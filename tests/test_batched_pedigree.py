"""
The batched pedigree route (run_dp_batched_pedigree: block split -> unit
seeds -> host min-plus chain -> seeded solves -> stitch) must reproduce the
monolithic solve bit-for-bit: cost, transmission path (recombination
events), per-read partitioning and superreads.  Unlike T == 1 blocks,
pedigree blocks are coupled through the transmission chain — these tests
pin the seam handling (boundary folds, recombination at block boundaries,
tie-breaks) to the monolithic reference semantics.
"""

import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core import NumericSampleIds, Pedigree
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.ops import wmec


def _gt(i):
    return Genotype.from_index(i, 2)


def _trio_multi_block_readset(
    seed, n_blocks=4, cols_per_block=6, reads_per_block=9, n_ind=3
):
    rng = random.Random(seed)
    rs = core.ReadSet()
    positions = []
    base = 100
    rid = 0
    for b in range(n_blocks):
        block_positions = [base + 10 * i for i in range(cols_per_block)]
        positions.extend(block_positions)
        for _ in range(reads_per_block):
            start = rng.randrange(0, cols_per_block - 1)
            length = rng.randint(2, cols_per_block - start)
            read = core.Read(f"r{rid}", 50, 0, rid % n_ind)
            rid += 1
            for c in range(start, start + length):
                read.add_variant(
                    block_positions[c], rng.randint(0, 1), rng.choice([5, 12, 28])
                )
            rs.add(read)
        base += 10 * cols_per_block + 5000  # gap: no read spans blocks
    rs.sort()
    return rs, positions


def _pack_trio(rs, positions, seed, n_ind=3, trios=((0, 1, 2),)):
    rng = random.Random(seed + 1)
    nsi = NumericSampleIds()
    ped = Pedigree(nsi)
    for ind in range(n_ind):
        ped.add_individual(f"ind{ind}", [_gt(1)] * len(positions), None)
    for f, m, c in trios:
        ped.add_relationship(f"ind{f}", f"ind{m}", f"ind{c}")
    recomb = [rng.randint(1, 10) for _ in positions]
    return wmec.pack_problem(rs, recomb, ped, False, positions), ped


@pytest.mark.parametrize("seed", range(8))
def test_pedigree_batched_equals_monolithic(seed):
    rs, _ = _trio_multi_block_readset(seed)
    positions = sorted(rs.get_positions())
    packed, ped = _pack_trio(rs, positions, seed)
    assert packed.T == 4

    ranges = wmec.connected_column_ranges(packed)
    assert len(ranges) > 1, "fixture must decompose into multiple blocks"

    mono = wmec.run_dp(packed, backend="numpy")
    batched = wmec.run_dp_batched_pedigree(packed)
    assert batched is not None

    assert batched.optimal_cost == mono.optimal_cost
    np.testing.assert_array_equal(batched.trans_path, mono.trans_path)
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(
        packed, mono
    )
    a0m, a1m, qm = wmec.extract_alleles(packed, mono, ped)
    a0b, a1b, qb = wmec.extract_alleles(packed, batched, ped)
    np.testing.assert_array_equal(a0m, a0b)
    np.testing.assert_array_equal(a1m, a1b)
    np.testing.assert_array_equal(qm, qb)


@pytest.mark.parametrize("seed", [3, 17])
def test_quartet_batched_equals_monolithic(seed):
    """Two trios (T=16) exercise multi-trio transmission seams."""
    rs, _ = _trio_multi_block_readset(
        seed, n_blocks=3, cols_per_block=5, reads_per_block=8, n_ind=4
    )
    positions = sorted(rs.get_positions())
    packed, ped = _pack_trio(
        rs, positions, seed, n_ind=4, trios=((0, 1, 2), (0, 1, 3))
    )
    assert packed.T == 16

    mono = wmec.run_dp(packed, backend="numpy")
    batched = wmec.run_dp_batched_pedigree(packed)
    assert batched is not None
    assert batched.optimal_cost == mono.optimal_cost
    np.testing.assert_array_equal(batched.trans_path, mono.trans_path)
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(
        packed, mono
    )


def test_pedigree_backend_env_override(monkeypatch):
    rs, _ = _trio_multi_block_readset(42)
    positions = sorted(rs.get_positions())
    packed, _ped = _pack_trio(rs, positions, 42)
    mono = wmec.run_dp(packed, backend="numpy")

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")
    forced = wmec.run_dp(packed, backend="auto")
    assert forced.optimal_cost == mono.optimal_cost
    np.testing.assert_array_equal(forced.trans_path, mono.trans_path)
    assert wmec.extract_partitioning(packed, forced) == wmec.extract_partitioning(
        packed, mono
    )


def test_pedigree_batched_single_block_returns_none():
    rs, _ = _trio_multi_block_readset(7, n_blocks=1)
    positions = sorted(rs.get_positions())
    packed, _ped = _pack_trio(rs, positions, 7)
    assert wmec.run_dp_batched_pedigree(packed) is None


def _seam_matrix_bruteforce(block_arrs, k_b, T, P):
    """Seam matrix of one block via T independent unit-seeded scans."""
    from whatshap_tpu.parallel.blocks import stack_blocks

    rep = stack_blocks([block_arrs] * T)
    dp0 = np.full((T, T), wmec.INF, dtype=np.int32)
    np.fill_diagonal(dp0, 0)
    m = wmec._launch_batched(wmec.forward_m_batched, k_b, T, P, rep + (dp0,))
    return np.asarray(m, dtype=np.int64)


@pytest.mark.parametrize(
    "n_ind,trios",
    [
        (3, ((0, 1, 2),)),  # trio: full symmetry, 1 coset
        (4, ((0, 1, 2), (0, 1, 3))),  # quartet, shared parents: 4 cosets
        (5, ((0, 1, 2), (2, 3, 4))),  # multi-generation: middle individual
        # is child AND parent, contributing no generator: 2 cosets
    ],
)
def test_seam_matrix_transmission_symmetry(n_ind, trios):
    """G[a][b] == G[0-coset rep][b ^ a ^ rep] for every block: the coset
    expansion used by pass 1 of run_dp_batched_pedigree reproduces the
    brute-force T-seeded seam matrix exactly."""
    rs, _ = _trio_multi_block_readset(
        11, n_blocks=3, cols_per_block=5, reads_per_block=8, n_ind=n_ind
    )
    positions = sorted(rs.get_positions())
    packed, _ped = _pack_trio(rs, positions, 11, n_ind=n_ind, trios=trios)
    T, P = packed.T, packed.P

    span = {0}
    for g in packed.t_sym_masks:
        span |= {d ^ g for d in span}
    expected_cosets = {
        3: 1,
        4: 4,
        5: 2,
    }[n_ind]
    assert T // len(span) == expected_cosets

    ranges = wmec.connected_column_ranges(packed)
    assert len(ranges) > 1
    blocks = list(wmec._slice_ranges(packed, ranges, on_accel=False))
    for c_pad, k_b, arrs in blocks:
        G = _seam_matrix_bruteforce(arrs, k_b, T, P)
        for a in range(T):
            for d in span:
                np.testing.assert_array_equal(
                    G[a], G[a ^ d][[b ^ d for b in range(T)]]
                )


def test_multigeneration_batched_equals_monolithic():
    """Three-generation pedigree (grandparents -> parent -> child): the
    coset-seeded seam pass must keep the batched route bit-identical."""
    rs, _ = _trio_multi_block_readset(
        23, n_blocks=3, cols_per_block=5, reads_per_block=8, n_ind=5
    )
    positions = sorted(rs.get_positions())
    packed, ped = _pack_trio(
        rs, positions, 23, n_ind=5, trios=((0, 1, 2), (2, 3, 4))
    )
    assert packed.T == 16

    mono = wmec.run_dp(packed, backend="numpy")
    batched = wmec.run_dp_batched_pedigree(packed)
    assert batched is not None
    assert batched.optimal_cost == mono.optimal_cost
    np.testing.assert_array_equal(batched.trans_path, mono.trans_path)
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(
        packed, mono
    )


def test_device_seam_chain_matches_host_chain():
    """The on-device min-plus seam chain (R == 1 route) must reproduce the
    host chain exactly, including INF saturation and bucket reordering."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    T = 4
    for _trial in range(12):
        nb = int(rng.randint(2, 40))
        m_all = rng.randint(0, wmec.INF, size=(nb, T)).astype(np.int64)
        m_all[rng.rand(nb, T) < 0.2] = wmec.INF
        G = m_all[np.arange(nb)[:, None, None],
                  np.arange(T)[:, None] ^ np.arange(T)[None, :]]
        m_in_host = np.zeros((nb, T), dtype=np.int64)
        m_cur = np.minimum(G[0].min(axis=0), wmec.INF)
        for j in range(1, nb):
            m_in_host[j] = m_cur
            m_cur = np.minimum((m_cur[:, None] + G[j]).min(axis=0), wmec.INF)
        # two buckets with interleaved block order, as the launch layer makes
        split = nb // 2
        order = list(range(0, nb, 2)) + list(range(1, nb, 2))
        parts = (
            jnp.asarray(m_all[order[:split]].astype(np.int32)),
            jnp.asarray(m_all[order[split:]].astype(np.int32)),
        )
        row_of = np.empty(nb, np.int32)
        for pos, ri in enumerate(order):
            row_of[ri] = pos
        nbp = wmec._b_tier(nb)
        perm = np.full(nbp, nb, np.int32)
        perm[:nb] = row_of
        m_in_dev = np.asarray(
            wmec._seam_chain_device(nbp, parts, jnp.asarray(perm))
        )
        np.testing.assert_array_equal(
            m_in_dev[:nb].astype(np.int64), m_in_host
        )

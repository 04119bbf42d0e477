"""
The production batched route (run_dp_batched: block split -> bucket ->
batched device solve -> stitch) must reproduce the monolithic solve
bit-for-bit on every output: cost, per-read partitioning, superread
alleles/qualities.
"""

import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core import NumericSampleIds, Pedigree, PedigreeDPTable
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.ops import wmec


def _gt(i):
    return Genotype.from_index(i, 2)


def _multi_block_readset(seed, n_blocks=5, cols_per_block=8, reads_per_block=6):
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
            read = core.Read(f"r{rid}", 50, 0, 0)
            rid += 1
            for c in range(start, start + length):
                read.add_variant(block_positions[c], rng.randint(0, 1), rng.choice([5, 12, 28]))
            rs.add(read)
        base += 10 * cols_per_block + 5000  # gap: no read spans blocks
    rs.sort()
    return rs, positions


def _pack(rs, positions):
    nsi = NumericSampleIds()
    ped = Pedigree(nsi)
    ped.add_individual("s0", [_gt(1)] * len(positions), None)
    recomb = [2] * len(positions)
    return wmec.pack_problem(rs, recomb, ped, False, positions)


@pytest.mark.parametrize("seed", range(6))
def test_batched_equals_monolithic(seed):
    rs, all_positions = _multi_block_readset(seed)
    positions = sorted(rs.get_positions())
    packed = _pack(rs, positions)

    ranges = wmec.connected_column_ranges(packed)
    assert len(ranges) > 1, "fixture must decompose into multiple blocks"

    mono = wmec.run_dp(packed, backend="numpy")
    batched = wmec.run_dp_batched(packed)
    assert batched is not None

    assert batched.optimal_cost == mono.optimal_cost
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(packed, mono)

    nsi = NumericSampleIds()
    ped = Pedigree(nsi)
    ped.add_individual("s0", [_gt(1)] * len(positions), None)
    a0m, a1m, qm = wmec.extract_alleles(packed, mono, ped)
    a0b, a1b, qb = wmec.extract_alleles(packed, batched, ped)
    np.testing.assert_array_equal(a0m, a0b)
    np.testing.assert_array_equal(a1m, a1b)
    np.testing.assert_array_equal(qm, qb)


def test_backend_env_override(monkeypatch):
    rs, _ = _multi_block_readset(99)
    positions = sorted(rs.get_positions())
    packed = _pack(rs, positions)
    mono = wmec.run_dp(packed, backend="numpy")

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")
    forced = wmec.run_dp(packed, backend="auto")
    assert forced.optimal_cost == mono.optimal_cost
    assert wmec.extract_partitioning(packed, forced) == wmec.extract_partitioning(packed, mono)


def test_cli_phase_under_forced_backends(tmp_path, monkeypatch):
    """The phase CLI must produce identical VCF output whichever backend
    solves the DP."""
    from whatshap_tpu.cli.phase import run_whatshap

    outputs = {}
    for name in ("numpy", "jax", "batched"):
        monkeypatch.setenv("WHATSHAP_TPU_BACKEND", name)
        out = tmp_path / f"phased_{name}.vcf"
        run_whatshap(
            phase_input_files=["tests/data/pacbio/pacbio.bam"],
            variant_file="tests/data/pacbio/variants.vcf",
            reference="tests/data/pacbio/reference.fasta",
            output=str(out),
            write_command_line_header=False,
        )
        outputs[name] = [
            line for line in out.read_text().splitlines() if not line.startswith("##")
        ]
    assert outputs["numpy"] == outputs["jax"]
    assert outputs["numpy"] == outputs["batched"]


def test_solve_packed_list_heterogeneous_k():
    """solve_packed_list buckets by (K, C); each block's result must equal
    its own serial solve even when coverages differ wildly across blocks."""
    from whatshap_tpu.parallel import workloads

    # trio instances with K spread (different read counts/lengths per block)
    packed_list = []
    for nb, (n_reads, rl) in enumerate([(12, 3), (24, 4), (40, 5)]):
        _, _, _, pl, _ = workloads.build_trio_batch(
            2, n_pos=48, n_reads=n_reads, seed=100 + nb, c_pad=48, read_len=rl
        )
        packed_list.extend(pl)
    assert max(p.K for p in packed_list) <= 12, [p.K for p in packed_list]
    ks = {p.K for p in packed_list}
    assert len(ks) > 1, "workload should span multiple K"
    results = wmec.solve_packed_list(packed_list)
    assert len(results) == len(packed_list)
    for p, r in zip(packed_list, results):
        serial = wmec.run_dp(p, backend="numpy")
        assert r.optimal_cost == serial.optimal_cost
        # paths must agree on active-slot bits (inactive bits are don't-care)
        act_mask = np.array(
            [int("".join("1" if a else "0" for a in row[::-1]), 2) for row in p.active],
            dtype=np.int64,
        )
        np.testing.assert_array_equal(
            np.asarray(r.index_path) & act_mask,
            np.asarray(serial.index_path) & act_mask,
        )
        np.testing.assert_array_equal(r.trans_path, serial.trans_path)


def test_solve_packed_list_mixed_tp_rejected():
    from whatshap_tpu.parallel import workloads

    _, _, _, single, _ = workloads.build_trio_batch(
        1, n_pos=8, n_reads=6, seed=7, n_ind=1, trios=(), c_pad=8
    )
    _, _, _, trio, _ = workloads.build_trio_batch(1, n_pos=8, n_reads=9, seed=8, c_pad=8)
    with pytest.raises(ValueError):
        wmec.solve_packed_list(single + trio)


def test_b_tier_ladder():
    from whatshap_tpu.ops import wmec

    assert wmec._b_tier(1) == 1
    assert wmec._b_tier(5) == 6
    assert wmec._b_tier(63) == 64
    assert wmec._b_tier(65) == 96
    assert wmec._b_tier(9999) == 9999  # beyond ladder: unchanged
    assert wmec._b_tier_floor(238) == 192
    assert wmec._b_tier_floor(1) == 1
    # ladder steps are <= 1.5x (after the tiny head) so padded compute
    # waste is bounded by a third
    for a, b in zip(wmec._B_TIERS, wmec._B_TIERS[1:]):
        assert b <= max(a * 1.5, a + 1)


def test_prep_batch_and_slice_b_roundtrip():
    import numpy as np

    from whatshap_tpu.ops import wmec

    arrs = (np.arange(12.0).reshape(3, 4), np.ones((3, 2), bool))
    padded = tuple(np.asarray(x) for x in wmec._prep_batch(1, 6, *arrs))
    assert all(a.shape[0] == 6 for a in padded)
    # padding replicates block 0
    assert (padded[0][3:] == arrs[0][0]).all()
    # repeat happens before padding (the seam route's T unit seeds)
    rep = tuple(np.asarray(x) for x in wmec._prep_batch(2, 8, *arrs))
    assert rep[0].shape[0] == 8
    assert (rep[0][:6] == np.repeat(arrs[0], 2, axis=0)).all()
    assert (rep[0][6:] == arrs[0][0]).all()
    # tuple and single-array results both slice back
    out = wmec._slice_b(tuple(padded), 3)
    assert all((o == a).all() for o, a in zip(out, arrs))
    single = wmec._slice_b(padded[0], 3)
    assert (single == arrs[0]).all()


def test_launch_stats_record_true_and_padded_batch(monkeypatch):
    """LAUNCH_STATS rows are (K, T, C, B_true, B_padded, n_dev): B_true is
    the pre-padding block count (pad_fraction and the scaling model depend
    on seeing the padding)."""
    import numpy as np

    from whatshap_tpu.ops import wmec

    monkeypatch.setenv("WHATSHAP_TPU_NO_MESH", "1")  # single-device launch
    calls = []

    def fake_kernel(K, T, P, *arrs):
        calls.append(arrs[0].shape[0])
        return (np.zeros((arrs[0].shape[0], 4)),)

    arrays = tuple(np.zeros((5, 8, 2), np.float32) for _ in range(3))
    wmec.LAUNCH_STATS.clear()
    out = wmec._launch_batched(fake_kernel, 8, 1, 2, arrays)
    assert calls == [5]  # CPU backend: no tier padding
    (k, t, c, b, b_pad, nd) = wmec.LAUNCH_STATS[-1]
    assert (k, t, c, b, nd) == (8, 1, 8, 5, 1)
    assert b_pad >= b

"""
Differential tests for the Pallas TPU wMEC kernels (interpret mode on CPU):
forward scan and full batched solve must be bit-identical to the XLA path
(which is itself fuzz-verified bit-exact against the reference C++).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whatshap_tpu.ops import wmec, wmec_pallas  # noqa: E402


def _workload(n_blocks=2, n_cols=48, coverage=8, seed=5):
    from whatshap_tpu.core import NumericSampleIds, Pedigree
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    packed_list = []
    k_max = 0
    for b in range(n_blocks):
        rs, positions, _ = blk.make_synthetic_readset(
            n_cols, coverage, read_len=8, seed=seed + b
        )
        ped = Pedigree(NumericSampleIds())
        ped.add_individual(
            "s",
            [canonic_index_to_biallelic_gt(1) for _ in positions],
            [None] * len(positions),
        )
        packed = wmec.pack_problem(rs, [1] * len(positions), ped, False)
        packed_list.append(packed)
        k_max = max(k_max, packed.K)
    k_max = max(k_max, wmec_pallas.LANE_BITS)
    padded = [blk.pad_block(p, n_cols, k_pad=k_max) for p in packed_list]
    arrays = blk.stack_blocks(padded)
    return k_max, packed_list[0].T, packed_list[0].P, [jnp.asarray(a) for a in arrays]


def test_forward_scan_matches_xla():
    K, T, P, arrays = _workload()
    assert wmec_pallas.kernel_supported(K, T, P)
    out_p = wmec_pallas.forward_scan_pallas(K, T, P, *arrays, interpret=True)
    for b in range(int(arrays[0].shape[0])):
        out_r = wmec._forward_scan(K, T, P, *[a[b] for a in arrays])
        for name, xp, xr in zip(
            ["dp", "jmin", "key", "proj_idx", "proj_jmin"], out_p, out_r
        ):
            assert np.array_equal(np.asarray(xp[b]), np.asarray(xr)), name


def test_solve_batched_matches_xla():
    K, T, P, arrays = _workload(n_blocks=3, seed=21)
    cp, ip, tp = wmec_pallas.solve_batched_pallas(K, T, P, *arrays, interpret=True)
    cr, ir, tr = wmec.solve_batched(K, T, P, *arrays)
    assert np.array_equal(np.asarray(cp), np.asarray(cr))
    assert np.array_equal(np.asarray(ip), np.asarray(ir))
    assert np.array_equal(np.asarray(tp), np.asarray(tr))


def _trio_workload(n_blocks=2, n_pos=12, n_reads=10, seed=31, n_ind=3, trios=((0, 1, 2),)):
    """Pedigree instances: one trio -> T=4, two trios (quartet) -> T=16."""
    from whatshap_tpu.core import NumericSampleIds, Pedigree, Read, ReadSet
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    rng = np.random.RandomState(seed)
    packed_list = []
    for _ in range(n_blocks):
        positions = [(i + 1) * 10 for i in range(n_pos)]
        rs = ReadSet()
        for i in range(n_reads):
            sample = int(rng.randint(0, n_ind))
            start = int(rng.randint(0, n_pos - 1))
            end = int(rng.randint(start + 1, n_pos))
            read = Read(f"R{i}", 50, 0, sample)
            for c in range(start, end + 1):
                if rng.rand() < 0.2 and c not in (start, end):
                    continue
                read.add_variant(positions[c], int(rng.randint(0, 2)), int(rng.randint(1, 300)))
            rs.add(read)
        rs.sort()
        ped = Pedigree(NumericSampleIds())
        for ind in range(n_ind):
            ped.add_individual(
                f"ind{ind}", [canonic_index_to_biallelic_gt(1) for _ in positions], None
            )
        for f, m, c in trios:
            ped.add_relationship(f"ind{f}", f"ind{m}", f"ind{c}")
        packed_list.append(
            wmec.pack_problem(
                rs, [int(rng.randint(1, 10)) for _ in positions], ped, False, positions
            )
        )
    k_max = max(max(p.K for p in packed_list), wmec_pallas.LANE_BITS)
    padded = [blk.pad_block(p, 16, k_pad=k_max) for p in packed_list]
    arrays = blk.stack_blocks(padded)
    return k_max, packed_list[0].T, packed_list[0].P, [jnp.asarray(a) for a in arrays]


def test_forward_scan_trio_matches_xla():
    K, T, P, arrays = _trio_workload()
    assert T == 4 and P == 4
    assert wmec_pallas.kernel_supported(K, T, P)
    out_p = wmec_pallas.forward_scan_pallas(K, T, P, *arrays, interpret=True)
    for b in range(int(arrays[0].shape[0])):
        out_r = wmec._forward_scan(K, T, P, *[a[b] for a in arrays])
        for name, xp, xr in zip(
            ["dp", "jmin", "key", "proj_idx", "proj_jmin"], out_p, out_r
        ):
            assert np.array_equal(np.asarray(xp[b]), np.asarray(xr)), name


def test_solve_batched_trio_matches_xla():
    K, T, P, arrays = _trio_workload(seed=37)
    cp, ip, tp = wmec_pallas.solve_batched_pallas(K, T, P, *arrays, interpret=True)
    cr, ir, tr = wmec.solve_batched(K, T, P, *arrays)
    assert np.array_equal(np.asarray(cp), np.asarray(cr))
    assert np.array_equal(np.asarray(ip), np.asarray(ir))
    assert np.array_equal(np.asarray(tp), np.asarray(tr))


def test_solve_quartet_matches_xla():
    # two trios (mother, father, two children): T = 16 transmissions
    K, T, P, arrays = _trio_workload(
        n_blocks=1, n_pos=10, n_reads=9, seed=61, n_ind=4,
        trios=((0, 1, 2), (0, 1, 3)),
    )
    assert T == 16 and P == 4
    assert wmec_pallas.kernel_supported(K, T, P)
    cp, ip, tp = wmec_pallas.solve_batched_pallas(K, T, P, *arrays, interpret=True)
    cr, ir, tr = wmec.solve_batched(K, T, P, *arrays)
    assert np.array_equal(np.asarray(cp), np.asarray(cr))
    assert np.array_equal(np.asarray(ip), np.asarray(ir))
    assert np.array_equal(np.asarray(tp), np.asarray(tr))


def test_solve_segmented_matches_batched():
    # checkpoint + recompute segmentation must be bit-identical to the
    # single-pass solve (and thus to the XLA path)
    K, T, P, arrays = _workload(n_blocks=2, n_cols=48, seed=43)
    cs, is_, ts = wmec_pallas.solve_segmented(K, T, P, *arrays, seg=16, interpret=True)
    cr, ir, tr = wmec.solve_batched(K, T, P, *arrays)
    assert np.array_equal(np.asarray(cs), np.asarray(cr))
    assert np.array_equal(np.asarray(is_), np.asarray(ir))
    assert np.array_equal(np.asarray(ts), np.asarray(tr))


def test_solve_segmented_trio_matches_batched():
    K, T, P, arrays = _trio_workload(n_pos=12, seed=51)
    # trio workload pads to 16 columns -> 4 segments of 4
    cs, is_, ts = wmec_pallas.solve_segmented(K, T, P, *arrays, seg=4, interpret=True)
    cr, ir, tr = wmec.solve_batched(K, T, P, *arrays)
    assert np.array_equal(np.asarray(cs), np.asarray(cr))
    assert np.array_equal(np.asarray(is_), np.asarray(ir))
    assert np.array_equal(np.asarray(ts), np.asarray(tr))


def test_forward_m_seeded_matches_xla():
    # pedigree seam-route pass 1: unit-seeded forwards -> seam matrix rows
    K, T, P, arrays = _trio_workload(n_blocks=2, seed=71)
    assert wmec_pallas.kernel_supported(K, T, P)
    B = int(arrays[0].shape[0])
    unit = np.full((T, T), wmec.INF, dtype=np.int32)
    np.fill_diagonal(unit, 0)
    dp0 = jnp.asarray(np.tile(unit, (B, 1)))
    rep = tuple(jnp.repeat(a, T, axis=0) for a in arrays)
    m_p = wmec_pallas.forward_m_seeded_pallas(K, T, P, *rep, dp0, interpret=True)
    m_r = wmec.forward_m_batched(K, T, P, *rep, dp0)
    assert np.array_equal(np.asarray(m_p), np.asarray(m_r))


def test_solve_seeded_matches_xla():
    # pedigree seam-route pass 2: seeded solves with per-seam backtraces
    K, T, P, arrays = _trio_workload(n_blocks=3, seed=73)
    assert wmec_pallas.kernel_supported(K, T, P)
    B = int(arrays[0].shape[0])
    rng = np.random.RandomState(7)
    dp0 = jnp.asarray(rng.randint(0, 50, size=(B, T)).astype(np.int32))
    dnext = jnp.asarray(rng.rand(B, K) < 0.4)
    out_p = wmec.solve_seeded_batched_pallas(
        K, T, P, *arrays, dp0, dnext, interpret=True
    )
    out_r = wmec.solve_seeded_batched(K, T, P, *arrays, dp0, dnext)
    names = ["cost_head", "m", "ip_head", "tp_head", "seam_head", "ips", "tps", "seams"]
    for name, xp, xr in zip(names, out_p, out_r):
        assert np.array_equal(np.asarray(xp), np.asarray(xr)), name

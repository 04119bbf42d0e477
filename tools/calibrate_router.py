"""
Measure the host-vs-device routing crossover for run_dp on the attached
device, instead of trusting the hard-coded defaults.

run_dp's auto router (whatshap_tpu/ops/wmec.py) sends instances with total
DP work ``C * 2^K * T <= HOST_ROUTE_WORK`` folded states to the host numpy
mirror: below some size the device round-trip (dispatch + fence over the
tunnel) dominates and the host wins.  This tool sweeps instance sizes,
times both routes warm, locates the crossover, and prints the env override
to export (``WHATSHAP_TPU_HOST_ROUTE_WORK``).  On CPU-only hosts it instead
calibrates the native adaptive-2^k_c engine against the XLA scan
(``WHATSHAP_TPU_ADAPTIVE_ROUTE_WORK``).

Usage:  python tools/calibrate_router.py [--json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _pack(n_cols, coverage, seed=1):
    from whatshap_tpu.core import NumericSampleIds, Pedigree
    from whatshap_tpu.ops import wmec
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    rs, positions, _ = blk.make_synthetic_readset(
        n_cols, coverage, read_len=8, seed=seed
    )
    ped = Pedigree(NumericSampleIds())
    ped.add_individual(
        "s",
        [canonic_index_to_biallelic_gt(1) for _ in positions],
        [None] * len(positions),
    )
    return wmec.pack_problem(rs, [1] * len(positions), ped, False)


def _time_backend(packed, backend, n_iters=3):
    from whatshap_tpu.ops import wmec

    wmec.run_dp(packed, backend=backend)  # warm (compile + caches)
    best = float("inf")
    for _ in range(n_iters):
        t0 = time.perf_counter()
        wmec.run_dp(packed, backend=backend)
        best = min(best, time.perf_counter() - t0)
    return best


def calibrate(device_backend, points=None):
    """Sweep work sizes; return per-point timings and the measured
    crossover (largest work size where the host still wins)."""
    from whatshap_tpu.ops import wmec

    # (n_cols, coverage) chosen so work = C * 2^K spans ~2^16 .. ~2^26
    points = points or [
        (64, 8),
        (128, 10),
        (256, 12),
        (512, 12),
        (512, 14),
        (1024, 14),
        (1024, 16),
    ]
    rows = []
    crossover = 0
    for n_cols, cov in points:
        packed = _pack(n_cols, cov)
        work = packed.n_cols * (1 << packed.K) * packed.T
        host_s = _time_backend(packed, "numpy")
        dev_s = _time_backend(packed, device_backend)
        rows.append(
            {
                "n_cols": packed.n_cols,
                "K": packed.K,
                "work_states": work,
                "host_s": round(host_s, 5),
                f"{device_backend}_s": round(dev_s, 5),
                "winner": "host" if host_s <= dev_s else device_backend,
            }
        )
        if host_s <= dev_s:
            crossover = max(crossover, work)
    return rows, crossover


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true", help="one JSON line only")
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (env JAX_PLATFORMS is too late on hosts "
        "whose sitecustomize imports jax at interpreter startup)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from whatshap_tpu.ops import wmec

    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        rows, crossover = calibrate("batched")
        var, default = "WHATSHAP_TPU_HOST_ROUTE_WORK", wmec.HOST_ROUTE_WORK
    else:
        # CPU-only host: the meaningful boundary is native-adaptive vs the
        # XLA scan.  "numpy" routes to the native adaptive engine when
        # available, so the same sweep applies with the jax backend as the
        # device side.
        rows, crossover = calibrate("jax")
        var, default = "WHATSHAP_TPU_ADAPTIVE_ROUTE_WORK", wmec.ADAPTIVE_ROUTE_WORK

    # recommend the next power of two at or above the crossover (router
    # compares with <=); 0 means the host never won — keep a small floor
    rec = 1 << max(crossover - 1, 1).bit_length() if crossover else 1 << 16
    out = {
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "sweep": rows,
        "measured_crossover_states": crossover,
        "recommended": {var: rec},
        "current_default": {var: default},
    }
    if args.json:
        print(json.dumps(out))
    else:
        for r in rows:
            print(r)
        print(f"\nmeasured crossover: {crossover} folded states")
        print(f"export {var}={rec}   # current default {default}")
    return out


if __name__ == "__main__":
    main()

"""
Warm the persistent XLA/Mosaic compile cache for the standard launch
shapes, so the first real CLI run on a fresh workload starts warm.

Every (K, C, B, T) launch bucket is a separate jit/Mosaic compile (minutes
cold over a tunneled backend).  The batch axis is tier-padded
(wmec._B_TIERS), so the compile universe is finite: this tool drives the
exact production dispatch functions (solve_batched_auto and the pedigree
seam kernels) over that grid with zero-filled inputs, and the persistent
cache (utils/jaxcache.py) stores each executable for every later process.

Usage:
    python tools/precompile.py            # common tiers (~a few minutes)
    python tools/precompile.py --full     # every K tier x B tier
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _zero_args(B, C, K, T, P):
    import jax.numpy as jnp

    nA = 1 << P
    return (
        jnp.zeros((B, C, K, T * P * 2), jnp.float32),  # wdiff
        jnp.zeros((B, C, T, P, 2), jnp.int32),  # wbase
        jnp.zeros((B, C, K), jnp.float32),  # rankw
        jnp.zeros((B, C, T, nA), jnp.int32),  # acost
        jnp.zeros((B, C, K), bool),  # die_prev
        jnp.zeros((B, C), jnp.int32),  # rc
    )


def warm(K, T, P, C, B, kind):
    import jax
    from whatshap_tpu.ops import wmec, wmec_pallas

    args = _zero_args(B, C, K, T, P)
    t0 = time.perf_counter()
    if kind == "solve":
        out = wmec.solve_batched_auto(K, T, P, *args)
    elif kind == "forward_m":
        dp0 = np.zeros((B, T), np.int32)
        out = wmec._launch_batched(
            wmec_pallas.forward_m_seeded_pallas, K, T, P, args + (dp0,)
        )
    elif kind == "seeded":
        dp0 = np.zeros((B, T), np.int32)
        dnext = np.zeros((B, K), bool)
        per_block = C * T * (1 << K) * 4 * 2
        out = wmec._launch_batched(
            wmec.solve_seeded_batched_pallas,
            K, T, P, args + (dp0, dnext), per_block_bytes=per_block,
        )
    else:
        raise ValueError(kind)
    jax.device_get(out)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true", help="every K tier x B tier")
    ap.add_argument("--cols", type=int, nargs="*", default=[64])
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu":
        print("no accelerator attached — nothing to precompile", file=sys.stderr)
        return 0

    from whatshap_tpu.ops import wmec, wmec_pallas
    from whatshap_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    tiers = [t for t in wmec._B_TIERS if t <= 384]
    small = [1, 8, 64]
    plans = []
    # single-sample exact solve (T=1, P=2): K15 is the default-coverage
    # tier (exact-K bucketing); others get the small ladder unless --full
    for k in range(8, 17):
        bt = tiers if (args.full or k in (14, 15, 16)) else small
        for c in args.cols:
            plans += [("solve", k, 1, 2, c, b) for b in bt]
    # trio seam route (T=4, P=4): K15 is the default tier
    for k in range(8, 16):
        if not wmec_pallas.kernel_supported(k, 4, 4):
            continue
        bt = tiers if (args.full or k in (14, 15)) else small
        for c in args.cols:
            # pass-1 batches are B*T seeds; warm the same ladder
            plans += [("forward_m", k, 4, 4, c, b) for b in bt]
            plans += [("seeded", k, 4, 4, c, b) for b in bt]

    t_all = time.perf_counter()
    for i, (kind, k, t, p, c, b) in enumerate(plans):
        dt = warm(k, t, p, c, b, kind)
        print(
            f"[{i + 1}/{len(plans)}] {kind} K={k} T={t} C={c} B={b}: {dt:.2f}s",
            flush=True,
        )
    print(f"warmed {len(plans)} shapes in {time.perf_counter() - t_all:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

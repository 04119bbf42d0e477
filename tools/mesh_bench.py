"""
Measure data-parallel scaling efficiency of the sharded block solver.

Runs the FULL batched wMEC solve (forward + device backtrace) on a
1-device mesh and on an n-device mesh over the same workload and reports
throughput and efficiency = T(1) / (n * T(n)).

On real multi-chip hardware this is the pod-slice efficiency number
(target >= 80% at n >= 2 hosts: blocks are embarrassingly parallel after
connected-component splitting, so the bound is load balance, not ICI).
On a single host you can still exercise the machinery with virtual
devices, but the timing is then bounded by physical cores and is NOT an
efficiency claim:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/mesh_bench.py --devices 8 --blocks 256

Prints one JSON line:
    {"devices": n, "blocks": B, "t1": ..., "tn": ..., "efficiency": ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all available devices)")
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--cols", type=int, default=64)
    ap.add_argument("--coverage", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU platform even if a TPU plugin "
                         "was pre-registered (mechanism check, not a perf claim)")
    ap.add_argument("--mode", choices=("both", "solo"), default="both",
                    help="'solo': run only the --devices mesh and print its "
                         "time + result checksum (lets the caller measure the "
                         "1-device baseline in a core-pinned subprocess, which "
                         "a virtual-device host needs for a meaningful "
                         "per-core scaling number)")
    ap.add_argument("--pin-cores", type=str, default=None,
                    help="restrict this process to the given CPU cores "
                         "(e.g. '0' or '0-1') before any compute")
    args = ap.parse_args()

    if args.pin_cores:
        cores = set()
        for part in args.pin_cores.split(","):
            if "-" in part:
                a, b = part.split("-")
                cores |= set(range(int(a), int(b) + 1))
            else:
                cores.add(int(part))
        os.sched_setaffinity(0, cores)

    if args.cpu:
        # sitecustomize may have pre-imported jax with a TPU plugin; the
        # config update after import is what actually takes effect then
        os.environ["JAX_PLATFORMS"] = "cpu"
        xla_flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in xla_flags:
            os.environ["XLA_FLAGS"] = (
                xla_flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from whatshap_tpu.parallel import mesh as pmesh
    from whatshap_tpu.parallel.workloads import build_single_sample_batch

    devices = jax.devices()
    n = args.devices or len(devices)
    assert n <= len(devices), f"asked for {n} devices, have {len(devices)}"
    assert args.blocks % n == 0, "--blocks must be divisible by --devices"

    K, T, P, packed_list, arrays = build_single_sample_batch(
        args.blocks, n_cols=args.cols, coverage=args.coverage, seed=7
    )

    def run(mesh):
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            costs, _, _ = pmesh.solve_blocks_sharded(mesh, K, T, P, arrays)
            costs = np.asarray(costs)  # host sync
            best = min(best, time.perf_counter() - t0)
        return best, costs

    if args.mode == "solo":
        import hashlib

        meshn = Mesh(np.array(devices[:n]), ("blocks",))
        run(meshn)
        tn, cn = run(meshn)
        print(json.dumps({
            "devices": n,
            "blocks": args.blocks,
            "cols": args.cols,
            "K": K,
            "t": round(tn, 4),
            "costs_sha": hashlib.sha256(
                np.ascontiguousarray(cn).tobytes()
            ).hexdigest(),
        }))
        return

    mesh1 = Mesh(np.array(devices[:1]), ("blocks",))
    meshn = Mesh(np.array(devices[:n]), ("blocks",))
    # warm both compilations before timing
    run(mesh1)
    t1, c1 = run(mesh1)
    run(meshn)
    tn, cn = run(meshn)
    assert np.array_equal(c1, cn), "sharded result diverged from 1-device result"

    eff = t1 / (n * tn) if n > 1 else 1.0
    print(json.dumps({
        "devices": n,
        "blocks": args.blocks,
        "cols": args.cols,
        "K": K,
        "t1": round(t1, 4),
        "tn": round(tn, 4),
        "blocks_per_sec": round(args.blocks / tn, 1),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()

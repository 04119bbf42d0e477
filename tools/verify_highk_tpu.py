"""
Device check: the K=17 Pallas kernel (the VMEM ceiling for T=1) against
the C++ exact engine, on both the monolithic solve and the segmented
checkpoint/recompute path.  Needs a real accelerator; CPU parity for
these shapes is covered (slowly) by the XLA mirror tests.

    python tools/verify_highk_tpu.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from whatshap_tpu.core import NumericSampleIds, Pedigree
from whatshap_tpu.ops import wmec, wmec_pallas
from whatshap_tpu.parallel import blocks as blk
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt


def build(cols, cov, seed=6):
    rs, positions, _ = blk.make_synthetic_readset(cols, cov, read_len=8, seed=seed)
    ped = Pedigree(NumericSampleIds())
    ped.add_individual(
        "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
    )
    return wmec.pack_problem(rs, [1] * len(positions), ped, False)


def active_mask(packed):
    return np.array(
        [int("".join("1" if a else "0" for a in row[::-1]), 2) for row in packed.active],
        dtype=np.int64,
    )


def main():
    K = 17
    packed = build(384, 17)
    assert packed.K == K, packed.K
    assert wmec_pallas.kernel_supported(K, packed.T, packed.P)
    serial = wmec._run_dp_native(packed)
    assert serial is not None, "native wmeclib unavailable"
    mask = active_mask(packed)

    padded = blk.pad_block(packed, 384, k_pad=K)
    args = [
        jnp.asarray(np.asarray(x)[None])
        for x in (padded.wdiff, padded.wbase, padded.rankw, padded.acost,
                  padded.die_prev, padded.rc)
    ]

    cost, ipath, tpath = wmec_pallas.solve_batched_pallas(K, packed.T, packed.P, *args)
    assert int(jax.device_get(cost)[0]) == serial.optimal_cost
    ip = np.asarray(jax.device_get(ipath))[0][: packed.n_cols].astype(np.int64)
    assert np.array_equal(ip & mask, np.asarray(serial.index_path, dtype=np.int64) & mask)
    print(f"K=17 Pallas solve parity OK: cost={serial.optimal_cost}")

    cost2, ipath2, tpath2 = wmec_pallas.solve_segmented(
        K, packed.T, packed.P, *args, seg=128
    )
    assert int(jax.device_get(cost2)[0]) == serial.optimal_cost
    ip2 = np.asarray(jax.device_get(ipath2))[0][: packed.n_cols].astype(np.int64)
    assert np.array_equal(ip2 & mask, np.asarray(serial.index_path, dtype=np.int64) & mask)
    print(f"K=17 Pallas segmented parity OK on {jax.default_backend()}")


if __name__ == "__main__":
    main()

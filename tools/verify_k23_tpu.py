"""
Device check: segmented XLA solve at the reference's K=23 coverage cap vs
the C++ exact engine (adaptive, cheap at any K).  The same assertion lives
in tests/test_highcov_segmented.py::test_coverage_23_segmented_vs_native,
but XLA-CPU needs 30+ minutes at 2^23 states — on a TPU this takes seconds
after the compile.

    python tools/verify_k23_tpu.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from whatshap_tpu.core import NumericSampleIds, Pedigree
from whatshap_tpu.ops import wmec
from whatshap_tpu.parallel import blocks as blk
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt


def main():
    rs, positions, _ = blk.make_synthetic_readset(24, 23, read_len=8, seed=6)
    ped = Pedigree(NumericSampleIds())
    ped.add_individual(
        "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
    )
    packed = wmec.pack_problem(rs, [1] * len(positions), ped, False)
    assert packed.K == 23, packed.K

    serial = wmec._run_dp_native(packed)
    assert serial is not None, "native wmeclib unavailable"

    padded = blk.pad_block(packed, 24)
    args = [
        jnp.asarray(x)
        for x in (padded.wdiff, padded.wbase, padded.rankw, padded.acost,
                  padded.die_prev, padded.rc)
    ]
    seg = wmec.solve_scan_segmented(packed.K, packed.T, packed.P, *args, seg=8)
    assert seg.optimal_cost == serial.optimal_cost, (seg.optimal_cost, serial.optimal_cost)
    assert list(seg.index_path[: packed.n_cols]) == list(serial.index_path)
    assert list(seg.trans_path[: packed.n_cols]) == list(serial.trans_path)
    import jax

    print(f"K=23 segmented parity OK on {jax.default_backend()}: cost={seg.optimal_cost}")


if __name__ == "__main__":
    main()

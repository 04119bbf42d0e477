"""
Differential test: the native C++ genotyping engine (native/genolib.cpp)
must match the numpy longdouble forward-backward to tight tolerance
(identical operation order except sum association), including NaN patterns
from the reference's unconditional normalizations.
"""

import math
import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core import PhredGenotypeLikelihoods
from whatshap_tpu.ops import genotyping as gt_ops
from whatshap_tpu.ops import wmec
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt


def _instance(rng, n_pos, n_reads, n_ind=1, trio=False):
    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = core.ReadSet()
    for i in range(n_reads):
        sample = rng.randrange(n_ind)
        start = rng.randrange(0, n_pos - 1)
        end = rng.randrange(start + 1, n_pos)
        r = core.Read(f"R{i}", 50, 0, sample)
        for c in range(start, end + 1):
            if rng.random() < 0.2 and c not in (start, end):
                continue
            r.add_variant(positions[c], rng.randrange(2), rng.randrange(1, 80))
        rs.add(r)
    rs.sort()
    ped = core.Pedigree(core.NumericSampleIds())
    for ind in range(n_ind):
        gls = [
            PhredGenotypeLikelihoods(
                [rng.choice([0.0, 5.0, 20.0]) for _ in range(3)]
            )
            for _ in positions
        ]
        ped.add_individual(
            f"ind{ind}",
            [canonic_index_to_biallelic_gt(rng.randrange(3)) for _ in positions],
            gls,
        )
    if trio:
        ped.add_relationship("ind0", "ind1", "ind2")
    recomb = [rng.choice([1, 2, 5]) for _ in positions]
    return wmec.pack_problem(rs, recomb, ped, False, positions, check_conflicts=False), ped


def _compare(packed, ped):
    nat = gt_ops._run_native(packed, ped)
    assert nat is not None, "native genolib unavailable"
    # numpy path, bypassing the dispatcher
    from whatshap_tpu import native

    saved = native.genolib
    native.genolib = None
    try:
        ref = gt_ops.run_genotyping(packed, ped)
    finally:
        native.genolib = saved
    assert nat.shape == ref.shape
    for idx in np.ndindex(ref.shape):
        a, b = float(nat[idx]), float(ref[idx])
        if math.isnan(b):
            assert math.isnan(a), idx
        else:
            assert abs(a - b) <= 1e-12 * max(abs(b), 1e-30), (idx, a, b)


def test_native_matches_numpy_single():
    from whatshap_tpu.native import genolib

    if genolib is None:
        pytest.skip("native genolib unavailable")
    for seed in range(8):
        rng = random.Random(900 + seed)
        packed, ped = _instance(rng, rng.randint(3, 10), rng.randint(3, 10))
        _compare(packed, ped)


def test_native_matches_numpy_trio():
    from whatshap_tpu.native import genolib

    if genolib is None:
        pytest.skip("native genolib unavailable")
    for seed in range(6):
        rng = random.Random(950 + seed)
        packed, ped = _instance(rng, rng.randint(3, 9), rng.randint(4, 10), n_ind=3, trio=True)
        _compare(packed, ped)

"""
Differential fuzz: the C++ exact wMEC engine (native/wmeclib.cpp) must match
the pure-numpy mirror EXACTLY — optimal cost, the full index path including
don't-care-bit inheritance, and the transmission path — on random
single-sample, trio and two-trio instances.
"""

import numpy as np
import pytest

from whatshap_tpu.native import wmeclib
from whatshap_tpu.ops import wmec

pytestmark = pytest.mark.skipif(wmeclib is None, reason="native wmeclib unavailable")


def _numpy_result(packed):
    """The pure mirror, bypassing the native dispatch."""
    import unittest.mock as mock

    with mock.patch.object(wmec, "_run_dp_native", lambda p: None):
        return wmec.run_dp(packed, backend="numpy")


def _native_result(packed):
    res = wmec._run_dp_native(packed)
    assert res is not None
    return res


def _random_instance(rng, n_pos, n_reads, n_ind=1, trios=()):
    from whatshap_tpu.core import NumericSampleIds, Pedigree, Read, ReadSet
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = ReadSet()
    for i in range(n_reads):
        sample = int(rng.randint(0, n_ind))
        start = int(rng.randint(0, n_pos - 1))
        end = int(rng.randint(start + 1, min(start + 8, n_pos) + 1))
        read = Read(f"R{i}", 50, 0, sample)
        for c in range(start, min(end, n_pos)):
            if rng.rand() < 0.15 and c not in (start,):
                continue
            read.add_variant(positions[c], int(rng.randint(0, 2)), int(rng.randint(1, 100)))
        rs.add(read)
    rs.sort()
    ped = Pedigree(NumericSampleIds())
    for ind in range(n_ind):
        ped.add_individual(
            f"ind{ind}", [canonic_index_to_biallelic_gt(1) for _ in positions], None
        )
    for f, m, c in trios:
        ped.add_relationship(f"ind{f}", f"ind{m}", f"ind{c}")
    recomb = [int(rng.randint(1, 10)) for _ in positions]
    return wmec.pack_problem(rs, recomb, ped, False, positions)


def _assert_equal(packed):
    a = _numpy_result(packed)
    b = _native_result(packed)
    assert a.optimal_cost == b.optimal_cost
    assert np.array_equal(a.index_path, b.index_path), (
        a.index_path.tolist(),
        b.index_path.tolist(),
    )
    assert np.array_equal(a.trans_path, b.trans_path)


@pytest.mark.parametrize("seed", range(25))
def test_single_sample(seed):
    rng = np.random.RandomState(4000 + seed)
    packed = _random_instance(rng, int(rng.randint(3, 30)), int(rng.randint(2, 25)))
    _assert_equal(packed)


@pytest.mark.parametrize("seed", range(20))
def test_trio(seed):
    rng = np.random.RandomState(5000 + seed)
    packed = _random_instance(
        rng, int(rng.randint(3, 20)), int(rng.randint(4, 25)), n_ind=3, trios=((0, 1, 2),)
    )
    _assert_equal(packed)


@pytest.mark.parametrize("seed", range(8))
def test_two_trios(seed):
    rng = np.random.RandomState(6000 + seed)
    packed = _random_instance(
        rng,
        int(rng.randint(3, 12)),
        int(rng.randint(6, 20)),
        n_ind=4,
        trios=((0, 1, 2), (0, 1, 3)),
    )
    _assert_equal(packed)


def test_through_dptable():
    """The PedigreeDPTable facade (auto backend, small instance -> native)
    must agree with the numpy mirror on the derived outputs."""
    from whatshap_tpu.core import PedigreeDPTable

    rng = np.random.RandomState(77)
    packed = _random_instance(rng, 12, 14)
    a = _numpy_result(packed)
    b = wmec.run_dp(packed, backend="numpy")
    assert a.optimal_cost == b.optimal_cost
    assert np.array_equal(a.index_path, b.index_path)
    assert np.array_equal(a.trans_path, b.trans_path)

"""
Differential fuzz: the C++ pair-scoring engine (native/scorelib.cpp) must
fill the TriangleSparseMatrix with exactly the same entries as the Python
pair loop (same f32 rounding points, same uint32 terminal wrap).
"""

import random

import pytest

from whatshap_tpu.core import Read, ReadSet
from whatshap_tpu.native import scorelib
from whatshap_tpu.polyphase.readscoring import ReadScoring, scoreReadset
from whatshap_tpu.polyphase.solver import AlleleMatrix

pytestmark = pytest.mark.skipif(scorelib is None, reason="native scorelib unavailable")


def _matrix(seed, ploidy):
    rng = random.Random(8200 + seed)
    n_pos = rng.randint(10, 60)
    n_reads = rng.randint(5, 60)
    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = ReadSet()
    for i in range(n_reads):
        start = rng.randint(0, n_pos - 2)
        length = rng.randint(2, min(20, n_pos - start))
        read = Read(f"r{i}", 50, 0, 0)
        for c in range(start, start + length):
            read.add_variant(positions[c], rng.randint(0, ploidy > 2 and 2 or 1), 30)
        rs.add(read)
    rs.sort()
    return AlleleMatrix(rs)


@pytest.mark.parametrize("seed", range(25))
@pytest.mark.parametrize("ploidy", [2, 4])
def test_native_scoring_matches_python(seed, ploidy, monkeypatch):
    am = _matrix(seed, ploidy)
    native = scoreReadset(am, 2, ploidy, 0.07)
    monkeypatch.setattr(
        ReadScoring, "_score_pairs_native", staticmethod(lambda *a, **k: None)
    )
    python = scoreReadset(am, 2, ploidy, 0.07)
    assert dict(native.m) == dict(python.m)

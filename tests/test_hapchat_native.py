"""
Differential fuzz: the C++ HapChat engine (native/hapchatlib.cpp) must
produce exactly the same haplotypes and optimal cost as the pure-Python
DP (which is itself oracle-fuzzed in test_oracle_solvers.py).
"""

import random

import pytest

import whatshap_tpu.core as core
from whatshap_tpu.native import hapchatlib
from whatshap_tpu.solver.hapchat import HapChatCore

pytestmark = pytest.mark.skipif(hapchatlib is None, reason="native hapchatlib unavailable")


def _readset(seed):
    rng = random.Random(5000 + seed)
    n_pos = rng.randint(2, 16)
    positions = sorted(rng.sample(range(10, 1200), n_pos))
    rs = core.ReadSet()
    made = 0
    for i in range(rng.randint(2, 16)):
        start = rng.randint(0, n_pos - 1)
        length = rng.randint(1, n_pos - start)
        vs = [
            (positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
            for p in range(start, start + length)
            if rng.random() < 0.85
        ]
        if not vs:
            continue
        read = core.Read(f"r{i}", 50, 0, 0)
        for p, a, q in vs:
            read.add_variant(p, a, q)
        rs.add(read)
        made += 1
    if made == 0:
        return None
    rs.sort()
    return rs


def _haps(hc):
    srs, _ = hc.get_super_reads()
    return [
        {v.position: v.allele for v in srs[0][k]} for k in range(2)
    ], hc.get_optimal_cost()


@pytest.mark.parametrize("seed", range(60))
def test_native_matches_python(seed):
    rs = _readset(seed)
    if rs is None:
        pytest.skip("empty readset")

    native = HapChatCore(rs)
    haps_native, cost_native = _haps(native)

    python = HapChatCore.__new__(HapChatCore)
    python._dp_native = lambda *a, **k: None
    python.__init__(rs)
    haps_python, cost_python = _haps(python)

    assert cost_native == cost_python
    assert haps_native == haps_python

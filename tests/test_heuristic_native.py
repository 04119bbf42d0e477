"""
Differential test: the C++ PedMEC heuristic engine (native/heurlib.cpp)
must produce exactly the same bipartition, transmission vector, haplotypes
and mutation events as the pure-Python engine on randomized single-sample
and trio instances (which is itself fuzz-verified against the reference
oracle in test_oracle_solvers.py).
"""

import random

import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.native import heurlib
from whatshap_tpu.solver.heuristic import PedMecHeuristic

pytestmark = pytest.mark.skipif(heurlib is None, reason="native heurlib unavailable")


def _gt(i):
    return Genotype.from_index(i, 2)


def _instance(seed):
    rng = random.Random(4000 + seed)
    trio = rng.random() < 0.5
    n_ind = 3 if trio else 1
    n_pos = rng.randint(2, 10)
    positions = sorted(rng.sample(range(10, 500), n_pos))
    rs = core.ReadSet()
    for i in range(rng.randint(2, 10)):
        start = rng.randint(0, n_pos - 1)
        length = rng.randint(1, n_pos - start)
        read = core.Read(f"r{i}", 50, 0, rng.randint(0, n_ind - 1))
        added = 0
        for p in range(start, start + length):
            if rng.random() < 0.9:
                read.add_variant(positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
                added += 1
        if added:
            rs.add(read)
    if len(rs) == 0:
        return None
    rs.sort()
    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    names = [f"ind{i}" for i in range(n_ind)]
    for i in range(n_ind):
        ped.add_individual(names[i], [_gt(rng.randint(0, 2)) for _ in range(n_pos)], None)
    if trio:
        ped.add_relationship(names[0], names[1], names[2])
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
    distrust = rng.random() < 0.3
    row_limit = rng.choice([16, 256])
    return rs, recomb, ped, positions, distrust, row_limit


def _solve(rs, recomb, ped, positions, distrust, row_limit, force_python):
    solver = PedMecHeuristic(
        rs,
        recomb,
        ped,
        row_limit,
        distrust_genotypes=distrust,
        positions=positions,
        allow_mutations=True,
        verbosity=0,
    )
    if force_python:
        solver._solve_native = lambda: False
    solver.solve()
    return solver


@pytest.mark.parametrize("seed", range(40))
def test_native_matches_python(seed):
    inst = _instance(seed)
    if inst is None:
        pytest.skip("empty instance")
    native = _solve(*inst, force_python=False)
    python = _solve(*inst, force_python=True)

    assert native.optBipart == [bool(x) for x in python.optBipart]
    assert native.optTrans == python.optTrans
    assert native.optHaps == python.optHaps
    assert [sorted(m) for m in native.mutations] == [sorted(m) for m in python.mutations]
    assert native.get_optimal_partitioning() == python.get_optimal_partitioning()

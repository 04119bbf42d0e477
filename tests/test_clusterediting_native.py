"""
Differential test: the native C++ cluster-editing engine
(native/clusterlib.cpp) must produce exactly the same clusterings as the
Python reference implementation, for both edge-bundling modes.
"""

import random

import pytest

import whatshap_tpu.core as core
from whatshap_tpu.polyphase import clusterediting as ce
from whatshap_tpu.polyphase.solver import AlleleMatrix, ClusterEditingSolver, scoreReadset


def _make(n_pos, n_reads, ploidy, seed, err=0.05):
    random.seed(seed)
    haps = [[random.randint(0, 1) for _ in range(n_pos)] for _ in range(ploidy)]
    rs = core.ReadSet()
    for i in range(n_reads):
        h = haps[i % ploidy]
        start = random.randint(0, n_pos - 20)
        ln = min(random.randint(8, 18), n_pos - start)
        r = core.Read(f"r{i}", 15)
        for p in range(start, start + ln):
            a = h[p] if random.random() > err else 1 - h[p]
            r.add_variant(p * 7, a, 1)
        rs.add(r)
    return AlleleMatrix(rs)


def test_native_matches_python():
    from whatshap_tpu.native import clusterlib

    if clusterlib is None:
        pytest.skip("native clusterlib unavailable")
    for seed in range(6):
        for bundle in (False, True):
            am = _make(60, 60, [2, 3, 4][seed % 3], 100 + seed)
            sim = scoreReadset(am, 2, 3, 0.07)
            nat = ClusterEditingSolver(sim, bundle)._run_native()
            g = ce.StaticSparseGraph(sim)
            sol = ce.InducedCostHeuristic(g, bundle).solve()
            py = [sol.getCluster(i) for i in range(sol.getNumClusters())]
            assert nat == py, (seed, bundle)

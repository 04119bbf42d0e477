"""
Differential test: the native C++ haplotype-threading engine
(native/threadlib.cpp) must produce exactly the same threaded paths as the
Python HaploThreader, including float32 score arithmetic, tie handling,
and the row-limit pruning.
"""

import random
from math import ceil

import pytest

import whatshap_tpu.core as core
from whatshap_tpu.polyphase.haplothreader import HaploThreader
from whatshap_tpu.polyphase.solver import AlleleMatrix, ClusterEditingSolver, scoreReadset
from whatshap_tpu.polyphase.threading import (
    compute_readlength_snp_distance_ratio,
    get_allele_depths,
    select_clusters,
)


def _pipeline_inputs(n_pos, n_reads, ploidy, seed, err=0.06):
    random.seed(seed)
    haps = [[random.randint(0, 1) for _ in range(n_pos)] for _ in range(ploidy)]
    rs = core.ReadSet()
    for i in range(n_reads):
        h = haps[i % ploidy]
        start = random.randint(0, n_pos - 15)
        ln = min(random.randint(8, 16), n_pos - start)
        r = core.Read(f"r{i}", 15)
        for p in range(start, start + ln):
            a = h[p] if random.random() > err else 1 - h[p]
            r.add_variant(p * 11, a, 1)
        rs.add(r)
    am = AlleleMatrix(rs)
    sim = scoreReadset(am, 2, ploidy, 0.07)
    clustering = ClusterEditingSolver(sim, False).run()
    allele_depths, _ = get_allele_depths(am, clustering, ploidy)
    cov_map = select_clusters(allele_depths, ploidy, 10)
    return am, cov_map, allele_depths


def _compare(threader, cov_map, allele_depths):
    native = threader._compute_native([0], cov_map, allele_depths)
    assert native is not None, "native threadlib unavailable"
    py = []
    num_vars = len(cov_map)
    py.extend(threader.computePaths(0, num_vars, cov_map, allele_depths, num_vars))
    assert native == py


def test_native_matches_python():
    from whatshap_tpu.native import threadlib

    if threadlib is None:
        pytest.skip("native threadlib unavailable")
    for seed, ploidy in [(1, 2), (2, 3), (3, 4), (4, 5), (5, 2), (6, 3)]:
        am, cov_map, allele_depths = _pipeline_inputs(50, 50, ploidy, 200 + seed)
        affine = ceil(compute_readlength_snp_distance_ratio(am) / 1.0)
        threader = HaploThreader(ploidy, 4 * affine, affine, 10, 0)
        _compare(threader, cov_map, allele_depths)


def test_native_matches_python_rowlimit():
    # tiny row limit forces the pruning path (stable score sort, original
    # insertion order of survivors)
    from whatshap_tpu.native import threadlib

    if threadlib is None:
        pytest.skip("native threadlib unavailable")
    for seed, ploidy, limit in [(11, 3, 4), (12, 4, 6), (13, 5, 8), (14, 4, 2)]:
        am, cov_map, allele_depths = _pipeline_inputs(40, 44, ploidy, 300 + seed)
        affine = ceil(compute_readlength_snp_distance_ratio(am) / 1.0)
        threader = HaploThreader(ploidy, 4 * affine, affine, 10, limit)
        _compare(threader, cov_map, allele_depths)


def test_run_threading_uses_native(monkeypatch):
    # end-to-end: run_threading through the dispatcher equals the pure-Python
    # path with the native engine disabled
    from whatshap_tpu import native
    from whatshap_tpu.polyphase.threading import run_threading

    if native.threadlib is None:
        pytest.skip("native threadlib unavailable")
    am, cov_map, allele_depths = _pipeline_inputs(45, 48, 4, 777)
    clustering = ClusterEditingSolver(scoreReadset(am, 2, 4, 0.07), False).run()
    genotypes = [{0: 2, 1: 2} for _ in range(am.getNumPositions())]
    paths_a, haps_a = run_threading(am, clustering, 4, [dict(g) for g in genotypes])
    monkeypatch.setattr(native, "threadlib", None)
    paths_b, haps_b = run_threading(am, clustering, 4, [dict(g) for g in genotypes])
    assert paths_a == paths_b
    assert haps_a == haps_b

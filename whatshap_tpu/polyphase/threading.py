"""
Threading stage of the polyploid phaser (behavior parity with
whatshap/polyphase/threading.py): select relevant clusters per position,
thread ploidy-many paths through them with the HaploThreader DP, derive
haplotype alleles from cluster consensus lists, and optionally force the
input genotypes back onto the result.
"""

import itertools
import logging
from collections import defaultdict
from math import ceil, log
from typing import Dict, List, Tuple

from functools import lru_cache

from scipy.stats import binom


@lru_cache(maxsize=65536)
def _binom_pmf(k, n, p):
    # scipy's pmf carries heavy per-call overhead; the value set is tiny
    return float(binom.pmf(k, n, p))

from . import Allele, AlleleDepth, Cluster, ClusterId, Genotype, Haplotype, Threading
from .haplothreader import HaploThreader
from .solver import AlleleMatrix

logger = logging.getLogger(__name__)


def run_threading(
    allele_matrix: AlleleMatrix,
    clustering: List[Cluster],
    ploidy: int,
    genotypes: List[Genotype],
    distrust_genotypes: bool = False,
    max_cluster_gap: int = 10,
    error_rate: float = 0.05,
) -> Tuple[Threading, List[Haplotype]]:
    """
    Thread ploidy-many haplotype paths through the read clusters and derive
    per-position alleles. If distrust_genotypes is False, the computed
    haplotypes are corrected to match the given genotypes with the fewest
    changes.
    """
    num_vars = allele_matrix.getNumPositions()
    allele_depths, cons_lists = get_allele_depths(allele_matrix, clustering, ploidy)
    cov_map = select_clusters(allele_depths, ploidy, max_cluster_gap)

    affine_switch_cost = ceil(compute_readlength_snp_distance_ratio(allele_matrix) / 1.0)
    paths = compute_threading_path(
        cov_map,
        allele_depths,
        ploidy,
        switch_cost=4 * affine_switch_cost,
        affine_switch_cost=affine_switch_cost,
        max_cluster_gap=max_cluster_gap,
    )
    assert len(paths) == num_vars

    haplotypes = compute_haplotypes(paths, cons_lists, ploidy)

    if not distrust_genotypes:
        haplotypes = force_genotypes(
            paths, haplotypes, genotypes, cov_map, allele_depths, error_rate
        )

    return paths, haplotypes


def compute_readlength_snp_distance_ratio(allele_matrix: AlleleMatrix) -> float:
    length = 0
    for read in allele_matrix:
        length += len(read)
    return length / len(allele_matrix)


def compute_threading_path(
    cov_map: List[List[ClusterId]],
    allele_depths: List[Dict[ClusterId, AlleleDepth]],
    ploidy: int,
    switch_cost: float = 32.0,
    affine_switch_cost: float = 8.0,
    max_cluster_gap: int = 10,
) -> Threading:
    """Run the HaploThreader DP; the affine cost is a per-switch-event offset
    that bundles simultaneous switches into one position."""
    logger.debug(f"Computing threading paths with switch cost {switch_cost} ..")
    row_limit = 16 * 2**ploidy if ploidy > 6 else 0
    threader = HaploThreader(ploidy, switch_cost, affine_switch_cost, max_cluster_gap, row_limit)
    return threader.computePathsBlockwise([0], cov_map, allele_depths)


def compute_haplotypes(
    path: Threading, consensus_lists: List[Dict[ClusterId, List[Allele]]], ploidy: int
) -> List[Haplotype]:
    """Assign each threaded haplotype the next consensus allele of its
    cluster (k-th pick for the k-th thread inside the same cluster)."""
    haplotypes: List[Haplotype] = [[] for _ in range(ploidy)]
    for pos in range(len(path)):
        cnts: Dict[ClusterId, int] = defaultdict(int)
        for i in range(ploidy):
            cid = path[pos][i]
            if cid in consensus_lists[pos]:
                allele = consensus_lists[pos][cid][cnts[cid]]
            else:
                allele = -1
            cnts[cid] += 1
            haplotypes[i].append(allele)
    return haplotypes


def force_genotypes(
    path: Threading,
    haplotypes: List[Haplotype],
    genotypes: List[Genotype],
    cov_map: List[List[ClusterId]],
    allele_depths: List[Dict[ClusterId, AlleleDepth]],
    error_rate: float,
) -> List[Haplotype]:
    num_vars = len(path)
    for pos in range(num_vars):
        alleles = {a for a in genotypes[pos]}
        present: Dict[int, int] = defaultdict(int)
        for h in haplotypes:
            present[h[pos]] += 1
            alleles.add(h[pos])

        if -1 in present:
            continue

        abundant_alleles, lacking_alleles = dict(), dict()
        alleles_to_insert, affected_positions = [], []
        for a in alleles:
            if a not in genotypes[pos]:
                genotypes[pos][a] = 0
            diff = present[a] - genotypes[pos][a]
            if diff > 0:
                abundant_alleles[a] = diff
                alleles_to_insert += [a for _ in range(genotypes[pos][a])]
                for p in range(len(path[pos])):
                    if haplotypes[p][pos] == a:
                        affected_positions.append(p)
            elif diff < 0:
                lacking_alleles[a] = -diff
                alleles_to_insert += [a for _ in range(-diff)]

        affected_positions.sort()
        alleles_to_insert.sort()

        if len(abundant_alleles) == 0:
            continue

        # among all permutations of the re-insertable alleles, pick the one
        # that best explains the observed per-cluster allele depths
        clusts = cov_map[pos]
        given_config = [haplotypes[h][pos] for h in range(len(haplotypes))]
        best_config = given_config
        best_likelihood = -float("inf")
        for perm in set(list(itertools.permutations(alleles_to_insert))):
            newconfig = given_config[:]
            for i in range(len(perm)):
                newconfig[affected_positions[i]] = perm[i]

            log_likelihood = 0.0
            for clust in clusts:
                allele_mult = {a: 0.0 for a in alleles}
                clust_mult = 0
                for slot in range(len(path[pos])):
                    if path[pos][slot] == clust:
                        allele_mult[newconfig[slot]] += 1
                        clust_mult += 1
                if clust_mult > 0:
                    total_depth = sum(allele_depths[pos][clust].values())
                    for a in alleles:
                        allele_mult[a] /= clust_mult
                        allele_mult[a] = (
                            allele_mult[a] * (1 - error_rate) + (1 - allele_mult[a]) * error_rate
                        )
                        observed_depth = allele_depths[pos][clust].get(a, 0)
                        prob = _binom_pmf(observed_depth, total_depth, allele_mult[a])
                        log_likelihood += log(prob) if prob > 0 else -float("inf")

            if log_likelihood > best_likelihood:
                best_likelihood = log_likelihood
                best_config = newconfig

        for h in range(len(haplotypes)):
            haplotypes[h][pos] = best_config[h]

    return haplotypes


def select_clusters(
    allele_depths: List[Dict[ClusterId, AlleleDepth]], ploidy: int, max_gap: int
) -> List[List[ClusterId]]:
    """
    Per position: clusters relevant for the threading. A cluster is kept if
    its relative coverage is at least 1/(8*ploidy); between ploidy and
    ploidy+2 clusters are selected, and clusters missing for at most max_gap
    intermediate positions are re-added.
    """
    cov_map: List[List[ClusterId]] = [[] for _ in range(len(allele_depths))]
    for pos in range(len(allele_depths)):
        sorted_cids = sorted(
            ((cid, sum(allele_depths[pos][cid].values())) for cid in allele_depths[pos]),
            key=lambda x: x[1],
            reverse=True,
        )
        total_cov = sum(e[1] for e in sorted_cids)
        cut_off = min(len(sorted_cids), ploidy + 2)
        cov_map[pos].append(sorted_cids[0][0])
        for cid, cov in sorted_cids[1:cut_off]:
            if cov / total_cov < (1.0 / (8.0 * ploidy)) and cov_map[pos]:
                break
            else:
                cov_map[pos].append(cid)

    cut_off = ploidy + 2
    for pos in range(1, len(cov_map) - 1):
        for cid in cov_map[pos - 1]:
            if len(cov_map[pos]) >= cut_off:
                break
            if cid in cov_map[pos]:
                continue
            if any(
                cid in cov_map[pos + k + 1] for k in range(min(max_gap, len(cov_map) - pos - 1))
            ):
                cov_map[pos].append(cid)
                allele_depths[pos][cid] = dict()

    for sub in cov_map:
        sub.sort()

    return cov_map


def get_allele_depths(
    allele_matrix: AlleleMatrix, clustering: List[Cluster], ploidy: int
) -> Tuple[List[Dict[ClusterId, AlleleDepth]], List[Dict[ClusterId, List[Allele]]]]:
    """
    ad[pos][c_id][al] = number of reads of cluster c_id with allele al at
    (local) position pos; cons_lists[pos][c_id] ranks the alleles so that the
    first k entries are the cluster's alleles when picked with multiplicity k.
    """
    num_vars = allele_matrix.getNumPositions()
    ad: List[Dict[ClusterId, AlleleDepth]] = [dict() for _ in range(num_vars)]
    cons_lists: List[Dict[ClusterId, List[Allele]]] = [dict() for _ in range(num_vars)]

    for c_id, cluster in enumerate(clustering):
        for read in cluster:
            for pos, allele in allele_matrix.getRead(read):
                if c_id not in ad[pos]:
                    ad[pos][c_id] = dict()
                if allele not in ad[pos][c_id]:
                    ad[pos][c_id][allele] = 0
                ad[pos][c_id][allele] += 1

    for pos in range(num_vars):
        for c_id in ad[pos]:
            cons_lists[pos][c_id] = []
            cnts: Dict[Allele, int] = defaultdict(int)
            for _ in range(ploidy):
                max_cnt = 0
                max_al = 0
                for al in ad[pos][c_id]:
                    cnt = ad[pos][c_id][al] / (1 + cnts[al])
                    if cnt > max_cnt:
                        max_cnt = cnt
                        max_al = al
                cons_lists[pos][c_id].append(max_al)
                cnts[max_al] += 1

    return ad, cons_lists

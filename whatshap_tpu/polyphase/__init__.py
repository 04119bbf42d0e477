"""
Polyploid phasing pipeline (behavior parity with whatshap/polyphase/__init__.py).

Shared types, block splitting by read connectivity, coverage helpers and the
ILP-solver gate used by the genetic polyphase subcommand.
"""

import logging
from collections import defaultdict
from dataclasses import dataclass
from queue import Queue
from typing import Dict, Iterator, List

from ..core import ReadSet
from .solver import AlleleMatrix

logger = logging.getLogger(__name__)


Position = int
Allele = int
Genotype = Dict[Allele, int]
AlleleDepth = Dict[Allele, int]
Haplotype = List[Allele]
ReadId = int
Cluster = List[ReadId]
Clustering = List[Cluster]
ClusterId = int
Threading = List[List[ClusterId]]


class SolverError(Exception):
    pass


class Interval:
    def __init__(self, start: Position, end: Position):
        self.start = start
        self.end = end
        self.length = end - start


@dataclass
class PolyphaseParameter:
    ploidy: int
    ce_bundle_edges: bool
    distrust_genotypes: bool
    min_overlap: int
    block_cut_sensitivity: int
    plot_clusters: bool
    plot_threading: bool
    plot_path: str
    threads: int
    use_prephasing: bool


@dataclass
class BlockContext:
    block_id: int
    job_id: int
    total_blocks: int
    recursion_level: int


class PhaseBreakpoint:
    def __init__(self, position: int, haplotypes: List[int], confidence: float):
        self.position = position
        self.haplotypes = sorted(haplotypes[:])
        self.confidence = confidence


@dataclass
class PolyphaseBlockResult:
    block_id: int
    clustering: List[List[int]]
    threads: List[List[int]]
    haplotypes: List[List[int]]
    breakpoints: List[PhaseBreakpoint]


@dataclass
class PolyphaseResult:
    clustering: List[List[int]]
    threads: List[List[int]]
    haplotypes: List[int]
    breakpoints: List[PhaseBreakpoint]


def get_coverage(
    allele_matrix: AlleleMatrix, clustering: List[Cluster]
) -> List[Dict[ClusterId, float]]:
    """Per position: cluster id -> relative coverage at that position."""
    num_vars = allele_matrix.getNumPositions()
    coverage = [defaultdict(float) for _ in range(num_vars)]
    coverage_sum = [0] * num_vars
    for c_id, cluster in enumerate(clustering):
        for read in cluster:
            for pos, _allele in allele_matrix.getRead(read):
                coverage[pos][c_id] += 1
                coverage_sum[pos] += 1
    for pos in range(num_vars):
        for c_id in coverage[pos]:
            coverage[pos][c_id] = coverage[pos][c_id] / coverage_sum[pos]
    return coverage


def compute_block_bounds(
    am: AlleleMatrix, ploidy: int, single_linkage: bool = False
) -> Iterator[Interval]:
    """
    Split the variant range into independently phasable intervals based on
    read connectivity between consecutive variants (made transitive via
    cluster merging). With single_linkage (or diploid input) a single
    connecting read suffices; otherwise the threshold is the smallest read
    count giving >=98% chance of covering at least ploidy-1 haplotypes.
    """
    num_vars = am.getNumPositions()
    if num_vars == 0:
        return

    if ploidy == 2 or single_linkage:
        cut_threshold = 1
    else:
        cut_threshold = ploidy * ploidy
        for i in range(ploidy - 1, ploidy * ploidy):
            cut_threshold = i
            if ploidy * pow((ploidy - 2) / ploidy, i) < 0.02:
                cut_threshold = i
                break
    logger.debug(f"Cut position threshold: coverage >= {cut_threshold}")

    link_to_next = [0] * num_vars
    for read in am:
        pos_list = [pos for (pos, _allele) in read]
        for i in range(len(pos_list) - 1):
            if pos_list[i] + 1 == pos_list[i + 1]:
                link_to_next[pos_list[i]] += 1

    pos_clust = [0] * num_vars
    for i in range(1, num_vars):
        if link_to_next[i - 1] >= cut_threshold:
            pos_clust[i] = pos_clust[i - 1]
        else:
            pos_clust[i] = pos_clust[i - 1] + 1
    num_clust = pos_clust[-1] + 1

    link_coverage = [defaultdict(int) for _ in range(num_clust)]
    for read in am:
        covered = {pos_clust[pos] for (pos, _allele) in read}
        for p1 in covered:
            for p2 in covered:
                link_coverage[p1][p2] += 1

    merged_clust = [-1] * num_clust
    new_num_clust = 0
    for i in range(num_clust):
        if merged_clust[i] >= 0:
            continue
        q = Queue()
        q.put(i)
        merged_clust[i] = new_num_clust
        while not q.empty():
            cur = q.get()
            for linked in link_coverage[cur]:
                if merged_clust[linked] < 0 and link_coverage[cur][linked] >= cut_threshold:
                    q.put(linked)
                    merged_clust[linked] = new_num_clust
        new_num_clust += 1

    start = 0
    for i in range(1, num_vars):
        if merged_clust[pos_clust[i]] != merged_clust[pos_clust[i - 1]]:
            yield Interval(start, i)
            start = i
    yield Interval(start, num_vars)


def create_genotype_list(variant_table, sample: str):
    """Per position: allele -> multiplicity in the genotype."""
    genotype_list = []
    for gt in variant_table.genotypes_of(sample):
        allele_count: Dict[int, int] = {}
        for allele in gt.as_vector():
            allele_count[allele] = allele_count.get(allele, 0) + 1
        genotype_list.append(allele_count)
    return genotype_list


def extract_partial_phasing(variant_table, sample: str, ploidy: int):
    readset = ReadSet()
    vars_ = variant_table.variants
    for read in variant_table.phased_blocks_as_reads(
        sample, vars_, 0, 0, target_ploidy=ploidy
    ):
        readset.add(read)
    if len(readset) > 0:
        am = AlleleMatrix(readset)
        assert len(am) % ploidy == 0
        for i in range(0, len(am), ploidy):
            assert all(am.getFirstPos(i) == am.getFirstPos(i + j) for j in range(1, ploidy))
            assert all(am.getLastPos(i) == am.getLastPos(i + j) for j in range(1, ploidy))
        return am
    return None


def get_ilp_solver():
    """Set up a PuLP solver with suppressed output (raises SolverError if
    PuLP or all of its backends are unavailable)."""
    try:
        from pulp import listSolvers, getSolver
    except ImportError:
        raise SolverError("PuLP is not installed; no ILP solver available.")
    solvers = listSolvers(onlyAvailable=True)
    for name in ["GUROBI_CMD", "GUROBI", "COIN_CMD", "PULP_CBC_CMD"]:
        if name in solvers:
            return getSolver(name, msg=0)
    if solvers:
        return getSolver(solvers[0], msg=0)
    raise SolverError("No ILP solver is available for PuLP.")

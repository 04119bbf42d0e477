"""
Polyploid phasing pipeline: shared types, block splitting by read
connectivity, coverage helpers and the ILP-solver gate used by the genetic
polyphase subcommand (counterpart of whatshap/polyphase/__init__.py).
"""

import logging
from collections import Counter, defaultdict
from dataclasses import dataclass
from typing import Dict, Iterator, List

from ..core import ReadSet
from ..graph import ComponentFinder
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
    """Per position: cluster id -> that cluster's share of the reads
    covering the position."""
    num_vars = allele_matrix.getNumPositions()
    hits: List[Dict[int, float]] = [defaultdict(float) for _ in range(num_vars)]
    totals = [0] * num_vars
    for c_id, cluster in enumerate(clustering):
        for read in cluster:
            for pos, _ in allele_matrix.getRead(read):
                hits[pos][c_id] += 1
                totals[pos] += 1
    for pos, bucket in enumerate(hits):
        for c_id in bucket:
            bucket[c_id] /= totals[pos]
    return hits


def _cut_coverage_threshold(ploidy: int) -> int:
    """Smallest read count giving >= 98% chance of touching at least
    ploidy-1 haplotypes; replicates the reference's fallback of
    ploidy^2 - 1 when the loop never converges."""
    threshold = ploidy * ploidy
    for i in range(ploidy - 1, ploidy * ploidy):
        threshold = i
        if ploidy * ((ploidy - 2) / ploidy) ** i < 0.02:
            break
    return threshold


def compute_block_bounds(
    am: AlleleMatrix, ploidy: int, single_linkage: bool = False
) -> Iterator[Interval]:
    """Split the variant range into independently phasable intervals.

    Consecutive variants stay in one interval when enough reads link them
    (transitively, via merging of linked position runs).  A single linking
    read suffices for diploid input or with single_linkage; otherwise the
    coverage threshold from _cut_coverage_threshold applies.
    """
    num_vars = am.getNumPositions()
    if num_vars == 0:
        return

    if ploidy == 2 or single_linkage:
        cut_threshold = 1
    else:
        cut_threshold = _cut_coverage_threshold(ploidy)
    logger.debug(f"Cut position threshold: coverage >= {cut_threshold}")

    # adjacency coverage between consecutive positions
    links = [0] * num_vars
    for read in am:
        positions = [pos for (pos, _) in read]
        for a, b in zip(positions, positions[1:]):
            if a + 1 == b:
                links[a] += 1

    # runs of well-linked consecutive positions
    run_of = [0] * num_vars
    for i in range(1, num_vars):
        run_of[i] = run_of[i - 1] if links[i - 1] >= cut_threshold else run_of[i - 1] + 1
    num_runs = run_of[-1] + 1

    # reads spanning several runs link them; merge transitively when the
    # pairwise read count clears the threshold
    pair_support: List[Dict[int, int]] = [defaultdict(int) for _ in range(num_runs)]
    for read in am:
        touched = {run_of[pos] for (pos, _) in read}
        for r1 in touched:
            for r2 in touched:
                pair_support[r1][r2] += 1

    finder = ComponentFinder(range(num_runs))
    for r1 in range(num_runs):
        for r2, support in pair_support[r1].items():
            if r1 != r2 and support >= cut_threshold:
                finder.merge(r1, r2)

    start = 0
    for i in range(1, num_vars):
        if finder.find(run_of[i]) != finder.find(run_of[i - 1]):
            yield Interval(start, i)
            start = i
    yield Interval(start, num_vars)


def create_genotype_list(variant_table, sample: str):
    """Per position: allele -> multiplicity in that position's genotype."""
    return [
        dict(Counter(gt.as_vector())) for gt in variant_table.genotypes_of(sample)
    ]


def extract_partial_phasing(variant_table, sample: str, ploidy: int):
    """Existing phased blocks of the input VCF as an AlleleMatrix of
    pseudo-reads (ploidy consecutive rows per block), or None."""
    readset = ReadSet()
    for read in variant_table.phased_blocks_as_reads(
        sample, variant_table.variants, 0, 0, target_ploidy=ploidy
    ):
        readset.add(read)
    if len(readset) == 0:
        return None
    am = AlleleMatrix(readset)
    assert len(am) % ploidy == 0
    for i in range(0, len(am), ploidy):
        assert all(am.getFirstPos(i) == am.getFirstPos(i + j) for j in range(1, ploidy))
        assert all(am.getLastPos(i) == am.getLastPos(i + j) for j in range(1, ploidy))
    return am


def get_ilp_solver():
    """A quiet PuLP solver, preferring Gurobi, then CBC; SolverError when
    PuLP or every backend is missing."""
    try:
        from pulp import listSolvers, getSolver
    except ImportError:
        raise SolverError("PuLP is not installed; no ILP solver available.")
    available = listSolvers(onlyAvailable=True)
    for preferred in ("GUROBI_CMD", "GUROBI", "COIN_CMD", "PULP_CBC_CMD"):
        if preferred in available:
            return getSolver(preferred, msg=0)
    if available:
        return getSolver(available[0], msg=0)
    raise SolverError("No ILP solver is available for PuLP.")

"""
Reordering stage of the polyploid phaser (behavior parity with
whatshap/polyphase/reorder.py): detect ambiguous switch breakpoints, solve
collapsed-region sub-instances, pick thread permutations per block (greedy
on linkage likelihoods, or via ILP when a prephasing is given) and assign
breakpoint confidences.
"""

import itertools as it
import logging
from bisect import bisect_right
from collections import defaultdict
from functools import reduce
from math import exp, log
from operator import mul
from typing import Dict, List, Tuple

from . import (
    Cluster,
    ClusterId,
    Haplotype,
    PhaseBreakpoint,
    PolyphaseResult,
    Position,
    Threading,
    get_ilp_solver,
)
from .solver import AlleleMatrix

logger = logging.getLogger(__name__)


ThreadId = int
SubInstance = Tuple[ClusterId, List[ThreadId], AlleleMatrix]
ThreadPermutation = Tuple[int]


def find_subinstances(
    allele_matrix: AlleleMatrix,
    clustering: List[Cluster],
    threads: Threading,
    haplotypes: List[Haplotype],
) -> List[SubInstance]:
    """
    Find cluster regions where at least two threads run through the same
    cluster with differing alleles ("collapsed" regions). Each such region
    becomes a sub-instance (cluster id, affected threads, submatrix of the
    heterozygous positions) to be phased recursively.
    """
    cwise_snps = defaultdict(list)
    last_thread_set = defaultdict(list)
    collapsed = []
    for pos, tup in enumerate(threads):
        clusters = set()
        alleles = defaultdict(set)
        thread_set = defaultdict(list)
        for hid, cid in enumerate(tup):
            clusters.add(cid)
            alleles[cid].add(haplotypes[hid][pos])
            thread_set[cid].append(hid)
        for cid in clusters:
            if len(alleles[cid]) >= 2:
                # thread-set changed: flush the old region, start a new one
                if last_thread_set[cid] != thread_set[cid]:
                    if cwise_snps[cid]:
                        collapsed.append((cid, last_thread_set[cid], cwise_snps[cid]))
                    last_thread_set[cid] = thread_set[cid]
                    cwise_snps[cid] = []
                cwise_snps[cid].append(pos)

    for cid, snps in cwise_snps.items():
        if snps:
            assert len(last_thread_set[cid]) > 0
            collapsed.append((cid, last_thread_set[cid], snps))

    sub_instances = []
    num_vars = len(allele_matrix.getPositions())
    ploidy = len(haplotypes)
    for cid, thread_set, snps in collapsed:
        if len(snps) == num_vars and len(thread_set) == ploidy:
            continue
        subm = allele_matrix.extractSubMatrix(snps, clustering[cid], True)
        assert len(subm.getPositions()) > 0
        if len(subm) > 0:
            sub_instances.append((cid, thread_set, subm))

    return sub_instances


def integrate_sub_results(
    allele_matrix: AlleleMatrix,
    threads: Threading,
    haplotypes: List[Haplotype],
    sub_instances: List[SubInstance],
    sub_results: List[PolyphaseResult],
) -> List[PhaseBreakpoint]:
    """Write sub-instance haplotypes back into the global ones and merge
    global + sub-instance breakpoints (joining duplicates per position)."""
    breakpoints = find_breakpoints(threads)
    for (cid, thread_set, subm), res in zip(sub_instances, sub_results):
        snps = [allele_matrix.globalToLocal(gpos) for gpos in subm.getPositions()]
        assert all(0 <= pos < allele_matrix.getNumPositions() for pos in snps)

        for i, pos in enumerate(snps):
            for j, hap in enumerate(thread_set):
                haplotypes[hap][pos] = res.haplotypes[j][i]

        for bp in res.breakpoints:
            pos = allele_matrix.globalToLocal(subm.localToGlobal(bp.position))
            haps = [thread_set[i] for i in bp.haplotypes]
            breakpoints.append(PhaseBreakpoint(pos, haps, bp.confidence))

    breakpoints.sort(key=lambda x: x.position)
    i = 0
    while i < len(breakpoints):
        j = i + 1
        while j < len(breakpoints) and breakpoints[i].position == breakpoints[j].position:
            j += 1
        if i + 1 == j:
            i += 1
            continue
        haps = sorted(list({h for k in range(i, j) for h in breakpoints[k].haplotypes}))
        conf = reduce(mul, [breakpoints[k].confidence for k in range(i, j)])
        breakpoints[i].haplotypes = haps
        breakpoints[i].confidence = conf
        del breakpoints[i + 1 : j]
        assert i + 1 >= len(breakpoints) or breakpoints[i].position != breakpoints[i + 1]
        i += 1

    return breakpoints


def run_reordering(
    allele_matrix: AlleleMatrix,
    clustering: List[Cluster],
    threads: Threading,
    haplotypes: List[Haplotype],
    breakpoints: List[PhaseBreakpoint],
    prephasing: AlleleMatrix,
    error_rate=0.07,
):
    """Resolve ambiguous thread linkage at every breakpoint using read
    support (and, if given, a prephasing), then permute blocks in place and
    attach confidences to the breakpoints."""
    lllh = compute_link_likelihoods(
        threads, haplotypes, breakpoints, clustering, allele_matrix, error_rate
    )

    if prephasing:
        aff = compute_phase_affiliation(
            allele_matrix, haplotypes, breakpoints, prephasing, error_rate
        )
    else:
        aff = None

    ploidy = len(haplotypes)
    perms = get_optimal_assignments(breakpoints, lllh, ploidy, aff)
    permute_blocks(threads, haplotypes, breakpoints, perms)
    compute_breakpoint_confidence(breakpoints, lllh, perms)


def find_breakpoints(threads: Threading) -> List[PhaseBreakpoint]:
    """Positions where two or more threads switch clusters simultaneously,
    or where a collapsed group splits up — the linkage is ambiguous there."""
    ploidy = len(threads[0])
    breakpoints: List[PhaseBreakpoint] = []

    for i in range(1, len(threads)):
        changed_idx = {j for j in range(ploidy) if threads[i - 1][j] != threads[i][j]}
        affected_clusts = {threads[i - 1][j] for j in changed_idx}
        affected_haps = sorted(j for j in range(ploidy) if threads[i - 1][j] in affected_clusts)

        if len(affected_haps) >= 2:
            breakpoints.append(PhaseBreakpoint(i, affected_haps, 0.0))

    return breakpoints


def compute_link_likelihoods(
    threads: Threading,
    haplotypes: List[Haplotype],
    breakpoints: List[PhaseBreakpoint],
    clustering: List[Cluster],
    allele_matrix: AlleleMatrix,
    error_rate: float,
) -> List[Dict[ThreadPermutation, float]]:
    """
    Per breakpoint: a dict mapping each permutation of the affected threads
    (left side -> right side linkage) to the log likelihood of the local
    reads under that linkage.
    """
    ploidy = len(threads[0])
    lllh = []
    for pos, affected in [(b.position, b.haplotypes) for b in breakpoints]:
        left_pos, right_pos = get_heterozygous_pos_for_haps(haplotypes, affected, pos, 32)
        both_pos = sorted(left_pos + right_pos)

        affected_clusts = {threads[pos][h] for h in affected}
        if pos > 0:
            affected_clusts = affected_clusts.union({threads[pos - 1][h] for h in affected})
        rids = filter(
            lambda r: allele_matrix.getFirstPos(r) < pos <= allele_matrix.getLastPos(r),
            [r for cid in affected_clusts for r in clustering[cid]],
        )
        submatrix = allele_matrix.extractSubMatrix(both_pos, list(rids), True)

        left_llh, right_llh = [], []
        for read in submatrix:
            left_l, right_l = [], []
            for h in range(ploidy):
                l_olp, r_olp, l_err, r_err = 0, 0, 0, 0
                for j, a in read:
                    p = both_pos[j]
                    error = 0 if a == haplotypes[h][p] else 1
                    if p < pos:
                        l_olp += 1
                        l_err += error
                    else:
                        r_olp += 1
                        r_err += error
                llh = log(1 - error_rate) * (l_olp - l_err) + log(error_rate) * l_err
                left_l.append(llh)
                llh = log(1 - error_rate) * (r_olp - r_err) + log(error_rate) * r_err
                right_l.append(llh)
            left_llh.append(left_l)
            right_llh.append(right_l)

        perm_llhs = dict()
        for perm in it.permutations(affected):
            left_h = list(affected)
            right_h = [perm[affected.index(i)] for i in affected]
            perm_llh = 0.0
            for i, read in enumerate(submatrix):
                read_llh = -float("inf")
                for left, right in zip(left_h, right_h):
                    read_llh = max(read_llh, left_llh[i][left] + right_llh[i][right])
                perm_llh += read_llh
            perm_llhs[perm] = perm_llh

        assert max(perm_llhs.values()) > -float("inf")
        lllh.append(perm_llhs)

    assert len(lllh) == len(breakpoints)
    return lllh


def compute_phase_affiliation(
    allele_matrix: AlleleMatrix,
    haplotypes: List[Haplotype],
    breakpoints: List[PhaseBreakpoint],
    prephasing: AlleleMatrix,
    error_rate: float,
) -> List[List[List[float]]]:
    """aff[b][t][p] = log-affinity of the t-th thread in block b to the p-th
    prephased haplotype."""
    ploidy = len(haplotypes)
    genpos = allele_matrix.getPositions()
    genpos_to_happos = {pos: i for i, pos in enumerate(genpos)}
    num_blocks = len(breakpoints) + 1
    block_starts = [b.position for b in breakpoints]
    assert block_starts == sorted(block_starts)

    aff = [[[0 for _ in range(ploidy)] for _ in range(ploidy)] for _ in range(num_blocks)]
    olp = [[[0 for _ in range(ploidy)] for _ in range(ploidy)] for _ in range(num_blocks)]
    err = [[[0 for _ in range(ploidy)] for _ in range(ploidy)] for _ in range(num_blocks)]

    prephasing_pos = prephasing.getPositions()
    phaseblock_starts = sorted(list({prephasing.getFirstPos(i) for i in range(len(prephasing))}))
    phaseblock_starts.append(len(prephasing_pos))
    for phb, (start, end) in enumerate(zip(phaseblock_starts[:-1], phaseblock_starts[1:])):
        for i in range(start, end):
            pos = prephasing_pos[i]
            if pos not in genpos_to_happos:
                continue
            hap_pos = genpos_to_happos[pos]
            block_id = bisect_right(block_starts, hap_pos)
            for thread_id in range(ploidy):
                h_allele = haplotypes[thread_id][hap_pos]
                if h_allele < 0:
                    continue
                for phase_id in range(phb * ploidy, (phb + 1) * ploidy):
                    p_allele = prephasing.getAllele(phase_id, i)
                    if p_allele < 0:
                        continue
                    olp[block_id][thread_id][phase_id % ploidy] += 1
                    err[block_id][thread_id][phase_id % ploidy] += (
                        1 if h_allele != p_allele else 0
                    )

    for b in range(num_blocks):
        for t in range(ploidy):
            for p in range(ploidy):
                logprob = log(1 - error_rate) * (olp[b][t][p] - err[b][t][p])
                logprob += log(error_rate) * err[b][t][p]
                aff[b][t][p] = logprob
    return aff


def get_heterozygous_pos_for_haps(
    haplotypes: List[Haplotype], subset: List[ThreadId], pivot_pos: int, limit: int = 0
) -> Tuple[List[Position], List[Position]]:
    """Positions (left of / right of-including the pivot) where the given
    haplotype subset carries at least two distinct alleles (up to limit per
    side)."""
    left, right = [], []
    j = pivot_pos - 1
    while len(left) < limit and j >= 0:
        if len({haplotypes[h][j] for h in subset}) > 1:
            left.append(j)
        j -= 1
    left = left[::-1]

    j = pivot_pos
    while len(right) < limit and j < len(haplotypes[0]):
        if len({haplotypes[h][j] for h in subset}) > 1:
            right.append(j)
        j += 1
    return left, right


def get_optimal_assignments(
    breakpoints: List[PhaseBreakpoint],
    lllh: List[Dict[ThreadPermutation, float]],
    ploidy: int,
    affiliations: List[List[List[float]]],
) -> List[ThreadPermutation]:
    """Per block: the permutation of threads to apply. Greedy local optima
    without a prephasing; ILP over linkage + affiliation scores with one."""
    P = list(range(ploidy))
    B = list(range(len(breakpoints)))
    BE = list(range(len(breakpoints) + 1))

    if not breakpoints:
        return [list(range(ploidy))]

    if not affiliations:
        assignments = [[i for i in P] for _ in BE]
        for b in B:
            for i in P:
                assignments[b + 1][i] = assignments[b][i]
            perm = max(lllh[b], key=lllh[b].get)
            affected = sorted(perm)
            for left, right in zip(affected, perm):
                assignments[b + 1][assignments[b].index(left)] = right
        return assignments

    try:
        from pulp import LpInteger, LpMaximize, LpProblem, LpVariable
    except ImportError:
        # The ILP decomposes along the block chain: per block an assignment
        # permutation (aff score), per breakpoint a linkage permutation of the
        # affected threads (lllh score). Solve exactly by DP over blocks.
        return _optimal_assignments_chain_dp(breakpoints, lllh, ploidy, affiliations)

    model = LpProblem(f"PermuteBlocks_p{ploidy}_b{len(breakpoints)}", LpMaximize)

    # x[b][t][h] = 1 iff thread t sits on haplotype h in block b
    x = [[[LpVariable(f"x_{b}_{t}_{h}", 0, 1, LpInteger) for h in P] for t in P] for b in BE]
    # y[b][t1][t2] = 1 iff thread t1 links to thread t2 over breakpoint b
    y = [[[LpVariable(f"y_{b}_{t1}_{t2}", 0, 1, LpInteger) for t2 in P] for t1 in P] for b in B]
    # z[b][i] = 1 iff the i-th permutation connects the haplotypes at b
    z = [[LpVariable(f"z_{b}_{i}", 0, 1, LpInteger) for i in range(len(lllh[b]))] for b in B]

    aff_scores = []
    if affiliations is None:
        for t in P:
            model += x[0][t][t] == 1
    else:
        for b in BE:
            for t in P:
                for h in P:
                    aff_scores.append(x[b][t][h] * affiliations[b][h][t])

    for i in BE:
        for j in P:
            model += sum([x[i][j][k] for k in P]) == 1
            model += sum([x[i][k][j] for k in P]) == 1

    for b, affected in enumerate([b.haplotypes for b in breakpoints]):
        for t1 in P:
            for t2 in P:
                if (t1 in affected) != (t2 in affected):
                    model += y[b][t1][t2] == 0
                elif t1 not in affected:
                    if t1 == t2:
                        model += y[b][t1][t2] == 1
                    else:
                        model += y[b][t1][t2] == 0
                for h in P:
                    model += x[b][h][t1] + x[b + 1][h][t2] - 1 <= y[b][t1][t2]
            model += sum([y[b][t1][t2] for t2 in P]) == 1
            model += sum([y[b][t2][t1] for t2 in P]) == 1

    z_weights = dict()
    for b, left in enumerate([b.haplotypes for b in breakpoints]):
        assert left == sorted(left)
        for i, right in enumerate(lllh[b].keys()):
            z_weights[z[b][i]] = lllh[b][right]
            assert set(left) == set(right)
            model += z[b][i] >= sum(y[b][l][r] for l, r in zip(left, right)) - len(left) + 1
            for l, r in zip(left, right):
                model += z[b][i] <= y[b][l][r]
        model += sum(z[b]) == 1

    model += sum([var * weight for (var, weight) in z_weights.items()]) + sum(aff_scores)

    solver = get_ilp_solver()
    model.solve(solver)

    assignments = [[0 for _ in P] for _ in BE]
    for b in BE:
        for t in P:
            for h in P:
                if x[b][t][h].varValue > 0.999:
                    assignments[b][t] = h
                    break
            else:
                assert False

    return assignments


def _optimal_assignments_chain_dp(
    breakpoints: List[PhaseBreakpoint],
    lllh: List[Dict[ThreadPermutation, float]],
    ploidy: int,
    affiliations: List[List[List[float]]],
) -> List[ThreadPermutation]:
    """
    Exact maximizer of the same objective the reference encodes as an ILP
    (reorder.py get_optimal_assignments): per block b an assignment m_b
    (x[b][i][j] = 1 iff m_b[i] = j) contributing sum_i aff[b][m_b[i]][i],
    plus per breakpoint b the linkage likelihood lllh[b][perm] of the
    permutation of affected threads induced between m_b and m_{b+1}
    (t -> m_{b+1}[m_b^{-1}(t)]), with unaffected threads forced to link to
    themselves. The chain structure makes this a plain DP over blocks with
    ploidy! states.
    """
    states = [list(p) for p in it.permutations(range(ploidy))]
    num_blocks = len(breakpoints) + 1

    def aff_score(b: int, m: List[int]) -> float:
        return sum(affiliations[b][m[i]][i] for i in range(ploidy))

    neg_inf = -float("inf")
    dp = [{tuple(m): aff_score(0, m) for m in states}]
    back: List[Dict[tuple, tuple]] = []
    for b, bp in enumerate(breakpoints):
        affected = bp.haplotypes
        affected_set = set(affected)
        cur: Dict[tuple, float] = {}
        choice: Dict[tuple, tuple] = {}
        for m2 in states:
            t2 = tuple(m2)
            base = aff_score(b + 1, m2)
            best = neg_inf
            best_prev = None
            for t1, prev_score in dp[b].items():
                if prev_score == neg_inf:
                    continue
                # induced linkage: thread m1[h] links to thread m2[h]
                inv = {}
                valid = True
                link = {}
                for h in range(ploidy):
                    l, r = t1[h], m2[h]
                    if (l in affected_set) != (r in affected_set):
                        valid = False
                        break
                    if l not in affected_set and l != r:
                        valid = False
                        break
                    link[l] = r
                if not valid:
                    continue
                perm = tuple(link[l] for l in affected)
                score = prev_score + lllh[b].get(perm, neg_inf) + base
                if score > best:
                    best = score
                    best_prev = t1
            cur[t2] = best
            choice[t2] = best_prev
        dp.append(cur)
        back.append(choice)

    # backtrack from the best final state
    final = max(dp[-1], key=dp[-1].get)
    chain = [final]
    for b in range(len(breakpoints) - 1, -1, -1):
        chain.append(back[b][chain[-1]])
    chain.reverse()
    return [list(m) for m in chain]


def permute_blocks(
    threads: Threading,
    haplotypes: List[Haplotype],
    breakpoints: List[PhaseBreakpoint],
    perms: List[ThreadPermutation],
):
    ploidy = len(haplotypes)
    ext_bp = [0] + [b.position for b in breakpoints] + [len(threads)]
    for i, (s, e) in enumerate(zip(ext_bp[:-1], ext_bp[1:])):
        for p in range(s, e):
            threads[p] = [threads[p][perms[i][t]] for t in range(ploidy)]
            hap_copy = [haplotypes[t][p] for t in range(ploidy)]
            for t in range(ploidy):
                haplotypes[t][p] = hap_copy[perms[i][t]]


def compute_breakpoint_confidence(
    breakpoints: List[PhaseBreakpoint],
    lllh: List[Dict[ThreadPermutation, float]],
    perms: List[ThreadPermutation],
):
    for i, bp in enumerate(breakpoints):
        affected = bp.haplotypes
        assert len(lllh[i].values()) >= 2
        best = max(lllh[i].values())
        reduced = [j for j in perms[i + 1] if j in affected]
        link = tuple(affected[reduced.index(j)] for j in perms[i] if j in affected)
        bp.confidence = exp(lllh[i][link] - best) / sum([exp(v - best) for v in lllh[i].values()])

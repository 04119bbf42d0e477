"""
Assign marker-allele clusters to haplotypes for genetic polyploid phasing
(behavior parity with whatshap/polyphase/clusterarrangement.py).

The problem is weighted interval scheduling on `ploidy` machines: each
non-singleton cluster spans an interval of variants (plus padding), at most
one cluster may occupy a haplotype at any position, and the total number of
covered variants is maximized. The reference solves an ILP via PuLP; when
PuLP is unavailable we solve the same optimum exactly with a min-cost flow
over the position chain (the LP relaxation of this interval model is
integral), then color the selected intervals onto haplotypes greedily.
"""

import logging

from . import get_ilp_solver

logger = logging.getLogger(__name__)


def arrange_clusters(clustering, padding, ploidy):
    # filter out singleton clusters
    filtered_to_real = []
    fclustering = []
    for i, clust in enumerate(clustering):
        if len(clust) > 1:
            filtered_to_real.append(i)
            fclustering.append(clust)

    # interval (with padding) and worth (#covered variants) per cluster
    c_start = []
    c_end = []
    c_worth = []
    for clust in fclustering:
        variants = [v for v in clust]
        c_worth.append(len(variants))
        c_start.append(max(0, min(variants) - padding))
        c_end.append(max(variants) + padding)

    n = max(c_end)
    c = len(fclustering)

    try:
        from pulp import LpInteger, LpMaximize, LpProblem, LpVariable, value
    except ImportError:
        return _arrange_clusters_flow(
            clustering, filtered_to_real, c_start, c_end, c_worth, n, c, ploidy
        )

    model = LpProblem("Cluster_Arrangement_c{}_n{}_p{}".format(c, n, ploidy), LpMaximize)

    # x[i][j] = 1 iff cluster j is put on haplotype i
    x = [
        [LpVariable("x_{}_{}".format(i, j), 0, 1, LpInteger) for j in range(c)]
        for i in range(ploidy)
    ]

    model += sum([c_worth[j] * x[i][j] for j in range(c) for i in range(ploidy)])

    for j in range(c):
        model += sum([x[i][j] for i in range(ploidy)]) <= 1

    old_covered = []
    for pos in range(n):
        covered = sorted([i for i in range(c) if c_start[i] <= pos <= c_end[i]])
        if covered != old_covered:
            for i in range(ploidy):
                model += sum([x[i][j] for j in covered]) <= 1
            old_covered = covered

    solver = get_ilp_solver()
    model.solve(solver)

    selected = []

    objVal = value(model.objective)
    logger.info(
        "Arranged %i variants out of a total of %i",
        int(objVal),
        sum([len(clust) for clust in clustering]),
    )

    for i in range(ploidy):
        selected.append([filtered_to_real[j] for j in range(c) if x[i][j].varValue > 0.999])
        logger.info("   h%i: %s", i, selected[-1])

    return selected


def _arrange_clusters_flow(
    clustering, filtered_to_real, c_start, c_end, c_worth, n, c, ploidy
):
    """Exact replacement for the arrangement ILP: min-cost flow of `ploidy`
    units along the position chain, each cluster an arc of capacity 1 with
    profit c_worth; selected (non-overlapping per unit of flow) intervals
    are then greedily colored onto haplotypes."""
    import networkx as nx

    # compress positions to interval endpoints to keep the graph small
    points = sorted({0, n + 1} | set(c_start) | {e + 1 for e in c_end})

    G = nx.DiGraph()
    for a, b in zip(points[:-1], points[1:]):
        G.add_edge(("p", a), ("p", b), capacity=ploidy, weight=0)
    for j in range(c):
        # occupancy interval is [c_start, c_end] inclusive -> exits at end+1;
        # an intermediate node per cluster keeps parallel intervals distinct
        G.add_edge(("p", c_start[j]), ("c", j), capacity=1, weight=-c_worth[j])
        G.add_edge(("c", j), ("p", c_end[j] + 1), capacity=1, weight=0)

    flow = nx.max_flow_min_cost(G, ("p", points[0]), ("p", points[-1]))

    chosen = [j for j in range(c) if flow.get(("p", c_start[j]), {}).get(("c", j), 0) >= 1]

    # greedy interval coloring onto ploidy haplotypes
    selected = [[] for _ in range(ploidy)]
    hap_free_at = [0] * ploidy
    total_worth = 0
    for j in sorted(chosen, key=lambda j: c_start[j]):
        for i in range(ploidy):
            if hap_free_at[i] <= c_start[j]:
                selected[i].append(filtered_to_real[j])
                hap_free_at[i] = c_end[j] + 1
                total_worth += c_worth[j]
                break

    logger.info(
        "Arranged %i variants out of a total of %i",
        total_worth,
        sum([len(clust) for clust in clustering]),
    )
    for i in range(ploidy):
        logger.info("   h%i: %s", i, selected[i])
    return selected

"""
Debug/development visualizations for `polyphase` and `polyphasegenetic`
(functional counterpart of whatshap/polyphase/plots.py; matplotlib is
imported lazily inside the plotting functions so it never becomes a hard
dependency).

The plots are diagnostic aids, not data products: this module renders the
same information (read clustering as colored segments over variant space,
haplotype threading over cluster coverage) in a compact form.
"""

import logging
from collections import defaultdict

from . import get_coverage
from .solver import AlleleMatrix

logger = logging.getLogger(__name__)


def draw_plots(
    readset,
    result,
    cut_positions,
    phasable_variant_table,
    plot_clusters,
    plot_threading,
    output,
):
    logger.info("Generating plots ...")
    if plot_clusters:
        draw_clustering(
            readset,
            result.clustering,
            phasable_variant_table,
            output + ".clusters.pdf",
            genome_space=False,
        )
    if plot_threading:
        allele_matrix = AlleleMatrix(readset)
        coverage = get_coverage(allele_matrix, result.clustering)
        del allele_matrix
        draw_threading(
            readset,
            result.clustering,
            coverage,
            result.threads,
            cut_positions,
            result.haplotypes,
            phasable_variant_table,
            output + ".threading.pdf",
        )


def avg_readlength(readset):
    """Average read length in base pairs."""
    if len(readset) > 0:
        return sum(read[-1].position - read[0].position for read in readset) / len(readset)
    return 0


def draw_clustering(readset, clustering, var_table, path, genome_space=False):
    """One horizontal segment per read, colored by cluster, x = variant index
    (or genome position with genome_space)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    pos_index = {pos: i for i, pos in enumerate(readset.get_positions())}
    num_reads = sum(len(c) for c in clustering)
    with PdfPages(path) as pdf:
        fig = plt.figure(figsize=(16, max(4, num_reads / 40)), dpi=100)
        y = 0
        cmap = plt.get_cmap("tab20")
        for cid, cluster in enumerate(clustering):
            color = cmap(cid % 20)
            for rid in sorted(cluster, key=lambda r: readset[r][0].position):
                read = readset[rid]
                if genome_space:
                    x0, x1 = read[0].position, read[-1].position
                else:
                    x0 = pos_index[read[0].position]
                    x1 = pos_index[read[-1].position]
                plt.hlines(y, x0, x1, colors=[color], linewidth=1)
                y += 1
        plt.xlabel("genome position" if genome_space else "variant index")
        plt.ylabel("reads (grouped by cluster)")
        plt.title("Read clustering")
        pdf.savefig(fig)
        plt.close(fig)
    logger.info(f"Wrote clustering plot to {path}")


def draw_threading(
    readset, clustering, coverage, paths, cut_positions, haplotypes, var_table, path
):
    """Cluster coverage as background band heights, threaded haplotype paths
    as lines through the clusters, cut positions as vertical markers."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    assert len(paths) > 0
    ploidy = len(paths[0])
    num_vars = len(paths)

    with PdfPages(path) as pdf:
        fig = plt.figure(figsize=(16, 8), dpi=100)
        cmap = plt.get_cmap("tab10")
        # background: relative coverage of each cluster per position
        present = sorted({cid for pos in range(num_vars) for cid in coverage[pos]})
        cluster_y = {cid: i for i, cid in enumerate(present)}
        for pos in range(num_vars):
            for cid, cov in coverage[pos].items():
                plt.vlines(
                    pos,
                    cluster_y[cid] - cov / 2,
                    cluster_y[cid] + cov / 2,
                    colors="lightgray",
                )
        # threads
        for h in range(ploidy):
            ys = [cluster_y.get(paths[pos][h], -1) + (h - ploidy / 2) * 0.08 for pos in range(num_vars)]
            plt.plot(range(num_vars), ys, color=cmap(h % 10), linewidth=1.2, label=f"hap {h}")
        for cut in cut_positions:
            plt.axvline(cut, color="red", linestyle="--", linewidth=0.8)
        plt.xlabel("variant index")
        plt.ylabel("cluster")
        plt.title("Haplotype threading")
        plt.legend(loc="upper right", fontsize="small")
        pdf.savefig(fig)
        plt.close(fig)
    logger.info(f"Wrote threading plot to {path}")


def draw_genetic_clustering(clustering, num_vars, path):
    """Variant-cluster membership matrix for the genetic polyphase."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    with PdfPages(path) as pdf:
        fig = plt.figure(figsize=(16, max(4, len(clustering) / 8)), dpi=100)
        for cid, cluster in enumerate(clustering):
            plt.scatter(list(cluster), [cid] * len(cluster), s=2)
        plt.xlabel("variant index")
        plt.ylabel("cluster id")
        plt.title("Genetic variant clustering")
        pdf.savefig(fig)
        plt.close(fig)


def draw_genetic_clustering_arrangement(clustering, arrangement, num_vars, path):
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    with PdfPages(path) as pdf:
        fig = plt.figure(figsize=(16, max(4, len(arrangement))), dpi=100)
        for hap, clusters in enumerate(arrangement):
            for cid in clusters:
                plt.scatter(list(clustering[cid]), [hap] * len(clustering[cid]), s=2)
        plt.xlabel("variant index")
        plt.ylabel("haplotype")
        plt.title("Cluster arrangement")
        pdf.savefig(fig)
        plt.close(fig)


def create_genetic_plots(
    output,
    chromosome,
    sample,
    ground_truth_reader,
    varinfo,
    clustering,
    haplo_skeletons,
    haplotypes,
    phased_positions,
    parent_coverage,
    co_parent_coverage,
    progeny_coverage,
    param,
):
    """Cluster + arrangement diagnostics for `polyphasegenetic --plot`
    (signature matches the reference's cli/polyphasegenetic.py call site)."""
    base = output if isinstance(output, str) else getattr(output, "name", "polyphasegenetic")
    prefix = f"{base}.{chromosome}.{sample}"
    num_vars = len(varinfo)
    node_vars = [[varinfo.node_to_variant(n) for n in clust] for clust in clustering]
    draw_genetic_clustering(node_vars, num_vars, prefix + ".clusters.pdf")
    if haplo_skeletons:
        draw_genetic_clustering_arrangement(
            node_vars, haplo_skeletons, num_vars, prefix + ".arrangement.pdf"
        )

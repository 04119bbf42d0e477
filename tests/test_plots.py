"""
Smoke + unit tests for the polyphase diagnostic plots
(whatshap_tpu/polyphase/plots.py; functional counterpart of
whatshap/polyphase/plots.py).
"""

import random

import pytest

matplotlib = pytest.importorskip("matplotlib")

import whatshap_tpu.core as core
from whatshap_tpu.polyphase.plots import (
    create_histogram,
    diff_ratio,
    draw_clustering,
    draw_phase_comparison,
    haplodist,
    parse_haplotype,
    plot_haplotype_dissimilarity,
    relative_hamming_dist,
)
from whatshap_tpu.vcf import BiallelicVcfVariant, VariantCallPhase


def test_parse_haplotype():
    assert parse_haplotype("read17_HG00514_HAP1") == 0
    assert parse_haplotype("read17_HG00514_HAP2") == 1
    assert parse_haplotype("x_NA19240_HAP1") == 2
    assert parse_haplotype("x_NA19240_HAP2") == 3
    assert parse_haplotype("a_b_HG00733_HAP1") == 4
    assert parse_haplotype("a_b_HG00733_HAP2") == 5
    assert parse_haplotype("plain_read") == -1
    assert parse_haplotype("HG00514") == -1
    assert parse_haplotype("x_OTHER_HAP1") == -1


def test_relative_hamming_dist():
    assert relative_hamming_dist([0, 1, 0], [0, 1, 0]) == 0
    assert relative_hamming_dist([0, 1], [1, 1]) == 0.5
    assert relative_hamming_dist([0], [0, 1]) == -1


def test_haplodist_windows():
    h1 = [0, 0, 1, 1]
    h2 = [0, 1, 1, 0]
    intervals = [(0, 1), (0, 2), (1, 3), (3, 3)]
    out = haplodist(h1, h2, intervals)
    assert out == [0.5, 1 / 3, 2 / 3, 1.0]
    assert haplodist([0], [0, 1], intervals) == -1


def test_diff_ratio():
    assert diff_ratio(0.5) == 2.0
    assert diff_ratio(2.0) == 2.0
    assert diff_ratio(0.0) == 0.0
    assert diff_ratio(None) is None


def test_create_histogram(tmp_path):
    out = tmp_path / "hist.pdf"
    create_histogram(str(out), [1, 2, 2, 3], [4, 5], 10, [0, 6], "x", "t")
    assert out.stat().st_size > 0


def _readset(n_reads=6, n_pos=8, seed=1):
    rng = random.Random(seed)
    positions = [100 * (i + 1) for i in range(n_pos)]
    rs = core.ReadSet()
    for i in range(n_reads):
        a = rng.randint(0, n_pos - 2)
        b = rng.randint(a + 2, n_pos)
        read = core.Read(f"r{i}", 50, 0, 0)
        for p in range(a, b):
            read.add_variant(positions[p], rng.randint(0, 1), 30)
        rs.add(read)
    rs.sort()
    return rs, positions


class _FakeTable:
    """Just enough of VariantTable for get_phase(): positions -> phases."""

    def __init__(self, positions, phase_by_pos):
        self.variants = [BiallelicVcfVariant(p, "A", "G") for p in positions]
        self._phase_by_pos = phase_by_pos

    @property
    def phases(self):
        return [
            [
                VariantCallPhase(0, self._phase_by_pos[v.position], None)
                for v in self.variants
            ]
        ]

    def subset_rows_by_position(self, positions):
        keep = set(positions)
        self.variants = [v for v in self.variants if v.position in keep]


def test_draw_clustering_smoke(tmp_path):
    rs, _ = _readset()
    clustering = [[0, 2, 4], [1, 3, 5]]
    out = tmp_path / "clusters.pdf"
    draw_clustering(rs, clustering, None, str(out))
    assert out.stat().st_size > 0


def test_plot_haplotype_dissimilarity_smoke(tmp_path):
    import matplotlib.pyplot as plt

    matplotlib.use("agg")
    rs, positions = _readset()
    rng = random.Random(3)
    table = _FakeTable(
        positions, {p: (rng.randint(0, 1), rng.randint(0, 1)) for p in positions}
    )
    fig = plt.figure()
    plot_haplotype_dissimilarity(
        {}, 0, 5, {p: i for i, p in enumerate(positions)}, positions, rs, table
    )
    out = tmp_path / "dissim.pdf"
    fig.savefig(str(out))
    plt.close(fig)
    assert out.stat().st_size > 0


def test_draw_phase_comparison(tmp_path):
    rng = random.Random(7)
    ploidy, n = 4, 12
    positions = [10 * (i + 1) for i in range(n)]
    truth = [[rng.randint(0, 1) for _ in range(n)] for _ in range(ploidy)]
    # predicted: permuted truth with one switch and one flip
    haplotypes = [truth[(h + 1) % ploidy][:] for h in range(ploidy)]
    haplotypes[0][5] = 1 - haplotypes[0][5]
    table = _FakeTable(
        positions, {p: tuple(truth[h][i] for h in range(ploidy)) for i, p in enumerate(positions)}
    )
    cov = [10] * n
    out = tmp_path / "comparison.pdf"
    draw_phase_comparison(haplotypes, positions, cov, [5] * n, [20] * n, table, str(out))
    assert out.stat().st_size > 0

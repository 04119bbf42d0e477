"""
Bit-exact parity fuzzing against the compiled reference C++ core.

These tests build the reference's PedigreeDPTable out-of-tree (tools/oracle)
and compare cost, optimal partition, transmission vector, haplotypes and
per-variant qualities on random instances.  Skipped when the reference
checkout / compiler are unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import oracle  # noqa: E402

from whatshap_tpu.core import (  # noqa: E402
    NumericSampleIds,
    PedigreeDPTable,
    Pedigree,
    PhredGenotypeLikelihoods,
    Read,
    ReadSet,
)
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt  # noqa: E402

pytestmark = pytest.mark.skipif(
    not oracle.oracle_available(), reason="reference oracle unavailable"
)


def random_instance(rng, n_reads, n_pos, max_q=30, n_ind=1, trios=(), het_only=True):
    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = ReadSet()
    for i in range(n_reads):
        sample = int(rng.randint(0, n_ind))
        start = int(rng.randint(0, n_pos - 1))
        end = int(rng.randint(start + 1, n_pos))
        read = Read(f"R{i}", 50, 0, sample)
        for c in range(start, end + 1):
            if rng.rand() < 0.2 and c not in (start, end):
                continue  # hole (BLANK at that column)
            read.add_variant(positions[c], int(rng.randint(0, 2)), int(rng.randint(1, max_q)))
        if len(read) < 2:
            read.add_variant(positions[min(end + 1, n_pos - 1)] if read._positions[-1] != positions[min(end + 1, n_pos - 1)] else positions[0], int(rng.randint(0, 2)), 1)
        rs.add(read)
    genotypes = [[1] * n_pos for _ in range(n_ind)] if het_only else [
        [int(rng.randint(0, 3)) for _ in range(n_pos)] for _ in range(n_ind)
    ]
    recomb = [int(rng.randint(1, 10)) for _ in range(n_pos)]
    return rs, positions, genotypes, recomb


def run_mine(rs, positions, genotypes, recomb, trios=(), distrust=False, gls=None):
    ped = Pedigree(NumericSampleIds())
    n_ind = len(genotypes)
    for ind in range(n_ind):
        ped.add_individual(
            f"ind{ind}",
            [canonic_index_to_biallelic_gt(g) for g in genotypes[ind]],
            [PhredGenotypeLikelihoods(g) for g in gls[ind]] if distrust else None,
        )
    for f, m, c in trios:
        ped.add_relationship(f"ind{f}", f"ind{m}", f"ind{c}")
    rs_sorted = ReadSet()
    for r in rs:
        rs_sorted.add(r)
    rs_sorted.sort()
    dp = PedigreeDPTable(rs_sorted, recomb, ped, distrust, positions)
    superreads, tv = dp.get_super_reads()
    return {
        "cost": dp.get_optimal_cost(),
        "partition": dp.get_optimal_partitioning(),
        "readorder": [r.name for r in rs_sorted],
        "transmission": tv,
        "haplotypes": {
            (k, h): "".join(str(v.allele) for v in superreads[k][h])
            for k in range(n_ind)
            for h in range(2)
        },
        "qualities": {
            (k, h): [v.quality for v in superreads[k][h]]
            for k in range(n_ind)
            for h in range(2)
        },
    }


def compare(rs, positions, genotypes, recomb, trios=(), distrust=False, gls=None):
    text = oracle.serialize_problem(
        rs, positions, genotypes, recomb, trios, distrust, gls
    )
    ref = oracle.run_oracle(text)
    mine = run_mine(rs, positions, genotypes, recomb, trios, distrust, gls)
    assert mine["cost"] == ref["cost"]
    # read order must match (validates the libstdc++ hash replica)
    assert [n.replace(" ", "_") for n in mine["readorder"]] == ref["readorder"]
    assert mine["partition"] == ref["partition"], (mine["partition"], ref["partition"])
    assert mine["transmission"] == ref["transmission"]
    for key in mine["haplotypes"]:
        assert mine["haplotypes"][key] == ref["haplotypes"][key], (
            key,
            mine["haplotypes"][key],
            ref["haplotypes"][key],
        )
        assert mine["qualities"][key] == ref["qualities"][key]


def test_parity_single_sample_random():
    rng = np.random.RandomState(1)
    for trial in range(30):
        n_reads = int(rng.randint(2, 9))
        n_pos = int(rng.randint(2, 12))
        rs, positions, genotypes, recomb = random_instance(rng, n_reads, n_pos)
        compare(rs, positions, genotypes, recomb)


def test_parity_single_sample_ties():
    # all-equal weights maximize ties; exercises Gray-order tie-breaking
    rng = np.random.RandomState(2)
    for trial in range(30):
        n_reads = int(rng.randint(2, 8))
        n_pos = int(rng.randint(2, 10))
        rs, positions, genotypes, recomb = random_instance(rng, n_reads, n_pos, max_q=2)
        compare(rs, positions, genotypes, recomb)


def test_parity_trio_random():
    rng = np.random.RandomState(3)
    for trial in range(20):
        n_reads = int(rng.randint(3, 9))
        n_pos = int(rng.randint(2, 8))
        rs, positions, genotypes, recomb = random_instance(
            rng, n_reads, n_pos, n_ind=3, het_only=True
        )
        compare(rs, positions, genotypes, recomb, trios=[(0, 1, 2)])


def test_parity_distrust_genotypes():
    rng = np.random.RandomState(4)
    for trial in range(20):
        n_reads = int(rng.randint(2, 8))
        n_pos = int(rng.randint(2, 8))
        rs, positions, genotypes, recomb = random_instance(rng, n_reads, n_pos)
        gls = [
            [[int(rng.randint(0, 20)) for _ in range(3)] for _ in range(n_pos)]
        ]
        compare(rs, positions, genotypes, recomb, distrust=True, gls=gls)

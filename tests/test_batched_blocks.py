"""
The production batched route (run_dp_batched: block split -> bucket ->
batched device solve -> stitch) must reproduce the monolithic solve
bit-for-bit on every output: cost, per-read partitioning, superread
alleles/qualities.
"""

import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core import NumericSampleIds, Pedigree, PedigreeDPTable
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.ops import wmec


def _gt(i):
    return Genotype.from_index(i, 2)


def _multi_block_readset(seed, n_blocks=5, cols_per_block=8, reads_per_block=6):
    rng = random.Random(seed)
    rs = core.ReadSet()
    positions = []
    base = 100
    rid = 0
    for b in range(n_blocks):
        block_positions = [base + 10 * i for i in range(cols_per_block)]
        positions.extend(block_positions)
        for _ in range(reads_per_block):
            start = rng.randrange(0, cols_per_block - 1)
            length = rng.randint(2, cols_per_block - start)
            read = core.Read(f"r{rid}", 50, 0, 0)
            rid += 1
            for c in range(start, start + length):
                read.add_variant(block_positions[c], rng.randint(0, 1), rng.choice([5, 12, 28]))
            rs.add(read)
        base += 10 * cols_per_block + 5000  # gap: no read spans blocks
    rs.sort()
    return rs, positions


def _pack(rs, positions):
    nsi = NumericSampleIds()
    ped = Pedigree(nsi)
    ped.add_individual("s0", [_gt(1)] * len(positions), None)
    recomb = [2] * len(positions)
    return wmec.pack_problem(rs, recomb, ped, False, positions)


@pytest.mark.parametrize("seed", range(6))
def test_batched_equals_monolithic(seed):
    rs, all_positions = _multi_block_readset(seed)
    positions = sorted(rs.get_positions())
    packed = _pack(rs, positions)

    ranges = wmec.connected_column_ranges(packed)
    assert len(ranges) > 1, "fixture must decompose into multiple blocks"

    mono = wmec.run_dp(packed, backend="numpy")
    batched = wmec.run_dp_batched(packed)
    assert batched is not None

    assert batched.optimal_cost == mono.optimal_cost
    assert wmec.extract_partitioning(packed, batched) == wmec.extract_partitioning(packed, mono)

    nsi = NumericSampleIds()
    ped = Pedigree(nsi)
    ped.add_individual("s0", [_gt(1)] * len(positions), None)
    a0m, a1m, qm = wmec.extract_alleles(packed, mono, ped)
    a0b, a1b, qb = wmec.extract_alleles(packed, batched, ped)
    np.testing.assert_array_equal(a0m, a0b)
    np.testing.assert_array_equal(a1m, a1b)
    np.testing.assert_array_equal(qm, qb)


def test_backend_env_override(monkeypatch):
    rs, _ = _multi_block_readset(99)
    positions = sorted(rs.get_positions())
    packed = _pack(rs, positions)
    mono = wmec.run_dp(packed, backend="numpy")

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")
    forced = wmec.run_dp(packed, backend="auto")
    assert forced.optimal_cost == mono.optimal_cost
    assert wmec.extract_partitioning(packed, forced) == wmec.extract_partitioning(packed, mono)


def test_cli_phase_under_forced_backends(tmp_path, monkeypatch):
    """The phase CLI must produce identical VCF output whichever backend
    solves the DP."""
    from whatshap_tpu.cli.phase import run_whatshap

    outputs = {}
    for name in ("numpy", "jax", "batched"):
        monkeypatch.setenv("WHATSHAP_TPU_BACKEND", name)
        out = tmp_path / f"phased_{name}.vcf"
        run_whatshap(
            phase_input_files=["tests/data/pacbio/pacbio.bam"],
            variant_file="tests/data/pacbio/variants.vcf",
            reference="tests/data/pacbio/reference.fasta",
            output=str(out),
            write_command_line_header=False,
        )
        outputs[name] = [
            line for line in out.read_text().splitlines() if not line.startswith("##")
        ]
    assert outputs["numpy"] == outputs["jax"]
    assert outputs["numpy"] == outputs["batched"]

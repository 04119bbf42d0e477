"""
Parity of the device (f64 lax.scan) genotyping forward-backward against
the host longdouble path: <= 1e-9 relative on every likelihood, identical
NaN patterns, on randomized single-sample and trio instances.
"""

import math
import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods
from whatshap_tpu.ops import genotyping as gt_host
from whatshap_tpu.ops import wmec
from whatshap_tpu.ops.genotyping_jax import run_genotyping_jax


def _gt(i):
    return Genotype.from_index(i, 2)


def _random_instance(seed, trio):
    rng = random.Random(9000 + seed)
    n_ind = 3 if trio else 1
    n_pos = rng.randint(2, 8)
    positions = sorted(rng.sample(range(10, 400), n_pos))
    rs = core.ReadSet()
    n_reads = rng.randint(2, 8)
    made = 0
    for i in range(n_reads):
        start = rng.randint(0, n_pos - 2)
        length = rng.randint(2, n_pos - start)
        read = core.Read(f"r{i}", 50, 0, rng.randint(0, n_ind - 1))
        for p in range(start, start + length):
            read.add_variant(positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
        rs.add(read)
        made += 1
    if made == 0:
        return None
    rs.sort()

    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    names = [f"ind{i}" for i in range(n_ind)]
    for i in range(n_ind):
        gls = [
            PhredGenotypeLikelihoods([rng.choice([0.0, 5.0, 20.0]) for _ in range(3)])
            for _ in range(n_pos)
        ]
        ped.add_individual(names[i], [_gt(rng.randint(0, 2)) for _ in range(n_pos)], gls)
    if trio:
        ped.add_relationship(names[0], names[1], names[2])
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
    packed = wmec.pack_problem(rs, recomb, ped, False, positions, check_conflicts=False)
    return packed, ped


def _assert_close(host, device):
    assert host.shape == device.shape
    h = np.asarray(host, dtype=np.float64)
    d = np.asarray(device)
    nan_h = np.isnan(h)
    np.testing.assert_array_equal(nan_h, np.isnan(d))
    ok = ~nan_h
    np.testing.assert_allclose(d[ok], h[ok], rtol=1e-9, atol=1e-300)


@pytest.mark.parametrize("seed", range(8))
def test_single_sample_parity(seed):
    inst = _random_instance(seed, trio=False)
    if inst is None:
        pytest.skip("empty instance")
    packed, ped = inst
    host = gt_host.run_genotyping(packed, ped)
    device = run_genotyping_jax(packed, ped)
    _assert_close(host, device)


@pytest.mark.parametrize("seed", range(8))
def test_trio_parity(seed):
    inst = _random_instance(100 + seed, trio=True)
    if inst is None:
        pytest.skip("empty instance")
    packed, ped = inst
    host = gt_host.run_genotyping(packed, ped)
    device = run_genotyping_jax(packed, ped)
    _assert_close(host, device)


@pytest.mark.parametrize("seed", range(6))
def test_f32_parity(seed):
    """The single-precision TPU-speed variant must stay within 1e-3
    relative of the f64 kernel (the per-column rescaling keeps all
    magnitudes near 1, so f32 holds ~1e-4)."""
    inst = _random_instance(seed if seed % 2 else 200 + seed, trio=bool(seed % 2))
    if inst is None:
        pytest.skip("empty instance")
    packed, ped = inst
    full = run_genotyping_jax(packed, ped)
    fast = run_genotyping_jax(packed, ped, dtype="f32")
    assert full.shape == fast.shape
    h = np.asarray(full)
    d = np.asarray(fast)
    ok = ~np.isnan(h) & ~np.isnan(d)
    np.testing.assert_allclose(d[ok], h[ok], rtol=1e-3, atol=1e-30)


def test_cli_genotype_under_jax_backend(tmp_path, monkeypatch):
    """The genotype CLI under the forced device backends must produce the
    same calls as the host path (float formatting may differ in GL
    decimals, so compare GT/GQ columns)."""
    from whatshap_tpu.cli.genotype import run_genotype

    outputs = {}
    for backend in ("host", "jax", "jax32", "pallas"):
        if backend == "host":
            monkeypatch.delenv("WHATSHAP_TPU_GENO_BACKEND", raising=False)
        else:
            monkeypatch.setenv("WHATSHAP_TPU_GENO_BACKEND", backend)
        out = tmp_path / f"gt_{backend}.vcf"
        run_genotype(
            phase_input_files=["tests/data/pacbio/pacbio.bam"],
            variant_file="tests/data/pacbio/variants.vcf",
            reference="tests/data/pacbio/reference.fasta",
            output=str(out),
            write_command_line_header=False,
        )
        rows = []
        for line in out.read_text().splitlines():
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            call = dict(zip(fields[8].split(":"), fields[9].split(":")))
            rows.append((fields[0], fields[1], call.get("GT"), call.get("GQ")))
        outputs[backend] = rows
    assert outputs["host"] == outputs["jax"]
    # f32 keeps every GT; GQ may flip by 1 at integer-rounding boundaries
    for fast_backend in ("jax32", "pallas"):
        assert len(outputs["host"]) == len(outputs[fast_backend])
        for full, fast in zip(outputs["host"], outputs[fast_backend]):
            assert full[:3] == fast[:3]  # chrom, pos, GT
            if full[3] is not None and fast[3] is not None:
                assert abs(int(full[3]) - int(fast[3])) <= 1


def test_batched_matches_single():
    """The vmapped batched kernel must agree with per-instance runs."""
    from whatshap_tpu.ops.genotyping_jax import run_genotyping_jax, run_genotyping_jax_batched

    # identical read layout (same K/C) with differing alleles/qualities
    def make(seed):
        rng = random.Random(seed)
        n_pos = 6
        positions = [10 * (i + 1) for i in range(n_pos)]
        rs = core.ReadSet()
        layout = [(0, 4), (1, 5), (2, 6), (0, 3), (3, 6)]
        for i, (a, b) in enumerate(layout):
            read = core.Read(f"r{i}", 50, 0, 0)
            for p in range(a, b):
                read.add_variant(positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
            rs.add(read)
        rs.sort()
        nsi = core.NumericSampleIds()
        ped = core.Pedigree(nsi)
        gls = [
            PhredGenotypeLikelihoods([rng.choice([0.0, 5.0, 20.0]) for _ in range(3)])
            for _ in range(n_pos)
        ]
        ped.add_individual("ind0", [_gt(rng.randint(0, 2)) for _ in range(n_pos)], gls)
        recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
        packed = wmec.pack_problem(rs, recomb, ped, False, positions, check_conflicts=False)
        return packed, ped

    pairs = [make(1000 + s) for s in range(4)]
    shapes = {(p.n_cols, p.K, p.T, p.P) for p, _ in pairs}
    assert len(shapes) == 1
    for packed, ped in pairs:
        single = run_genotyping_jax(packed, ped)
        batched = run_genotyping_jax_batched([packed], ped)
        _assert_close(single, batched[0])

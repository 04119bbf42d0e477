"""
Golden CLI legs for the device genotyping backends (VERDICT r2 item 7):
`genotype` must produce identical GT and GQ fields — and GL within f32
tolerance — whichever backend computes the forward-backward HMM
(host longdouble / jax f64 / jax32 f32 / pallas-on-CPU falls back to f32
XLA).  GT/GQ are the calls users consume; GL carries full float precision
so it is compared with a tolerance instead of byte equality.
"""

import math

import pytest

from whatshap_tpu.cli.genotype import run_genotype
from whatshap_tpu.io.sam import build_minimal_index, sam_to_bam

bam = "tests/data/oneread.bam"
trio_bam = "tests/data/trio.pacbio.bam"


def setup_module():
    sam_to_bam(trio_bam[:-4] + ".sam", trio_bam)
    build_minimal_index(trio_bam)


def teardown_module():
    import os

    os.remove(trio_bam)
    os.remove(trio_bam + ".bai")


def _genotype_calls(path):
    """[(CHROM, POS, sample GT, sample GQ, [GL...]), ...] per sample column."""
    calls = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            fmt = fields[8].split(":")
            for col in fields[9:]:
                parts = dict(zip(fmt, col.split(":")))
                gl = [float(x) for x in parts["GL"].split(",")] if "GL" in parts else []
                calls.append(
                    (fields[0], fields[1], parts.get("GT"), parts.get("GQ"), gl)
                )
    return calls


def _run_all_backends(tmp_path, monkeypatch, **kwargs):
    out = {}
    for backend in ("host", "jax", "jax32", "pallas"):
        monkeypatch.setenv("WHATSHAP_TPU_GENO_BACKEND", backend)
        path = tmp_path / f"gt_{backend}.vcf"
        run_genotype(output=str(path), write_command_line_header=False, **kwargs)
        out[backend] = _genotype_calls(path)
    return out


def _assert_golden(out):
    ref = out["host"]
    assert len(ref) > 0
    for backend in ("jax", "jax32", "pallas"):
        got = out[backend]
        assert len(got) == len(ref)
        for (c0, p0, gt0, gq0, gl0), (c1, p1, gt1, gq1, gl1) in zip(ref, got):
            assert (c0, p0) == (c1, p1)
            assert gt0 == gt1, f"{backend}: GT mismatch at {c0}:{p0}"
            assert gq0 == gq1, f"{backend}: GQ mismatch at {c0}:{p0}"
            assert len(gl0) == len(gl1)
            for a, b in zip(gl0, gl1):
                if a <= -30 and b <= -30:
                    # probabilities this small (< 1e-30) sit at the f32
                    # pipeline's flush-to-zero edge (normal range ends at
                    # 10^-37.9, and forward-backward products underflow
                    # before the final normalization): the f32 paths emit
                    # the GL=-1000 zero sentinel while the longdouble host
                    # keeps e.g. -37 — both mean "impossible genotype"
                    continue
                assert math.isclose(a, b, rel_tol=5e-3, abs_tol=5e-3), (
                    f"{backend}: GL drift at {c0}:{p0}: {a} vs {b}"
                )


def test_genotype_backends_golden_single_sample(tmp_path, monkeypatch):
    out = _run_all_backends(
        tmp_path,
        monkeypatch,
        phase_input_files=["tests/data/pacbio/pacbio.bam"],
        variant_file="tests/data/pacbio/variants.vcf",
        reference="tests/data/pacbio/reference.fasta",
    )
    _assert_golden(out)


def test_genotype_backends_golden_trio(tmp_path, monkeypatch):
    out = _run_all_backends(
        tmp_path,
        monkeypatch,
        phase_input_files=[trio_bam],
        variant_file="tests/data/trio.vcf",
        ped="tests/data/trio.ped",
    )
    _assert_golden(out)

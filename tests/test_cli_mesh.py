"""
Production CLI on the multi-device mesh (VERDICT r2 item 1): with the
batched backend forced, the phased VCF from the sharded run over the
8-device virtual mesh must be byte-identical to the single-device
(WHATSHAP_TPU_NO_MESH=1) run, and the sharded launch must actually have
spanned more than one device (wmec.LAUNCH_STATS records per-launch device
counts).
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from whatshap_tpu.cli.phase import run_whatshap
from whatshap_tpu.ops import wmec

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs a multi-device (virtual) platform"
)


@pytest.fixture(scope="module")
def synth_chrom(tmp_path_factory):
    import make_synth_chrom

    out = tmp_path_factory.mktemp("synth")
    return make_synth_chrom.generate(
        out, n_vars=400, coverage=6, vars_per_read=8, spacing=60, break_every=40, seed=5
    )


def _phase(synth_chrom, out_path):
    run_whatshap(
        phase_input_files=[synth_chrom["bam"]],
        variant_file=synth_chrom["vcf"],
        reference=False,  # --no-reference
        output=str(out_path),
        write_command_line_header=False,
    )


def test_phase_cli_mesh_byte_identical(synth_chrom, tmp_path, monkeypatch):
    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")

    monkeypatch.setenv("WHATSHAP_TPU_NO_MESH", "1")
    single = tmp_path / "single.vcf"
    _phase(synth_chrom, single)

    monkeypatch.delenv("WHATSHAP_TPU_NO_MESH")
    wmec.LAUNCH_STATS.clear()
    sharded = tmp_path / "sharded.vcf"
    _phase(synth_chrom, sharded)

    assert any(
        n_dev > 1 for (_k, _t, _c, _b, _bp, n_dev) in wmec.LAUNCH_STATS
    ), "CLI run never launched a sharded batch"
    assert sharded.read_bytes() == single.read_bytes()


@pytest.fixture(scope="module")
def synth_trio(tmp_path_factory):
    import make_synth_chrom

    out = tmp_path_factory.mktemp("synth_trio")
    return make_synth_chrom.generate_trio(
        out, n_vars=240, coverage=4, vars_per_read=8, spacing=60, break_every=30, seed=9
    )


def test_phase_trio_cli_batched_mesh_byte_identical(synth_trio, tmp_path, monkeypatch):
    """Pedigree (T=4) chromosomes route through run_dp_batched_pedigree on
    the mesh, byte-identical to the exact host solve at CLI granularity."""
    from whatshap_tpu.ops import wmec as wmec_mod

    def phase_trio(out_path):
        run_whatshap(
            phase_input_files=[synth_trio["bam"]],
            variant_file=synth_trio["vcf"],
            reference=synth_trio["fasta"],
            ped=synth_trio["ped"],
            output=str(out_path),
            write_command_line_header=False,
        )

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "numpy")
    host = tmp_path / "host.vcf"
    phase_trio(host)

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")
    wmec_mod.LAUNCH_STATS.clear()
    sharded = tmp_path / "sharded.vcf"
    phase_trio(sharded)

    assert any(
        t > 1 and n_dev > 1 for (_k, t, _c, _b, _bp, n_dev) in wmec_mod.LAUNCH_STATS
    ), "trio CLI run never launched a sharded pedigree batch"
    assert sharded.read_bytes() == host.read_bytes()


def test_phase_cli_mesh_matches_default_route(synth_chrom, tmp_path, monkeypatch):
    """The sharded batched route must agree with the default (auto) route —
    on CPU that is the numpy/native exact solver, so this also pins the
    mesh path to the host oracle at CLI granularity."""
    monkeypatch.delenv("WHATSHAP_TPU_BACKEND", raising=False)
    monkeypatch.delenv("WHATSHAP_TPU_NO_MESH", raising=False)
    auto = tmp_path / "auto.vcf"
    _phase(synth_chrom, auto)

    monkeypatch.setenv("WHATSHAP_TPU_BACKEND", "batched")
    sharded = tmp_path / "sharded.vcf"
    _phase(synth_chrom, sharded)

    assert sharded.read_bytes() == auto.read_bytes()

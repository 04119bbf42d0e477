"""
The batched native realignment engine (cigarlib wh_realign_read) must
reproduce the Python per-variant realign path byte-for-byte through the
whole phase pipeline.
"""

import io
import sys
from pathlib import Path

import whatshap_tpu.native
from whatshap_tpu.cli.phase import run_whatshap

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))


def _phase(bam, vcf, fasta):
    out = io.StringIO()
    run_whatshap(
        phase_input_files=[bam],
        variant_file=vcf,
        reference=fasta,
        output=out,
        write_command_line_header=False,
    )
    return [
        line for line in out.getvalue().splitlines() if not line.startswith("##")
    ]


def _parity(bam, vcf, fasta, monkeypatch):
    native = _phase(bam, vcf, fasta)
    monkeypatch.setattr(whatshap_tpu.native, "cigarlib", None)
    python = _phase(bam, vcf, fasta)
    assert native == python


def test_realign_parity_pacbio(monkeypatch):
    _parity(
        "tests/data/pacbio/pacbio.bam",
        "tests/data/pacbio/variants.vcf",
        "tests/data/pacbio/reference.fasta",
        monkeypatch,
    )


def test_realign_parity_synthetic(tmp_path, monkeypatch):
    from make_synth_chrom import generate

    info = generate(tmp_path / "chrom", n_vars=300, coverage=8, seed=11)
    _parity(info["bam"], info["vcf"], info["fasta"], monkeypatch)


def test_realign_parity_indels(tmp_path, monkeypatch):
    """Multi-length alleles force the padded-haplotype branches."""
    from make_synth_chrom import generate

    info = generate(tmp_path / "chrom", n_vars=120, coverage=8, seed=13)
    # rewrite a few VCF records into insertions/deletions relative to the
    # reference (keeps positions/REF bases consistent with the FASTA)
    vcf = Path(info["vcf"])
    lines = vcf.read_text().splitlines()
    out = []
    k = 0
    for line in lines:
        if line.startswith("#"):
            out.append(line)
            continue
        f = line.split("\t")
        if k % 7 == 3:
            f[4] = f[3] + "ACG"  # insertion
        k += 1
        out.append("\t".join(f))
    vcf.write_text("\n".join(out) + "\n")
    _parity(info["bam"], str(vcf), info["fasta"], monkeypatch)


def test_end_to_end_phasing_accuracy(tmp_path):
    """The full pipeline on a simulated chromosome must reconstruct the
    true haplotypes: switch-error rate within phase blocks stays near the
    simulated read error floor."""
    from make_synth_chrom import generate

    info = generate(tmp_path / "chrom", n_vars=400, coverage=10, seed=21)
    out = io.StringIO()
    run_whatshap(
        phase_input_files=[info["bam"]],
        variant_file=info["vcf"],
        reference=info["fasta"],
        output=out,
        write_command_line_header=False,
    )
    hap0 = info["hap0"]
    blocks = {}
    n_phased = 0
    for line in out.getvalue().splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        call = dict(zip(f[8].split(":"), f[9].split(":")))
        gt = call.get("GT", "")
        if "|" not in gt:
            continue
        n_phased += 1
        vi = int(f[1]) // 150 - 1
        blocks.setdefault(call.get("PS"), []).append((vi, int(gt.split("|")[0])))
    assert n_phased > 300, f"only {n_phased} of 400 variants phased"
    n_pairs = n_switch = 0
    for members in blocks.values():
        members.sort()
        rel_prev = None
        for vi, a in members:
            rel = a ^ hap0[vi]
            if rel_prev is not None:
                n_pairs += 1
                n_switch += rel != rel_prev
            rel_prev = rel
    assert n_pairs > 0
    assert n_switch / n_pairs < 0.02, f"switch rate {n_switch / n_pairs:.3f}"


def test_end_to_end_trio_phasing(tmp_path):
    """phase --ped on a simulated trio chromosome: the PedMEC DP over all
    three samples' reads must phase the child with few switch errors."""
    from make_synth_chrom import generate_trio

    info = generate_trio(tmp_path / "trio", n_vars=160, coverage=6, seed=5)
    out = io.StringIO()
    run_whatshap(
        phase_input_files=[info["bam"]],
        variant_file=info["vcf"],
        reference=info["fasta"],
        ped=info["ped"],
        output=out,
        write_command_line_header=False,
    )
    text = out.getvalue()
    header = [ln for ln in text.splitlines() if ln.startswith("#CHROM")][0].split("\t")
    ci = header[9:].index("child")
    truth = info["samples"]["child"][0]
    blocks = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        call = dict(zip(f[8].split(":"), f[9 + ci].split(":")))
        gt = call.get("GT", "")
        if "|" not in gt:
            continue
        a, b = gt.split("|")
        if a == b:
            continue
        vi = int(f[1]) // 150 - 1
        blocks.setdefault(call.get("PS"), []).append((vi, int(a)))
    n_pairs = n_switch = 0
    for members in blocks.values():
        members.sort()
        prev = None
        for vi, a in members:
            rel = a ^ truth[vi]
            if prev is not None:
                n_pairs += 1
                n_switch += rel != prev
            prev = rel
    assert n_pairs > 60
    assert n_switch / n_pairs < 0.03, f"child switch rate {n_switch}/{n_pairs}"


def test_realign_parity_affine(tmp_path, monkeypatch):
    """Affine-gap realignment through the genotype pipeline must match the
    Python per-variant path byte-for-byte (alleles AND qualities: affine
    quality is the best-vs-second-best separation)."""
    from make_synth_chrom import generate

    from whatshap_tpu.cli.genotype import run_genotype

    info = generate(tmp_path / "chrom", n_vars=200, coverage=8, seed=17)

    def _run():
        out = io.StringIO()
        run_genotype(
            phase_input_files=[info["bam"]],
            variant_file=info["vcf"],
            reference=info["fasta"],
            output=out,
            affine_gap=True,
            write_command_line_header=False,
        )
        return [
            line for line in out.getvalue().splitlines() if not line.startswith("##")
        ]

    native = _run()
    monkeypatch.setattr(whatshap_tpu.native, "cigarlib", None)
    python = _run()
    assert native == python

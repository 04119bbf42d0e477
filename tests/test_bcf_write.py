"""
BCF writing (io/bcf.py BCFWriter): round-trip through our own reader and
end-to-end through the phase CLI with a .bcf output path.

The reference writes BCF via pysam/htslib when the output file ends in
.bcf (whatshap/vcf.py VariantFile mode inference); this asserts the native
writer produces files our stack reads back identically.
"""

import gzip

from whatshap_tpu.io.vcflib import VariantFile


def _roundtrip(in_path, tmp_path, name="out.bcf"):
    src = VariantFile(in_path)
    out = tmp_path / name
    header = src.header.copy()
    used_fmt = set()
    for rec in src:
        header.add_contig(rec.chrom)
        used_fmt.update(rec.format)
    src.close()
    # BCF requires every FORMAT key declared (htslib errors otherwise);
    # the real pipeline guarantees this via vcf.augment_header
    if "GT" in used_fmt and "GT" not in header.formats:
        header.add_line('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
    if "PS" in used_fmt and "PS" not in header.formats:
        header.add_line(
            '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set identifier">'
        )
    src = VariantFile(in_path)
    w = VariantFile(str(out), mode="w", header=header)
    records = list(src)
    for rec in records:
        w.write(rec)
    w.close()
    src.close()
    back = VariantFile(str(out))
    return records, list(back)


def _lines(records):
    return [r.to_line() for r in records]


def test_roundtrip_phased_vcf(tmp_path):
    orig, back = _roundtrip("tests/data/phasedinput.vcf", tmp_path)
    assert _lines(orig) == _lines(back)


def test_roundtrip_multisample(tmp_path):
    orig, back = _roundtrip("tests/data/ped_samples.vcf", tmp_path)
    assert _lines(orig) == _lines(back)


def test_roundtrip_existing_bcf(tmp_path):
    # read a real (htslib-produced) BCF, rewrite it with our writer, reread
    orig, back = _roundtrip("tests/data/haplotag_2.bcf", tmp_path)
    assert _lines(orig) == _lines(back)


def test_written_bcf_is_bgzf(tmp_path):
    _roundtrip("tests/data/phasedinput.vcf", tmp_path)
    raw = (tmp_path / "out.bcf").read_bytes()
    assert raw[:2] == b"\x1f\x8b"  # BGZF magic
    with gzip.open(tmp_path / "out.bcf", "rb") as f:
        assert f.read(3) == b"BCF"


def test_phase_cli_writes_bcf(tmp_path):
    from whatshap_tpu.cli.phase import run_whatshap

    out = tmp_path / "phased.bcf"
    run_whatshap(
        phase_input_files=["tests/data/pacbio/pacbio.bam"],
        variant_file="tests/data/pacbio/variants.vcf",
        reference="tests/data/pacbio/reference.fasta",
        output=str(out),
    )
    vf = VariantFile(str(out))
    recs = list(vf)
    assert len(recs) > 0
    phased = [
        r
        for r in recs
        if any("|" in (c._values.get("GT", "") or "") for c in r.samples.values())
    ]
    assert phased, "no phased genotypes in BCF output"
    assert any("PS" in r.format for r in phased)

"""
Generate a synthetic chromosome dataset (reference FASTA + aligned BAM +
heterozygous VCF) for end-to-end CLI benchmarking.

Two random haplotypes over `n_vars` biallelic SNVs are sampled; reads are
drawn from one haplotype each, carry the haplotype's alleles (plus a
per-base error rate at variant sites), and align contiguously (all-M
CIGAR).  Reads are confined to `break_every`-variant windows so the
chromosome decomposes into many read-connected phase blocks — the shape
the batched device solver consumes in production (real long-read data
breaks wherever no fragment spans adjacent variants).

Returns/writes: ref.fasta(+.fai), reads.bam(+.bai), variants.vcf and a
truth table of the two haplotypes.
"""

import json
import random
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

from whatshap_tpu.io.sam import (  # noqa: E402
    AlignedSegment,
    AlignmentFile,
    AlignmentHeader,
    build_minimal_index,
)

BASES = "ACGT"


def _load_cached(out, params):
    """Deterministic outputs are cached on disk: if a manifest with the
    same parameters exists and the files it names are present, reuse them
    (a 100k-variant chromosome takes ~1 min to synthesize)."""
    mf = Path(out) / "manifest.json"
    if not mf.exists():
        return None
    try:
        d = json.loads(mf.read_text())
    except (OSError, ValueError):
        return None
    if d.get("params") != params:
        return None
    info = d.get("info", {})
    for key in ("fasta", "bam", "vcf", "ped"):
        if key in info and not Path(info[key]).exists():
            return None
    # required index sidecars (a crash or partial cleanup can lose them
    # while the main files survive)
    if "fasta" in info and not Path(info["fasta"] + ".fai").exists():
        return None
    if "bam" in info and not Path(info["bam"] + ".bai").exists():
        return None
    return info


def _store_cached(out, params, info):
    (Path(out) / "manifest.json").write_text(
        json.dumps({"params": params, "info": info})
    )


def generate(
    out_dir,
    n_vars=4000,
    coverage=14,
    vars_per_read=30,
    spacing=150,
    err=0.02,
    break_every=64,
    seed=7,
):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    params = dict(kind="single", n_vars=n_vars, coverage=coverage,
                  vars_per_read=vars_per_read, spacing=spacing, err=err,
                  break_every=break_every, seed=seed)
    cached = _load_cached(out, params)
    if cached is not None:
        return cached
    rng = random.Random(seed)
    contig = "chr1"
    ref_len = (n_vars + 2) * spacing
    ref = [rng.choice(BASES) for _ in range(ref_len)]

    positions = [(i + 1) * spacing for i in range(n_vars)]  # 0-based ref coords
    alts = []
    for p in positions:
        r = ref[p]
        alts.append(rng.choice([b for b in BASES if b != r]))
    hap0 = [rng.randint(0, 1) for _ in range(n_vars)]
    hap1 = [1 - a for a in hap0]  # strictly heterozygous sites

    # reference FASTA + fai
    fasta = out / "ref.fasta"
    seq = "".join(ref)
    with open(fasta, "w") as f:
        f.write(f">{contig}\n")
        for i in range(0, ref_len, 60):
            f.write(seq[i : i + 60] + "\n")
    line_blen = 61  # 60 bases + newline
    with open(str(fasta) + ".fai", "w") as f:
        offset = len(f">{contig}\n")
        f.write(f"{contig}\t{ref_len}\t{offset}\t60\t{line_blen}\n")

    # VCF of unphased heterozygous SNVs
    vcf = out / "variants.vcf"
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={contig},length={ref_len}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample\n")
        for i, p in enumerate(positions):
            f.write(
                f"{contig}\t{p + 1}\t.\t{ref[p]}\t{alts[i]}\t50\tPASS\t.\tGT\t0/1\n"
            )

    # reads: confined to break_every-variant windows
    header = AlignmentHeader.from_dict(
        {
            "HD": {"VN": "1.6", "SO": "coordinate"},
            "SQ": [{"SN": contig, "LN": ref_len}],
            "RG": [{"ID": "rg1", "SM": "sample"}],
        }
    )
    n_windows = (n_vars + break_every - 1) // break_every
    reads = []
    rid = 0
    for w in range(n_windows):
        v_lo = w * break_every
        v_hi = min(v_lo + break_every, n_vars)
        span = min(vars_per_read, v_hi - v_lo)
        n_reads = max(1, round(coverage * (v_hi - v_lo) / max(span, 1)))
        for _ in range(n_reads):
            hap = rng.choice([hap0, hap1])
            v_start = rng.randint(v_lo, max(v_lo, v_hi - span))
            v_end = min(v_start + span, v_hi)
            g_start = positions[v_start] - rng.randint(10, spacing - 10)
            g_end = positions[v_end - 1] + rng.randint(10, spacing - 10)
            bases = list(seq[g_start:g_end])
            for vi in range(v_start, v_end):
                allele = hap[vi]
                if rng.random() < err:
                    allele = 1 - allele
                if allele == 1:
                    bases[positions[vi] - g_start] = alts[vi]
            reads.append((g_start, rid, "".join(bases)))
            rid += 1
    reads.sort()

    bam = out / "reads.bam"
    bf = AlignmentFile(str(bam), "wb", header=header)
    for g_start, i, sq in reads:
        seg = AlignedSegment(header)
        seg.query_name = f"read{i}"
        seg.flag = 0
        seg.reference_id = 0
        seg.reference_start = g_start
        seg.mapping_quality = 50
        seg.cigartuples = [(0, len(sq))]
        seg.query_sequence = sq
        seg.query_qualities = [30] * len(sq)
        seg.tags = {"RG": "rg1"}
        bf.write(seg)
    bf.close()
    build_minimal_index(str(bam))
    info = {
        "fasta": str(fasta),
        "bam": str(bam),
        "vcf": str(vcf),
        "n_vars": n_vars,
        "n_reads": len(reads),
        "hap0": hap0,
    }
    _store_cached(out, params, info)
    return info


def generate_trio(
    out_dir,
    n_vars=2000,
    coverage=10,
    vars_per_read=30,
    spacing=150,
    err=0.02,
    break_every=64,
    recomb_per_block=0.2,
    seed=7,
):
    """Trio variant: mother/father haplotypes are simulated independently,
    the child inherits one (recombining) haplotype from each parent; one
    BAM carries three read groups and a PED file links the family.

    Returns paths plus the true haplotypes per sample."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    params = dict(kind="trio", n_vars=n_vars, coverage=coverage,
                  vars_per_read=vars_per_read, spacing=spacing, err=err,
                  break_every=break_every, recomb_per_block=recomb_per_block,
                  seed=seed)
    cached = _load_cached(out, params)
    if cached is not None:
        return cached
    rng = random.Random(seed)
    contig = "chr1"
    ref_len = (n_vars + 2) * spacing
    ref = [rng.choice(BASES) for _ in range(ref_len)]
    positions = [(i + 1) * spacing for i in range(n_vars)]
    alts = [rng.choice([b for b in BASES if b != ref[p]]) for p in positions]

    def hap():
        return [rng.randint(0, 1) for _ in range(n_vars)]

    mother = [hap(), hap()]
    father = [hap(), hap()]
    # child: one haplotype from each parent with occasional block crossovers
    def inherit(parent):
        cur = rng.randint(0, 1)
        h = []
        for vi in range(n_vars):
            if vi % break_every == 0 and vi > 0 and rng.random() < recomb_per_block:
                cur = 1 - cur
            h.append(parent[cur][vi])
        return h

    child = [inherit(mother), inherit(father)]
    samples = {"mother": mother, "father": father, "child": child}

    fasta = out / "ref.fasta"
    seq = "".join(ref)
    with open(fasta, "w") as f:
        f.write(f">{contig}\n")
        for i in range(0, ref_len, 60):
            f.write(seq[i : i + 60] + "\n")
    with open(str(fasta) + ".fai", "w") as f:
        f.write(f"{contig}\t{ref_len}\t{len(f'>{contig}') + 1}\t60\t61\n")

    vcf = out / "variants.vcf"
    names = list(samples)
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={contig},length={ref_len}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(names) + "\n")
        for i, p in enumerate(positions):
            gts = []
            for name in names:
                h = samples[name]
                gts.append("/".join(map(str, sorted((h[0][i], h[1][i])))))
            f.write(
                f"{contig}\t{p + 1}\t.\t{ref[p]}\t{alts[i]}\t50\tPASS\t.\tGT\t"
                + "\t".join(gts) + "\n"
            )

    ped = out / "family.ped"
    ped.write_text("FAM child father mother 0 0\nFAM father 0 0 0 0\nFAM mother 0 0 0 0\n")

    header = AlignmentHeader.from_dict(
        {
            "HD": {"VN": "1.6", "SO": "coordinate"},
            "SQ": [{"SN": contig, "LN": ref_len}],
            "RG": [{"ID": name, "SM": name} for name in names],
        }
    )
    n_windows = (n_vars + break_every - 1) // break_every
    reads = []
    rid = 0
    for name in names:
        haps = samples[name]
        for w in range(n_windows):
            v_lo = w * break_every
            v_hi = min(v_lo + break_every, n_vars)
            span = min(vars_per_read, v_hi - v_lo)
            n_reads = max(1, round(coverage * (v_hi - v_lo) / max(span, 1)))
            for _ in range(n_reads):
                h = haps[rng.randint(0, 1)]
                v_start = rng.randint(v_lo, max(v_lo, v_hi - span))
                v_end = min(v_start + span, v_hi)
                g_start = positions[v_start] - rng.randint(10, spacing - 10)
                g_end = positions[v_end - 1] + rng.randint(10, spacing - 10)
                bases = list(seq[g_start:g_end])
                for vi in range(v_start, v_end):
                    allele = h[vi]
                    if rng.random() < err:
                        allele = 1 - allele
                    if allele == 1:
                        bases[positions[vi] - g_start] = alts[vi]
                reads.append((g_start, rid, name, "".join(bases)))
                rid += 1
    reads.sort()
    bam = out / "reads.bam"
    bf = AlignmentFile(str(bam), "wb", header=header)
    for g_start, i, name, sq in reads:
        seg = AlignedSegment(header)
        seg.query_name = f"read{i}"
        seg.flag = 0
        seg.reference_id = 0
        seg.reference_start = g_start
        seg.mapping_quality = 50
        seg.cigartuples = [(0, len(sq))]
        seg.query_sequence = sq
        seg.query_qualities = [30] * len(sq)
        seg.tags = {"RG": name}
        bf.write(seg)
    bf.close()
    build_minimal_index(str(bam))
    info = {
        "fasta": str(fasta),
        "bam": str(bam),
        "vcf": str(vcf),
        "ped": str(ped),
        "n_vars": n_vars,
        "n_reads": len(reads),
        "samples": {k: list(v) for k, v in samples.items()},
    }
    _store_cached(out, params, info)
    return info


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-vars", type=int, default=4000)
    ap.add_argument("--coverage", type=int, default=14)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    info = generate(args.out_dir, n_vars=args.n_vars, coverage=args.coverage, seed=args.seed)
    info.pop("hap0")
    print(json.dumps(info))

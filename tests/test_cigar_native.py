"""
Differential fuzz of the C++ CIGAR engine (native/cigarlib.cpp) against
the pure-Python _variants module: identical split points in realignment
mode and identical (variant, allele, quality) calls in reference-free
mode, over randomized reads with mixed CIGAR operations and indel
variants.
"""

import random

import pytest

from whatshap_tpu._variants import _detect_alleles, _iterate_cigar
from whatshap_tpu.native import cigarlib
from whatshap_tpu.variants import (
    ReadSetReader,
    _pack_detect_state,
)
from whatshap_tpu.vcf import BiallelicVcfVariant

pytestmark = pytest.mark.skipif(cigarlib is None, reason="native cigarlib unavailable")

_BASES = "ACGT"


class FakeRead:
    def __init__(self, reference_start, cigartuples, query_sequence, query_qualities):
        self.reference_start = reference_start
        self.cigartuples = cigartuples
        self.query_sequence = query_sequence
        self.query_qualities = query_qualities


def _random_read(rng, ref_start):
    cigar = []
    ref_len = 0
    query_len = 0
    if rng.random() < 0.5:
        softclip = rng.randint(1, 5)
        cigar.append((4, softclip))
        query_len += softclip
    for _ in range(rng.randint(1, 6)):
        op = rng.choices([0, 1, 2, 3, 7, 8], weights=[10, 2, 2, 1, 2, 2])[0]
        length = rng.randint(1, 12)
        cigar.append((op, length))
        if op in (0, 7, 8):
            ref_len += length
            query_len += length
        elif op == 1:
            query_len += length
        elif op in (2, 3):
            ref_len += length
    seq = "".join(rng.choice(_BASES) for _ in range(query_len + 5))
    quals = [rng.randint(3, 60) for _ in range(len(seq))] if rng.random() < 0.8 else None
    return FakeRead(ref_start, cigar, seq, quals), ref_len


def _random_variants(rng, lo, hi):
    variants = []
    pos = lo
    while pos < hi:
        ref = "".join(rng.choice(_BASES) for _ in range(rng.choices([1, 2, 3], [8, 1, 1])[0]))
        alt = "".join(rng.choice(_BASES) for _ in range(rng.choices([0, 1, 2], [1, 8, 1])[0]))
        if alt != ref:
            variants.append(BiallelicVcfVariant(pos, ref, alt))
        pos += rng.randint(1, 6)
    return variants


@pytest.mark.parametrize("seed", range(60))
def test_iterate_cigar_native_matches_python(seed):
    rng = random.Random(7100 + seed)
    ref_start = rng.randint(0, 30)
    read, _span = _random_read(rng, ref_start)
    variants = _random_variants(rng, 0, ref_start + 80)
    if not variants:
        pytest.skip("no variants")
    python = list(_iterate_cigar(variants, 0, read, read.cigartuples))
    native = cigarlib.iterate_cigar(
        cigarlib._i64([v.position for v in variants]),
        0,
        read.reference_start,
        cigarlib._i32([op for op, _ in read.cigartuples]),
        cigarlib._i32([ln for _, ln in read.cigartuples]),
    )
    assert native == python


@pytest.mark.parametrize("seed", range(60))
def test_detect_alleles_native_matches_python(seed):
    rng = random.Random(7500 + seed)
    ref_start = rng.randint(0, 30)
    read, _span = _random_read(rng, ref_start)
    raw_variants = _random_variants(rng, 0, ref_start + 80)
    if not raw_variants:
        pytest.skip("no variants")

    reader = ReadSetReader.__new__(ReadSetReader)  # only static helpers used
    normalized = [v.normalized() for v in raw_variants]
    usable = reader.detect_non_overlapping_variants(normalized)
    progress = sorted(
        (reader.build_var_progress(normalized, j) for j in usable),
        key=lambda p: p.variant_id,
    )
    if not progress:
        pytest.skip("no usable variants")

    python = list(_detect_alleles(normalized, progress, 0, read))
    # rebuild trackers: the python walk mutates their state
    progress = sorted(
        (reader.build_var_progress(normalized, j) for j in usable),
        key=lambda p: p.variant_id,
    )
    state = _pack_detect_state(cigarlib, normalized, progress)
    native = cigarlib.detect_alleles(
        state["prog_positions"],
        state["prog_variant_id"],
        state["prog_ref_len"],
        state["allele_off"],
        state["match_t"],
        state["insert_t"],
        state["delete_t"],
        state["seq_off"],
        state["allele_seq"],
        0,
        read.reference_start,
        cigarlib._i32([op for op, _ in read.cigartuples]),
        cigarlib._i32([ln for _, ln in read.cigartuples]),
        read.query_sequence,
        read.query_qualities,
    )
    assert native == python

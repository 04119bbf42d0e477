"""
Detect variants in reads: ReadSetReader re-discovers VCF variants in BAM
alignments, either by realignment to padded REF/ALT haplotypes (when a
reference is available) or directly from the CIGAR (reference-free).

Behavior parity with whatshap/variants.py.
"""

import csv
import logging
from collections import Counter, defaultdict
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional

from ._variants import _detect_alleles, _iterate_cigar
from .align import edit_distance, edit_distance_affine_gap, enumerate_all_kmers, kmer_align
from .bam import AlignmentWithSourceID, BamReader, MultiBamReader, SampleBamReader
from .core import Genotype, NumericSampleIds, Read, ReadSet
from .io.sam import AlignedSegment
from .vcf import VcfVariant

logger = logging.getLogger(__name__)


class ReadSetError(Exception):
    pass


@dataclass
class AlleleProgress:
    progress: int = 0
    length: int = 0
    quality: int = 0
    matched: int = 0
    match_target: int = 0
    inserted: int = 0
    insert_target: int = 0
    deleted: int = 0
    delete_target: int = 0


class VariantProgress:
    def __init__(self, variant_id):
        self.variant_id = variant_id
        self.query_start = 0
        self.alleles = []

    def __iter__(self):
        yield from self.alleles

    def __len__(self):
        return len(self.alleles)

    def add_allele(self, matches, insertions, deletions):
        l = matches + insertions + deletions
        a = AlleleProgress(0, l, 0, 0, matches, 0, insertions, 0, deletions)
        self.alleles.append(a)

    def reset(self, query_start):
        self.query_start = query_start
        for a in self.alleles:
            a.progress, a.matched, a.inserted, a.deleted, a.quality = 0, 0, 0, 0, 0

    def get_resolved(self):
        return [i for i, a in enumerate(self.alleles) if a.progress == a.length]

    def get_pending(self):
        return [i for i, a in enumerate(self.alleles) if 0 <= a.progress < a.length]


@dataclass
class AlignedRead:
    read: Read
    is_supplementary: bool
    is_reverse: bool
    reference_start: int
    reference_end: int

    def distance(self, other: "AlignedRead") -> int:
        return max(
            0,
            self.reference_start - other.reference_end,
            other.reference_start - self.reference_end,
        )


def is_alignment_primary(alignment: AlignedSegment) -> bool:
    non_primary = (
        alignment.is_supplementary or alignment.is_secondary or alignment.is_unmapped
    )
    return not non_primary


def is_alignmentwsid_primary(alignment: AlignmentWithSourceID) -> bool:
    return is_alignment_primary(alignment=alignment.bam_alignment)


# some value that would very unlikely appear as a suffix of a genuine read id
PRIMARY_DEFAULT_SUB_ALIGNMENT_ID = "____1"


def get_sub_alignment_id(
    alignment: AlignedSegment,
    is_primary: bool,
    primary_default: Optional[str] = PRIMARY_DEFAULT_SUB_ALIGNMENT_ID,
) -> str:
    """Unique-ish id per alignment segment of a read: the CIGAR string plus
    the flag distinguish supplementary alignments of the same read."""
    if not is_primary or primary_default is None:
        return str(hash((alignment.cigarstring, alignment.flag)))
    return primary_default


def get_sub_alignmentw_id_wsid(
    alignment: AlignmentWithSourceID,
    is_primary: bool,
    primary_default: Optional[str] = PRIMARY_DEFAULT_SUB_ALIGNMENT_ID,
) -> str:
    return get_sub_alignment_id(
        alignment=alignment.bam_alignment, is_primary=is_primary, primary_default=primary_default
    )


class ReadSetReader:
    """Associate VCF variants with BAM reads by re-discovering the variants
    in each read."""

    def __init__(
        self,
        paths: List[str],
        reference: Optional[str],
        numeric_sample_ids: NumericSampleIds,
        *,
        mapq_threshold: int = 20,
        overhang: int = 10,
        affine: int = False,
        gap_start: int = 10,
        gap_extend: int = 7,
        default_mismatch: int = 15,
        duplicates: bool = False,
        use_kmerald: bool = False,
        kmeralign_costs_path: Optional[str] = None,
        kmer_size: int = 7,
        kmerald_gappenalty: float = 40,
        kmerald_window: int = 25,
        use_supplementary: bool = False,
        supplementary_distance_threshold: int = 100_000,
        allow_supplementary_only_read_groups: bool = False,
    ):
        self._mapq_threshold = mapq_threshold
        self._numeric_sample_ids = numeric_sample_ids
        self._use_affine = affine
        self._gap_start = gap_start
        self._gap_extend = gap_extend
        self._default_mismatch = default_mismatch
        self._overhang = overhang
        self._duplicates = duplicates
        self._use_kmerald = use_kmerald
        self._kmeralign_costs_path = kmeralign_costs_path
        self._kmer_size = kmer_size
        self._kmerald_gappenalty = kmerald_gappenalty
        self._kmerald_window = kmerald_window
        self._paths = paths
        self._reader: BamReader
        self._use_supplementary = use_supplementary
        self._supplementary_distance_threshold = supplementary_distance_threshold
        self._allow_supplementary_only_read_groups = allow_supplementary_only_read_groups
        if len(paths) == 1:
            self._reader = SampleBamReader(paths[0], reference=reference)
        else:
            self._reader = MultiBamReader(paths, reference=reference)

    @property
    def n_paths(self) -> int:
        return len(self._paths)

    def read(
        self,
        chromosome,
        variants,
        sample,
        reference,
        regions=None,
        restricted_genotypes: Optional[List[Genotype]] = None,
    ) -> ReadSet:
        """Detect alleles and return a ReadSet of reads covering the given
        variants (see the reference docstring, whatshap/variants.py:201-248)."""
        if __debug__ and variants:
            varposc = Counter(variant.position for variant in variants)
            pos, count = varposc.most_common()[0]
            assert count == 1, f"Position {pos} occurs more than once in variant list."

        assert restricted_genotypes is None or len(restricted_genotypes) == len(variants)
        alignments = self._usable_alignments(chromosome, sample, regions)
        reads = self._alignments_to_reads(
            alignments, variants, sample, reference, restricted_genotypes
        )
        grouped_reads = self._group_reads(
            reads,
            self._supplementary_distance_threshold,
            allow_supplementary_only_groups=self._allow_supplementary_only_read_groups,
        )
        readset = self._make_readset_from_grouped_reads(grouped_reads)
        return readset

    @staticmethod
    def _make_readset_from_grouped_reads(groups: Iterable[List[Read]]) -> ReadSet:
        read_set = ReadSet()
        for group in groups:
            read_set.add(merge_reads(*group))
        return read_set

    @staticmethod
    def create_read_from_group(
        group: List[AlignedRead],
        distance_threshold: int,
        allow_supplementary_only_groups: bool = False,
    ) -> Optional[Read]:
        """Merge multiple AlignedReads (primary + usable supplementary) into a
        single Read (whatshap/variants.py:257-336)."""
        if len(group) > 1:
            logger.debug(f"Group of read {group[0].read.name!r} has {len(group)} items.")
        primary: Optional[AlignedRead] = None
        n_primary = 0
        read = None
        for read in group:
            if not read.is_supplementary:
                n_primary += 1
                primary = read
        if primary is None and not allow_supplementary_only_groups:
            return None
        if n_primary > 2:
            logger.warning(
                f"Read name {group[0].read.name!r} has more than two primary alignments."
            )
            return None
        if primary is None:
            primary = read
        reference_start = primary.reference_start
        variants = dict()
        skip = set()
        for read in group:
            if read.is_supplementary:
                if read.is_reverse != primary.is_reverse:
                    continue
                if primary.distance(read) > distance_threshold:
                    continue
            reference_start = min(reference_start, read.reference_start)
            for variant in read.read:
                if variant.position in variants:
                    if variants[variant.position].allele != variant.allele:
                        skip.add(variant.position)
                else:
                    variants[variant.position] = variant
        union_read = Read(
            primary.read.name
            + (primary.read.sub_alignment_id if allow_supplementary_only_groups else ""),
            primary.read.mapqs[0],
            primary.read.source_id,
            primary.read.sample_id,
            reference_start,
            primary.read.BX_tag,
            primary.read.HP_tag,
            primary.read.PS_tag,
            chromosome=primary.read.chromosome,
            sub_alignment_id=primary.read.sub_alignment_id,
            is_supplementary=primary.read.is_supplementary,
            is_reverse=primary.is_reverse,
            reference_end=primary.reference_end,
        )
        for position, variant in variants.items():
            if position not in skip:
                union_read.add_variant(variant.position, variant.allele, variant.quality)
        union_read.sort()
        if len(union_read) != len(primary.read):
            logger.debug(
                f"Converted read {primary.read.name} with {len(primary.read)} variants"
                f" to read with {len(union_read)} variants."
            )
        return union_read

    @staticmethod
    def _group_reads(
        reads: Iterable[AlignedRead],
        distance_threshold: int,
        allow_supplementary_only_groups: bool = False,
    ) -> Iterator[List[Read]]:
        """Group reads (e.g. paired ends, supplementary parts) by
        (source_id, name[, sub-alignment id], sample_id)."""
        groups = defaultdict(list)
        for read in reads:
            groups[
                (
                    read.read.source_id,
                    read.read.name,
                    read.read.sub_alignment_id if allow_supplementary_only_groups else None,
                    read.read.sample_id,
                )
            ].append(read)
        n_skipped = 0
        n_non_singleton = 0
        for group in groups.values():
            if len(group) > 1:
                n_non_singleton += 1
            read = ReadSetReader.create_read_from_group(
                group,
                distance_threshold,
                allow_supplementary_only_groups=allow_supplementary_only_groups,
            )
            if read is None:
                n_skipped += 1
            else:
                yield [read]

        logger.info(f"Number of non-singleton groups: {n_non_singleton}")
        logger.info(f"Skipped {n_skipped} groups")

    def _usable_alignments(self, chromosome, sample, regions=None):
        """Alignments with sufficient mapping quality that are not secondary,
        unmapped or (by default) duplicate/supplementary."""
        if regions is None:
            regions = [(0, None)]
        for s, e in regions:
            for alignment in self._reader.fetch(
                reference=chromosome, sample=sample, start=s, end=e
            ):
                if (
                    (not self._use_supplementary and alignment.bam_alignment.is_supplementary)
                    or alignment.bam_alignment.mapping_quality < self._mapq_threshold
                    or alignment.bam_alignment.is_secondary
                    or alignment.bam_alignment.is_unmapped
                    or (not self._duplicates and alignment.bam_alignment.is_duplicate)
                ):
                    continue
                yield alignment

    def has_reference(self, chromosome):
        return self._reader.has_reference(chromosome)

    def _alignments_to_reads(
        self,
        alignments,
        variants,
        sample,
        reference,
        restricted_genotypes: Optional[List[Genotype]],
    ):
        """Convert BAM alignments to Read objects, detecting alleles by
        realignment (reference given) or from the CIGAR."""
        numeric_sample_id = 0 if sample is None else self._numeric_sample_ids[sample]
        number_of_alignments = 0
        number_of_supplementary_alignments = 0
        if reference is not None:
            # copy into a plain str for fast slicing
            reference = reference[:]
            normalized_variants = variants
        else:
            normalized_variants = [variant.normalized() for variant in variants]

        if reference is None:
            valid_variant_ids = self.detect_non_overlapping_variants(normalized_variants)
            valid_positions = [normalized_variants[j].position for j in valid_variant_ids]
            var_progress = [
                self.build_var_progress(normalized_variants, j) for j in valid_variant_ids
            ]
            var_progress.sort(key=lambda x: x.variant_id)

        i = 0  # index into variants (reference) or variant progresses (no reference)

        if self._use_kmerald:
            calculated_costs = {}
            splitted_strings = {}
            kmerald_costs = {}
            with open(self._kmeralign_costs_path) as costs_file:
                reader = csv.reader(costs_file, delimiter="\t")
                for line in reader:
                    kmerald_costs[(int(line[0]), int(line[1]))] = line[2]
        else:
            kmerald_costs = None
            calculated_costs = None
            splitted_strings = None

        def get_tag_or_default(aln, tag, default):
            if aln.bam_alignment.has_tag(tag):
                return aln.bam_alignment.get_tag(tag)
            else:
                return default

        for alignment in alignments:
            barcode = get_tag_or_default(alignment, "BX", "")
            hp = get_tag_or_default(alignment, "HP", -1)
            ps = get_tag_or_default(alignment, "PS", -1)
            try:
                ps = int(ps)
            except ValueError:
                raise ValueError(
                    f"Invalid PS tag value ({ps}) in read "
                    f"{alignment.bam_alignment.query_name}. PS must be an integer."
                )
            primary: bool = is_alignmentwsid_primary(alignment)
            sub_alignment_id: str = get_sub_alignment_id(
                alignment.bam_alignment, is_primary=primary
            )
            read = Read(
                alignment.bam_alignment.query_name,
                alignment.bam_alignment.mapq,
                alignment.source_id,
                numeric_sample_id,
                alignment.bam_alignment.reference_start,
                barcode,
                hp,
                ps,
                chromosome=alignment.bam_alignment.reference_name,
                sub_alignment_id=sub_alignment_id,
                is_supplementary=alignment.bam_alignment.is_supplementary,
                is_reverse=alignment.bam_alignment.is_reverse,
                reference_end=alignment.bam_alignment.reference_end,
            )

            if reference is None:
                while (
                    i < len(valid_positions)
                    and valid_positions[i] < alignment.bam_alignment.reference_start
                ):
                    i += 1
                detected = _detect_alleles(
                    normalized_variants, var_progress, i, alignment.bam_alignment
                )
            else:
                while (
                    i < len(normalized_variants)
                    and normalized_variants[i].position < alignment.bam_alignment.reference_start
                ):
                    i += 1
                detected = self.detect_alleles_by_alignment(
                    variants,
                    restricted_genotypes,
                    i,
                    alignment.bam_alignment,
                    reference,
                    self._overhang,
                    self._use_affine,
                    self._gap_start,
                    self._gap_extend,
                    self._default_mismatch,
                    self._use_kmerald,
                    kmerald_costs,
                    self._kmer_size,
                    self._kmerald_gappenalty,
                    self._kmerald_window,
                    calculated_costs,
                    splitted_strings,
                )

            for j, allele, quality in detected:
                read.add_variant(variants[j].position, allele, quality)
            if read:  # at least one variant covered and detected
                number_of_alignments += 1
                number_of_supplementary_alignments += alignment.bam_alignment.is_supplementary
                yield AlignedRead(
                    read,
                    alignment.bam_alignment.is_supplementary,
                    alignment.bam_alignment.is_reverse,
                    alignment.bam_alignment.reference_start,
                    alignment.bam_alignment.reference_end,
                )

        logger.info(f"Number of supplementary alignments: {number_of_supplementary_alignments}")

    def detect_non_overlapping_variants(self, variants: List[VcfVariant]):
        """Indices of variants that do not conflict with deletions or share a
        position with another variant (whatshap/variants.py:549-583)."""
        j = 0
        conflicting = set()
        seen_pos = set()
        while j < len(variants):
            v = variants[j]
            if v.position in seen_pos:
                conflicting.add(j)
                j += 1
                continue
            else:
                seen_pos.add(v.position)
            ref = len(v.reference_allele)
            max_del = max(ref - len(alt) for alt in v.get_alt_allele_list())
            if max_del > 0:
                deletion_end = v.position + ref
                if j + 1 < len(variants) and variants[j + 1].position < deletion_end:
                    conflicting.add(j)
                    while j + 1 < len(variants) and variants[j + 1].position < deletion_end:
                        j += 1
                        conflicting.add(j)
            j += 1
        return [j for j in range(len(variants)) if j not in conflicting]

    def build_var_progress(self, variants, j):
        """Progress tracker for the j-th variant, with per-allele targets."""
        v = VariantProgress(j)
        ref_len = len(variants[j].reference_allele)
        v.add_allele(len(variants[j].reference_allele), 0, 0)
        for i, alt in enumerate(variants[j].get_alt_allele_list()):
            alt_len = len(alt)
            match_target = min(ref_len, alt_len)
            ins_target = max(0, len(alt) - ref_len)
            del_target = max(0, ref_len - len(alt))
            v.add_allele(match_target, ins_target, del_target)
        return v

    @staticmethod
    def split_cigar_left(cigar, i, consumed):
        """Left part of a CIGAR split at (element i, consumed ops), yielded
        from the split point back to the beginning."""
        middle_op, middle_length = cigar[i]
        assert consumed <= middle_length
        if consumed > 0:
            yield middle_op, consumed
        for j in range(i - 1, -1, -1):
            yield cigar[j]

    @staticmethod
    def split_cigar_right(cigar, i, consumed):
        """Right part of the split, from the split point to the end."""
        middle_op, middle_length = cigar[i]
        if consumed < middle_length:
            yield middle_op, middle_length - consumed
        for j in range(i + 1, len(cigar)):
            yield cigar[j]

    @staticmethod
    def cigar_prefix_length(cigar, reference_bases: int):
        """How many query bases correspond to a prefix of the given number of
        reference bases?  Returns (reference_bases, query_bases); the former
        may be smaller if the CIGAR runs out (whatshap/variants.py:620-656)."""
        ref_pos = 0
        query_pos = 0
        for op, length in cigar:
            if op in (0, 7, 8):  # M, X, =
                ref_pos += length
                query_pos += length
                if ref_pos >= reference_bases:
                    return (reference_bases, query_pos + reference_bases - ref_pos)
            elif op == 2:  # D
                ref_pos += length
                if ref_pos >= reference_bases:
                    return (reference_bases, query_pos)
            elif op == 1:  # I
                query_pos += length
            elif op == 4 or op == 5:  # soft or hard clipping
                pass
            elif op == 3:  # N: always stop at reference skips
                return (reference_bases, query_pos)
            else:
                assert False, "unknown CIGAR operator"
        assert ref_pos < reference_bases
        return (ref_pos, query_pos)

    @staticmethod
    def realign(
        variant: VcfVariant,
        restricted_variants: Optional[Genotype],
        bam_read: AlignedSegment,
        cigartuples,
        i,
        consumed,
        query_pos,
        reference,
        overhang,
        use_affine,
        gap_start,
        gap_extend,
        default_mismatch,
        use_kmerald,
        kmerald_costs,
        kmer_size,
        kmerald_gappenalty,
        kmerald_window,
        calculated_costs,
        splitted_strings,
    ):
        """Realign the query around one variant to its REF/ALT haplotypes and
        pick the closer one (whatshap/variants.py:684-848)."""
        # Do not process symbolic alleles like <DEL>, <DUP>, etc.
        if any(alt.startswith("<") for alt in variant.get_alt_allele_list()):
            return None, None

        left_cigar_iterator = ReadSetReader.split_cigar_left(cigartuples, i, consumed)
        right_cigar_iterator = ReadSetReader.split_cigar_right(cigartuples, i, consumed)

        if use_kmerald:
            left_ref_bases, left_query_bases = ReadSetReader.cigar_prefix_length(
                left_cigar_iterator, int(kmerald_window)
            )
            right_ref_bases, right_query_bases = ReadSetReader.cigar_prefix_length(
                right_cigar_iterator, len(variant.reference_allele) + int(kmerald_window)
            )
            assert variant.position - left_ref_bases >= 0
            assert variant.position + right_ref_bases <= len(reference)
            query_temp = bam_read.query_sequence[
                query_pos - left_query_bases : query_pos + right_query_bases
            ]
            if query_temp in splitted_strings:
                query = splitted_strings[query_temp]
            else:
                query = enumerate_all_kmers(str(query_temp).encode("UTF-8"), int(kmer_size))
                splitted_strings[query_temp] = query

            ref_temp = reference[
                variant.position - left_ref_bases : variant.position + right_ref_bases
            ]
            if ref_temp in splitted_strings:
                ref = splitted_strings[ref_temp]
            else:
                ref = enumerate_all_kmers(str(ref_temp).encode("UTF-8"), int(kmer_size))
                splitted_strings[ref_temp] = ref

            alt_temp = (
                reference[variant.position - left_ref_bases : variant.position]
                + variant.alternative_allele
                + reference[
                    variant.position
                    + len(variant.reference_allele) : variant.position
                    + right_ref_bases
                ]
            )
            if alt_temp in splitted_strings:
                alt = splitted_strings[alt_temp]
            else:
                alt = enumerate_all_kmers(str(alt_temp).encode("UTF-8"), int(kmer_size))
                splitted_strings[alt_temp] = alt

            base_qual_score = 30
            if (ref_temp, query_temp) in calculated_costs:
                distance_ref = calculated_costs[(ref_temp, query_temp)]
            else:
                distance_ref = kmer_align(ref, query, kmerald_costs, kmerald_gappenalty)
                calculated_costs[(ref_temp, query_temp)] = distance_ref

            if (alt_temp, query_temp) in calculated_costs:
                distance_alt = calculated_costs[(alt_temp, query_temp)]
            else:
                distance_alt = kmer_align(alt, query, kmerald_costs, kmerald_gappenalty)
                calculated_costs[(alt_temp, query_temp)] = distance_alt

            if distance_ref < distance_alt:
                return 0, base_qual_score  # detected REF
            elif distance_ref > distance_alt:
                return 1, base_qual_score  # detected ALT
            else:
                return None, None  # cannot decide
        else:
            left_ref_bases, left_query_bases = ReadSetReader.cigar_prefix_length(
                left_cigar_iterator, overhang
            )
            right_ref_bases, right_query_bases = ReadSetReader.cigar_prefix_length(
                right_cigar_iterator, len(variant.reference_allele) + overhang
            )

            assert variant.position - left_ref_bases >= 0
            assert variant.position + right_ref_bases <= len(reference)

            query = bam_read.query_sequence[
                query_pos - left_query_bases : query_pos + right_query_bases
            ]
            pos = variant.position
            left_pad = reference[pos - left_ref_bases : pos]
            right_pad = reference[pos + len(variant.reference_allele) : pos + right_ref_bases]
            padded_alleles = [reference[pos - left_ref_bases : pos + right_ref_bases]]
            for alt in variant.get_alt_allele_list():
                padded_alleles.append(left_pad + alt + right_pad)

        if use_affine:
            assert gap_start is not None
            assert gap_extend is not None
            assert default_mismatch is not None
            base_qualities = [default_mismatch] * len(query)
            distances = [
                (i, edit_distance_affine_gap(query, allele, base_qualities, gap_start, gap_extend))
                for i, allele in enumerate(padded_alleles)
                if restricted_variants is None or i in restricted_variants.as_vector()
            ]
            distances.sort(key=lambda x: x[1])
            base_qual_score = (
                distances[0][1] - distances[1][1] if len(distances) > 1 else distances[0][1]
            )
        else:
            distances = [
                (i, edit_distance(query, allele))
                for i, allele in enumerate(padded_alleles)
                if restricted_variants is None or i in restricted_variants.as_vector()
            ]
            distances.sort(key=lambda x: x[1])
            base_qual_score = 30

        if len(distances) == 1 or distances[0][1] < distances[1][1]:
            return distances[0][0], base_qual_score
        else:
            return None, None  # cannot decide

    @staticmethod
    def detect_alleles_by_alignment(
        variants: List[VcfVariant],
        restricted_genotypes: Optional[List[Genotype]],
        j,
        bam_read: AlignedSegment,
        reference,
        overhang=10,
        use_affine=False,
        gap_start=None,
        gap_extend=None,
        default_mismatch=None,
        use_kmerald=False,
        kmerald_costs=None,
        kmer_size=7,
        kmerald_gappenalty=40,
        kmerald_window=25,
        calculated_costs=None,
        splitted_strings=None,
    ):
        """Yield (variant index, allele, quality) for variants covered by the
        given alignment, via realignment."""
        cigartuples = bam_read.cigartuples
        if not cigartuples:
            return

        for index, i, consumed, query_pos in _iterate_cigar(variants, j, bam_read, cigartuples):
            allele, quality = ReadSetReader.realign(
                variants[index],
                restricted_genotypes[index] if restricted_genotypes else None,
                bam_read,
                cigartuples,
                i,
                consumed,
                query_pos,
                reference,
                overhang,
                use_affine,
                gap_start,
                gap_extend,
                default_mismatch,
                use_kmerald,
                kmerald_costs,
                kmer_size,
                kmerald_gappenalty,
                kmerald_window,
                calculated_costs,
                splitted_strings,
            )
            num_alts = len(variants[index].get_alt_allele_list())
            if allele in range(num_alts + 1):
                yield (index, allele, quality)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        self._reader.close()


def merge_two_reads(read1: Read, read2: Read) -> Read:
    """Merge two reads that belong to the same haplotype (e.g. the two ends
    of a read pair); overlaps allowed (whatshap/variants.py:924-983)."""
    assert read1.is_sorted()
    assert read2.is_sorted()
    if read2:
        result = Read(
            read1.name,
            read1.mapqs[0],
            read1.source_id,
            read1.sample_id,
            read1.reference_start,
            read1.BX_tag,
            read1.HP_tag,
            read1.PS_tag,
        )
        result.add_mapq(read2.mapqs[0])
    else:
        return read1

    i1 = 0
    i2 = 0

    def add1():
        result.add_variant(read1[i1].position, read1[i1].allele, read1[i1].quality)

    def add2():
        result.add_variant(read2[i2].position, read2[i2].allele, read2[i2].quality)

    while i1 < len(read1) or i2 < len(read2):
        if i1 == len(read1):
            add2()
            i2 += 1
            continue
        if i2 == len(read2):
            add1()
            i1 += 1
            continue
        variant1 = read1[i1]
        variant2 = read2[i2]
        if variant2.position < variant1.position:
            add2()
            i2 += 1
        elif variant2.position > variant1.position:
            add1()
            i1 += 1
        else:
            # variant on self-overlapping read pair
            assert read1[i1].position == read2[i2].position
            if read1[i1].allele == read2[i2].allele:
                quality = read1[i1].quality + read2[i2].quality
                result.add_variant(read1[i1].position, read1[i1].allele, quality)
            else:
                if read1[i1].quality >= read2[i2].quality:
                    add1()
                else:
                    add2()
            i1 += 1
            i2 += 1
    return result


def merge_reads(*reads: Read) -> Read:
    """Merge multiple reads of the same haplotype into a single Read."""
    it = iter(reads)
    try:
        read = next(it)
    except StopIteration:
        raise ValueError("no reads to merge")
    assert read.is_sorted()
    for partner in it:
        read = merge_two_reads(read, partner)
    return read

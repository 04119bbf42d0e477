"""
Functions for reading and writing VCFs: VariantTable model, VcfReader,
PhasedVcfWriter, GenotypeVcfWriter.

Behavior parity with whatshap/vcf.py, built on the native VCF layer
(whatshap_tpu.io.vcflib) instead of pysam.
"""

import itertools
import logging
import math
import os
import sys
from abc import ABC, abstractmethod
from copy import deepcopy
from dataclasses import dataclass
from os import PathLike
from typing import (
    Dict,
    Iterable,
    Iterator,
    List,
    Optional,
    Sequence,
    Set,
    TextIO,
    Tuple,
    Union,
)

from .core import (
    Genotype,
    PhredGenotypeLikelihoods,
    Read,
    ReadSet,
    binomial_coefficient,
    get_max_genotype_alleles,
    get_max_genotype_ploidy,
)
from .io.vcflib import (
    VariantFile,
    VariantHeader,
    VariantRecord,
    VariantRecordSample,
)
from .utils import warn_once

logger = logging.getLogger(__name__)


class VcfError(Exception):
    pass


class VcfNotSortedError(VcfError):
    pass


class PloidyError(VcfError):
    pass


class VcfIndexMissing(VcfError):
    pass


class VcfInvalidChromosome(VcfError):
    pass


class VcfInvalidAllele(VcfError):
    pass


@dataclass
class VariantCallPhase:
    block_id: int  # numeric id of the phased block
    phase: Tuple[Optional[int], ...]  # alleles representing the phasing. (1, 0) is 1|0
    quality: Optional[int]


class VcfVariant(ABC):
    """A variant in a VCF file (not to be confused with core Variant)"""

    position: int
    reference_allele: str

    @abstractmethod
    def get_ref_allele(self):
        ...

    @abstractmethod
    def get_alt_allele(self):
        ...

    @abstractmethod
    def get_alt_allele_list(self):
        ...

    @abstractmethod
    def is_snv(self):
        ...

    @abstractmethod
    def normalized(self):
        ...


class BiallelicVcfVariant(VcfVariant):
    __slots__ = ("position", "reference_allele", "alternative_allele")

    def __init__(self, position: int, reference_allele: str, alternative_allele: str):
        """Multi-ALT sites are not modelled."""
        self.position = position
        self.reference_allele = reference_allele
        self.alternative_allele = alternative_allele

    def __repr__(self):
        return "BiallelicVcfVariant({}, {!r}, {!r})".format(
            self.position, self.reference_allele, self.alternative_allele
        )

    def __hash__(self):
        return hash((self.position, self.reference_allele, self.alternative_allele))

    def __eq__(self, other):
        return (
            (self.position == other.position)
            and (self.reference_allele == other.reference_allele)
            and (self.alternative_allele == other.alternative_allele)
        )

    def __lt__(self, other):
        return (self.position, self.reference_allele, self.alternative_allele) < (
            other.position,
            other.reference_allele,
            other.alternative_allele,
        )

    def get_ref_allele(self):
        return self.reference_allele

    def get_alt_allele(self):
        return self.alternative_allele

    def get_alt_allele_list(self):
        return [self.alternative_allele]

    def get_allele(self, a):
        if a == 0:
            return self.reference_allele
        elif a == 1:
            return self.alternative_allele
        else:
            raise VcfInvalidAllele(f"Querying invalid allele {a} (highest id was 1")

    def is_snv(self) -> bool:
        return (self.reference_allele != self.alternative_allele) and (
            len(self.reference_allele) == len(self.alternative_allele) == 1
        )

    def normalized(self) -> "BiallelicVcfVariant":
        """
        Return a normalized version of this variant.

        Common prefixes and/or suffixes between the reference and alternative
        allele are removed, and the position is adjusted as necessary.

        >>> BiallelicVcfVariant(100, 'GCTGTT', 'GCTAAATT').normalized()
        BiallelicVcfVariant(103, 'G', 'AAA')
        """
        pos, ref, alt = self.position, self.reference_allele, self.alternative_allele
        while len(ref) >= 1 and len(alt) >= 1 and ref[-1] == alt[-1]:
            ref, alt = ref[:-1], alt[:-1]
        while len(ref) >= 1 and len(alt) >= 1 and ref[0] == alt[0]:
            ref, alt = ref[1:], alt[1:]
            pos += 1
        return BiallelicVcfVariant(pos, ref, alt)


class MultiallelicVcfVariant(VcfVariant):
    __slots__ = ("position", "reference_allele", "alternative_alleles")

    def __init__(self, position: int, reference_allele: str, alternative_alleles: Sequence[str]):
        self.position = position
        self.reference_allele = reference_allele
        self.alternative_alleles = tuple(alternative_alleles)

    def __repr__(self):
        return "MultiallelicVcfVariant({}, {!r}, {!r})".format(
            self.position, self.reference_allele, self.alternative_alleles
        )

    def __hash__(self):
        return hash((self.position, self.reference_allele, self.alternative_alleles))

    def __eq__(self, other):
        return (
            (self.position == other.position)
            and (self.reference_allele == other.reference_allele)
            and (len(self.alternative_alleles) == len(other.alternative_alleles))
            and all(a == b for a, b in zip(self.alternative_alleles, other.alternative_alleles))
        )

    def __lt__(self, other):
        if (self.position, self.reference_allele) != (other.position, other.reference_allele):
            return (self.position, self.reference_allele) < (other.position, other.reference_allele)
        if len(self.alternative_alleles) != len(other.alternative_alleles):
            return len(self.alternative_alleles) < len(other.alternative_alleles)
        for alt_self, alt_other in zip(
            sorted(self.alternative_alleles), sorted(other.alternative_alleles)
        ):
            if alt_self != alt_other:
                return alt_self < alt_other
        return False

    def get_ref_allele(self):
        return self.reference_allele

    def get_alt_allele(self):
        return self.alternative_alleles[0]

    def get_alt_allele_list(self):
        return self.alternative_alleles

    def get_allele(self, a):
        if a == 0:
            return self.reference_allele
        else:
            return self.alternative_alleles[a - 1]

    def is_snv(self) -> bool:
        return any(self.reference_allele != alt for alt in self.alternative_alleles) and (
            len(self.reference_allele) == 1
            and all(len(alt) == 1 for alt in self.alternative_alleles)
        )

    def normalized(self) -> "MultiallelicVcfVariant":
        """Remove common prefixes/suffixes of REF and all ALTs."""
        pos, ref, alts = self.position, self.reference_allele, self.alternative_alleles
        while ref and all(alts) and all(ref[-1] == alt[-1] for alt in alts):
            ref, alts = ref[:-1], tuple(alt[:-1] for alt in alts)
        while ref and all(alts) and all(ref[0] == alt[0] for alt in alts):
            ref, alts = ref[1:], tuple(alt[1:] for alt in alts)
            pos += 1
        return MultiallelicVcfVariant(pos, ref, alts)


class GenotypeLikelihoods:
    __slots__ = "log_prob_genotypes"

    def __init__(self, log_prob_genotypes: List[float]):
        """Likelihoods of all genotypes given as log10 probabilities."""
        self.log_prob_genotypes = log_prob_genotypes

    def __repr__(self):
        return f"GenotypeLikelihoods({self.log_prob_genotypes})"

    def __eq__(self, other):
        if other is None:
            return False
        if self.log_prob_genotypes is None and other.log_prob_genotypes is None:
            return True
        return self.log_prob_genotypes == other.log_prob_genotypes

    def log10_probs(self) -> List[float]:
        return self.log_prob_genotypes

    def log10_prob_of(self, genotype_index: int) -> float:
        return self.log10_probs()[genotype_index]

    def as_phred(
        self, ploidy: int = 2, regularizer: Optional[float] = None
    ) -> PhredGenotypeLikelihoods:
        if regularizer is None:
            # shift log likelihoods such that the largest one is zero
            m = max(self.log_prob_genotypes)
            return PhredGenotypeLikelihoods(
                [round((prob - m) * -10) for prob in self.log_prob_genotypes], ploidy=ploidy
            )
        else:
            p = [10**x for x in self.log_prob_genotypes]
            s = sum(p)
            p = [x / s + regularizer for x in p]
            m = max(p)
            return PhredGenotypeLikelihoods(
                [round(-10 * math.log10(x / m)) for x in p], ploidy=ploidy
            )


class VariantTable:
    """
    For a single chromosome, store variants and their genotypes.  Each row of
    this table contains a variant, each column the genotypes of one sample.
    """

    def __init__(self, chromosome: str, samples: List[str]):
        self.chromosome = chromosome
        self.samples = samples
        self.genotypes: List[List[Genotype]] = [[] for _ in samples]
        self.phases: List[List[Optional[VariantCallPhase]]] = [[] for _ in samples]
        self.allele_depths: List[List[Optional[int]]] = [[] for _ in samples]
        self.genotype_likelihoods: List[List[Optional[GenotypeLikelihoods]]] = [[] for _ in samples]
        self.variants: List[VcfVariant] = []
        self._sample_to_index = {sample: index for index, sample in enumerate(samples)}

    def __len__(self) -> int:
        return len(self.variants)

    def add_variant(
        self,
        variant: VcfVariant,
        genotypes: Sequence[Genotype],
        phases: Sequence[Optional[VariantCallPhase]],
        genotype_likelihoods: Sequence[Optional[GenotypeLikelihoods]],
        allele_depths: Sequence[Optional[int]],
    ) -> None:
        """Add a row to the table"""
        if len(genotypes) != len(self.genotypes):
            raise ValueError("Expecting as many genotypes as there are samples")
        if len(phases) != len(self.phases):
            raise ValueError("Expecting as many phases as there are samples")
        if len(allele_depths) != len(self.allele_depths):
            raise ValueError("Expecting as many allele_depths as there are samples")
        self.variants.append(variant)
        for i, genotype in enumerate(genotypes):
            assert isinstance(genotype, Genotype)
            self.genotypes[i].append(genotype)
        for i, phase in enumerate(phases):
            self.phases[i].append(phase)
        for i, gl in enumerate(genotype_likelihoods):
            self.genotype_likelihoods[i].append(gl)
        for i, depth in enumerate(allele_depths):
            self.allele_depths[i].append(depth)

    def genotypes_of(self, sample: str) -> List[Genotype]:
        return self.genotypes[self._sample_to_index[sample]]

    def set_genotypes_of(self, sample: str, genotypes: List[Genotype]) -> None:
        assert len(genotypes) == len(self.variants)
        self.genotypes[self._sample_to_index[sample]] = genotypes

    def genotype_likelihoods_of(self, sample: str) -> List[Optional[GenotypeLikelihoods]]:
        return self.genotype_likelihoods[self._sample_to_index[sample]]

    def set_genotype_likelihoods_of(
        self, sample: str, genotype_likelihoods: List[Optional[GenotypeLikelihoods]]
    ) -> None:
        assert len(genotype_likelihoods) == len(self.variants)
        self.genotype_likelihoods[self._sample_to_index[sample]] = genotype_likelihoods

    def phases_of(self, sample: str) -> List[Optional[VariantCallPhase]]:
        return self.phases[self._sample_to_index[sample]]

    def num_of_blocks_of(self, sample: str) -> int:
        return len(
            {i.block_id for i in self.phases[self._sample_to_index[sample]] if i is not None}
        )

    def allele_depths_of(self, sample: str) -> List[Tuple[int, ...]]:
        depths: List[Tuple[int, ...]] = []
        for depth_code in self.allele_depths[self._sample_to_index[sample]]:
            assert depth_code is not None
            c = depth_code
            depth = []
            while c > 0:
                depth.append(c & 4095)
                c = c >> 12
            depths.append(tuple(depth))
        return depths

    def id_of(self, sample: str) -> int:
        return self._sample_to_index[sample]

    def remove_rows_by_index(self, indices: Iterable[int]) -> None:
        """Remove variants given by their index in the variant list"""
        for i in sorted(indices, reverse=True):
            del self.variants[i]
            for gt in self.genotypes:
                del gt[i]
            for ad in self.allele_depths:
                del ad[i]
            for ph in self.phases:
                del ph[i]
            for gl in self.genotype_likelihoods:
                del gl[i]

        for gt in self.genotypes:
            assert len(self.variants) == len(gt)
        for ph in self.phases:
            assert len(self.variants) == len(ph)
        for gl in self.genotype_likelihoods:
            assert len(self.variants) == len(gl)
        assert (
            len(self.samples)
            == len(self.genotypes)
            == len(self.phases)
            == len(self.genotype_likelihoods)
        )

    def subset_rows_by_position(self, positions: Iterable[int]) -> None:
        """Keep only rows given in positions, discard the rest"""
        positions = frozenset(positions)
        to_discard = [i for i, v in enumerate(self.variants) if v.position not in positions]
        self.remove_rows_by_index(to_discard)

    def create_subtable(self, samples: List[str]) -> "VariantTable":
        """Keep only the given samples; return as a new table"""
        subtable = VariantTable(self.chromosome, samples)
        subtable.variants = deepcopy(self.variants)
        subtable._sample_to_index = {sample: index for index, sample in enumerate(samples)}
        for i, sample in enumerate(samples):
            subtable.genotypes[i] = deepcopy(self.genotypes_of(sample))
            subtable.phases[i] = deepcopy(self.phases_of(sample))
            subtable.genotype_likelihoods[i] = deepcopy(self.genotype_likelihoods_of(sample))
            subtable.allele_depths[i] = deepcopy(self.allele_depths[self._sample_to_index[sample]])
        return subtable

    def phased_blocks_as_reads(
        self,
        sample: str,
        input_variants: Iterable[VcfVariant],
        source_id: int,
        numeric_sample_id: int,
        default_quality: int = 20,
        mapq: int = 100,
        target_ploidy: int = 2,
    ):
        """
        Yields one sorted core Read object per phased block, encoding the
        phase information as if the block was a single sequencing read.
        """
        try:
            sample_index = self._sample_to_index[sample]
        except KeyError:
            return
        input_variant_set = set(input_variants)
        read_map: Dict[int, List[Read]] = {}
        assert (
            len(self.variants)
            == len(self.genotypes[sample_index])
            == len(self.phases[sample_index])
        )
        for variant, genotype, phase in zip(
            self.variants, self.genotypes[sample_index], self.phases[sample_index]
        ):
            if len(genotype.as_vector()) != target_ploidy:
                continue
            if variant not in input_variant_set:
                continue
            if genotype.is_homozygous():
                continue
            if phase is None or phase.phase[0] is None:
                continue
            quality = default_quality if phase.quality is None else phase.quality
            if phase.block_id in read_map:
                for i, allele in enumerate(phase.phase):
                    read_map[phase.block_id][i].add_variant(variant.position, allele, quality)
            else:
                read_map[phase.block_id] = []
                for i, allele in enumerate(phase.phase):
                    name = f"{sample}_phase_{i}_block_{phase.block_id}"
                    r = Read(name, mapq, source_id, numeric_sample_id)
                    r.add_variant(variant.position, allele, quality)
                    read_map[phase.block_id].append(r)
        for read_list in read_map.values():
            for read in read_list:
                if len(read) > 1:
                    read.sort()
                    yield read


class MixedPhasingError(Exception):
    pass


class VcfReader:
    """Read a VCF file chromosome by chromosome."""

    def __init__(
        self,
        path: Union[str, PathLike],
        only_snvs: bool = False,
        phases: bool = False,
        genotype_likelihoods: bool = False,
        ignore_genotypes: bool = False,
        ploidy: Optional[int] = None,
        mav: bool = False,
        allele_depth: bool = False,
    ):
        self._only_snvs = only_snvs
        self._vcf_reader = VariantFile(os.fspath(path))
        self._path = path
        self._phases = phases
        self._genotype_likelihoods = genotype_likelihoods
        self._ignore_genotypes = ignore_genotypes
        self.samples = list(self._vcf_reader.header.samples)  # intentionally public
        self.contigs = self._vcf_reader.header.contigs
        self.ploidy = ploidy
        self.mav = mav
        self.allele_depth = allele_depth
        logger.debug("Found %d sample(s) in the VCF file.", len(self.samples))

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        self._vcf_reader.close()

    @property
    def path(self) -> str:
        return self._vcf_reader.filename.decode()

    def index_exists(self) -> bool:
        return self._vcf_reader.index is not None

    def _fetch(self, chromosome: str, start: int = 0, end: Optional[int] = None):
        try:
            records = self._vcf_reader.fetch(chromosome, start=start, stop=end)
        except ValueError as e:
            if "invalid contig" in e.args[0]:
                raise VcfInvalidChromosome(e.args[0]) from None
            elif "fetch requires an index" in e.args[0]:
                raise VcfIndexMissing(
                    f"{self._path} is missing an index (.tbi or .csi)"
                ) from None
            else:
                raise
        return records

    def fetch(self, chromosome: str, start: int = 0, end: Optional[int] = None) -> VariantTable:
        """Fetch records from a single chromosome, optionally restricted to
        a region.  Return a VariantTable object."""
        records = list(self._fetch(chromosome, start=start, end=end))
        return self._process_single_chromosome(chromosome, records)

    def fetch_regions(
        self, chromosome: str, regions: Iterable[Tuple[int, Optional[int]]]
    ) -> VariantTable:
        records = []
        for start, end in regions:
            records.extend(list(self._fetch(chromosome, start=start, end=end)))
        return self._process_single_chromosome(chromosome, records)

    def __iter__(self) -> Iterator[VariantTable]:
        """Yield VariantTable objects for each chromosome."""
        for chromosome, records in itertools.groupby(
            self._vcf_reader, lambda record: record.chrom
        ):
            yield self._process_single_chromosome(chromosome, records)

    @staticmethod
    def _extract_HP_phase(call: VariantRecordSample) -> Optional[VariantCallPhase]:
        hp = call.get("HP")
        if hp is None or hp == (".",):
            return None
        if isinstance(hp, str):
            hp = (hp,)
        fields = [[int(x) for x in s.split("-")] for s in hp]
        for i in range(len(fields)):
            assert fields[0][0] == fields[i][0]
        block_id = fields[0][0]
        order = [field[1] - 1 for field in fields]
        phase = call["GT"]
        phase = tuple(phase[order.index(i)] for i in range(len(order)))
        return VariantCallPhase(block_id=block_id, phase=phase, quality=call.get("PQ", None))

    @staticmethod
    def _extract_GT_PS_phase(call: VariantRecordSample) -> Optional[VariantCallPhase]:
        if not call.phased:
            return None
        is_het = not all(x == call["GT"][0] for x in call["GT"])
        if not is_het:
            return None
        block_id = call.get("PS", 0)
        phase = call["GT"]
        return VariantCallPhase(block_id=block_id, phase=phase, quality=call.get("PQ", None))

    @staticmethod
    def _extract_AD_depth(call: VariantRecordSample) -> int:
        """Allele depths packed 12 bits per allele (max 4095)."""
        depths = call.get("AD")
        if isinstance(depths, int):
            depths = (depths,)
        depth_code = 0
        if depths and None not in depths:
            for depth in reversed(depths):
                if depth > 4095:
                    warn_once(
                        logger,
                        "Allele depths of 4096 or higher detected. Cutting them off to 4095",
                    )
                cnt = min(4095, depth)
                depth_code = (depth_code << 12) + cnt
        return depth_code

    def _process_single_chromosome(self, chromosome: str, records) -> VariantTable:
        phase_detected = None
        n_snvs = 0
        n_other = 0
        n_multi = 0
        table = VariantTable(chromosome, self.samples)
        prev_position = None
        for record in records:
            if not record.alts:
                continue
            if len(record.alts) > 1:
                n_multi += 1
                if not self.mav or len(record.alts) >= get_max_genotype_alleles():
                    continue

            pos, ref, alts = record.start, str(record.ref), [str(alt) for alt in record.alts]
            if len(ref) == 1 and all(len(alt) == 1 for alt in alts):
                n_snvs += 1
            else:
                n_other += 1
                if self._only_snvs:
                    continue

            if (prev_position is not None) and (prev_position > pos):
                raise VcfNotSortedError(
                    "VCF not ordered: {}:{} appears before {}:{}".format(
                        chromosome, prev_position + 1, chromosome, pos + 1
                    )
                )

            if prev_position == pos:
                warn_once(
                    logger, "Skipping duplicated position %s on chromosome %r", pos + 1, chromosome
                )
                continue
            prev_position = pos

            # Phasing information (GT/PS or HP, but not mixed), if requested
            if self._phases:
                phases = []
                for call in record.samples.values():
                    phase = None
                    for extract_phase, phase_name in [
                        (self._extract_HP_phase, "HP"),
                        (self._extract_GT_PS_phase, "GT_PS"),
                    ]:
                        p = extract_phase(call)
                        if p is not None:
                            if phase_detected is None:
                                phase_detected = phase_name
                            elif phase_detected != phase_name:
                                raise MixedPhasingError(
                                    "Mixed phasing information in input VCF (e.g. mixing PS "
                                    "and HP fields)"
                                )
                            phase = p
                            phase_ploidy = len(p.phase)
                            if phase_ploidy > get_max_genotype_ploidy():
                                raise PloidyError(
                                    "Ploidies higher than {} are not supported."
                                    "".format(get_max_genotype_ploidy())
                                )
                            elif p is None or p.block_id is None or p.phase is None:
                                pass
                            elif self.ploidy is None:
                                self.ploidy = phase_ploidy
                            elif phase_ploidy != self.ploidy:
                                raise PloidyError(
                                    "Phasing information contains inconsistent ploidy ({} and "
                                    "{})".format(self.ploidy, phase_ploidy)
                                )
                    phases.append(phase)
            else:
                phases = [None] * len(record.samples)

            # Genotype likelihoods, if requested
            if self._genotype_likelihoods:
                genotype_likelihoods: List[Optional[GenotypeLikelihoods]] = []
                for call in record.samples.values():
                    GL = call.get("GL", None)
                    PL = call.get("PL", None)
                    # Prefer GLs (floats) over PLs (ints) if both are present
                    if GL is not None:
                        if not isinstance(GL, tuple):
                            GL = (GL,)
                        genotype_likelihoods.append(GenotypeLikelihoods(list(GL)))
                    elif PL is not None:
                        if not isinstance(PL, tuple):
                            PL = (PL,)
                        likelihoods = [(pl / -10) if pl is not None else None for pl in PL]
                        genotype_likelihoods.append(GenotypeLikelihoods(likelihoods))
                    else:
                        genotype_likelihoods.append(None)
            else:
                genotype_likelihoods = [None] * len(record.samples)

            if not self._ignore_genotypes:
                genotype_lists = [call.get("GT", None) for call in record.samples.values()]
                for geno in genotype_lists:
                    if geno is None or None in geno:
                        continue
                    geno_ploidy = len(geno)
                    if geno_ploidy > get_max_genotype_ploidy():
                        raise PloidyError(
                            "Ploidies higher than {} are not supported."
                            "".format(get_max_genotype_ploidy())
                        )
                    elif self.ploidy is None:
                        self.ploidy = geno_ploidy
                    elif geno_ploidy != self.ploidy:
                        raise PloidyError(
                            "Inconsistent ploidy ({} and {})".format(self.ploidy, geno_ploidy)
                        )
                genotypes = [genotype_code(geno_list) for geno_list in genotype_lists]
            else:
                genotypes = [Genotype([]) for _ in self.samples]
                phases = [None] * len(self.samples)

            if self.allele_depth:
                depths: List[Optional[int]] = [
                    self._extract_AD_depth(call) for call in record.samples.values()
                ]
            else:
                depths = [None] * len(record.samples)

            if len(alts) == 1:
                variant: VcfVariant = BiallelicVcfVariant(
                    position=pos, reference_allele=ref, alternative_allele=alts[0]
                )
            else:
                variant = MultiallelicVcfVariant(
                    position=pos, reference_allele=ref, alternative_alleles=alts
                )
            table.add_variant(variant, genotypes, phases, genotype_likelihoods, depths)

        logger.debug(
            "Parsed %s SNVs and %s non-SNVs. Also found %s multi-ALTs.", n_snvs, n_other, n_multi
        )
        return table


def remove_overlapping_calls(calls):
    """Filter out overlapping variants (currently a no-op, as in the
    reference: whatshap/vcf.py:806-821)."""
    return calls


@dataclass
class VcfHeader:
    format_or_info: str
    id: str
    number: Union[str, int]
    typ: str
    description: str

    def line(self):
        return (
            "##{format_or_info}=<ID={id},Number={number},Type={typ},"
            'Description="{description}">'.format(
                format_or_info=self.format_or_info,
                id=self.id,
                number=self.number,
                typ=self.typ,
                description=self.description,
            )
        )


PREDEFINED_FORMATS = {
    "GL": VcfHeader(
        "FORMAT",
        "GL",
        "G",
        "Float",
        "Genotype Likelihood, log10-scaled likelihoods of the data given the"
        " called genotype for each possible genotype generated from the"
        " reference and alternate alleles given the sample ploidy",
    ),
    "GQ": VcfHeader("FORMAT", "GQ", 1, "Integer", "Phred-scaled genotype quality"),
    "GT": VcfHeader("FORMAT", "GT", 1, "String", "Genotype"),
    "HP": VcfHeader("FORMAT", "HP", ".", "String", "Phasing haplotype identifier"),
    "PQ": VcfHeader("FORMAT", "PQ", 1, "Float", "Phasing quality"),
    "PS": VcfHeader("FORMAT", "PS", 1, "Integer", "Phase set identifier"),
    "HS": VcfHeader("FORMAT", "HS", ".", "Integer", "Haploid phase set identifier"),
    "AD": VcfHeader("FORMAT", "AD", ".", "Integer", "Observed allele depths"),
}

PREDEFINED_INFOS = {
    "AC": VcfHeader(
        "INFO",
        "AC",
        "A",
        "Integer",
        "Allele count in genotypes, for each ALT allele, in the same order as listed",
    ),
    "AN": VcfHeader("INFO", "AN", "A", "Integer", "Total number of alleles in called genotypes"),
    "END": VcfHeader("INFO", "END", 1, "Integer", "Stop position of the interval"),
    "SVLEN": VcfHeader(
        "INFO", "SVLEN", ".", "Integer", "Difference in length between REF and ALT alleles"
    ),
    "SVTYPE": VcfHeader("INFO", "SVTYPE", 1, "String", "Type of structural variant"),
}


def augment_header(header: VariantHeader, contigs: List[str], formats: List[str], infos: List[str]):
    """Add contigs, formats and infos to a VariantHeader (in place)."""
    for contig in contigs:
        header.add_contig(contig)

    for fmt in formats:
        if fmt in header.formats:
            header.remove_format(fmt)
        try:
            h = PREDEFINED_FORMATS[fmt]
        except KeyError:
            raise VcfError(f"FORMAT {fmt!r} not defined in VCF header") from None
        header.add_line(h.line())

    for info in infos:
        try:
            h = PREDEFINED_INFOS[info]
        except KeyError:
            raise VcfError(f"INFO {info!r} not defined in VCF header") from None
        header.add_line(h.line())


def missing_headers(path: str) -> Tuple[List[str], List[str], List[str]]:
    """Find contigs, FORMATs and INFOs used in the body of a VCF but missing
    from (or mistyped in) its header."""
    with VariantFile(path) as variant_file:
        header = variant_file.header.copy()
        incorrect_formats = []
        for fmt, v in variant_file.header.formats.items():
            if fmt not in PREDEFINED_FORMATS:
                continue
            h = PREDEFINED_FORMATS[fmt]
            if str(v.number) != str(h.number) or (
                v.type != h.typ and not (v.type == "Float" and h.typ == "Integer")
            ):
                if fmt == "PS" and v.type != h.typ:
                    raise VcfError(
                        "The input VCF/BCF contains phase set ('PS') tags that are of the"
                        " non-standard type '{}' instead of 'Integer'. WhatsHap cannot"
                        " overwrite these as it could produce inconsistent files."
                        " To proceed, you can use 'whatshap unphase' to remove phasing"
                        " information from the input file".format(v.type)
                    )
                incorrect_formats.append(fmt)

        contigs = dict()  # encountered contigs, in order
        formats = dict()  # encountered FORMATs, in order
        seen_infos: Set[str] = set()
        try:
            for record in variant_file:
                seen_infos.update(record.info)
                if any(alt.startswith("<") for alt in record.alts or []):
                    seen_infos.add("END")
                contigs[record.contig] = None
                for fmt in record.format:
                    formats[fmt] = None
        except ValueError as e:
            raise VcfError(e)

    header_contigs = set(header.contigs)
    missing_contigs = [contig for contig in contigs if contig not in header_contigs]
    header_formats = set(header.formats)
    missing_formats = [fmt for fmt in formats if fmt not in header_formats]
    missing_infos = list(set(seen_infos) - set(header.infos))
    return (missing_contigs, incorrect_formats + missing_formats, missing_infos)


@dataclass
class GenotypeChange:
    sample: str
    chromosome: str
    variant: VcfVariant
    old_gt: Genotype
    new_gt: Genotype


class VcfAugmenter(ABC):
    def __init__(
        self,
        in_path: str,
        command_line: Optional[str],
        out_file: TextIO = sys.stdout,
        include_haploid_phase_sets: bool = False,
    ):
        """
        in_path -- Path to input VCF, used as template.
        command_line -- A string added as a VCF header entry (None to skip).
        out_file -- Open file-like object (or path) to which VCF is written.
        """
        logger.debug("Reading the input VCF to find possibly missing headers")
        contigs, formats, infos = missing_headers(in_path)
        logger.debug("Missing contigs: %s", contigs)
        logger.debug("Missing formats: %s", formats)
        logger.debug("Missing infos: %s", infos)
        if include_haploid_phase_sets and "HS" not in formats:
            formats.append("HS")
        self._reader = VariantFile(in_path)
        augment_header(self._reader.header, contigs, formats, infos)
        if command_line is not None:
            command_line = '"' + command_line.replace('"', "") + '"'
            self._reader.header.add_meta("commandline", command_line)
        self.setup_header(self._reader.header)
        self._writer = VariantFile(out_file, mode="w", header=self._reader.header)
        self._unprocessed_record: Optional[VariantRecord] = None
        self._reader_iter = iter(self._reader)

    @abstractmethod
    def setup_header(self, header):
        ...

    def close(self):
        self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    @property
    def samples(self) -> List[str]:
        return list(self._reader.header.samples)

    def _record_modifier(self, chromosome: str):
        for record in self._iterrecords(chromosome):
            yield record
            self._writer.write(record)

    def _iterrecords(self, chromosome: str) -> Iterable[VariantRecord]:
        """Yield all records for the target chromosome"""
        n = 0
        if self._unprocessed_record is not None:
            assert self._unprocessed_record.chrom == chromosome
            yield self._unprocessed_record
            n += 1
        for record in self._reader_iter:
            n += 1
            if record.chrom != chromosome:
                self._unprocessed_record = record
                assert n != 1
                return
            yield record

    def write_unchanged(self, chromosome: str) -> None:
        for record in self._iterrecords(chromosome):
            self._writer.write(record)


class PhasedVcfWriter(VcfAugmenter):
    """Read in a VCF file and write it back out with added phasing
    information (PS or HP tags)."""

    def __init__(
        self,
        in_path: str,
        command_line: Optional[str],
        out_file: TextIO = sys.stdout,
        tag: str = "PS",
        ploidy: int = 2,
        include_haploid_sets: bool = False,
        only_snvs: bool = False,
        mav: bool = False,
    ):
        if tag not in ("HP", "PS"):
            raise ValueError('Tag must be either "HP" or "PS"')
        self.tag = tag
        self.ploidy = ploidy
        super().__init__(in_path, command_line, out_file, include_haploid_sets)
        self._phase_tag_found_warned = False
        self._set_phasing_tags = self._set_HP if tag == "HP" else self._set_PS
        self._only_snvs = only_snvs
        self._mav = mav

    def setup_header(self, header: VariantHeader):
        """Called by baseclass constructor"""
        header.remove_meta_key("phasing")
        header.add_line(PREDEFINED_FORMATS[self.tag].line())

    def _set_HP(
        self,
        call: VariantRecordSample,
        component: int,
        phase: Tuple[int, ...],
        haploid_component: Optional[Iterable[int]] = None,
    ):
        assert all(allele in [0, 1] or self._mav for allele in phase)
        call["HP"] = ",".join(f"{component + 1}-{allele + 1}" for allele in phase)
        if haploid_component:
            call["HS"] = [comp + 1 for comp in haploid_component]

    def _set_PS(
        self,
        call: VariantRecordSample,
        component: int,
        phase: Tuple[int, ...],
        haploid_component: Optional[Iterable[int]] = None,
    ):
        assert all(allele in [0, 1] or self._mav for allele in phase)
        call["PS"] = component + 1
        call["GT"] = phase
        if haploid_component:
            call["HS"] = [comp + 1 for comp in haploid_component]
        call.phased = True

    def write(
        self,
        chromosome: str,
        sample_superreads: Dict[str, ReadSet],
        sample_components: Dict,
        sample_haploid_components=None,
    ):
        """
        Add phasing information to all variants on a single chromosome.

        sample_components maps sample -> {variant position -> component id}
        where a component is identified by the position of its left-most
        variant.  Returns a list of GenotypeChange objects.
        """
        genotype_changes = []
        sample_phases: Dict[str, Dict] = dict()
        sample_genotypes: Dict[str, Dict] = dict()
        for sample, superreads in sample_superreads.items():
            sample_phases[sample] = {}
            sample_genotypes[sample] = {}
            for variants in zip(*superreads):
                phasing = tuple(v.allele for v in variants)
                allowed_alleles = all(
                    allele in [0, 1] or self._mav for allele in phasing
                )
                if allowed_alleles:
                    sample_phases[sample][variants[0].position] = phasing
                    sample_genotypes[sample][variants[0].position] = Genotype(list(phasing))

        prev_pos = None
        for record in self._record_modifier(chromosome):
            self._remove_existing_phasing(record, list(sample_superreads))
            pos = record.start
            if not record.alts:
                continue
            if len(record.alts) > 1 and not self._mav:
                continue
            if pos == prev_pos:
                continue
            is_snv = len(str(record.ref)) == 1 and len(str(record.alts[0])) == 1
            if self._only_snvs and not is_snv:
                continue

            # Determine whether the variant is phased in any sample
            for sample in self.samples:
                if sample in sample_superreads:
                    components = sample_components[sample]
                    phases = sample_phases[sample]
                    if pos in components and pos in phases:
                        break
            else:
                continue

            # Set phase tag for all target samples
            for sample in sample_superreads:
                call = record.samples[sample]
                components = sample_components[sample]
                haploid_components = (
                    sample_haploid_components[sample] if sample_haploid_components else None
                )
                phases = sample_phases[sample]
                genotypes = sample_genotypes[sample]

                if (
                    self.tag in call
                    and call[self.tag] is not None
                    and not self._phase_tag_found_warned
                ):
                    logger.warning(
                        "Ignoring existing phasing information "
                        "found in input VCF ({} tag exists).".format(self.tag)
                    )
                    self._phase_tag_found_warned = True

                gt_type = genotype_code(call["GT"])
                is_het = not gt_type.is_homozygous()

                # is genotype to be changed?
                if pos in genotypes and genotypes[pos] != gt_type:
                    call["GT"] = tuple(genotypes[pos].as_vector())
                    variant: VcfVariant
                    if len(record.alts) > 1:
                        variant = MultiallelicVcfVariant(record.start, record.ref, record.alts)
                    else:
                        variant = BiallelicVcfVariant(record.start, record.ref, record.alts[0])
                    genotype_changes.append(
                        GenotypeChange(sample, chromosome, variant, gt_type, genotypes[pos])
                    )
                    is_het = not genotypes[pos].is_homozygous()

                if pos in components and pos in phases and is_het:
                    haploid_component = (
                        haploid_components[pos]
                        if (
                            haploid_components
                            and pos in haploid_components
                            and len(haploid_components[pos]) == self.ploidy
                        )
                        else None
                    )
                    self._set_phasing_tags(call, components[pos], phases[pos], haploid_component)
                else:
                    # Unphased
                    call[self.tag] = None
            prev_pos = pos
        return genotype_changes

    def _remove_existing_phasing(self, record: VariantRecord, samples: Iterable[str]):
        if self.tag == "PS":
            for sample in samples:
                call = record.samples[sample]
                if "GT" not in call:
                    continue
                call.phased = False
                if call["GT"] is not None and all(allele is not None for allele in call["GT"]):
                    call["GT"] = tuple(sorted(call["GT"]))


def genotype_code(gt: Optional[Tuple[Optional[int], ...]]) -> Genotype:
    """Return genotype encoded as a core Genotype object"""
    if gt is None:
        result = Genotype([])
    elif any(allele is None for allele in gt):
        result = Genotype([])
    else:
        result = Genotype([allele for allele in gt])
    return result


class GenotypeVcfWriter(VcfAugmenter):
    """Read in a VCF file and write it back out with added genotyping
    information (GT/GQ/GL)."""

    def __init__(self, in_path: str, command_line: Optional[str], out_file: TextIO = sys.stdout):
        super().__init__(in_path, command_line, out_file)

    def setup_header(self, header: VariantHeader):
        """Called by baseclass constructor"""
        header.add_line(
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype computed by WhatsHap genotyping algorithm">'
        )
        header.add_line(
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Phred-scaled genotype quality computed by WhatsHap genotyping algorithm">'
        )
        header.add_line(
            '##FORMAT=<ID=GL,Number=G,Type=Float,Description="Log10-scaled likelihoods for genotypes: 0/0, 0/1, 1/1, computed by WhatsHap genotyping algorithm">'
        )

    def write_genotypes(
        self, chromosome: str, variant_table: VariantTable, only_snvs, ploidy: int = 2
    ) -> None:
        """Add genotyping information to all variants on a single chromosome."""
        genotyped_variants = dict()
        for i in range(len(variant_table)):
            genotyped_variants[variant_table.variants[i].position] = i

        GT_GL_GQ = frozenset(["GT", "GL", "GQ"])
        for record in self._record_modifier(chromosome):
            pos = record.start
            if not record.alts:
                continue

            for sample, call in record.samples.items():
                geno = Genotype([])
                n_alleles = 1 + len(record.alts)
                n_genotypes = binomial_coefficient(ploidy + n_alleles - 1, n_alleles - 1)
                geno_l = [1 / n_genotypes] * int(n_genotypes)

                if pos in genotyped_variants:
                    likelihoods = variant_table.genotype_likelihoods_of(sample)[
                        genotyped_variants[pos]
                    ]
                    # likelihoods can be 'None' if position was not accessible
                    if likelihoods is not None:
                        geno_l = [l for l in likelihoods]
                        geno = variant_table.genotypes_of(sample)[genotyped_variants[pos]]

                # Compute GQ
                geno_index = geno.get_index()
                geno_q = sum(geno_l[i] for i in range(n_genotypes) if i != geno_index)

                call["GT"] = tuple(geno.as_vector())
                call["GL"] = [max(math.log10(j), -1000) if j > 0 else -1000 for j in geno_l]

                # store quality as phred score
                if not geno.is_none():
                    assert geno_q is not None
                    if geno_q > 0:
                        call["GQ"] = min(round(-10.0 * math.log10(geno_q)), 10000)
                    else:
                        call["GQ"] = 10000
                else:
                    call["GQ"] = None

                record.qual = None

                # delete all other genotype information present before
                for tag in set(call.keys()) - GT_GL_GQ:
                    del call[tag]

"""
Sample-aware BAM readers (parity with whatshap/bam.py): SampleBamReader
filters alignments by read-group -> sample mapping; MultiBamReader
heap-merges several sorted BAMs on the fly.
"""

import heapq
import logging
import os
from abc import ABC
from collections import defaultdict
from dataclasses import dataclass
from typing import Iterable, Optional
from urllib.parse import urlparse

from .io.sam import AlignedSegment, AlignmentFile

logger = logging.getLogger(__name__)


@dataclass
class AlignmentWithSourceID:
    source_id: int
    bam_alignment: AlignedSegment


class AlignmentFileNotIndexedError(Exception):
    pass


class SampleNotFoundError(Exception):
    pass


class ReferenceNotFoundError(Exception):
    pass


class EmptyAlignmentFileError(Exception):
    pass


def is_local(path):
    return urlparse(path).scheme == ""


class BamReader(ABC):
    pass


class SampleBamReader(BamReader):
    """Provides only those reads from a BAM file that belong to a specified
    sample.  The BAM file must have an index."""

    def __init__(self, path: str, *, source_id: int = 0, reference: Optional[str] = None):
        self.source_id: int = source_id
        if reference:
            reference = os.path.abspath(reference)
        self._samfile = AlignmentFile(path, reference_filename=reference)
        try:
            fetcher = self._samfile.fetch()
        except ValueError:
            raise AlignmentFileNotIndexedError(path)
        try:
            next(fetcher)
        except StopIteration:
            raise EmptyAlignmentFileError(path) from None
        self._references = frozenset(self._samfile.references)
        self._initialize_sample_to_group_ids()

    def has_reference(self, name: str) -> bool:
        return name in self._references

    def _initialize_sample_to_group_ids(self) -> None:
        read_groups = self._samfile.header.to_dict().get("RG", [])
        logger.debug("Read groups in CRAM/BAM header: %s", read_groups)
        samples = defaultdict(list)
        for read_group in read_groups:
            if "SM" in read_group:
                samples[read_group["SM"]].append(read_group["ID"])
            else:
                logger.warning(
                    'Read group "%s" does not contain an SM field to assign it to a sample.'
                    " Use --ignore-read-groups to use these alignments anyway.",
                    read_group["ID"],
                )
        self._sample_to_group_ids = {id: frozenset(values) for id, values in samples.items()}

    def has_sample(self, sample: str) -> bool:
        return sample in self._sample_to_group_ids

    def fetch(self, reference: str, sample: str, start: int = 0, end: Optional[int] = None):
        """Yield AlignmentWithSourceID instances for the given region/sample."""
        if reference not in self._references:
            raise ReferenceNotFoundError(reference)
        if sample is None:
            for bam_read in self._samfile.fetch(reference, start=start, stop=end):
                yield AlignmentWithSourceID(self.source_id, bam_read)
        else:
            try:
                read_groups = self._sample_to_group_ids[sample]
            except KeyError:
                raise SampleNotFoundError()
            for bam_read in self._samfile.fetch(reference, start=start, stop=end):
                if bam_read.has_tag("RG") and bam_read.get_tag("RG") in read_groups:
                    yield AlignmentWithSourceID(self.source_id, bam_read)

    def close(self) -> None:
        self._samfile.close()


class ComparableAlignedSegment:
    """Orders alignments by (reference_start, source_id) for heap merging."""

    def __init__(self, aligned_segment: AlignedSegment, source_id: int):
        self.segment = aligned_segment
        self.source_id = source_id

    def __lt__(self, other) -> bool:
        self_pos = self.segment.reference_start
        other_pos = other.segment.reference_start
        return (self_pos < other_pos) or (
            self_pos == other_pos and self.source_id < other.source_id
        )


class MultiBamReader(BamReader):
    """Read multiple sorted BAM files, merging them on the fly."""

    def __init__(self, paths: Iterable[str], *, reference: Optional[str] = None):
        self._readers = []
        for source_id, path in enumerate(paths):
            self._readers.append(SampleBamReader(path, source_id=source_id, reference=reference))

    def fetch(
        self,
        reference: Optional[str] = None,
        sample: Optional[str] = None,
        start: int = 0,
        end: Optional[int] = None,
    ):
        assert reference is not None

        def make_comparable(reader):
            for alignment in reader.fetch(reference, sample, start, end):
                yield ComparableAlignedSegment(alignment.bam_alignment, alignment.source_id)

        iterators = []
        for reader in self._readers:
            if sample is None or reader.has_sample(sample):
                iterators.append(make_comparable(reader))
        if not iterators:
            raise SampleNotFoundError("Sample not found in any input CRAM/BAM file")
        for it in heapq.merge(*iterators):
            yield AlignmentWithSourceID(it.source_id, it.segment)

    def has_reference(self, name: str) -> bool:
        return all(reader.has_reference(name) for reader in self._readers)

    def close(self) -> None:
        for f in self._readers:
            f.close()

"""
Read merging (--merge-reads): build "same-haplotype" (blue) and
"different-haplotype" (notblue) evidence graphs from pairwise allele
match/mismatch counts, break blue components crossed by notblue edges, and
consensus-merge each remaining component into a superread.

Behavior parity with whatshap/merge.py.
"""

import logging
from abc import ABC, abstractmethod
from math import log
from typing import Dict

import networkx as nx

from .core import Read, ReadSet

logger = logging.getLogger(__name__)


class ReadMergerBase(ABC):
    @abstractmethod
    def merge(self, readset: ReadSet) -> ReadSet:
        ...


def eval_overlap(n1, n2):
    """Matches/mismatches between a pair of overlapping reads."""
    hang1 = n2["begin"] - n1["begin"]
    overlap = zip(n1["alleles"][hang1:], n2["alleles"])
    match = mismatch = 0
    for c1, c2 in overlap:
        if c1 == c2:
            match += 1
        else:
            mismatch += 1
    return match, mismatch


class ReadMerger(ReadMergerBase):
    def __init__(self, error_rate, max_error_rate, positive_threshold, negative_threshold):
        self._error_rate = error_rate
        self._max_error_rate = max_error_rate
        self._positive_threshold = positive_threshold
        self._negative_threshold = negative_threshold

    def merge(self, readset: ReadSet) -> ReadSet:
        """Merge subsets of reads into superreads according to a
        probabilistic same/different-haplotype model."""
        logger.info(
            "Merging %d reads with error rate %.2f, maximum error rate %.2f, "
            "positive threshold %d and negative threshold %d ...",
            len(readset),
            self._error_rate,
            self._max_error_rate,
            self._positive_threshold,
            self._negative_threshold,
        )
        gblue = nx.Graph()
        gnotblue = nx.Graph()

        error_rate = self._error_rate
        thr = self._positive_threshold
        thr_neg = self._negative_threshold
        thr_diff = 1 + int(log(thr, (1 - error_rate) / (error_rate / 3)))
        thr_neg_diff = 1 + int(log(thr_neg, (1 - error_rate) / (error_rate / 3)))

        reads = []
        queue = {}
        for i, read in enumerate(readset):
            alleles = []
            orgn = []
            for variant in read:
                orgn.append((variant.position, variant.allele, variant.quality))
                assert variant.allele in (0, 1)
                alleles.append(variant.allele)
            reads.append(orgn)

            begin = read[0].position
            end = begin + len(alleles)
            gblue.add_node(i, begin=begin, end=end)
            gnotblue.add_node(i, begin=begin, end=end)
            queue[i] = {"begin": begin, "end": end, "alleles": alleles}
            for x in [id for id in queue.keys() if queue[id]["end"] <= begin]:
                del queue[x]
            for j in queue.keys():
                if i == j:
                    continue
                match, mismatch = eval_overlap(queue[j], queue[i])
                if (
                    match + mismatch >= thr_neg_diff
                    and min(match, mismatch) / (match + mismatch) <= self._max_error_rate
                    and match - mismatch >= thr_diff
                ):
                    gblue.add_edge(j, i, match=match, mismatch=mismatch)
                    if mismatch - match >= thr_neg_diff:
                        gnotblue.add_edge(j, i, match=match, mismatch=mismatch)

        # notblue edges are evidence against merging: break blue components
        # crossed by a notblue edge by removing weakest blue edges
        blue_component = {}
        current_component = 0
        for conncomp in nx.connected_components(gblue):
            for v in conncomp:
                blue_component[v] = current_component
            current_component += 1

        for u, v in gnotblue.edges():
            if blue_component[u] != blue_component[v]:
                continue
            while v in nx.node_connected_component(gblue, u):
                path = nx.shortest_path(gblue, source=u, target=v)
                w, x = min(
                    zip(path[:-1], path[1:]),
                    key=lambda p: gblue[p[0]][p[1]]["match"] - gblue[p[0]][p[1]]["mismatch"],
                )
                gblue.remove_edge(w, x)

        # Merge blue components into consensus superreads
        superreads: Dict = {}
        representative = {}
        for cc in nx.connected_components(gblue):
            if len(cc) == 1:
                continue
            r = min(cc)
            superreads[r] = {}
            for i in cc:
                representative[i] = r

        for id in range(len(reads)):
            if id in representative:
                for position, allele, quality in reads[id]:
                    r = representative[id]
                    if position not in superreads[r]:
                        superreads[r][position] = [0, 0]
                    superreads[r][position][allele] += quality

        merged_reads = ReadSet()
        readn = 0
        for id in range(len(reads)):
            read = Read(f"read{readn}")
            readn += 1
            if id in representative:
                if id == representative[id]:
                    for position in sorted(superreads[id]):
                        z = superreads[id][position]
                        allele = 0 if z[0] >= z[1] else 1
                        read.add_variant(position, allele, abs(z[1] - z[0]))
                    merged_reads.add(read)
            else:
                for position, allele, quality in reads[id]:
                    read.add_variant(position, allele, quality)
                merged_reads.add(read)

        logger.info(
            "... after merging: merged %d reads into %d reads", len(readset), len(merged_reads)
        )
        return merged_reads


class DoNothingReadMerger(ReadMergerBase):
    def merge(self, readset):
        return readset

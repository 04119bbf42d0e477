"""
CIGAR machinery for allele detection: walk an alignment's CIGAR and the
variant list in lockstep (for realignment mode), or detect alleles directly
from the CIGAR without a reference (reference-free mode).

Semantics parity with whatshap/_variants.pyx.
"""

import logging
from collections import deque

logger = logging.getLogger(__name__)


def _iterate_cigar(variants, j, bam_read, cigartuples):
    """Iterate over the CIGAR of bam_read and variants[j:] in lockstep.

    Yields (index, i, consumed, query_pos): index into the variants list;
    i/consumed describe the CIGAR split position at the variant.
    """
    ref_pos = bam_read.reference_start
    query_pos = 0
    n = len(variants)

    # Skip variants located to the left of the read
    while j < n and variants[j].position < ref_pos:
        j += 1

    v_position = variants[j].position if j < n else 0
    for i, (cigar_op, length) in enumerate(cigartuples):
        if j < n:
            v_position = variants[j].position
        if cigar_op in (0, 7, 8):  # M, X, = (match)
            while j < n and v_position < ref_pos + length:
                assert v_position >= ref_pos
                yield (j, i, v_position - ref_pos, query_pos + v_position - ref_pos)
                j += 1
                if j < n:
                    v_position = variants[j].position
            query_pos += length
            ref_pos += length
        elif cigar_op == 1:  # I (insertion)
            if j < n and v_position == ref_pos:
                yield (j, i, 0, query_pos)
                j += 1
                if j < n:
                    v_position = variants[j].position
            query_pos += length
        elif cigar_op == 2:  # D (deletion)
            while j < n and v_position < ref_pos + length:
                assert v_position >= ref_pos
                yield (j, i, v_position - ref_pos, query_pos)
                j += 1
                if j < n:
                    v_position = variants[j].position
            ref_pos += length
        elif cigar_op == 3:  # N (reference skip)
            while j < n and v_position < ref_pos + length:
                assert v_position >= ref_pos
                j += 1
                if j < n:
                    v_position = variants[j].position
            ref_pos += length
        elif cigar_op == 4:  # S (soft clipping)
            query_pos += length
        elif cigar_op == 5 or cigar_op == 6:  # H or P
            pass
        else:
            raise ValueError(f"Unsupported CIGAR operation: {cigar_op}")


def _detect_alleles(variants, var_progress, first, bam_read):
    """Reference-free allele detection: track per-allele match/insert/delete
    progress of each covered variant across the CIGAR operations.

    Yields (variant index, allele, quality).
    """
    ref_pos = bam_read.reference_start
    query_pos = 0
    j = first
    n = len(var_progress)

    # Skip variants that come before this region
    while j < n:
        var_id = var_progress[j].variant_id
        var_pos = variants[var_id].position
        if var_pos >= ref_pos:
            break
        j += 1

    vqueue = deque()  # pending variants, kept in positional order

    for cigar_op, length in bam_read.cigartuples:
        # Skip variants that come before this region
        while j < n:
            var_id = var_progress[j].variant_id
            var_pos = variants[var_id].position
            if var_pos >= ref_pos:
                break
            j += 1

        if cigar_op == 3:  # N
            ref_pos += length
            continue
        elif cigar_op == 4:  # S
            query_pos += length
            continue
        elif cigar_op == 5 or cigar_op == 6:  # H or P
            continue

        # Queue all variants starting within the ref span of this operation
        ref_end = ref_pos + length
        while j < n:
            var_id = var_progress[j].variant_id
            var_pos = variants[var_id].position
            if var_pos >= ref_end:
                break
            ref_len = len(variants[var_id].reference_allele)
            # An insertion op in front of a non-insertion variant is ignored
            if cigar_op == 1 and ref_len > 0:
                break
            # A deletion op seeing an insertion variant: skip the variant
            if cigar_op == 2 and ref_len == 0:
                j += 1
                continue
            query_start = query_pos + var_pos - ref_pos if cigar_op != 2 else query_pos
            var_progress[j].reset(query_start)
            vqueue.append(var_progress[j])
            j += 1

        # Progress handler per op type
        ref_end = ref_pos
        query_end = query_pos
        if cigar_op in (0, 7, 8):
            handler = _detect_alleles_match
            ref_end += length
            query_end += length
        elif cigar_op == 1:
            handler = _detect_alleles_insertion
            query_end += length
        elif cigar_op == 2:
            handler = _detect_alleles_deletion
            ref_end += length
        else:
            logger.error("Unsupported CIGAR operation: %d", cigar_op)
            raise ValueError(f"Unsupported CIGAR operation: {cigar_op}")

        for var_entry in vqueue:
            variant = variants[var_entry.variant_id]
            handler(variant, var_entry, bam_read, ref_pos, query_pos, length)
        ref_pos = ref_end
        query_pos = query_end

        # Yield resolved variants from the left; requeue unresolved ones
        while vqueue:
            var_entry = vqueue.popleft()
            resolved = list(var_entry.get_resolved())
            num_resolved = len(resolved)
            num_pending = len(var_entry.get_pending())
            if num_resolved >= 1 and num_pending == 0:
                lengths = [var_entry.alleles[r].length for r in resolved]
                i = resolved[lengths.index(max(lengths))]
                a = var_entry.alleles[i]
                q = a.quality // a.length if a.length > 0 else 30
                yield var_entry.variant_id, i, q
            elif num_pending > 0:
                vqueue.appendleft(var_entry)
                break
            # else: no allele matches; discard

    # After the last operation, yield everything still resolved
    for var_entry in vqueue:
        resolved = list(var_entry.get_resolved())
        num_resolved = len(resolved)
        num_pending = len(var_entry.get_pending())
        if num_resolved >= 1 and num_pending == 0:
            lengths = [var_entry.alleles[r].length for r in resolved]
            i = resolved[lengths.index(max(lengths))]
            a = var_entry.alleles[i]
            q = a.quality // a.length if a.length > 0 else 30
            yield var_entry.variant_id, i, q


def _detect_alleles_match(variant, entry, bam_read, ref_pos, query_pos, length):
    query_start = entry.query_start
    op_start = max(0, entry.query_start - query_pos)
    for i, a in enumerate(entry):
        if a.progress < 0:
            continue
        ops_consumed = op_start
        allele_seq = variant.get_allele(i)
        # NOTE: the reference computes this index once and does NOT advance
        # it inside the loop (_variants.pyx:232-247); replicated verbatim.
        qp = query_start + a.matched + a.inserted
        while a.matched < a.match_target and ops_consumed < length:
            qbase = bam_read.query_sequence[qp]
            vbase = allele_seq[a.matched + a.inserted]
            if qbase == vbase:
                ops_consumed += 1
                if bam_read.query_qualities:
                    a.quality += bam_read.query_qualities[qp]
                else:
                    a.quality += 30
                a.matched += 1
                a.progress += 1
            else:
                break
        # non-matches left but match ops remain -> allele fails
        if ops_consumed < length and a.progress < a.length:
            a.progress = -1


def _detect_alleles_insertion(variant, entry, bam_read, ref_pos, query_pos, length):
    query_start = entry.query_start
    for i, a in enumerate(entry):
        if a.progress < 0:
            continue
        ops_consumed = 0
        allele_seq = variant.get_allele(i)
        while a.inserted < a.insert_target and ops_consumed < length:
            ops_consumed += 1
            qbase = bam_read.query_sequence[query_start + a.matched + a.inserted]
            vbase = allele_seq[a.matched + a.inserted]
            if qbase == vbase:
                a.inserted += 1
                a.progress += 1
                a.quality += 30
            else:
                break
        if ops_consumed < length and 0 < a.progress < a.length:
            a.progress = -1


def _detect_alleles_deletion(variant, entry, bam_read, ref_pos, query_pos, length):
    for i, a in enumerate(entry):
        if a.progress < 0:
            continue
        ops_consumed = 0
        while a.deleted < a.delete_target and ops_consumed < length:
            ops_consumed += 1
            a.deleted += 1
            a.progress += 1
            a.quality += 30
        if ops_consumed < length and a.progress < a.length:
            a.progress = -1

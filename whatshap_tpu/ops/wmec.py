"""
TPU-native wMEC/PedMEC solver core.

The reference (src/pedigreedptable.cpp:15-406) solves weighted Minimum Error
Correction by a column-wise DP over bipartitions of the active reads x
transmission vectors, enumerating the 2^k bipartitions of each column with
Gray codes so each bipartition's cost is an O(1) incremental update.

That trick is a scalar-CPU optimization.  On TPU we instead compute the cost
of ALL 2^k bipartitions of a column at once with a bit-matrix matmul on the
MXU:

    cost_partition[p][a](B) = wbase[t,p,a] + sum_s bit_s(B) * wdiff[s,t,p,a]
                            = wbase + (Bits @ wdiff)[B]

where Bits is the static (2^K, K) matrix of bipartition bit patterns.  The
column scan (sequential in the number of variants, like the reference) runs
under ``jax.lax.scan``; everything else is vectorized over the full state
space.

Slot layout: instead of re-indexing active reads per column (the reference's
ColumnIndexingScheme), each read is assigned a persistent *slot* in [0, K)
for its active lifetime.  Projection between columns ("forward projection"
in the reference) becomes an in-place min-fold over the bits of dying slots
(static-shape reshapes inside the scan body).  State entries are constant
along inactive-slot bits, so backtrace lookups work directly at padded
indices.

Bit-exact parity with the reference's tie-breaking is preserved by carrying
an explicit tie-break key: the reference iterates bipartitions in Gray-code
order and keeps the first strict minimum, which equals "argmin by
(cost, gray_rank)" where gray_rank(B) is the inverse Gray code of the
bipartition index in *active-read-rank* bit order.  We compute gray_rank for
all padded slot-space indices with a second small matmul plus a XOR prefix.
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.jaxcache import enable_persistent_cache
from ..core.genotype import Genotype
from ..core.pedigree_model import Pedigree, PedigreePartitions
from ..core.readset import ReadSet

# "Infinity" cost sentinel.  Chosen so that INF + INF still fits in int32
# (the reference uses uint32 max with explicit overflow guards,
# pedigreedptable.cpp:262-290).
INF = 1 << 29

# Full-backtrace-table budget for the jax paths; beyond this, run_dp uses a
# segmented checkpoint/recompute solve (sqrt(n) memory).  Tests shrink it.
SEGMENT_TABLE_BUDGET = 1 << 30


class MendelianConflictError(RuntimeError):
    def __init__(self):
        super().__init__("Error: Mendelian conflict")


@dataclass
class PackedProblem:
    """A wMEC/PedMEC instance packed into dense per-column arrays."""

    n_cols: int
    K: int  # number of slots (= max coverage)
    T: int  # number of transmission configurations (4^#trios)
    P: int  # number of founder partitions (2*(#individuals - #trios))
    n_reads: int
    positions: np.ndarray  # (C,) genomic positions
    active: np.ndarray  # (C, K) bool
    slot_read: np.ndarray  # (C, K) int32, read index or -1
    allele: np.ndarray  # (C, K) int8  (0/1; 2=blank/inactive)
    weight: np.ndarray  # (C, K) int32 phred
    rank: np.ndarray  # (C, K) int8, rank among active reads (read-id order), -1
    die_prev: np.ndarray  # (C, K) bool: slots that died after column c-1
    rc: np.ndarray  # (C,) int32 recombination cost
    wdiff: np.ndarray  # (C, K, T, P, 2) int32
    wbase: np.ndarray  # (C, T, P, 2) int32
    acost: np.ndarray  # (C, T, 2^P) int32 (INF = incompatible assignment)
    read_slot: np.ndarray  # (R,) int32 slot of each read (-1 if never active)
    read_first_col: np.ndarray  # (R,) int32 first active column (-1)
    h2p: np.ndarray  # (T, I, 2) int32 haplotype -> partition map
    read_source: np.ndarray  # (R,) int32 individual index per read
    # Transmission-relabeling symmetries: XOR masks d such that relabeling
    # one founder's haplotypes maps the DP onto itself with t -> t ^ d and
    # every cost preserved (see pack_problem).  The seam-matrix pass of the
    # batched pedigree route seeds one scan per coset instead of per t.
    t_sym_masks: Tuple[int, ...] = ()


def pack_problem(
    readset: ReadSet,
    recombcost: Sequence[int],
    pedigree: Pedigree,
    distrust_genotypes: bool = False,
    positions: Optional[Sequence[int]] = None,
    check_conflicts: bool = True,
    emission_tables: bool = True,
) -> PackedProblem:
    """Convert a ReadSet + Pedigree into dense arrays for the device DP.

    Mirrors the column semantics of src/columniterator.cpp:10-169 (active
    read tracking, blank entries) and the per-column data consumed by
    src/pedigreecolumncostcomputer.cpp:14-114.
    """
    readset.reassign_read_ids()
    n_reads = len(readset)
    if positions is None:
        cols = readset.get_positions()
    else:
        cols = list(positions)
    C = len(cols)
    pos_to_col = {p: i for i, p in enumerate(cols)}

    n_ind = len(pedigree)
    n_trios = pedigree.triple_count
    T = 4 ** n_trios
    P = 2 * (n_ind - n_trios) if n_ind else 2

    # read -> individual index (direct slot access: this function is the
    # packing hot path for every solver, so Variant-object construction and
    # per-entry method calls are avoided throughout)
    reads = list(readset)
    read_source = np.zeros(n_reads, dtype=np.int32)
    for i, read in enumerate(reads):
        read_source[i] = pedigree.id_to_index(read.sample_id)

    # Per-read active column ranges; all first/last positions must be columns
    # (asserted by the reference's ColumnIterator constructor).
    first_col = np.full(n_reads, -1, dtype=np.int32)
    last_col = np.full(n_reads, -1, dtype=np.int32)
    for i, read in enumerate(reads):
        rpos = read._positions
        if not rpos:
            continue
        fc = pos_to_col.get(rpos[0])
        lc = pos_to_col.get(rpos[-1])
        if fc is None or lc is None:
            raise ValueError(
                "ColumnIterator: read end positions must be contained in the "
                "column position set"
            )
        first_col[i] = fc
        last_col[i] = lc

    # Slot assignment: greedy lowest-free-slot over activation order.
    # Event-driven: reads visited by (start column, read id); before each
    # assignment every slot whose occupant died strictly before that column
    # is freed.  Identical assignment to a per-column sweep (the lowest
    # free slot does not depend on the order slots were freed in).
    import heapq

    read_slot = np.full(n_reads, -1, dtype=np.int32)
    free_slots: List[int] = []
    deaths: List[Tuple[int, int]] = []  # (first column after death, slot)
    next_slot = 0
    for i in np.argsort(first_col, kind="stable").tolist():
        fc = first_col[i]
        if fc < 0:
            continue
        while deaths and deaths[0][0] <= fc:
            heapq.heappush(free_slots, heapq.heappop(deaths)[1])
        if free_slots:
            s = heapq.heappop(free_slots)
        else:
            s = next_slot
            next_slot += 1
        read_slot[i] = s
        heapq.heappush(deaths, (last_col[i] + 1, s))
    K = max(next_slot, 1)

    active = np.zeros((C, K), dtype=bool)
    slot_read = np.full((C, K), -1, dtype=np.int32)
    allele = np.full((C, K), 2, dtype=np.int8)
    weight = np.zeros((C, K), dtype=np.int32)
    rank = np.full((C, K), -1, dtype=np.int8)
    die = np.zeros((C, K), dtype=bool)  # slot dies AFTER column c

    # Per-read entry maps.  Entry lookups are flattened into one scatter:
    # collect (col, slot, allele, quality) for every variant that lands on a
    # column, then assign in bulk.
    flat_pos: List[int] = []
    flat_slot: List[int] = []
    flat_read: List[int] = []
    flat_allele: List[int] = []
    flat_weight: List[int] = []
    for i, read in enumerate(reads):
        if first_col[i] < 0:
            continue
        s = read_slot[i]
        active[first_col[i] : last_col[i] + 1, s] = True
        slot_read[first_col[i] : last_col[i] + 1, s] = i
        die[last_col[i], s] = True
        rpos = read._positions
        flat_pos.extend(rpos)
        flat_slot.extend([s] * len(rpos))
        flat_read.extend([i] * len(rpos))
        flat_allele.extend(read._alleles)
        flat_weight.extend(read._qualities)
    if flat_pos:
        fp_arr = np.asarray(flat_pos, dtype=np.int64)
        cols_arr = np.asarray(cols, dtype=np.int64)
        sorted_cols = C > 1 and bool(np.all(cols_arr[1:] > cols_arr[:-1])) or C <= 1
        if sorted_cols:
            ci = np.searchsorted(cols_arr, fp_arr)
            fl_read = np.asarray(flat_read, dtype=np.int64)
            ok = (
                (ci < C)
                & (cols_arr[np.minimum(ci, C - 1)] == fp_arr)
                & (ci >= first_col[fl_read])
                & (ci <= last_col[fl_read])
            )
        else:  # unsorted position list: fall back to the dict
            ci = np.asarray([pos_to_col.get(p, -1) for p in flat_pos], dtype=np.int64)
            fl_read = np.asarray(flat_read, dtype=np.int64)
            # keep the per-variant active-span guard of the column iterator
            ok = (
                (ci >= 0)
                & (ci >= first_col[fl_read])
                & (ci <= last_col[fl_read])
            )
        ci_ok = ci[ok]
        sl_ok = np.asarray(flat_slot, dtype=np.int64)[ok]
        allele[ci_ok, sl_ok] = np.asarray(flat_allele, dtype=np.int8)[ok]
        weight[ci_ok, sl_ok] = np.asarray(flat_weight, dtype=np.int32)[ok]

    # rank among active reads in read-id order, vectorized over columns:
    # stable-argsort the (inactive -> +inf) read ids per row, then scatter
    # 0..n_active-1 back through the ordering
    sort_key = np.where(active, slot_read, np.iinfo(np.int32).max)
    order_all = np.argsort(sort_key, axis=1, kind="stable")  # (C, K)
    n_act = active.sum(axis=1)
    rank_vals = np.where(
        np.arange(K)[None, :] < n_act[:, None], np.arange(K)[None, :], -1
    ).astype(np.int8)
    np.put_along_axis(rank, order_all, rank_vals, axis=1)

    die_prev = np.zeros((C, K), dtype=bool)
    if C > 1:
        die_prev[1:] = die[:-1]

    # Transmission-dependent partition maps
    h2p = np.zeros((T, max(n_ind, 1), 2), dtype=np.int32)
    for t in range(T):
        pp = PedigreePartitions(pedigree, t)
        for i in range(n_ind):
            h2p[t, i, 0] = pp.haplotype_to_partition(i, 0)
            h2p[t, i, 1] = pp.haplotype_to_partition(i, 1)

    # Transmission-relabeling symmetries.  Relabeling a FOUNDER's two
    # haplotypes (founder = never a child in a triple; its partition pair is
    # free, pedigreepartitions.cpp:7-28) and simultaneously flipping the
    # transmission bit of every triple that selects from it (bit 2t = father
    # side, 2t+1 = mother side, pedigreepartitions.cpp:39-52) is a
    # cost-preserving bijection of the whole DP: reads of that founder swap
    # partition side inside the min-fold, every descendant's h2p entry is
    # unchanged, genotype/GL costs are symmetric in the haplotype pair, and
    # recombination cost is Hamming on t (XOR-invariant).  Hence
    # G[a][b] == G[a^d][b^d] for every d in the XOR-span of these masks.
    triples = pedigree.triples
    child_of = {c for _f, _m, c in triples}
    t_sym_masks = []
    for i in range(n_ind):
        if i in child_of:
            continue
        mask = 0
        for ti, (fa, mo, _c) in enumerate(triples):
            if fa == i:
                mask |= 1 << (2 * ti)
            if mo == i:
                mask |= 1 << (2 * ti + 1)
        if mask:
            t_sym_masks.append(mask)

    if not emission_tables:
        # caller consumes only the structural arrays (the genotyping HMM
        # builds its own probability-space emission from allele/weight):
        # skip the wMEC cost-table construction below entirely
        rc = np.asarray(list(recombcost), dtype=np.int32)
        if C > 0 and len(rc) < C:
            rc = np.concatenate([rc, np.full(C - len(rc), INF, dtype=np.int32)])
        empty32 = np.zeros(0, dtype=np.int32)
        return PackedProblem(
            n_cols=C,
            K=K,
            T=T,
            P=P,
            n_reads=n_reads,
            positions=np.asarray(cols, dtype=np.int64),
            active=active,
            slot_read=slot_read,
            allele=allele,
            weight=weight,
            rank=rank,
            die_prev=die_prev,
            rc=rc[:C] if C > 0 else rc,
            wdiff=empty32.reshape(0, K, T, P, 2),
            wbase=empty32.reshape(0, T, P, 2),
            acost=empty32.reshape(0, T, 1 << P),
            read_slot=read_slot,
            read_first_col=first_col,
            h2p=h2p,
            read_source=read_source,
            t_sym_masks=tuple(t_sym_masks),
        )

    # Column cost weights.
    # c_s(a) = weight if allele in {0,1} and allele != a else 0
    # (pedigreecolumncostcomputer.cpp:53-76: a REF entry adds its phred to
    # cost_partition[p][1], an ALT entry to cost_partition[p][0]).
    contra = np.zeros((C, K, 2), dtype=np.int32)
    is_ref = allele == 0
    is_alt = allele == 1
    contra[:, :, 0] = np.where(is_alt, weight, 0)
    contra[:, :, 1] = np.where(is_ref, weight, 0)

    if n_reads > 0:
        ind_of_slot = np.where(slot_read >= 0, read_source[np.maximum(slot_read, 0)], 0)
    else:
        ind_of_slot = np.zeros((C, K), dtype=np.int32)
    # partition index per (column, slot, transmission, bit)
    p_of_bit0 = h2p[:, :, 0][np.arange(T)[:, None, None], ind_of_slot[None]]  # (T,C,K)
    p_of_bit1 = h2p[:, :, 1][np.arange(T)[:, None, None], ind_of_slot[None]]
    # one-hot over partitions
    sel0 = (p_of_bit0[..., None] == np.arange(P)[None, None, None, :])  # (T,C,K,P)
    sel1 = (p_of_bit1[..., None] == np.arange(P)[None, None, None, :])
    # wbase[c,t,p,a] = sum_s sel0 * c_s(a); wdiff = (sel1 - sel0) * c_s(a)
    wbase = np.einsum("tckp,cka->ctpa", sel0.astype(np.int64), contra.astype(np.int64))
    wdiff = (
        (sel1.astype(np.int64) - sel0.astype(np.int64)).transpose(1, 2, 0, 3)[
            ..., None
        ]
        * contra[:, :, None, None, :].astype(np.int64)
    )  # (C,K,T,P,2)

    # Genotype-compatible allele assignments per (column, transmission):
    # acost[c,t,i] = sum of (truncated) GL costs, or INF if incompatible
    # (pedigreecolumncostcomputer.cpp:25-49).
    nA = 1 << P
    acost = np.zeros((C, T, nA), dtype=np.int64)
    assign_idx = np.arange(nA)
    # per-individual genotype data is transmission-independent: extract once
    ind_gl_cols: List[Optional[np.ndarray]] = []
    ind_gt_idx: List[Optional[np.ndarray]] = []
    for ind in range(n_ind):
        if distrust_genotypes:
            gl_cols = np.zeros((C, 3), dtype=np.int64)
            gl_row = pedigree._genotype_likelihoods[ind]
            for c in range(C):
                gls = gl_row[c]  # IndexError on short rows, like the getter
                if gls is None:
                    raise RuntimeError(
                        "genotype likelihoods required with distrust_genotypes"
                    )
                # unsigned-int truncation per addition, as in the C++
                vec = gls._gl
                gl_cols[c, 0] = int(vec[0])
                gl_cols[c, 1] = int(vec[1])
                gl_cols[c, 2] = int(vec[2])
            ind_gl_cols.append(gl_cols)
            ind_gt_idx.append(None)
        else:
            gt_row = pedigree._genotypes[ind]
            gt_list = []
            for c in range(C):
                als = gt_row[c]._alleles  # IndexError on short rows, like the getter
                if len(als) == 2 and als[0] in (0, 1) and als[1] in (0, 1):
                    gt_list.append(als[0] + als[1])
                else:
                    gt_list.append(-1)
            ind_gl_cols.append(None)
            ind_gt_idx.append(np.asarray(gt_list, dtype=np.int64))
    for t in range(T):
        for ind in range(n_ind):
            part0 = h2p[t, ind, 0]
            part1 = h2p[t, ind, 1]
            a0 = (assign_idx >> part0) & 1  # (nA,)
            a1 = (assign_idx >> part1) & 1
            gt_of_assign = a0 + a1  # canonical diploid biallelic index
            if distrust_genotypes:
                acost[:, t, :] += ind_gl_cols[ind][:, gt_of_assign]
            else:
                ok = gt_of_assign[None, :] == ind_gt_idx[ind][:, None]  # (C, nA)
                acost[:, t, :] += np.where(ok, 0, np.int64(INF) * 4)
    acost = np.minimum(acost, INF).astype(np.int32)

    if C > 0 and check_conflicts:
        # Mendelian conflict check: a column where no (t, assignment) is
        # compatible (pedigreedptable.cpp:301-303)
        if bool(np.any(np.all(acost >= INF, axis=(1, 2)))):
            raise MendelianConflictError()

    rc = np.asarray(list(recombcost), dtype=np.int32)
    if C > 0 and len(rc) < C:
        # The reference indexes recombcost[column] without a bounds check
        # (pedigreedptable.cpp:287): reading past the end is UB there.  We
        # instead pad with a prohibitive cost, which keeps the transmission
        # vector constant across the unspecified tail — the behavior the
        # reference tests rely on.
        rc = np.concatenate([rc, np.full(C - len(rc), INF, dtype=np.int32)])

    return PackedProblem(
        n_cols=C,
        K=K,
        T=T,
        P=P,
        n_reads=n_reads,
        positions=np.asarray(cols, dtype=np.int64),
        active=active,
        slot_read=slot_read,
        allele=allele,
        weight=weight,
        rank=rank,
        die_prev=die_prev,
        rc=rc[:C] if C > 0 else rc,
        wdiff=wdiff.astype(np.int32),
        wbase=wbase.astype(np.int32),
        acost=acost,
        read_slot=read_slot,
        read_first_col=first_col,
        h2p=h2p,
        read_source=read_source,
        t_sym_masks=tuple(t_sym_masks),
    )


# ---------------------------------------------------------------------------
# Device-side DP
# ---------------------------------------------------------------------------


def _bits_matrix(K: int) -> np.ndarray:
    """Static (2^K, K) matrix of bipartition bit patterns."""
    idx = np.arange(1 << K, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(K)[None, :]) & 1).astype(np.float32)


def _assign_bits(P: int) -> np.ndarray:
    idx = np.arange(1 << P, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(P)[None, :]) & 1).astype(np.int32)


def _popcount_matrix(T: int) -> np.ndarray:
    i = np.arange(T)
    x = i[:, None] ^ i[None, :]
    pc = np.zeros_like(x)
    while np.any(x):
        pc += x & 1
        x >>= 1
    return pc.astype(np.int32)


def _inverse_gray(n: jnp.ndarray, K: int) -> jnp.ndarray:
    """Inverse Gray code (rank of bipartition in Gray iteration order)."""
    shift = 1
    while shift < max(K, 1):
        n = n ^ (n >> shift)
        shift <<= 1
    return n


def _fold_dying(K: int, T: int, die_c, cost, key_vec, jmin):
    """Fold dying bits of a (S, T) dp state (forward projection,
    pedigreedptable.cpp:316-326) with Gray-order tie-breaking.

    ``key_vec`` is the (S,) tie-break key of the folded column.  Returns
    (cost, key, idx, jmin), each (S, T): per surviving row, the winning
    value / key / source bipartition index / source transmission argmin.
    Used both inside the forward scan step and for the host-visible seam
    fold of the pedigree block chain (run_dp_batched_pedigree).
    """
    S = 1 << K
    idx_base = jnp.arange(S, dtype=jnp.int32)
    key = jnp.broadcast_to(key_vec[:, None], (S, T))
    idx = jnp.broadcast_to(idx_base[:, None], (S, T))
    for p in range(K):
        # view (hi_dims, 2, lo_dims) over bit p
        def fold(arr):
            return arr.reshape((1 << (K - 1 - p)), 2, (1 << p), T)

        c_v = fold(cost)
        k_v = fold(key)
        i_v = fold(idx)
        j_v = fold(jmin)
        a_c, b_c = c_v[:, 0], c_v[:, 1]
        a_k, b_k = k_v[:, 0], k_v[:, 1]
        take_b = (b_c < a_c) | ((b_c == a_c) & (b_k < a_k))
        w_c = jnp.where(take_b, b_c, a_c)
        w_k = jnp.where(take_b, b_k, a_k)
        w_i = jnp.where(take_b, i_v[:, 1], i_v[:, 0])
        w_j = jnp.where(take_b, j_v[:, 1], j_v[:, 0])

        def both(w, orig):
            return jnp.where(
                die_c[p],
                jnp.broadcast_to(w[:, None], orig.shape).reshape(S, T),
                orig.reshape(S, T),
            ).reshape(S, T)

        cost = both(w_c, c_v)
        key = both(w_k, k_v)
        idx = both(w_i, i_v)
        jmin = both(w_j, j_v)
    return cost, key, idx, jmin


def _forward_scan_impl(
    K: int,
    T: int,
    P: int,
    wdiff,  # (C, K, T*P*2) float32
    wbase,  # (C, T, P, 2) int32
    rankw,  # (C, K) float32  (2^rank or 0)
    acost,  # (C, T, 2^P) int32
    die_prev,  # (C, K) bool
    rc,  # (C,) int32
    carry0=None,
    emit_bt: bool = True,
):
    """Forward pass.  Returns per-column backtrace arrays and final state."""
    S = 1 << K
    nA = 1 << P
    # generate the (S, K) bit matrix on device: baking it in as a host
    # constant makes the serialized HLO O(2^K * K) — at K=23 that is a
    # ~770 MB constant that oversizes remote-compile requests.  The
    # optimization_barrier stops XLA from constant-folding the iota
    # expression back into exactly that constant at compile time (the fold
    # OOMs the compiler at high K).
    bits = jax.lax.optimization_barrier(
        (
            (jnp.arange(S, dtype=jnp.uint32)[:, None] >> jnp.arange(K, dtype=jnp.uint32)[None, :])
            & 1
        ).astype(jnp.float32)
    )  # (S, K) f32
    abits = jnp.asarray(_assign_bits(P))  # (nA, P) i32
    pcmat_np = _popcount_matrix(T)
    max_pc = max(int(pcmat_np.max()), 1)
    pcmat = jnp.asarray(pcmat_np)  # (T, T) i32
    idx_base = jnp.arange(S, dtype=jnp.int32)

    def col_cost(wdiff_c, wbase_c, acost_c):
        # f: (S, T*P*2).  NOTE: TPU matmuls default to one-pass bf16, which
        # is inexact for integer weights > 256 — HIGHEST forces the 3-pass
        # scheme, exact for integers < 2^24.
        f = jnp.dot(
            bits,
            wdiff_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cp = f.astype(jnp.int32).reshape(S, T, P, 2) + wbase_c[None]  # (S,T,P,2)
        s0 = jnp.sum(cp[..., 0], axis=-1)  # (S, T)
        d = cp[..., 1] - cp[..., 0]  # (S, T, P) int32
        # per-assignment partition cost, exact int32 (P is tiny: unrolled)
        pa = jnp.zeros((S, T, nA), dtype=jnp.int32)
        for p in range(P):
            pa = pa + jnp.where(abits[None, None, :, p] == 1, d[:, :, p : p + 1], 0)
        total = s0[:, :, None] + pa + acost_c[None]  # (S, T, nA)
        total = jnp.minimum(total, INF)
        return jnp.min(total, axis=-1)  # (S, T)

    def step(carry, xs):
        dp_prev, jmin_prev, key_prev = carry
        wdiff_c, wbase_c, rankw_c, acost_c, die_c, rc_c = xs

        # ---- fold dying bits of the previous column (forward projection,
        # pedigreedptable.cpp:316-326) with Gray-order tie-breaking ----
        proj_cost, _key, proj_idx, proj_jmin = _fold_dying(
            K, T, die_c, dp_prev, key_prev, jmin_prev
        )

        # ---- transmission min-plus (pedigreedptable.cpp:262-300) ----
        # clamp rc so pcmat * rc cannot overflow int32 (pcmat max is static)
        rc_safe = jnp.minimum(rc_c, INF // max_pc)
        recomb = jnp.minimum(pcmat * rc_safe, INF)
        trans_term = proj_cost[:, None, :] + recomb[None]  # (S, T_i, T_j)
        trans_term = jnp.minimum(trans_term, INF)
        trans_min = jnp.min(trans_term, axis=-1)  # (S, T)
        jmin_new = jnp.argmin(trans_term, axis=-1).astype(jnp.int32)

        # ---- current column cost over all bipartitions ----
        cc = col_cost(wdiff_c, wbase_c, acost_c)  # (S, T)
        dp = jnp.minimum(cc + trans_min, INF)

        # ---- tie-break key for this column ----
        # rank weights are powers of two (bf16-exact products; f32-exact
        # accumulation below 2^24), so default matmul precision is safe here
        r = jnp.dot(bits, rankw_c[:, None], preferred_element_type=jnp.float32)
        key_new = _inverse_gray(r[:, 0].astype(jnp.int32), K)

        emit = (proj_idx, proj_jmin) if emit_bt else None
        return (dp, jmin_new, key_new), emit

    if carry0 is None:
        carry0 = (
            jnp.zeros((S, T), dtype=jnp.int32),
            jnp.zeros((S, T), dtype=jnp.int32),
            jnp.zeros((S,), dtype=jnp.int32),
        )
    xs = (wdiff, wbase, rankw, acost, die_prev, rc)
    carry, emitted = jax.lax.scan(step, carry0, xs)
    dp_last, jmin_last, key_last = carry
    if emit_bt:
        proj_idx, proj_jmin = emitted
        return dp_last, jmin_last, key_last, proj_idx, proj_jmin
    return dp_last, jmin_last, key_last


def _backtrace_impl(K, T, dp_last, jmin_last, key_last, proj_idx, proj_jmin):
    """Device-side backtrace: pick the reference's optimum (first strict
    minimum in (gray order, transmission) iteration; numeric-index tiebreak
    selects the zero-padded representative) and walk the projection tables
    with a reverse scan.  Mirrors the host loop in run_dp exactly."""
    S = 1 << K
    big = jnp.int32(2**30)
    m = jnp.min(dp_last)
    cand = dp_last == m
    keyb = jnp.where(cand, key_last[:, None], big)
    km = jnp.min(keyb)
    cand = cand & (keyb == km)
    comb = (
        jnp.arange(T, dtype=jnp.int32)[None, :] * S
        + jnp.arange(S, dtype=jnp.int32)[:, None]
    )
    best = jnp.min(jnp.where(cand, comb, big))
    opt_trans = best // S
    opt_idx = best % S
    prev_trans = jmin_last[opt_idx, opt_trans]
    index_path, trans_path, seam = _backtrace_from(
        opt_idx, opt_trans, prev_trans, proj_idx, proj_jmin
    )
    return m, index_path, trans_path, seam


def _backtrace_from(start_idx, start_trans, prev_trans, proj_idx, proj_jmin):
    """Walk the projection tables backwards from a given last-column state
    (start_idx, start_trans) whose preceding transmission is prev_trans.
    Returns (index_path (C,), trans_path (C,), seam_prev) where seam_prev is
    the transmission value of the column BEFORE the first one (meaningful
    only for seeded block solves — the block-chain seam)."""

    def step(carry, xs):
        v_idx, v_trans, prev_t = carry
        pi, pj = xs
        nv_idx = pi[v_idx, prev_t]
        nv_trans = prev_t
        nprev = pj[nv_idx, nv_trans]
        return (nv_idx, nv_trans, nprev), (nv_idx, nv_trans)

    (_, _, seam_prev), (idxs, transs) = jax.lax.scan(
        step,
        (start_idx, start_trans, prev_trans),
        (proj_idx[1:], proj_jmin[1:]),
        reverse=True,
    )
    index_path = jnp.concatenate([idxs, start_idx[None]])
    trans_path = jnp.concatenate([transs, start_trans[None]])
    return index_path, trans_path, seam_prev


@partial(jax.jit, static_argnames=("K", "T", "P"))
def _solve_scan(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc):
    """Forward pass + backtrace entirely on device; returns
    (optimal_cost, index_path (C,), trans_path (C,))."""
    dp_last, jmin_last, key_last, proj_idx, proj_jmin = _forward_scan_impl(
        K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, emit_bt=True
    )
    return _backtrace_impl(K, T, dp_last, jmin_last, key_last, proj_idx, proj_jmin)[:3]


@partial(jax.jit, static_argnames=("K", "T", "P"))
def _forward_carry_scan(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, carry):
    """One segment's forward scan, carry only (no backtrace tables)."""
    return _forward_scan_impl(
        K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, carry0=carry, emit_bt=False
    )


@partial(jax.jit, static_argnames=("K", "T", "P"))
def _forward_tables_scan(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, carry):
    """One segment's forward scan re-run, emitting its backtrace tables."""
    return _forward_scan_impl(
        K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, carry0=carry, emit_bt=True
    )


def solve_scan_segmented(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, seg=256):
    """Segmented checkpoint/recompute solve on the XLA scan path — the
    sqrt(n) memory trick of the reference (pedigreedptable.cpp:104,127-173)
    for shapes the Pallas kernels do not cover (K 17..23, or any T).

    Memory: nseg checkpoints of O(S*T) plus ONE segment's backtrace tables
    of O(seg*S*T) live at a time, instead of O(C*S*T) for the whole
    instance.  Bit-identical to the monolithic solve.  C must be a
    multiple of `seg`.
    """
    C = wdiff.shape[0]
    assert C % seg == 0, (C, seg)
    nseg = C // seg
    S = 1 << K

    def seg_args(i):
        sl = slice(i * seg, (i + 1) * seg)
        return (wdiff[sl], wbase[sl], rankw[sl], acost[sl], die_prev[sl], rc[sl])

    carry = (
        jnp.zeros((S, T), dtype=jnp.int32),
        jnp.zeros((S, T), dtype=jnp.int32),
        jnp.zeros((S,), dtype=jnp.int32),
    )
    checkpoints = [carry]
    for i in range(nseg):
        carry = _forward_carry_scan(K, T, P, *seg_args(i), carry)
        checkpoints.append(carry)

    dp_last, jmin_last, key_last = (
        np.asarray(x) for x in jax.device_get(carry)
    )

    # optimum: first strict minimum in (gray order, transmission) with the
    # numeric-index tiebreak for padded duplicates (as in run_dp's numpy
    # backtrace)
    m = dp_last.min()
    cand = dp_last == m
    key2 = np.where(cand, key_last[:, None].astype(np.int64), np.iinfo(np.int64).max)
    cand &= key2 == key2.min()
    ti = np.nonzero(cand)
    order = np.lexsort((ti[0], ti[1]))
    v_idx = int(ti[0][order[0]])
    v_trans = int(ti[1][order[0]])
    optimal_cost = int(m)
    prev_trans = int(jmin_last[v_idx, v_trans])

    index_path = np.zeros(C, dtype=np.int64)
    trans_path = np.zeros(C, dtype=np.int64)
    index_path[C - 1] = v_idx
    trans_path[C - 1] = v_trans

    for s in reversed(range(nseg)):
        a = s * seg
        b = a + seg
        _, _, _, proj_idx, proj_jmin = _forward_tables_scan(
            K, T, P, *seg_args(s), checkpoints[s]
        )
        proj_idx, proj_jmin = (
            np.asarray(x) for x in jax.device_get((proj_idx, proj_jmin))
        )
        lo = max(a, 1)
        for i in range(b - 1, lo - 1, -1):
            li = i - a
            v_idx = int(proj_idx[li, v_idx, prev_trans])
            v_trans = prev_trans
            prev_trans = int(proj_jmin[li, v_idx, v_trans])
            index_path[i - 1] = v_idx
            trans_path[i - 1] = v_trans
    return DPResult(optimal_cost, index_path, trans_path)


@partial(jax.jit, static_argnames=("K", "T", "P"))
def solve_batched(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc):
    """Batched end-to-end solve (leading block axis): forward scan plus
    device-side backtrace per block.  Returns (costs (B,), index paths
    (B, C), transmission paths (B, C)); only the paths leave the chip."""

    def one(wd, wb, rw, ac, dp_, rc_):
        dp_last, jmin_last, key_last, pi, pj = _forward_scan_impl(
            K, T, P, wd, wb, rw, ac, dp_, rc_, emit_bt=True
        )
        return _backtrace_impl(K, T, dp_last, jmin_last, key_last, pi, pj)[:3]

    return jax.vmap(one)(wdiff, wbase, rankw, acost, die_prev, rc)


def _seeded_carry(K: int, T: int, dp0):
    """Initial scan carry for a block whose incoming folded dp vector is
    dp0 (T,) int32 — the seam state of the pedigree block chain.  The key
    and jmin seeds are irrelevant: the first column's projection tables are
    never consumed by the backtrace (the seam transition is reconstructed
    on the host from the previous block's seam fold)."""
    S = 1 << K
    return (
        jnp.broadcast_to(dp0[None, :].astype(jnp.int32), (S, T)),
        jnp.zeros((S, T), dtype=jnp.int32),
        jnp.zeros((S,), dtype=jnp.int32),
    )


@partial(jax.jit, static_argnames=("K", "T", "P"))
def forward_m_batched(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0):
    """Batched seeded forward pass, folded final cost vector only.

    Per batch element: scan the block's columns starting from the seam
    carry dp0 (T,), return m (T,) = min over bipartitions of the final dp.
    With unit seeds (0 at one transmission value, INF elsewhere) this yields
    one row of the block's T x T seam cost matrix G — the DP is min-plus
    linear in its seed, so a whole pedigree chromosome chains through these
    tiny matrices (run_dp_batched_pedigree)."""

    def one(wd, wb, rw, ac, dpv, rc_, d0):
        dp_last, _, _ = _forward_scan_impl(
            K, T, P, wd, wb, rw, ac, dpv, rc_, carry0=_seeded_carry(K, T, d0), emit_bt=False
        )
        return jnp.min(dp_last, axis=0)

    return jax.vmap(one)(wdiff, wbase, rankw, acost, die_prev, rc, dp0)


@partial(jax.jit, static_argnames=("K", "T", "P"))
def solve_seeded_batched(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0, die_next):
    """Batched seeded solve for the pedigree block chain (T > 1).

    Per batch element (one read-connected block, seeded with its incoming
    seam vector dp0 (T,)):
      - cost_head, head paths: the global-optimum backtrace (used for the
        chromosome's LAST block, whose seeded dp equals the monolithic dp)
      - per-transmission-value backtraces: for every t, the path started
        from the seam fold winner (s*(t), t) with the folded jmin as the
        preceding transmission — used for all earlier blocks, where the
        actually-taken t arrives from the next block's seam during host
        stitching.  die_next (K,) bool holds the monolithic die flags of
        the NEXT block's first column, defining the seam fold.
    Returns (cost_head, m (B,T), ip_head (B,C), tp_head (B,C),
    seam_head (B,), ips (B,T,C), tps (B,T,C), seams (B,T)).
    """
    S = 1 << K

    def one(wd, wb, rw, ac, dpv, rc_, d0, dn):
        dp_last, jmin_last, key_last, pi, pj = _forward_scan_impl(
            K, T, P, wd, wb, rw, ac, dpv, rc_, carry0=_seeded_carry(K, T, d0), emit_bt=True
        )
        cost_head, ip_head, tp_head, seam_head = _backtrace_impl(
            K, T, dp_last, jmin_last, key_last, pi, pj
        )
        # seam fold with the NEXT block's first-column die flags: all slots
        # active at this block's last column die there, so row 0 of the fold
        # is the monolithic winner (don't-care bits zeroed)
        fc, _fk, fi, fj = _fold_dying(K, T, dn, dp_last, key_last, jmin_last)
        m = fc[0]
        s_star = fi[0]
        jmin_star = fj[0]
        ips, tps, seams = jax.vmap(
            lambda t: _backtrace_from(s_star[t], t, jmin_star[t], pi, pj)
        )(jnp.arange(T, dtype=jnp.int32))
        return cost_head, m, ip_head, tp_head, seam_head, ips, tps, seams

    return jax.vmap(one)(wdiff, wbase, rankw, acost, die_prev, rc, dp0, die_next)


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def solve_seeded_batched_pallas(
    K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0, die_next, interpret=False
):
    """Pallas-kernel mirror of solve_seeded_batched: seeded forward with
    table emission on the VMEM-resident kernel, head backtrace, seam fold,
    and per-transmission seam backtraces.  Bit-identical outputs; the
    round-3 seam route ran these scans on the XLA path, ~4x below the
    Pallas kernel on its dominant K=15/T=4 buckets."""
    from . import wmec_pallas as wp

    B = wdiff.shape[0]
    S = 1 << K
    pidx, pjmin, dp_last, jmin_last, key_last = wp.forward_tables_seeded_pallas(
        K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0, interpret=interpret
    )
    cost_head, opt_trans, opt_idx = wp._select_optimum(K, T, dp_last, key_last)
    jm = jmin_last.reshape(B, T, S)
    prev_trans = jax.vmap(lambda j, t, s: j[t, s])(jm, opt_trans, opt_idx)
    head_init = jnp.stack([opt_idx, opt_trans, prev_trans], axis=1)  # (B, 3)

    # seam fold with the NEXT block's first-column die flags (same XLA fold
    # as the scan path — tiny relative to the forward pass)
    dpST = dp_last.reshape(B, T, S).transpose(0, 2, 1)
    jmST = jm.transpose(0, 2, 1)
    keyS = key_last.reshape(B, S)
    fc, _fk, fi, fj = jax.vmap(
        lambda d, c, k, j: _fold_dying(K, T, d, c, k, j)
    )(die_next, dpST, keyS, jmST)
    m = fc[:, 0, :]
    s_star = fi[:, 0, :]
    jmin_star = fj[:, 0, :]
    t_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    seam_inits = jnp.stack([s_star, t_ids, jmin_star], axis=2)  # (B, T, 3)

    # head + T seam backtraces in ONE kernel launch sharing the tables
    inits = jnp.concatenate([head_init[:, None, :], seam_inits], axis=1)
    ips_all, tps_all, fins_all = wp.backtrace_pallas_t_multi(
        K, T, T + 1, inits, pidx, pjmin, interpret=interpret
    )
    # the backtrace kernel's final state walks one extra step through
    # column 0; its middle element is exactly _backtrace_from's seam_prev
    return (
        cost_head,
        m,
        ips_all[:, 0],
        tps_all[:, 0],
        fins_all[:, 0, 1],
        ips_all[:, 1:],
        tps_all[:, 1:],
        fins_all[:, 1:, 1],
    )


@partial(jax.jit, static_argnames=("K", "T", "P"))
def _forward_scan(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc):
    """Single-block forward pass with full backtrace emission."""
    return _forward_scan_impl(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc)


@partial(jax.jit, static_argnames=("K", "T", "P"))
def forward_cost_batched(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc):
    """Batched (leading block axis) forward pass, final costs only.

    This is the scale-out workhorse: thousands of independent phase blocks,
    padded to a common (C, K) bucket, run as one vmapped scan; the block axis
    shards data-parallel over a device mesh.
    """

    def one(wd, wb, rw, ac, dp_, rc_):
        dp_last, jmin_last, key_last = _forward_scan_impl(
            K, T, P, wd, wb, rw, ac, dp_, rc_, emit_bt=False
        )
        return dp_last, jmin_last, key_last

    return jax.vmap(one)(wdiff, wbase, rankw, acost, die_prev, rc)


#: HBM budget for the per-column backtrace tables of one batched launch
#: (two s32 tables of C * T * 2^K entries per block); batches whose tables
#: would exceed it are split into sequential chunks.  Overridable for
#: smaller-HBM parts via WHATSHAP_TPU_HBM_TABLE_BUDGET (bytes).
HBM_TABLE_BUDGET = int(os.environ.get("WHATSHAP_TPU_HBM_TABLE_BUDGET", 8 << 30))


#: Routing thresholds (total DP work C * 2^K * T, in folded states).  The
#: defaults were measured with tools/calibrate_router.py on the attached
#: device (host numpy beats a device round-trip below ~4M states; the
#: native adaptive-2^k_c engine stays competitive with the XLA-CPU scan up
#: to ~256M); recalibrate per device generation with that tool and export
#: the env overrides it prints.
HOST_ROUTE_WORK = int(os.environ.get("WHATSHAP_TPU_HOST_ROUTE_WORK", 1 << 22))
ADAPTIVE_ROUTE_WORK = int(os.environ.get("WHATSHAP_TPU_ADAPTIVE_ROUTE_WORK", 1 << 28))


#: Per-launch shape records for the most recent batched solves:
#: (K, T, C, B_real, B_padded, n_devices).  Consumed by bench / mesh_bench
#: for load-balance reporting and the N-chip efficiency model; bounded so
#: long runs don't grow it.
LAUNCH_STATS: List[Tuple[int, int, int, int, int, int]] = []
_LAUNCH_STATS_CAP = 4096


def _record_launch(K, T, C, B, B_padded, n_dev):
    if len(LAUNCH_STATS) < _LAUNCH_STATS_CAP:
        LAUNCH_STATS.append((K, T, C, B, B_padded, n_dev))


def _mesh_devices() -> int:
    """Number of devices the batched launches may shard over (1 disables
    sharding; WHATSHAP_TPU_NO_MESH=1 forces single-device launches)."""
    if os.environ.get("WHATSHAP_TPU_NO_MESH"):
        return 1
    return jax.device_count()


def _launch_sharded(kernel, K, T, P, *arrays, n_dev):
    """One batched kernel launch with the block axis sharded over all local
    devices via shard_map (no collectives: blocks are independent; only the
    per-block costs/paths come back).

    The batch is padded to a device multiple by repeating the first block —
    a replica solves identically and its results are dropped, which keeps
    padding outside the parity surface.
    """
    from ..parallel.mesh import make_block_mesh
    from jax.sharding import NamedSharding, PartitionSpec

    try:  # jax >= 0.6 top-level API, older experimental fallback
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map

    B = arrays[0].shape[0]
    pad = (-B) % n_dev
    if pad:
        arrays = tuple(
            jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
            if isinstance(a, jax.Array)
            else np.concatenate([a, np.repeat(a[:1], pad, axis=0)], axis=0)
            for a in arrays
        )
    mesh = make_block_mesh()
    spec = PartitionSpec("blocks")
    sharding = NamedSharding(mesh, spec)
    arrays = tuple(jax.device_put(a, sharding) for a in arrays)
    body = lambda *arrs: kernel(K, T, P, *arrs)  # noqa: E731
    try:
        # check_vma=False: scan carries are seeded from unvarying zeros and
        # become blocks-varying after one step; there are no collectives, so
        # the varying-manual-axes type check adds nothing here.
        fn = _shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        fn = _shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec, check_rep=False)
    out = fn(*arrays)
    if pad:
        out = _slice_b(out, B)
    return out


#: Batch-axis launch tiers (1.5-step ladder): every distinct batch size is
#: a separate jit/Mosaic compile (the grid bakes B in), so an arbitrary
#: workload would recompile per block count.  Padding B up to the next tier
#: (replicating block 0; replica results are dropped) bounds the compile
#: universe to ~2 tiers per (K, C) shape per chromosome at <= 33% padded
#: compute — and makes the persistent cache (and tools/precompile.py)
#: actually cover unseen workloads.
_B_TIERS = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256,
            384, 512, 768, 1024, 1536, 2048, 3072, 4096]


def _b_tier(b: int) -> int:
    for t in _B_TIERS:
        if t >= b:
            return t
    return b


def _b_tier_floor(b: int) -> int:
    prev = _B_TIERS[0]
    for t in _B_TIERS:
        if t > b:
            return prev
        prev = t
    return prev


def _slice_b(out, b):
    """Drop batch-padding rows from a kernel result (tuple of arrays or a
    single array — forward_m returns one array)."""
    if isinstance(out, tuple):
        return tuple(x[:b] for x in out)
    return out[:b]


#: Pass-2 (seeded solve) bucket shapes already compiled-or-loaded in this
#: process; guards the run_dp_batched_pedigree warmup launches so warm runs
#: never pay a redundant zero-seeded solve.
_PASS2_SHAPES_WARMED: set = set()


def _run_bucket_thunks(thunks):
    """Run per-bucket launch thunks, in parallel threads when there are
    several: each first-contact bucket shape pays a compile or a
    persistent-cache executable load — several seconds of round trips on a
    tunneled backend — and those RPCs release the GIL, so overlapping them
    across buckets cuts cold start by the bucket count.  Results keep
    thunk order; with one bucket this is a plain call."""
    if len(thunks) <= 1:
        return [f() for f in thunks]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(thunks))) as ex:
        return list(ex.map(lambda f: f(), thunks))


@partial(jax.jit, static_argnames=("nbp",))
def _seam_chain_device(nbp, ms, perm):
    """Min-plus seam chain on the device (single-coset pedigrees, R == 1).

    ms: per-bucket (B_b, T) i32 folded-min vectors in bucket-concat order;
    perm (nbp,) i32 maps chain position j to its concat row (block order),
    with padding positions pointing at an appended min-plus identity.
    Returns m_in (nbp, T): the incoming seam vector of each block, exactly
    the host chain's values (INF-saturated min-plus, int32-safe since
    2*INF < 2^31)."""
    m_all = jnp.concatenate(ms, axis=0)
    T = m_all.shape[1]
    col_xor = jnp.arange(T)[:, None] ^ jnp.arange(T)[None, :]
    g_all = jnp.take(m_all, col_xor, axis=1)  # (nb, T, T): G[a][b] = m[a^b]
    ident = jnp.where(jnp.eye(T, dtype=bool), 0, INF).astype(jnp.int32)[None]
    g_chain = jnp.concatenate([g_all, ident], axis=0)[perm]  # (nbp, T, T)

    def step(v, g):
        nxt = jnp.minimum(jnp.min(v[:, None] + g, axis=0), INF)
        return nxt, v

    _, m_in = jax.lax.scan(step, jnp.zeros((T,), jnp.int32), g_chain)
    return m_in


@partial(jax.jit, static_argnames=("reps", "bt"))
def _prep_batch(reps, bt, *arrs):
    """Fused launch-prep program: repeat each array `reps` times along the
    batch axis (the pedigree seam route's T unit seeds), then pad the batch
    to tier `bt` by replicating row 0.  One jitted program per bucket shape
    — doing this with per-array jnp glue cost a dozen tiny executables per
    bucket, each a ~0.3 s device-load round trip on a tunneled backend."""
    if reps > 1:
        arrs = tuple(jnp.repeat(a, reps, axis=0) for a in arrs)
    b = arrs[0].shape[0]
    if bt > b:
        arrs = tuple(
            jnp.concatenate([a, jnp.repeat(a[:1], bt - b, axis=0)], axis=0)
            for a in arrs
        )
    return arrs


def _launch_batched(kernel, K, T, P, arrays, per_block_bytes=0):
    """One batched kernel launch: sharded over the local mesh when more
    than one device is attached (shard_map; parallel/mesh.py), chunked so
    per-device HBM-resident tables stay under HBM_TABLE_BUDGET when
    `per_block_bytes` is given (e.g. K=15, T=4, C=256 backtrace tables need
    256 MiB/block — a B=64 launch would want 16 GiB and OOM a 16 GiB
    part), and batch-tier padded on accelerators (see _B_TIERS)."""
    enable_persistent_cache()
    B = arrays[0].shape[0]
    n_dev = _mesh_devices()
    on_accel = jax.default_backend() != "cpu"
    if n_dev > 1 and B > 1:
        launch_raw = partial(_launch_sharded, kernel, n_dev=n_dev)
    elif on_accel:
        n_dev = 1

        def launch_raw(K_, T_, P_, *arrs):
            # route through the AOT trace cache: a cold process deserializes
            # the kernel's saved StableHLO instead of re-tracing the
            # column-unrolled Pallas body (~10 s for a trio bucket)
            from ..utils.aotcache import aot_call

            return aot_call(kernel, (K_, T_, P_), arrs)
    else:
        n_dev = 1

        def launch_raw(K_, T_, P_, *arrs):
            return kernel(K_, T_, P_, *arrs)

    def launch(K_, T_, P_, *arrs):
        b = arrs[0].shape[0]
        bt = _b_tier(b) if on_accel else b
        if bt > b:
            arrs = _prep_batch(1, bt, *arrs)
        # record the true vs padded batch (tier pad + the sharded path's
        # device-multiple pad) so pad_fraction and the scaling model see
        # the replicated compute
        bt_dev = bt + ((-bt) % n_dev)
        _record_launch(K_, T_, arrs[0].shape[1], b, bt_dev, n_dev)
        # trailing tier-padding rows (replicas of block 0) stay in the
        # result: every caller indexes outputs by true block position, so
        # slicing them off on device would only add programs
        return launch_raw(K_, T_, P_, *arrs)

    if on_accel and per_block_bytes > 0:
        max_b = max(n_dev, (HBM_TABLE_BUDGET // per_block_bytes) * n_dev)
        # floor the chunk size to a tier so tier padding never exceeds the
        # HBM table budget
        max_b = max(n_dev, _b_tier_floor(max_b))
        if B > max_b:
            # tier-padded rows must never land in the MIDDLE of the
            # concatenated batch (callers index by true block position),
            # so any padded part is sliced back to its true size; with a
            # tier-valued max_b only the final part can need the slice
            parts = []
            for i in range(0, B, max_b):
                true_b = min(max_b, B - i)
                out = launch(K, T, P, *(a[i : i + max_b] for a in arrays))
                if _b_tier(true_b) > true_b:
                    out = _slice_b(out, true_b)
                parts.append(out)
            return tuple(jnp.concatenate(xs, axis=0) for xs in zip(*parts))
    return launch(K, T, P, *arrays)


def solve_batched_auto(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc):
    """Batched solve, dispatching to the Pallas TPU kernels when the problem
    shape supports them (T*2^K states fit VMEM: single samples up to K=16,
    single trios up to K=15) and a real accelerator is attached; otherwise
    the XLA scan path.  Both are bit-identical.

    With more than one attached device the block axis is sharded across the
    local mesh — this is the production multi-chip route: every batched CLI
    launch uses every chip."""
    from . import wmec_pallas

    use_pallas = wmec_pallas.kernel_supported(K, T, P) and jax.default_backend() != "cpu"
    kernel = wmec_pallas.solve_batched_pallas if use_pallas else solve_batched
    C = wdiff.shape[1]
    per_block = C * T * (1 << K) * 4 * 2  # index + trans backtrace, s32
    return _launch_batched(
        kernel, K, T, P, (wdiff, wbase, rankw, acost, die_prev, rc), per_block
    )


@dataclass
class DPResult:
    optimal_cost: int
    index_path: np.ndarray  # (C,) slot-space bipartition index per column
    trans_path: np.ndarray  # (C,) transmission value per column


def _next_pow2(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def connected_column_ranges(packed: PackedProblem) -> List[Tuple[int, int]]:
    """Split the column axis into maximal ranges not crossed by any read.

    A new range starts at column c when no slot is occupied by the same
    read in both c-1 and c (i.e. every occupant either died or the slot was
    re-assigned).  Within the DP, such boundaries fold the whole state away,
    so the ranges are independent subproblems — for T == 1 exactly (there is
    no transmission state to couple them).
    """
    C = packed.n_cols
    if C <= 1:
        return [(0, C)] if C else []
    crossing = (
        packed.active[:-1] & packed.active[1:] & ~packed.die_prev[1:]
    ).any(axis=1)
    starts = [0] + list(np.nonzero(~crossing)[0] + 1)
    return list(zip(starts, starts[1:] + [C]))


def _range_tiers(packed: PackedProblem, ranges, on_accel: bool):
    """(c_pad, k_tier) per read-connected range, with small K tiers merged
    into the next tier when the extra padded states cost less than a
    launch (_merge_k_pairs) — computed up front so slicing pads each range
    directly to its final launch bucket."""
    pairs = []
    for a, b in ranges:
        c_pad = _next_pow2(b - a, lo=64)
        act = np.nonzero(packed.active[a:b].any(axis=0))[0]
        k_used = int(act[-1]) + 1 if act.size else 1
        pairs.append((c_pad, _k_tier(k_used, packed.T, packed.P, on_accel)))
    if on_accel and len(pairs) > 1:
        merged = _merge_k_pairs(pairs, packed.T)
        pairs = [(cp, k) for (cp, _k), k in zip(pairs, merged)]
    return pairs


def _slice_ranges(packed: PackedProblem, ranges, on_accel: bool, tiers=None):
    """Slice each read-connected column range out of a packed problem as an
    independent padded block with its own launch-bucket slot count.

    die_prev of a block's first column may keep stale True flags; folding a
    fresh uniform state is a no-op, so they are harmless (and for the
    pedigree chain they are exactly the monolithic boundary fold).

    Per-range slot count: the greedy lowest-free-slot assignment keeps a
    read-connected range's occupied slots dense at the bottom, so slicing
    to the highest active slot gives each range its own 2^k state space
    (bucketing by K as well as by C — one high-coverage range must not
    make every sparse range pay its exponent).  `tiers` (from
    _range_tiers) overrides the per-range (c_pad, k_b) so launch-merged
    buckets pad straight to their final tier.

    Yields (c_pad, k_b, PaddedArrays) in range order.
    """
    from ..parallel.blocks import PaddedArrays

    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    rankw_full = np.where(
        packed.rank >= 0, (1 << np.maximum(packed.rank, 0).astype(np.int64)), 0
    ).astype(np.float32)
    wdiff_full = packed.wdiff.reshape(C, K, T * P * 2).astype(np.float32)

    if tiers is None:
        tiers = _range_tiers(packed, ranges, on_accel)
    for (a, b), (c_pad, k_b) in zip(ranges, tiers):
        n = b - a
        kk = min(K, k_b)
        nA = 1 << P
        arrs = PaddedArrays(
            wdiff=np.zeros((c_pad, k_b, T * P * 2), dtype=np.float32),
            wbase=np.zeros((c_pad, T, P, 2), dtype=np.int32),
            rankw=np.zeros((c_pad, k_b), dtype=np.float32),
            acost=np.zeros((c_pad, T, nA), dtype=np.int32),
            die_prev=np.zeros((c_pad, k_b), dtype=bool),
            rc=np.full(c_pad, INF, dtype=np.int32),
            n_cols=n,
        )
        arrs.wdiff[:n, :kk] = wdiff_full[a:b, :kk]
        arrs.wbase[:n] = packed.wbase[a:b]
        arrs.rankw[:n, :kk] = rankw_full[a:b, :kk]
        arrs.acost[:n] = packed.acost[a:b]
        arrs.die_prev[:n, :kk] = packed.die_prev[a:b, :kk]
        arrs.rc[:n] = packed.rc[a:b]
        if c_pad > n:
            arrs.rankw[n:, :kk] = rankw_full[b - 1, :kk]
        yield c_pad, k_b, arrs


def run_dp_batched(packed: PackedProblem) -> Optional[DPResult]:
    """Solve a single-sample (T == 1) instance by splitting it into
    read-connected blocks, bucketing the blocks by padded column count and
    solving each bucket as one batched device launch.

    This is the production CLI route onto the batched Pallas/XLA kernels
    (`solve_batched_auto`): one chromosome usually decomposes into many
    short blocks, which batch into a few fixed-shape launches instead of C
    sequential scan steps per block.  Costs, partitionings and superreads
    are bit-identical to the monolithic solve; index-path bits of inactive
    slots (don't-cares for all outputs) may differ.

    Returns None when the instance has transmission state (T > 1) or only
    one block — callers fall back to the monolithic path.
    """
    from . import wmec_pallas
    from ..parallel.blocks import PaddedArrays, pad_block, stack_blocks

    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    if C == 0 or T != 1:
        return None
    ranges = connected_column_ranges(packed)
    if len(ranges) <= 1:
        return None

    enable_persistent_cache()  # before the first glue jnp op of the route
    on_accel = jax.default_backend() != "cpu"

    buckets: dict = {}  # (c_pad, k_b) -> list of (range_index, PaddedArrays)
    for ri, (c_pad, k_b, arrs) in enumerate(_slice_ranges(packed, ranges, on_accel)):
        buckets.setdefault((c_pad, k_b), []).append((ri, arrs))

    total_cost = 0
    index_path = np.zeros(C, dtype=np.int64)
    trans_path = np.zeros(C, dtype=np.int64)
    # Dispatch every bucket's launch before fetching anything (parallel
    # threads: first-contact compiles/loads overlap): jit dispatch is
    # async, while each jax.device_get call is one host<->device round
    # trip (tens of ms over a tunnel) — one fetch for all buckets, not one
    # per output array per bucket.
    def _bucket_thunk(k_b, members):
        stacked = stack_blocks([arrs for _, arrs in members])
        return members, solve_batched_auto(
            k_b, T, P, *[jnp.asarray(x) for x in stacked]
        )

    pending = _run_bucket_thunks(
        [
            partial(_bucket_thunk, k_b, members)
            for (c_pad, k_b), members in buckets.items()
        ]
    )
    fetched = jax.device_get([out for _, out in pending])
    for (members, _), (costs, index_paths, trans_paths) in zip(pending, fetched):
        index_paths = np.asarray(index_paths, dtype=np.int64)
        trans_paths = np.asarray(trans_paths, dtype=np.int64)
        for bi, (ri, arrs) in enumerate(members):
            a, b = ranges[ri]
            total_cost += int(costs[bi])
            index_path[a:b] = index_paths[bi, : b - a]
            trans_path[a:b] = trans_paths[bi, : b - a]
    return DPResult(total_cost, index_path, trans_path)


def run_dp_batched_pedigree(packed: PackedProblem) -> Optional[DPResult]:
    """Solve a pedigree (T > 1) instance by splitting it into read-connected
    blocks and solving all blocks as batched device launches, exactly —
    matching the monolithic scan bit-for-bit.

    Unlike T == 1, the blocks are coupled: the transmission chain crosses
    read-connectivity boundaries (recombination cost between adjacent
    columns, pedigreedptable.cpp:262-300).  But the DP is min-plus linear
    in its incoming folded state, and at a boundary every active slot dies,
    so the whole coupling is the T-vector m[t] = min_s dp_last[s, t].  The
    chromosome therefore solves in two batched passes plus a tiny host
    chain:

      1. every block runs T unit-seeded forward scans (one batched launch
         per (C, K) bucket) yielding its T x T seam matrix G;
      2. the host chains m_j = minplus(m_{j-1}, G_j) over blocks in order
         (integer min-plus — exact);
      3. every block re-runs seeded with its incoming m vector, emitting
         the head backtrace plus one backtrace per possible seam
         transmission value; the host stitches right-to-left, picking each
         block's path by the transmission value handed back from the next
         block's seam.

    Total device work is (2T + 1) forward column scans per block (T unit
    seeds + T + 1 backtraces) over the block's OWN 2^k state space — for
    uneven coverage and many blocks this beats one monolithic scan over
    2^K_max, and every launch batches across blocks and shards over the
    mesh.

    Returns None for T == 1 (run_dp_batched handles it) or single-block
    instances.
    """
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    if C == 0 or T == 1:
        return None
    ranges = connected_column_ranges(packed)
    nb = len(ranges)
    if nb <= 1:
        return None

    enable_persistent_cache()  # before the first glue jnp op of the route
    on_accel = jax.default_backend() != "cpu"
    blocks = list(_slice_ranges(packed, ranges, on_accel))
    die_next = []
    for ri, (c_pad, k_b, arrs) in enumerate(blocks):
        dn = np.zeros(k_b, dtype=bool)
        if ri + 1 < nb:
            nxt = packed.die_prev[ranges[ri + 1][0]]
            kk = min(len(nxt), k_b)
            dn[:kk] = nxt[:kk]
        die_next.append(dn)

    buckets: dict = {}  # (c_pad, k_b) -> list of range indices
    for ri, (c_pad, k_b, _arrs) in enumerate(blocks):
        buckets.setdefault((c_pad, k_b), []).append(ri)

    from ..parallel.blocks import stack_blocks

    # Transmission-symmetry cosets: for every XOR mask d in the span of
    # packed.t_sym_masks, G[a][b] == G[a^d][b^d] (founder haplotype
    # relabeling — see pack_problem).  One seeded scan per coset
    # representative recovers the full T x T seam matrix:
    #     G[a][b] = G[rep(a)][b ^ (a ^ rep(a))].
    # For a single trio that is 1 scan instead of 4; for two disjoint trios
    # 1 instead of 16.
    span = {0}
    for g in packed.t_sym_masks:
        span |= {d ^ g for d in span}
    rep_of = np.full(T, -1, dtype=np.int64)  # t -> index into reps
    reps: List[int] = []
    for a in range(T):
        if rep_of[a] >= 0:
            continue
        for d in span:
            if rep_of[a ^ d] < 0:
                rep_of[a ^ d] = len(reps)
        reps.append(a)
    R = len(reps)
    rep_val = np.asarray(reps, dtype=np.int64)
    unit_seeds = np.full((R, T), INF, dtype=np.int32)
    unit_seeds[np.arange(R), rep_val] = 0

    # ---- pass 1: unit-seeded forwards -> per-block seam matrices G ----
    # Dispatch all buckets before fetching: each jax.device_get call is one
    # host<->device round trip (tens of ms over a tunnel), so the fetch for
    # every bucket is fused into a single call (round-3 spent ~9 s of a
    # 9.5 s trio run in 36 such round trips).
    from . import wmec_pallas

    G = np.zeros((nb, T, T), dtype=np.int64)
    stacked_by_bucket = {}

    def _pass1_thunk(c_pad, k_b, idxs):
        stacked = stacked_by_bucket[(c_pad, k_b)]
        B = len(idxs)
        dp0 = np.tile(unit_seeds, (B, 1))
        if on_accel:
            # fused repeat+tier-pad in one device program; dp0 pads on the
            # host (numpy, free) to the same tier
            bt = _b_tier(B * R)
            rep = _prep_batch(R, bt, *stacked)
            if bt > B * R:
                dp0 = np.concatenate(
                    [dp0, np.repeat(dp0[:1], bt - B * R, axis=0)], axis=0
                )
            kern = (
                wmec_pallas.forward_m_seeded_pallas
                if wmec_pallas.kernel_supported(k_b, T, P)
                else forward_m_batched
            )
        else:
            rep = tuple(np.repeat(x, R, axis=0) for x in stacked)
            kern = forward_m_batched
        return idxs, _launch_batched(kern, k_b, T, P, rep + (dp0,))

    for (c_pad, k_b), idxs in buckets.items():
        stacked_by_bucket[(c_pad, k_b)] = stack_blocks(
            [blocks[ri][2] for ri in idxs]
        )

    def _pass2_launch(c_pad, k_b, idxs, dp0):
        stacked = stacked_by_bucket[(c_pad, k_b)]
        dnext = np.stack([die_next[ri] for ri in idxs])
        S = 1 << k_b
        # head + T seam backtraces retire the forward tables per block
        per_block = c_pad * T * S * 4 * 2
        kern = (
            solve_seeded_batched_pallas
            if on_accel and wmec_pallas.kernel_supported(k_b, T, P)
            else solve_seeded_batched
        )
        return _launch_batched(
            kern, k_b, T, P, stacked + (dp0, dnext), per_block_bytes=per_block
        )

    # Pass-2 executable warmups, overlapped with pass 1: the seeded solve's
    # first contact per bucket shape pays a multi-second compile-or-load
    # round trip on a tunneled backend, and pass 2's shapes depend only on
    # the buckets (known now), not on pass 1's results.  Fire a zero-seeded
    # launch per not-yet-warmed shape alongside the pass-1 thunks, discard
    # the result; the real pass-2 call then finds the executable loaded.
    warm_thunks = []
    if on_accel and not os.environ.get("WHATSHAP_TPU_NO_PASS2_WARMUP"):
        for (c_pad, k_b), idxs in buckets.items():
            key = (k_b, T, P, c_pad, _b_tier(len(idxs)))
            if key in _PASS2_SHAPES_WARMED:
                continue
            _PASS2_SHAPES_WARMED.add(key)
            warm_thunks.append(
                partial(
                    _pass2_launch,
                    c_pad,
                    k_b,
                    idxs,
                    np.zeros((len(idxs), T), dtype=np.int32),
                )
            )

    pass1_thunks = [
        partial(_pass1_thunk, c_pad, k_b, idxs)
        for (c_pad, k_b), idxs in buckets.items()
    ]
    pending_m = _run_bucket_thunks(pass1_thunks + warm_thunks)[: len(pass1_thunks)]

    m_in = None
    m_in_dev = None
    if (
        on_accel
        and R == 1
        and not os.environ.get("WHATSHAP_TPU_HOST_SEAM_CHAIN")
    ):
        # Device seam chain: keep the per-bucket m vectors on the device,
        # expand them to seam matrices (G[a][b] = m[a^b] — the single-coset
        # case), min-plus-chain them in block order with a lax.scan, and
        # seed pass 2 by device gather.  This removes the host fetch (a
        # full tunnel round trip, tens of ms) between the two passes: the
        # whole chromosome queues as one device program chain with a
        # single fence at the pass-2 fetch.
        order_row = np.empty(nb, dtype=np.int32)
        parts = []
        offset = 0
        for idxs, m in pending_m:
            B_b = len(idxs)
            parts.append(m[:B_b])
            for pos, ri in enumerate(idxs):
                order_row[ri] = offset + pos
            offset += B_b
        nbp = _b_tier(nb)
        perm = np.full(nbp, nb, dtype=np.int32)  # padding -> identity row
        perm[:nb] = order_row
        m_in_dev = _seam_chain_device(nbp, tuple(parts), jnp.asarray(perm))
    else:
        # expand coset rows to the full matrix:
        # G[a][b] = Gr[rep_of[a]][b^a^rep(a)]
        a_idx = np.arange(T)[:, None]
        b_idx = np.arange(T)[None, :]
        row_sel = rep_of[a_idx]  # (T, 1)
        col_sel = b_idx ^ a_idx ^ rep_val[rep_of[a_idx]]  # (T, T)
        for (idxs, _), m_out in zip(
            pending_m, jax.device_get([m for _, m in pending_m])
        ):
            m_out = np.asarray(m_out, dtype=np.int64)  # (B*R, T)
            for bi, ri in enumerate(idxs):
                Gr = m_out[bi * R : (bi + 1) * R]  # (R, T)
                G[ri] = Gr[row_sel, col_sel]

        # ---- host chain: incoming seam vector per block (min-plus) ----
        m_in = np.zeros((nb, T), dtype=np.int64)  # block 0: uniform zeros
        m_cur = np.minimum(G[0].min(axis=0), INF)
        for j in range(1, nb):
            m_in[j] = m_cur
            m_cur = np.minimum((m_cur[:, None] + G[j]).min(axis=0), INF)

    # ---- pass 2: seeded solves with per-seam backtraces ----
    # Same dispatch-all-then-fetch-once pattern as pass 1.
    per_block_out = [None] * nb

    def _pass2_thunk(c_pad, k_b, idxs):
        if m_in_dev is not None:
            dp0 = jnp.take(
                m_in_dev, jnp.asarray(np.asarray(idxs, dtype=np.int32)), axis=0
            )
        else:
            dp0 = np.stack([m_in[ri].astype(np.int32) for ri in idxs])
        return idxs, _pass2_launch(c_pad, k_b, idxs, dp0)

    pending_out = _run_bucket_thunks(
        [
            partial(_pass2_thunk, c_pad, k_b, idxs)
            for (c_pad, k_b), idxs in buckets.items()
        ]
    )
    for (idxs, _), out in zip(
        pending_out, jax.device_get([o for _, o in pending_out])
    ):
        out = tuple(np.asarray(x) for x in out)
        for bi, ri in enumerate(idxs):
            per_block_out[ri] = tuple(x[bi] for x in out)

    # ---- host stitch, right to left ----
    index_path = np.zeros(C, dtype=np.int64)
    trans_path = np.zeros(C, dtype=np.int64)
    cost_head, _m, ip_head, tp_head, seam_head, _ips, _tps, _seams = per_block_out[-1]
    total_cost = int(cost_head)
    a, b = ranges[-1]
    index_path[a:b] = ip_head[: b - a]
    trans_path[a:b] = tp_head[: b - a]
    prev_t = int(seam_head)
    for j in range(nb - 2, -1, -1):
        _c, _m, _iph, _tph, _sh, ips, tps, seams = per_block_out[j]
        a, b = ranges[j]
        index_path[a:b] = ips[prev_t][: b - a]
        trans_path[a:b] = tps[prev_t][: b - a]
        prev_t = int(seams[prev_t])
    return DPResult(total_cost, index_path, trans_path)


def solve_packed_list(
    packed_list: Sequence[PackedProblem], c_pad: Optional[int] = None
) -> List[Optional[DPResult]]:
    """Solve a list of independent same-(T, P) instances as a few batched
    device launches, bucketed by (padded K, padded column count).

    Bucketing by K matters as much as by C: the state space is 2^K, so one
    high-coverage block in a batch would otherwise make every low-coverage
    block pay its exponent (the batch analogue of the reference's adaptive
    per-column 2^k_c cost, pedigreedptable.cpp:84-135).  Each bucket pads
    to its own slot count and column count; results are returned in input
    order and are bit-identical to per-block serial solves (inactive-slot
    index-path bits are don't-cares).
    """
    from . import wmec_pallas
    from ..parallel.blocks import pad_block, stack_blocks

    results: List[Optional[DPResult]] = [None] * len(packed_list)
    if not packed_list:
        return results
    T, P = packed_list[0].T, packed_list[0].P
    # dispatch all buckets, then fetch everything in one host<->device
    # round trip (see run_dp_batched)
    pending = []
    for k_b, cp, idxs, stacked in bucket_packed_list(packed_list, c_pad):
        out = solve_batched_auto(k_b, T, P, *[jnp.asarray(x) for x in stacked])
        pending.append((idxs, out))
    for (idxs, _), (costs, ipaths, tpaths) in zip(
        pending, jax.device_get([out for _, out in pending])
    ):
        ipaths = np.asarray(ipaths, dtype=np.int64)
        tpaths = np.asarray(tpaths, dtype=np.int64)
        for bi, i in enumerate(idxs):
            n = packed_list[i].n_cols
            results[i] = DPResult(int(costs[bi]), ipaths[bi, :n], tpaths[bi, :n])
    return results


# One kernel launch+fence costs roughly this many state*column*T units of
# VPU work; used to decide whether a small launch bucket is worth its
# dispatch overhead.  On the attached v5e the measured per-launch overhead
# is ~25 ms and the kernel sustains ~7.5e9 states/s, putting the
# break-even near 2e8 (the round-3 constant of 2.5e7 corresponded to a
# ~3 ms overhead and kept launch-bound small buckets alive).
MERGE_OVERHEAD_STATES = float(
    os.environ.get("WHATSHAP_TPU_MERGE_OVERHEAD_STATES", 2e8)
)


def _merge_k_pairs(pairs: List[Tuple[int, int]], T: int) -> List[int]:
    """Launch-merge model for per-range buckets: given (c_pad, k_tier) per
    range, raise small tiers into the next tier of the same c_pad whenever
    the extra padded state work costs less than one launch
    (MERGE_OVERHEAD_STATES).  Returns the final k per range."""
    by_cp: dict = {}
    for i, (cp, kb) in enumerate(pairs):
        by_cp.setdefault(cp, {}).setdefault(kb, []).append(i)
    out = [kb for _cp, kb in pairs]
    for cp, tiers in by_cp.items():
        items = sorted(tiers.items())
        i = 0
        while i + 1 < len(items):
            k_b, idxs = items[i]
            k_next = items[i + 1][0]
            added_states = len(idxs) * ((1 << k_next) - (1 << k_b)) * cp * T
            if added_states < MERGE_OVERHEAD_STATES:
                items[i + 1] = (k_next, idxs + items[i + 1][1])
            else:
                for j in idxs:
                    out[j] = k_b
            i += 1
        k_b, idxs = items[-1]
        for j in idxs:
            out[j] = k_b
    return out


def _k_tier(k: int, T: int, P: int, on_accel: bool) -> int:
    """Launch-bucket slot count for a block of coverage k.

    On accelerators, rounds up to the Pallas lane minimum only — K stays
    exact above it.  Rounding odd K to even tiers (a round-3 rule to halve
    Mosaic compile counts) doubled the state space of every odd-coverage
    block; with the batch-tier ladder, the persistent compile cache and
    tools/precompile.py bounding cold compiles, exact K wins (the default
    coverage-15 workload runs 2^15 states per block, not 2^16).
    """
    from . import wmec_pallas

    k = max(k, 1)
    if not on_accel or not wmec_pallas.kernel_supported(
        max(k, wmec_pallas.LANE_BITS), T, P
    ):
        return k
    return max(k, wmec_pallas.LANE_BITS)


def bucket_packed_list(
    packed_list: Sequence[PackedProblem], c_pad: Optional[int] = None
) -> List[Tuple[int, int, List[int], tuple]]:
    """Group same-(T, P) instances into fixed-shape launch buckets.

    Returns [(k_pad, c_pad, block_indices, stacked_arrays)] ready for
    `solve_batched_auto(k_pad, T, P, *stacked_arrays)` per bucket.
    """
    from . import wmec_pallas
    from ..parallel.blocks import pad_block, stack_blocks

    if not packed_list:
        return []
    T, P = packed_list[0].T, packed_list[0].P
    on_accel = jax.default_backend() != "cpu"
    buckets: dict = {}  # (k_pad, c_pad) -> list of block indices
    for i, p in enumerate(packed_list):
        if p.T != T or p.P != P:
            raise ValueError("solve_packed_list: all blocks must share (T, P)")
        k_b = _k_tier(p.K, T, P, on_accel)
        cp = c_pad if c_pad is not None else _next_pow2(max(p.n_cols, 1), lo=64)
        cp = max(cp, p.n_cols)
        buckets.setdefault((k_b, cp), []).append(i)

    if on_accel:
        # Launch-count / state-work trade-off: a separate small bucket saves
        # 2^Δk of state work for its blocks but pays a full kernel dispatch
        # + fence (tens of ms over an RPC-attached chip, and low VPU
        # occupancy for small batches).  Merge a bucket into the next K tier
        # (same c_pad) when the extra padded state work costs less than a
        # launch.  Measured on v5e (trio workload, B=64 vs 256): uniform
        # beats naive per-K buckets at B=64, per-K wins 1.44x at B=256;
        # this model picks correctly in both regimes.
        by_cp: dict = {}
        for (k_b, cp), idxs in buckets.items():
            by_cp.setdefault(cp, []).append((k_b, idxs))
        buckets = {}
        for cp, items in by_cp.items():
            items.sort()
            i = 0
            while i < len(items):
                k_b, idxs = items[i]
                if i + 1 < len(items):
                    k_next = items[i + 1][0]
                    added_states = len(idxs) * ((1 << k_next) - (1 << k_b)) * cp * T
                    if added_states < MERGE_OVERHEAD_STATES:
                        items[i + 1] = (k_next, idxs + items[i + 1][1])
                        i += 1
                        continue
                buckets[(k_b, cp)] = idxs
                i += 1

    out = []
    for (k_b, cp), idxs in buckets.items():
        padded = [pad_block(packed_list[i], cp, k_pad=k_b) for i in idxs]
        out.append((k_b, cp, idxs, stack_blocks(padded)))
    return out


def _run_dp_native(packed: PackedProblem) -> Optional[DPResult]:
    """Dispatch to the C++ exact engine (native/wmeclib.cpp) — bit-exact
    with the numpy mirror (differential-fuzzed), but with the reference's
    adaptive per-column 2^k_c complexity instead of the padded 2^K.
    WHATSHAP_TPU_NO_NATIVE=1 disables."""
    try:
        from ..native import wmeclib
    except ImportError:  # pragma: no cover
        return None
    if wmeclib is None:
        return None
    result = wmeclib.solve(
        packed.n_cols,
        packed.K,
        packed.T,
        packed.P,
        packed.active,
        packed.die_prev,
        packed.wdiff,
        packed.wbase,
        packed.acost,
        packed.rank,
        packed.rc,
    )
    if result is None:
        return None
    cost, index_path, trans_path = result
    return DPResult(cost, index_path, trans_path)


def run_dp(packed: PackedProblem, backend: str = "auto") -> Optional[DPResult]:
    """Run the forward scan + backtrace.  Returns None for empty problems.

    backend: "auto" | "jax" | "numpy" | "batched".  The numpy mirror is
    exact and faster than a jit compile for tiny state spaces; the jax path
    pads the column count to power-of-two buckets so jit caches are reused
    across blocks; "batched" splits single-sample instances into
    read-connected blocks and solves them as batched device launches
    (run_dp_batched), falling back to "jax" when not applicable.

    The WHATSHAP_TPU_BACKEND environment variable overrides "auto" routing
    (set it to numpy/jax/batched to force a path through the CLI).
    """
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    if C == 0:
        return None
    S = 1 << K

    if backend == "auto":
        backend = os.environ.get("WHATSHAP_TPU_BACKEND", "")
        if backend not in ("numpy", "jax", "batched"):
            if C * S * T <= HOST_ROUTE_WORK:
                backend = "numpy"
            elif jax.default_backend() != "cpu":
                # production TPU route: block-split + batched kernel launches
                # (single-sample and pedigree both; the pedigree route chains
                # seam vectors across blocks, run_dp_batched_pedigree)
                backend = "batched"
            else:
                backend = "jax"
                # When the jax route would land on the XLA scan (no
                # accelerator or unsupported kernel shape), prefer the
                # native host engine if its ADAPTIVE cost is small: it pays
                # sum_c 2^k_c per column like the reference, so a high-K
                # but sparse-coverage instance that is infeasible padded to
                # 2^K stays cheap on the host.
                from . import wmec_pallas

                pallas_ok = (
                    jax.default_backend() != "cpu"
                    and wmec_pallas.kernel_supported(max(K, 7), T, P)
                )
                if not pallas_ok:
                    try:
                        from ..native import wmeclib
                    except ImportError:  # pragma: no cover
                        wmeclib = None
                    if wmeclib is not None:
                        k_c = packed.active.sum(axis=1).astype(np.int64)
                        adaptive = int(
                            np.sum(np.int64(1) << np.minimum(k_c, 40))
                        ) * T * T
                        if adaptive <= ADAPTIVE_ROUTE_WORK:
                            backend = "numpy"

    if backend == "batched":
        result = run_dp_batched(packed) if T == 1 else run_dp_batched_pedigree(packed)
        if result is not None:
            return result
        backend = "jax"

    if backend == "jax":
        # forward + backtrace fully on device; only the paths come back
        from . import wmec_pallas
        from ..parallel.blocks import pad_block

        enable_persistent_cache()
        c_pad = _next_pow2(C)
        use_pallas = (
            jax.default_backend() != "cpu" and wmec_pallas.kernel_supported(max(K, 7), T, P)
        )
        k_run = max(K, wmec_pallas.LANE_BITS) if use_pallas else K
        # whole-chromosome instances would need O(C * 2^K) backtrace tables
        # in HBM; above ~2 GB switch to the segmented solve (checkpoint +
        # recompute — the TPU analogue of the reference's sqrt(n)-column
        # trick, pedigreedptable.cpp:104,127-173).  The segmented path only
        # needs C padded to a segment multiple, not a power of two — the
        # per-segment kernel shapes are fixed, so the jit cache is unaffected.
        # segment length: bound one segment's backtrace tables near the
        # budget (high K shrinks the segment instead of blowing HBM)
        per_col_bytes = (1 << k_run) * T * 4 * (2 if T > 1 else 1)
        seg = max(256, min(2048, _next_pow2(SEGMENT_TABLE_BUDGET // max(per_col_bytes, 1), lo=256) >> 1))
        table_bytes = c_pad * per_col_bytes
        use_segmented = use_pallas and table_bytes > 2 * SEGMENT_TABLE_BUDGET
        # XLA fallback shapes (K 17..23, or any unsupported T) get the same
        # sqrt(n) treatment once full tables would exceed ~1 GB; segment
        # length trades checkpoint memory against table memory.
        use_segmented_xla = not use_pallas and table_bytes > SEGMENT_TABLE_BUDGET
        if use_segmented_xla:
            seg = max(64, min(2048, _next_pow2(int(np.sqrt(C)), lo=64)))
        if use_segmented or use_segmented_xla:
            c_pad = ((C + seg - 1) // seg) * seg
        padded = pad_block(packed, c_pad, k_pad=k_run)
        args = (
            jnp.asarray(padded.wdiff),
            jnp.asarray(padded.wbase),
            jnp.asarray(padded.rankw),
            jnp.asarray(padded.acost),
            jnp.asarray(padded.die_prev),
            jnp.asarray(padded.rc),
        )
        if use_pallas:
            if use_segmented:
                costs, index_paths, trans_paths = wmec_pallas.solve_segmented(
                    k_run, T, P, *[a[None] for a in args], seg=seg
                )
            else:
                costs, index_paths, trans_paths = wmec_pallas.solve_batched_pallas(
                    k_run, T, P, *[a[None] for a in args]
                )
            cost, index_path, trans_path = costs[0], index_paths[0], trans_paths[0]
        elif use_segmented_xla:
            result = solve_scan_segmented(K, T, P, *args, seg=seg)
            return DPResult(
                result.optimal_cost, result.index_path[:C], result.trans_path[:C]
            )
        else:
            cost, index_path, trans_path = _solve_scan(K, T, P, *args)
        return DPResult(
            int(cost),
            np.asarray(index_path, dtype=np.int64)[:C],
            np.asarray(trans_path, dtype=np.int64)[:C],
        )

    native = _run_dp_native(packed)
    if native is not None:
        return native

    from . import wmec_numpy

    dp_last, jmin_last, key_last, proj_idx, proj_jmin = wmec_numpy.forward_scan_numpy(
        packed
    )
    dp_last = np.asarray(dp_last)
    jmin_last = np.asarray(jmin_last)
    key_last = np.asarray(key_last)
    proj_idx = np.asarray(proj_idx)
    proj_jmin = np.asarray(proj_jmin)
    C_run = proj_idx.shape[0]  # C, or the padded column count on the jax path

    # ---- final optimum: first strict minimum in (gray order, transmission)
    # iteration (pedigreedptable.cpp:308-315), with a numeric-index tiebreak
    # to select the zero-padded representative among inactive-bit duplicates.
    m = dp_last.min()
    cand = dp_last == m
    key2 = np.where(cand, key_last[:, None].astype(np.int64), np.iinfo(np.int64).max)
    km = key2.min()
    cand &= key2 == km
    # among remaining: smallest transmission, then smallest index
    ti = np.nonzero(cand)
    order = np.lexsort((ti[0], ti[1]))  # sort by trans, then index
    opt_idx = int(ti[0][order[0]])
    opt_trans = int(ti[1][order[0]])
    optimal_cost = int(m)

    # ---- backtrace (pedigreedptable.cpp:137-173) ----
    # On the jax path the walk starts in the padded tail, where projection
    # tables are identities — semantics match the unpadded walk exactly.
    index_path = np.zeros(C_run, dtype=np.int64)
    trans_path = np.zeros(C_run, dtype=np.int64)
    v_idx, v_trans = opt_idx, opt_trans
    prev_trans = int(jmin_last[opt_idx, opt_trans])
    index_path[C_run - 1] = v_idx
    trans_path[C_run - 1] = v_trans
    for i in range(C_run - 1, 0, -1):
        # backtrace tables of column i-1 were emitted at scan step i
        v_idx = int(proj_idx[i, v_idx, prev_trans])
        v_trans = prev_trans
        prev_trans = int(proj_jmin[i, v_idx, v_trans])
        index_path[i - 1] = v_idx
        trans_path[i - 1] = v_trans
    return DPResult(optimal_cost, index_path[:C], trans_path[:C])


# ---------------------------------------------------------------------------
# Output extraction (host, numpy)
# ---------------------------------------------------------------------------


def extract_partitioning(packed: PackedProblem, result: Optional[DPResult]) -> List[int]:
    """Per-read partition (0 or 1).

    The C++ marks reads with bit==0 as ``true`` (pedigreedptable.cpp:391-406)
    and the Cython wrapper inverts that back (core.pyx:410-416:
    ``0 if x else 1``), so the exposed value equals the bipartition bit; reads
    never active in any column default to 1.
    """
    out = [1] * packed.n_reads
    if result is None:
        return out
    for r in range(packed.n_reads):
        s = packed.read_slot[r]
        c = packed.read_first_col[r]
        if s < 0 or c < 0:
            continue
        out[r] = (int(result.index_path[c]) >> int(s)) & 1
    return out


def extract_alleles(
    packed: PackedProblem, result: DPResult, pedigree: Pedigree
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-column, per-individual optimal alleles + qualities.

    Replicates PedigreeColumnCostComputer::get_alleles
    (pedigreecolumncostcomputer.cpp:117-175) at the traced-back optimum,
    including its exact tie handling: the LAST assignment attaining the
    minimum cost wins (``cost <= best_cost``), the reported quality is the
    gap for haplotype 1, and an allele becomes EQUAL_SCORES (3) when its
    haplotype's two allele costs tie.

    Returns (allele0, allele1, quality) of shape (C, n_individuals).
    """
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    n_ind = len(pedigree)
    nA = 1 << P

    b = (
        (result.index_path[:, None] >> np.arange(K)[None, :]) & 1
    ).astype(np.int64)  # (C, K)
    t_sel = result.trans_path  # (C,)
    # cost_partition[c, p, a] at the optimum
    wdiff_sel = packed.wdiff[np.arange(C), :, t_sel]  # (C, K, P, 2)
    wbase_sel = packed.wbase[np.arange(C), t_sel]  # (C, P, 2)
    cp = wbase_sel + np.einsum("ck,ckpa->cpa", b, wdiff_sel.astype(np.int64))

    assign_idx = np.arange(nA)
    abits = ((assign_idx[:, None] >> np.arange(P)[None, :]) & 1).astype(np.int64)
    acost_sel = packed.acost[np.arange(C), t_sel].astype(np.int64)  # (C, nA)
    # total[c, a] = acost + sum_p cp[c, p, bit_p(a)]
    cp0 = cp[:, :, 0]  # (C, P)
    cp1 = cp[:, :, 1]
    total = (
        acost_sel
        + cp0.sum(axis=1)[:, None]
        + (cp1 - cp0) @ abits.T  # (C, nA)
    )
    total = np.minimum(total, INF)

    compatible = acost_sel < INF  # (C, nA)
    total_masked = np.where(compatible, total, np.int64(1) << 60)
    best_cost = total_masked.min(axis=1)  # (C,)
    if np.any(best_cost >= INF):
        raise MendelianConflictError()
    # last argmin among compatible assignments ("cost <= best_cost")
    is_best = total_masked == best_cost[:, None]
    last_best = nA - 1 - np.argmax(is_best[:, ::-1], axis=1)  # (C,)

    allele0 = np.zeros((C, n_ind), dtype=np.int64)
    allele1 = np.zeros((C, n_ind), dtype=np.int64)
    quality = np.zeros((C, n_ind), dtype=np.int64)
    for ind in range(n_ind):
        part0 = packed.h2p[t_sel, ind, 0]  # (C,)
        part1 = packed.h2p[t_sel, ind, 1]
        a0_of_assign = (assign_idx[None, :] >> part0[:, None]) & 1  # (C, nA)
        a1_of_assign = (assign_idx[None, :] >> part1[:, None]) & 1
        a0 = a0_of_assign[np.arange(C), last_best]
        a1 = a1_of_assign[np.arange(C), last_best]
        # best cost for forcing each haplotype to each allele
        big = np.int64(1) << 60
        bc = np.where(compatible, total, big)
        bcfa00 = np.where(a0_of_assign == 0, bc, big).min(axis=1)
        bcfa01 = np.where(a0_of_assign == 1, bc, big).min(axis=1)
        bcfa10 = np.where(a1_of_assign == 0, bc, big).min(axis=1)
        bcfa11 = np.where(a1_of_assign == 1, bc, big).min(axis=1)
        q0 = np.abs(bcfa00 - bcfa01)
        q1 = np.abs(bcfa10 - bcfa11)
        # reference quirk: quality is overwritten by the haplotype-1 value
        quality[:, ind] = q1
        allele0[:, ind] = np.where(q0 == 0, 3, a0)
        allele1[:, ind] = np.where(q1 == 0, 3, a1)
    return allele0, allele1, quality

"""
Genotyping forward-backward HMM over the same bipartition x transmission
state space as the wMEC solver, in probability space with per-column
rescaling.

Semantics parity with src/genotypedptable.cpp, genotypecolumncostcomputer.cpp
and transitionprobabilitycomputer.cpp.  The host path computes in numpy
longdouble (80-bit extended on x86-64, matching the C++ long double); the
same slot layout as ops/wmec.py is reused: per-column sums over dying/born
slot bits are sum-folds, and sums over the (padded) state axis are corrected
by the exact power-of-two duplicate factor of inactive slots.
"""

from typing import List, Optional

import numpy as np

from ..core.pedigree_model import Pedigree
from ..core.genotype import Genotype
from . import wmec

LD = np.longdouble


def _phred_probability(phred: int) -> LD:
    # genotypecolumncostcomputer.cpp:26-37: phred 0 maps to 0.9999
    if phred == 0:
        return LD("0.9999")
    return LD(10) ** (LD(-int(phred)) / LD(10))


def _transition_tables(packed: "wmec.PackedProblem", pedigree: Pedigree):
    """Per-column transmission transition matrix and allele-assignment prior.

    Mirrors TransitionProbabilityComputer (transitionprobabilitycomputer.cpp).
    """
    C, T, P = packed.n_cols, packed.T, packed.P
    n_ind = len(pedigree)
    nA = 1 << P
    trio_count = pedigree.triple_count

    pcmat = wmec._popcount_matrix(T).astype(np.int64)

    trans = np.zeros((C, T, T), dtype=LD)
    passign = np.zeros((C, T, nA), dtype=LD)

    # per (t, a, ind): genotype index a0 + a1
    gt_idx = np.zeros((T, nA, max(n_ind, 1)), dtype=np.int64)
    for t in range(T):
        for ind in range(n_ind):
            p0 = packed.h2p[t, ind, 0]
            p1 = packed.h2p[t, ind, 1]
            a0 = (np.arange(nA) >> p0) & 1
            a1 = (np.arange(nA) >> p1) & 1
            gt_idx[t, :, ind] = a0 + a1

    for c in range(C):
        recomb_prob = LD(10) ** (-LD(int(packed.rc[c])) / LD(10))
        bernoulli = np.array(
            [
                recomb_prob**i * (1 - recomb_prob) ** (2 * trio_count - i)
                for i in range(2 * trio_count + 1)
            ],
            dtype=LD,
        )
        m = bernoulli[pcmat]
        trans[c] = m / m.sum(axis=1, keepdims=True)

        # allele-assignment prior from genotype likelihoods
        gl = np.zeros((max(n_ind, 1), 3), dtype=LD)
        for ind in range(n_ind):
            gls = pedigree.get_genotype_likelihoods(ind, c)
            assert gls is not None
            vec = gls.as_vector()
            gl[ind] = [LD(v) for v in vec]
        for t in range(T):
            probs = np.ones(nA, dtype=LD)
            for ind in range(n_ind):
                probs *= gl[ind][gt_idx[t, :, ind]]
            # deduplicate by genotype vector multiplicity
            counts = {}
            keys = [tuple(gt_idx[t, a]) for a in range(nA)]
            for k in keys:
                counts[k] = counts.get(k, 0) + 1
            mult = np.array([counts[k] for k in keys], dtype=LD)
            probs = probs / mult
            # the reference normalizes unconditionally; a zero sum yields
            # NaNs downstream exactly like the C++ (0/0 on long doubles)
            with np.errstate(divide="ignore", invalid="ignore"):
                probs = probs / probs.sum()
            passign[c, t] = probs
    return trans, passign, gt_idx


def _column_emission(packed: "wmec.PackedProblem", c: int):
    """Emission em[B, t, a] for column c, longdouble.

    cost_partition[p][al](B) = product over active non-blank slots s mapped
    to p (via h2p[t][ind][1 - bit_s]) of q_s(al), with q_s built from the
    phred error probability (genotypecolumncostcomputer.cpp:54-103).
    """
    K, T, P = packed.K, packed.T, packed.P
    S = 1 << K
    nA = 1 << P
    cp = np.ones((S, T, P, 2), dtype=LD)
    for s in range(K):
        if not packed.active[c, s]:
            continue
        allele = int(packed.allele[c, s])
        if allele == 2:  # BLANK
            continue
        proba = _phred_probability(int(packed.weight[c, s]))
        if allele == 0:
            q = np.array([1 - proba, proba], dtype=LD)  # [P(obs|hap=ref), P(obs|hap=alt)]
        else:
            q = np.array([proba, 1 - proba], dtype=LD)
        read_idx = int(packed.slot_read[c, s])
        ind = int(packed.read_source[read_idx]) if read_idx >= 0 else 0
        # view the state axis split around bit s
        view = cp.reshape(1 << (K - 1 - s), 2, 1 << s, T, P, 2)
        for t in range(T):
            # bit==0 -> haplotype 1, bit==1 -> haplotype 0
            # (genotypecolumncostcomputer.cpp:60-67 uses entry_in_partition1
            # as the haplotype index)
            p_bit0 = packed.h2p[t, ind, 1]
            p_bit1 = packed.h2p[t, ind, 0]
            view[:, 0, :, t, p_bit0, :] *= q
            view[:, 1, :, t, p_bit1, :] *= q

    abits = wmec._assign_bits(P)
    em = np.ones((S, T, nA), dtype=LD)
    for p in range(P):
        bitsel = abits[:, p]  # (nA,)
        em *= np.where(bitsel[None, None, :] == 1, cp[:, :, p, 1:2], cp[:, :, p, 0:1])
    return em


def _sum_fold(arr: np.ndarray, K: int, bits) -> np.ndarray:
    """Sum out the given slot bits, writing the sum to both halves (keeps the
    array constant along the folded bits)."""
    S = arr.shape[0]
    rest = arr.shape[1:]
    for p in range(K):
        if not bits[p]:
            continue
        view = arr.reshape((1 << (K - 1 - p), 2) + (1 << p,) + rest)
        total = view[:, 0] + view[:, 1]
        view[:, 0] = total
        view[:, 1] = total
        arr = view.reshape((S,) + rest)
    return arr


def _run_native(packed: "wmec.PackedProblem", pedigree: Pedigree) -> Optional[np.ndarray]:
    """Dispatch to the C++ engine (native/genolib.cpp), a loop-for-loop
    mirror of run_genotyping below in 80-bit long double (differentially
    tested; only sum association differs, ~1e-15 relative)."""
    try:
        from ..native import genolib
    except ImportError:  # pragma: no cover
        return None
    if genolib is None:
        return None
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    n_ind = len(pedigree)
    gl = np.zeros((max(n_ind, 1), C, 3), dtype=np.float64)
    for ind in range(n_ind):
        gl_row = pedigree._genotype_likelihoods[ind][:C]
        if len(gl_row) < C or any(g is None for g in gl_row):
            return None
        gl[ind] = np.asarray([g._gl[:3] for g in gl_row], dtype=np.float64)
    return genolib.run(
        C,
        K,
        T,
        P,
        n_ind,
        pedigree.triple_count,
        packed.active,
        packed.allele,
        packed.weight,
        packed.slot_read,
        packed.read_source if packed.read_source.size else np.zeros(1, np.int32),
        packed.die_prev,
        packed.rc,
        packed.h2p,
        gl,
    )


def run_genotyping(packed: "wmec.PackedProblem", pedigree: Pedigree) -> Optional[np.ndarray]:
    """Scaled forward-backward; returns likelihoods (C, n_ind, 3) longdouble.

    Follows the exact operation order of GenotypeDPTable (backward pass with
    per-column scaling sums, forward pass combining alpha, transitions,
    emissions and stored beta; genotypedptable.cpp:116-442).
    """
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    if C == 0:
        return None
    native = _run_native(packed, pedigree)
    if native is not None:
        return native
    S = 1 << K
    nA = 1 << P
    n_ind = len(pedigree)

    trans, passign, gt_idx = _transition_tables(packed, pedigree)

    # birth[c, s]: slot holds a read at column c that was not there at c-1
    # (newly active, or REUSED: the old read died entering c and a new one
    # was assigned the freed slot — die_prev[c] marks both flavours of
    # death, so reuse shows up as active & die_prev).  These are the bits
    # the backward pass must sum out when projecting onto column c-1.
    birth = np.zeros((C, K), dtype=bool)
    prev_active = np.zeros(K, dtype=bool)
    for c in range(C):
        birth[c] = packed.active[c] & (~prev_active | packed.die_prev[c])
        prev_active = packed.active[c].copy()

    k_active = packed.active.sum(axis=1)  # active slot count per column
    dup = np.array([LD(2) ** int(K - k) for k in k_active])  # padding duplicates

    emissions = [_column_emission(packed, c) for c in range(C)]

    # ---- backward pass ----
    scaling = np.zeros(C, dtype=LD)
    beta_store: List[Optional[np.ndarray]] = [None] * C  # beta for c <-> c+1
    beta_next: Optional[np.ndarray] = None  # scaled beta at column c (for c<->c+1)
    for c in range(C - 1, -1, -1):
        em = emissions[c]  # (S, T, nA)
        if beta_next is None:
            bval = np.ones((S, T), dtype=LD)
        else:
            bval = beta_next
        # scaling_sum = sum over active B, i, a of beta
        scaling_sum = (bval.sum() / dup[c]) * LD(nA)
        scaling[c] = scaling_sum
        if c > 0:
            # contribution[B, j] = sum_i sum_a bval*em*passign * trans[j, i]
            weighted = (bval[:, :, None] * em * passign[c][None]).sum(axis=2)  # (S, T_i)
            contrib = weighted @ trans[c].T  # (S, T_j) with trans[j,i] summed over i
            new_beta = _sum_fold(contrib.copy(), K, birth[c])
            with np.errstate(divide="ignore", invalid="ignore"):
                new_beta /= scaling_sum
            beta_store[c - 1] = new_beta
        if beta_next is not None:
            with np.errstate(divide="ignore", invalid="ignore"):
                beta_next /= scaling_sum
            beta_store[c] = beta_next
        beta_next = beta_store[c - 1] if c > 0 else None

    # ---- forward pass ----
    likelihoods = np.zeros((C, max(n_ind, 1), 3), dtype=LD)
    alpha_prev: Optional[np.ndarray] = None  # (S, T), scaled
    for c in range(C):
        em = emissions[c]
        if c > 0:
            sum_prev = alpha_prev @ trans[c]  # (S, T_i): sum_j alpha[B,j]*trans[j,i]
        else:
            sum_prev = np.ones((S, T), dtype=LD)
        with np.errstate(divide="ignore", invalid="ignore"):
            fwd = sum_prev[:, :, None] * em * passign[c][None] / scaling[c]  # (S,T,nA)
        beta_here = beta_store[c]
        if beta_here is None:
            fb = fwd
        else:
            fb = fwd * beta_here[:, :, None]
        normalization = fb.sum() / dup[c]
        # genotype marginals
        for ind in range(n_ind):
            g = gt_idx[:, :, ind]  # (T, nA)
            for geno in range(3):
                mask = (g == geno).astype(LD)  # (T, nA)
                likelihoods[c, ind, geno] = (fb * mask[None]).sum() / dup[c]
        with np.errstate(divide="ignore", invalid="ignore"):
            likelihoods[c] /= normalization
        # project alpha to the next column: sum out slots dying after c
        # (die_prev[c+1] marks exactly those)
        if c + 1 < C:
            alpha = fwd.sum(axis=2)  # (S, T)
            alpha_prev = _sum_fold(alpha, K, packed.die_prev[c + 1])
    return likelihoods

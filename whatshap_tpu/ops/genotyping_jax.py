"""
Device (TPU/XLA) genotyping forward-backward kernel.

Same HMM as ops/genotyping.py (semantics from src/genotypedptable.cpp:116-442)
but expressed TPU-first in float64 under two `lax.scan`s:

- Emissions use the wMEC bit-matrix trick in LOG space: the per-state
  partition products of GenotypeColumnCostComputer become
  ``base + Bits @ diff`` (one matmul over the slot axis per column),
  followed by a tiny unrolled sum over partitions and an exp.
- The backward/forward projections between columns (summing out
  born/dying slot bits) are static-shape sum-folds over the state axis —
  the additive twin of the wMEC min-folds.
- Per-column rescaling follows the reference's exact operation order, so
  the result matches the 80-bit host path to f64 rounding (~1e-12
  relative; the parity tests require 1e-9).

The host longdouble path (ops/genotyping.py + native/genolib.cpp) remains
the byte-exact CLI default and the oracle; this kernel is the scale-out
path (WHATSHAP_TPU_GENO_BACKEND=jax forces it everywhere).

float64 note: TPUs emulate f64 in software; the f64 kernel exists for
parity and batched throughput via vmap. dtype="f32"
(WHATSHAP_TPU_GENO_BACKEND=jax32) is the native-speed variant — the
per-column rescaling keeps every intermediate near magnitude 1, so single
precision holds ~1e-4 relative on the likelihoods, far inside the integer
GQ/GT quantization of the VCF output.
"""

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.jaxcache import enable_persistent_cache

from ..core.pedigree_model import Pedigree
from . import wmec
from .genotyping import _transition_tables  # noqa: F401  (longdouble reference)


def _transition_tables_f64(packed: "wmec.PackedProblem", pedigree: Pedigree):
    """Vectorized float64 twin of `_transition_tables` for the device
    paths.  The longdouble original stays the byte-exact host reference;
    f64 rounding differs by ~1e-16 per entry, far inside the device
    parity tolerances, and this version is O(100x) faster on long
    chromosomes (no per-column Python loop)."""
    C, T, P = packed.n_cols, packed.T, packed.P
    n_ind = len(pedigree)
    nA = 1 << P
    tc = pedigree.triple_count
    pcmat = wmec._popcount_matrix(T).astype(np.int64)

    recomb_prob = 10.0 ** (-packed.rc.astype(np.float64) / 10.0)  # (C,)
    i_arr = np.arange(2 * tc + 1, dtype=np.float64)
    bern = recomb_prob[:, None] ** i_arr[None, :] * (1 - recomb_prob[:, None]) ** (
        2 * tc - i_arr[None, :]
    )  # (C, 2tc+1)
    m = bern[:, pcmat]  # (C, T, T)
    trans = m / m.sum(axis=2, keepdims=True)

    # gt_idx[t, a, ind]
    gt_idx = np.zeros((T, nA, max(n_ind, 1)), dtype=np.int64)
    a_arr = np.arange(nA)
    for t in range(T):
        for ind in range(n_ind):
            a0 = (a_arr >> packed.h2p[t, ind, 0]) & 1
            a1 = (a_arr >> packed.h2p[t, ind, 1]) & 1
            gt_idx[t, :, ind] = a0 + a1

    # per-column GLs (C, n_ind, 3)
    gl = np.zeros((C, max(n_ind, 1), 3), dtype=np.float64)
    for ind in range(n_ind):
        row = pedigree._genotype_likelihoods[ind]
        gl[:, ind, :] = np.asarray([g._gl[:3] for g in row[:C]], dtype=np.float64)

    passign = np.ones((C, T, nA), dtype=np.float64)
    for t in range(T):
        probs = np.ones((C, nA), dtype=np.float64)
        for ind in range(n_ind):
            probs *= gl[:, ind, gt_idx[t, :, ind]]
        keys = [tuple(gt_idx[t, a]) for a in range(nA)]
        counts: dict = {}
        for k in keys:
            counts[k] = counts.get(k, 0) + 1
        mult = np.array([counts[k] for k in keys], dtype=np.float64)
        probs = probs / mult[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            passign[:, t, :] = probs / probs.sum(axis=1, keepdims=True)
    return trans, passign, gt_idx


def _prepare_inputs(packed: "wmec.PackedProblem", pedigree: Pedigree):
    """Host-side packing of the per-column HMM tables (float64 numpy)."""
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    nA = 1 << P

    trans, passign, gt_idx = _transition_tables_f64(packed, pedigree)

    # log q per (column, slot, hap allele); inactive/blank slots contribute 0
    live = packed.active & (packed.allele != 2)
    w = packed.weight.astype(np.float64)
    proba = np.where(w == 0, 0.9999, 10.0 ** (-w / 10.0))
    q0 = np.where(packed.allele == 0, 1 - proba, proba)
    q1 = np.where(packed.allele == 0, proba, 1 - proba)
    with np.errstate(divide="ignore", invalid="ignore"):
        qlog = np.where(
            live[:, :, None],
            np.log(np.stack([q0, q1], axis=-1)),
            0.0,
        )  # (C, K, 2)
    slot_ind = np.where(
        packed.slot_read >= 0,
        packed.read_source[np.maximum(packed.slot_read, 0)]
        if packed.read_source.size
        else 0,
        0,
    )  # (C, K)

    # log-emission as base + Bits @ diff over (t, p, al): one-hot scatter of
    # each live slot's qlog onto its bit-0/bit-1 partition
    base = np.zeros((C, T, P, 2), dtype=np.float64)
    diff = np.zeros((C, K, T, P, 2), dtype=np.float64)
    p_range = np.arange(P)
    for t in range(T):
        p_bit0 = packed.h2p[t, slot_ind, 1]  # (C, K)
        p_bit1 = packed.h2p[t, slot_ind, 0]
        oh0 = (p_bit0[:, :, None] == p_range[None, None, :]).astype(np.float64)
        oh1 = (p_bit1[:, :, None] == p_range[None, None, :]).astype(np.float64)
        base[:, t] = np.einsum("ckp,cka->cpa", oh0, qlog)
        diff[:, :, t] = (oh1 - oh0)[:, :, :, None] * qlog[:, :, None, :]

    # fold masks: bits born entering column c (backward) / dying after c-1
    # (forward projection uses die_prev of the NEXT column)
    birth = np.zeros((C, K), dtype=bool)
    prev_active = np.zeros(K, dtype=bool)
    for c in range(C):
        birth[c] = packed.active[c] & (~prev_active | packed.die_prev[c])
        prev_active = packed.active[c].copy()
    die_next = np.zeros((C, K), dtype=bool)
    if C > 1:
        die_next[:-1] = packed.die_prev[1:]

    k_active = packed.active.sum(axis=1)
    dup = np.float64(2.0) ** (K - k_active)  # inactive-bit duplicate factor

    # genotype masks per individual: (n_ind, T, nA, 3)
    n_ind = max(len(pedigree), 1)
    gmask = np.zeros((n_ind, T, nA, 3), dtype=np.float64)
    for ind in range(gt_idx.shape[2]):
        for g in range(3):
            gmask[ind, :, :, g] = gt_idx[:, :, ind] == g

    return dict(
        trans=trans,
        passign=passign,
        base=base,
        diff=diff.reshape(C, K, T * P * 2),
        birth=birth,
        die_next=die_next,
        dup=dup,
        gmask=gmask,
    )


def _sum_fold(arr, K: int, T: int, bits):
    """Sum out the given slot bits of the (S, T) state array, writing the
    sum to both halves (additive twin of the wMEC min-fold)."""
    S = 1 << K
    for p in range(K):
        view = arr.reshape((1 << (K - 1 - p), 2, (1 << p) * T))
        total = view[:, 0] + view[:, 1]
        folded = jnp.stack([total, total], axis=1).reshape(S, T)
        arr = jnp.where(bits[p], folded, arr.reshape(S, T))
    return arr


@partial(jax.jit, static_argnames=("K", "T", "P", "n_ind", "dtype"))
def _forward_backward(
    K, T, P, n_ind, trans, passign, base, diff, birth, die_next, dup, gmask, dtype="f64"
):
    ftype = jnp.float64 if dtype == "f64" else jnp.float32
    trans, passign, base, diff, dup, gmask = (
        x.astype(ftype) for x in (trans, passign, base, diff, dup, gmask)
    )
    S = 1 << K
    nA = 1 << P
    # device-generated to keep the serialized HLO free of O(2^K * K)
    # constants; the barrier additionally stops XLA constant folding from
    # re-materializing it inside the compiler (OOM at high K)
    bits = jax.lax.optimization_barrier(
        (
            (jnp.arange(S, dtype=jnp.uint32)[:, None] >> jnp.arange(K, dtype=jnp.uint32)[None, :])
            & 1
        ).astype(ftype)
    )  # (S, K)
    abits = np.asarray(wmec._assign_bits(P))  # (nA, P) host constant

    def emission(base_c, diff_c):
        # logcp: (S, T, P, 2) via one matmul over the slot axis
        logcp = (bits @ diff_c).reshape(S, T, P, 2) + base_c[None]
        lem = jnp.zeros((S, T, nA), dtype=ftype)
        for p in range(P):
            sel = jnp.asarray(abits[:, p])  # (nA,)
            lem = lem + jnp.where(
                sel[None, None, :] == 1, logcp[:, :, p, 1:2], logcp[:, :, p, 0:1]
            )
        return jnp.exp(lem)  # (S, T, nA)

    # ---- backward scan (right to left) ----
    def bwd_step(beta, xs):
        base_c, diff_c, passign_c, trans_c, birth_c, dup_c = xs
        em = emission(base_c, diff_c)
        scaling_sum = (beta.sum() / dup_c) * nA
        weighted = (beta[:, :, None] * em * passign_c[None]).sum(axis=2)  # (S, T_i)
        contrib = weighted @ trans_c.T  # (S, T_j)
        new_beta = _sum_fold(contrib, K, T, birth_c) / scaling_sum
        # beta_store[c] = incoming beta scaled by this column's sum
        return new_beta, (scaling_sum, beta / scaling_sum)

    beta0 = jnp.ones((S, T), dtype=ftype)
    xs_rev = (
        base[::-1], diff[::-1], passign[::-1], trans[::-1], birth[::-1], dup[::-1]
    )
    _, (scaling_rev, beta_scaled_rev) = jax.lax.scan(bwd_step, beta0, xs_rev)
    scaling = scaling_rev[::-1]  # (C,)
    beta_store = beta_scaled_rev[::-1]  # (C, S, T); row c pairs c <-> c+1

    C = base.shape[0]
    # the last column has no successor: its beta factor is the identity
    has_beta = jnp.arange(C) < C - 1

    # ---- forward scan (left to right) ----
    def fwd_step(carry, xs):
        alpha_prev, is_first = carry
        base_c, diff_c, passign_c, trans_c, die_c, dup_c, scaling_c, beta_c, use_beta = xs
        em = emission(base_c, diff_c)
        sum_prev = jnp.where(
            is_first, jnp.ones((S, T), dtype=ftype), alpha_prev @ trans_c
        )
        fwd = sum_prev[:, :, None] * em * passign_c[None] / scaling_c  # (S, T, nA)
        fb = fwd * jnp.where(use_beta, beta_c, jnp.ones((S, T), dtype=ftype))[:, :, None]
        normalization = fb.sum() / dup_c
        # genotype marginals: (n_ind, 3)
        marg = jnp.einsum("sta,itag->ig", fb, gmask) / dup_c / normalization
        alpha = _sum_fold(fwd.sum(axis=2), K, T, die_c)
        return (alpha, jnp.zeros((), dtype=bool)), marg

    xs_fwd = (base, diff, passign, trans, die_next, dup, scaling, beta_store, has_beta)
    carry0 = (jnp.zeros((S, T), dtype=ftype), jnp.ones((), dtype=bool))
    _, likelihoods = jax.lax.scan(fwd_step, carry0, xs_fwd)
    return likelihoods  # (C, n_ind, 3)


def run_genotyping_jax(
    packed: "wmec.PackedProblem", pedigree: Pedigree, dtype: str = "f64"
) -> Optional[np.ndarray]:
    """Device forward-backward; returns likelihoods (C, n_ind, 3) float64,
    or None for empty problems.

    dtype="f32" is the TPU-speed variant: the per-column rescaling keeps
    magnitudes near 1 so single precision holds ~1e-4 relative accuracy on
    the likelihoods (far inside the integer GQ/GT quantization), at native
    MXU speed instead of emulated f64.
    """
    if packed.n_cols == 0:
        return None
    enable_persistent_cache()
    inputs = _prepare_inputs(packed, pedigree)
    n_ind = max(len(pedigree), 1)
    with jax.enable_x64(dtype == "f64"):
        out = _forward_backward(
            packed.K,
            packed.T,
            packed.P,
            n_ind,
            **{k: jnp.asarray(v) for k, v in inputs.items()},
            dtype=dtype,
        )
        out = np.asarray(jax.device_get(out), dtype=np.float64)
    return out


@partial(jax.jit, static_argnames=("K", "T", "P", "n_ind", "dtype"))
def _forward_backward_batched(K, T, P, n_ind, *stacked, dtype="f64"):
    """vmap of the forward-backward over a leading block axis — the
    scale-out form: many independent genotyping instances per launch."""
    return jax.vmap(
        lambda *args: _forward_backward(K, T, P, n_ind, *args, dtype=dtype)
    )(*stacked)


def prepare_genotyping_batch(packed_list, pedigree):
    """Host-side packing for a batched device launch: stacks the per-block
    HMM tables of same-shaped instances.  Returns (static, stacked numpy
    arrays) for `launch_genotyping_batch`."""
    shapes = {(p.n_cols, p.K, p.T, p.P) for p in packed_list}
    assert len(shapes) == 1, "instances must share one padded shape"
    inputs = [_prepare_inputs(p, pedigree) for p in packed_list]
    keys = list(inputs[0])
    n_ind = max(len(pedigree), 1)
    first = packed_list[0]
    static = (first.K, first.T, first.P, n_ind)
    stacked = [np.stack([inp[k] for inp in inputs]) for k in keys]
    return static, stacked


def launch_genotyping_batch(static, stacked, dtype: str = "f64") -> np.ndarray:
    """Run the batched forward-backward; returns (B, C, n_ind, 3) float64."""
    enable_persistent_cache()
    K, T, P, n_ind = static
    with jax.enable_x64(dtype == "f64"):
        out = _forward_backward_batched(
            K, T, P, n_ind, *[jnp.asarray(a) for a in stacked], dtype=dtype
        )
        return np.asarray(jax.device_get(out), dtype=np.float64)


def run_genotyping_jax_batched(packed_list, pedigree, dtype: str = "f64") -> Optional[np.ndarray]:
    """Batched device forward-backward over same-shaped instances (same
    C/K/T/P and individual count); returns (B, C, n_ind, 3) float64."""
    if not packed_list:
        return None
    static, stacked = prepare_genotyping_batch(packed_list, pedigree)
    return launch_genotyping_batch(static, stacked, dtype=dtype)

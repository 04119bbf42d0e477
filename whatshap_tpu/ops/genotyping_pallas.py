"""
Pallas TPU kernel for the genotyping forward-backward HMM.

The XLA `lax.scan` path (ops/genotyping_jax.py) round-trips the (S, T)
probability state and the (S, T, nA) emission through HBM every column;
like the wMEC scan before it, that is bandwidth/latency bound far below
the VPU's speed of light.  This kernel keeps the scaled beta/alpha state
resident in VMEM across a (batch, column) grid and emits only the small
per-column outputs:

- backward pass: per column writes the scaled beta table (the analogue of
  the wMEC backtrace tables, consumed by the forward pass) and the scaling
  sum;
- forward pass: per column writes the (T*nA) vector of state-summed
  forward*beta products — the genotype marginals are a tiny host-side
  einsum of that vector with the per-individual genotype masks, so the
  kernel needs no pedigree logic at all.

Layout mirrors ops/wmec_pallas.py: the 2^K state axis is (R, 128) =
(2^(K-7) sublanes, 128 lanes); summing out a born/dying slot bit p is a
butterfly exchange-and-add — the additive twin of the wMEC min-fold — a
lane roll by 2^p for p < 7, a sublane roll by 2^(p-7) otherwise,
predicated on the bit actually folding.  Emissions are built in log space
by a slot-loop accumulation (one on-demand bit mask per slot, immediately
consumed) and exponentiated on the VPU.

Arithmetic is float32 (the TPU-native dtype): the per-column rescaling
keeps every intermediate near magnitude 1, so f32 holds ~1e-4 relative on
the final likelihoods — far inside the integer GQ/GT quantization — and
the differential tests pin it against the f64 XLA path and the 80-bit
host oracle (semantics from src/genotypedptable.cpp:116-442).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BITS = 7
LANES = 1 << LANE_BITS

MAX_K = 17


def kernel_supported(K: int, T: int, P: int) -> bool:
    if not (LANE_BITS <= K <= MAX_K and T <= 16 and P <= 4):
        return False
    # beta/alpha state plus T*nA emission planes must stay inside VMEM
    return T * (1 << P) * (1 << K) <= (1 << 19)


def _sum_fold(p, x):
    """Butterfly sum over bit p of the (R, LANES) plane: both partners end
    up holding the pairwise sum (the state becomes constant along the bit,
    exactly like the XLA _sum_fold)."""
    if p < LANE_BITS:
        axis, sh = 1, 1 << p
    else:
        axis, sh = 0, 1 << (p - LANE_BITS)
    size = LANES if axis == 1 else x.shape[0]
    up = pltpu.roll(x, sh, axis=axis)
    dn = pltpu.roll(x, size - sh, axis=axis)
    bitp = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        >> (p if axis == 1 else p - LANE_BITS)
    ) & 1
    partner = jnp.where(bitp == 1, up, dn)
    return x + partner


def _make_emission(K, T, P, R):
    """Returns a function computing the T*nA emission planes exp(lem) for
    one column from diff (K, TP2) VMEM and base (TP2,) SMEM values."""
    nA = 1 << P
    TP2 = T * P * 2
    abits = ((np.arange(nA)[:, None] >> np.arange(P)[None, :]) & 1).astype(np.int32)

    def emission(diff_ref, base_ref, col=0):
        # logcp[j] over the state plane, built by on-demand bit masks
        acc = [jnp.zeros((R, LANES), jnp.float32) for _ in range(TP2)]
        for k in range(K):
            if k < LANE_BITS:
                mask = (
                    (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) >> k) & 1
                ).astype(jnp.float32)
            else:
                mask = (
                    (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) >> (k - LANE_BITS)) & 1
                ).astype(jnp.float32)
            for j in range(TP2):
                acc[j] = acc[j] + mask * diff_ref[0, col, k, j]
        em = []
        for t in range(T):
            for a in range(nA):
                lem = jnp.zeros((R, LANES), jnp.float32)
                for p in range(P):
                    j = (t * P + p) * 2 + int(abits[a, p])
                    lem = lem + (acc[j] + base_ref[0, col, 0, j])
                em.append(jnp.exp(lem))
        return em  # list of T*nA (R, LANES) planes, index t * nA + a

    return emission


def _geno_chunk(C: int, K: int, T: int, P: int) -> int:
    """Columns per grid step.  Measured on v5e: unlike the wMEC kernels
    (where 4 columns/step gave +15%), chunking REGRESSED this kernel 3x
    (226k -> 74k variants/s at K=13) — the f32 emission/rescale chain
    schedules worse when unrolled — so it stays at one column per step;
    the machinery is kept for future Mosaic versions."""
    return 1


def _make_bwd_kernel(K, T, P, C, CC):
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    emission = _make_emission(K, T, P, R)

    def kernel(
        diff_ref,  # (1, CC, K, TP2) f32 VMEM
        base_ref,  # (1, CC, 1, TP2) f32 SMEM
        passign_ref,  # (1, CC, 1, T*nA) f32 SMEM
        trans_ref,  # (1, CC, 1, T*T) f32 SMEM
        birth_ref,  # (1, CC, 1, K) i32 SMEM
        dup_ref,  # (1, CC, 1, 1) f32 SMEM
        beta_out_ref,  # (1, CC, T, R, LANES) f32 VMEM: scaled incoming beta
        scaling_ref,  # (1, CC, 1, 1) f32 SMEM
        beta_s,  # scratch (T, R, LANES) f32
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            for t in range(T):
                beta_s[t] = jnp.ones((R, LANES), jnp.float32)

        # grid step j covers columns [C-(j+1)*CC, C-j*CC), processed in
        # descending column order (the backward direction)
        for col in reversed(range(CC)):
            em = emission(diff_ref, base_ref, col)

            total = jnp.zeros((), jnp.float32)
            for t in range(T):
                total = total + jnp.sum(beta_s[t])
            scaling_sum = (total / dup_ref[0, col, 0, 0]) * np.float32(nA)
            scaling_ref[0, col, 0, 0] = scaling_sum
            inv = 1.0 / scaling_sum

            # weighted[t_i] = sum_a beta * em * passign
            weighted = []
            for t in range(T):
                acc = jnp.zeros((R, LANES), jnp.float32)
                for a in range(nA):
                    acc = acc + em[t * nA + a] * passign_ref[0, col, 0, t * nA + a]
                weighted.append(beta_s[t] * acc)

            # beta_store[c] = incoming beta / scaling_sum (pairs c <-> c+1;
            # the last column's slot is written but never read forward)
            for t in range(T):
                beta_out_ref[0, col, t] = beta_s[t] * inv

            # contrib[t_j] = sum_i weighted[t_i] * trans[t_j, t_i], then
            # fold bits born entering this column and rescale -> new beta
            for tj in range(T):
                if T == 1:
                    contrib = weighted[0] * trans_ref[0, col, 0, 0]
                else:
                    contrib = jnp.zeros((R, LANES), jnp.float32)
                    for ti in range(T):
                        contrib = contrib + weighted[ti] * trans_ref[0, col, 0, tj * T + ti]
                for p in range(K):
                    born = birth_ref[0, col, 0, p] != 0
                    contrib = jax.lax.cond(born, partial(_sum_fold, p), lambda x: x, contrib)
                beta_s[tj] = contrib * inv

    return kernel


def _make_fwd_kernel(K, T, P, C, CC):
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    emission = _make_emission(K, T, P, R)

    def kernel(
        diff_ref,  # (1, CC, K, TP2) f32 VMEM
        base_ref,  # (1, CC, 1, TP2) f32 SMEM
        passign_ref,  # (1, CC, 1, T*nA) f32 SMEM
        trans_ref,  # (1, CC, 1, T*T) f32 SMEM
        die_ref,  # (1, CC, 1, K) i32 SMEM   (die_next)
        scaling_ref,  # (1, CC, 1, 1) f32 SMEM
        beta_ref,  # (1, CC, T, R, LANES) f32 VMEM (scaled beta table)
        red_ref,  # (1, CC, 1, T*nA) f32 SMEM out: state-summed fwd*beta
        alpha_s,  # scratch (T, R, LANES) f32
    ):
        j = pl.program_id(1)

        for col in range(CC):
            em = emission(diff_ref, base_ref, col)
            inv = 1.0 / scaling_ref[0, col, 0, 0]

            # sum_prev[t_i] = ones at the first column, else
            # sum_j alpha[t_j] * trans[t_j, t_i]
            sum_prev = []
            for ti in range(T):

                def _first(ti=ti):
                    return jnp.ones((R, LANES), jnp.float32)

                def _chain(ti=ti, col=col):
                    if T == 1:
                        return alpha_s[0] * trans_ref[0, col, 0, 0]
                    acc = jnp.zeros((R, LANES), jnp.float32)
                    for tj in range(T):
                        acc = acc + alpha_s[tj] * trans_ref[0, col, 0, tj * T + ti]
                    return acc

                if col == 0:
                    sum_prev.append(jax.lax.cond(j == 0, _first, _chain))
                else:
                    sum_prev.append(_chain())

            for t in range(T):
                alpha_acc = jnp.zeros((R, LANES), jnp.float32)
                beta_t = beta_ref[0, col, t]
                # the last column has no successor: identity beta factor
                if col == CC - 1:
                    is_last = j == (C // CC) - 1
                    beta_f = jnp.where(
                        is_last, jnp.ones((R, LANES), jnp.float32), beta_t
                    )
                else:
                    beta_f = beta_t
                for a in range(nA):
                    fwd = sum_prev[t] * em[t * nA + a] * (
                        passign_ref[0, col, 0, t * nA + a] * inv
                    )
                    alpha_acc = alpha_acc + fwd
                    red_ref[0, col, 0, t * nA + a] = jnp.sum(fwd * beta_f)
                for p in range(K):
                    dies = die_ref[0, col, 0, p] != 0
                    alpha_acc = jax.lax.cond(
                        dies, partial(_sum_fold, p), lambda x: x, alpha_acc
                    )
                alpha_s[t] = alpha_acc

    return kernel


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_backward_pallas(
    K, T, P, diff, base, passign, trans, birth, die_next, dup, interpret=False
):
    """Batched scaled forward-backward on the Pallas kernels.

    Inputs are the stacked `_prepare_inputs` arrays with a leading batch
    axis, in float32:
      diff (B, C, K, TP2), base (B, C, T, P, 2), passign (B, C, T, nA),
      trans (B, C, T, T), birth (B, C, K) bool, die_next (B, C, K) bool,
      dup (B, C).
    Returns (red (B, C, T, nA), scaling (B, C)): the state-summed
    forward*beta products and per-column scaling sums; genotype marginals
    are `einsum('bcta,itag->bcig', red, gmask)` normalized per column.
    """
    B, C = diff.shape[0], diff.shape[1]
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2

    diff = diff.astype(jnp.float32)
    base_flat = base.reshape(B, C, 1, TP2).astype(jnp.float32)
    passign_flat = passign.reshape(B, C, 1, T * nA).astype(jnp.float32)
    trans_flat = trans.reshape(B, C, 1, T * T).astype(jnp.float32)
    birth_i = birth.astype(jnp.int32).reshape(B, C, 1, K)
    die_i = die_next.astype(jnp.int32).reshape(B, C, 1, K)
    dup_f = dup.reshape(B, C, 1, 1).astype(jnp.float32)

    CC = _geno_chunk(C, K, T, P)
    nchunks = C // CC

    # ---- backward pass: grid step j covers columns [C-(j+1)*CC, C-j*CC) ----
    rev = lambda b, c: (b, nchunks - 1 - c, 0, 0)  # noqa: E731
    rev5 = lambda b, c: (b, nchunks - 1 - c, 0, 0, 0)  # noqa: E731
    beta_store, scaling = pl.pallas_call(
        _make_bwd_kernel(K, T, P, C, CC),
        grid=(B, nchunks),
        out_shape=[
            jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 1, 1), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((1, CC, K, TP2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, 1, TP2), rev, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, T * nA), rev, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, T * T), rev, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, K), rev, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, 1), rev, memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CC, T, R, LANES), rev5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, 1, 1), rev, memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((T, R, LANES), jnp.float32)],
        interpret=interpret,
    )(diff, base_flat, passign_flat, trans_flat, birth_i, dup_f)

    # ---- forward pass ----
    fwdm = lambda b, c: (b, c, 0, 0)  # noqa: E731
    fwd5 = lambda b, c: (b, c, 0, 0, 0)  # noqa: E731
    red = pl.pallas_call(
        _make_fwd_kernel(K, T, P, C, CC),
        grid=(B, nchunks),
        out_shape=jax.ShapeDtypeStruct((B, C, 1, T * nA), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, CC, K, TP2), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, 1, TP2), fwdm, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, T * nA), fwdm, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, T * T), fwdm, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, K), fwdm, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, 1, 1), fwdm, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CC, T, R, LANES), fwd5, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CC, 1, T * nA), fwdm, memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((T, R, LANES), jnp.float32)],
        interpret=interpret,
    )(
        diff,
        base_flat,
        passign_flat,
        trans_flat,
        die_i,
        scaling,
        beta_store,
    )
    return red.reshape(B, C, T, nA), scaling.reshape(B, C)


def run_genotyping_pallas_batched(packed_list, pedigree):
    """Batched Pallas forward-backward over same-shaped instances; returns
    (B, C, n_ind, 3) float64 likelihoods (f32 compute, ~1e-4 relative to
    the longdouble host engine — inside GQ/GT quantization)."""
    from .genotyping_jax import prepare_genotyping_batch

    if not packed_list:
        return None
    static, stacked = prepare_genotyping_batch(packed_list, pedigree)
    return launch_genotyping_pallas(static, stacked)


def pad_prepared_k(static, stacked, k_pad):
    """Pad the slot axis of prepared inputs to k_pad (>= K).  The extra
    state bits carry zero diff (emission constant along them) and never
    fold; `dup` absorbs the exact 2^(k_pad - K) duplicate factor, so every
    scaled quantity is unchanged."""
    K, T, P, n_ind = static
    assert k_pad >= K
    if k_pad == K:
        return static, stacked
    trans, passign, base, diff, birth, die_next, dup, gmask = stacked
    pad = k_pad - K
    diff = np.pad(np.asarray(diff), ((0, 0), (0, 0), (0, pad), (0, 0)))
    birth = np.pad(np.asarray(birth), ((0, 0), (0, 0), (0, pad)))
    die_next = np.pad(np.asarray(die_next), ((0, 0), (0, 0), (0, pad)))
    dup = np.asarray(dup) * (2.0 ** pad)
    return (k_pad, T, P, n_ind), [trans, passign, base, diff, birth, die_next, dup, gmask]


def launch_genotyping_pallas(static, stacked):
    """Run the Pallas batch from prepared (static, stacked) inputs.

    The batch is chunked so the per-column beta tables stay under the
    shared HBM budget (they are the dominant footprint, exactly like the
    wMEC backtrace tables)."""
    from .wmec import HBM_TABLE_BUDGET

    if static[0] < LANE_BITS:
        static, stacked = pad_prepared_k(static, stacked, LANE_BITS)
    K, T, P, n_ind = static
    trans, passign, base, diff, birth, die_next, dup, gmask = (
        np.asarray(stacked[i]) for i in range(8)
    )
    B, C = diff.shape[0], diff.shape[1]
    per_block = C * T * (1 << K) * 4
    max_b = max(1, HBM_TABLE_BUDGET // per_block)
    interpret = jax.default_backend() == "cpu"  # CPU has no Mosaic
    reds = []
    for lo in range(0, B, max_b):
        sl = slice(lo, lo + max_b)
        red_c, _scaling = forward_backward_pallas(
            K,
            T,
            P,
            jnp.asarray(diff[sl], jnp.float32),
            jnp.asarray(base[sl], jnp.float32),
            jnp.asarray(passign[sl], jnp.float32),
            jnp.asarray(trans[sl], jnp.float32),
            jnp.asarray(birth[sl]),
            jnp.asarray(die_next[sl]),
            jnp.asarray(dup[sl], jnp.float32),
            interpret=interpret,
        )
        reds.append(np.asarray(jax.device_get(red_c), dtype=np.float64))
    red = np.concatenate(reds, axis=0)
    # marginals: dup cancels between numerator and normalization
    marg = np.einsum("bcta,itag->bcig", red, gmask[0])
    norm = red.sum(axis=(2, 3))[:, :, None, None]
    return marg / norm

"""
Pallas TPU kernel for the wMEC/PedMEC forward column scan.

The XLA `lax.scan` path (ops/wmec.py) round-trips every per-column
intermediate through HBM: with ~50 small elementwise ops per column over the
(S, T) state, the scan is bandwidth/latency bound ~100x below the VPU's
speed of light.  This kernel keeps the entire DP state (cost, tie key,
transmission backtrace) resident in VMEM scratch across a (batch, column)
grid — the sequential column dimension is the innermost grid loop — so per
column the only HBM traffic is the tiny per-column inputs and the emitted
backtrace tables.

Bit-for-bit identical to the XLA/numpy paths (same int32 arithmetic, same
INF clamping, same Gray-order tie-breaking); the differential tests assert
that.  Layout: the 2^K bipartition axis is stored as (R, 128) = (2^(K-7)
sublanes, 128 lanes); folding a dying slot bit p is a butterfly exchange —
a lane roll by 2^p for p < 7, a sublane roll by 2^(p-7) otherwise — and is
predicated on the slot actually dying (most columns fold 0-2 bits, not K).

Requires K >= 7 (bucket padding guarantees this) and T * 2^K states small
enough for VMEM: that covers single individuals (T=1, K<=16) and
single-trio pedigrees (T=4, P=4, K<=15); larger pedigrees fall back to
the XLA path.  For T > 1 the fold/backtrace state (cost, tie key,
projection index, transmission argmin) is carried per transmission value,
exactly as in the XLA scan.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 29

LANE_BITS = 7  # 128 lanes
LANES = 1 << LANE_BITS

MAX_T = 16
MAX_K = 17  # T * 2^K states must fit the VMEM working set.  K=17 (T=1)
            # compiles once bit masks are built on demand in the slot loop
            # (materializing all K masks at once was the VMEM blowup that
            # used to cap this at 16); K=18+ still fails the Mosaic compile
            # even table-free and routes through the segmented XLA path.


def kernel_supported(K: int, T: int, P: int) -> bool:
    # T == 1 (single individual, K<=17), T == 4 (one trio, K<=15) and
    # T == 16 (two trios, e.g. a quartet, K<=13) fit the VMEM-resident
    # state budget; larger pedigrees still run on XLA
    if not (LANE_BITS <= K <= MAX_K and T <= MAX_T and P <= 4):
        return False
    return T * (1 << K) <= (1 << 17)


def _popcount_matrix(T: int) -> np.ndarray:
    t = np.arange(T)
    x = t[:, None] ^ t[None, :]
    pc = np.zeros((T, T), dtype=np.int64)
    while np.any(x):
        pc += x & 1
        x >>= 1
    return pc.astype(np.int32)


def _assign_bits(P: int) -> np.ndarray:
    nA = 1 << P
    return ((np.arange(nA)[:, None] >> np.arange(P)[None, :]) & 1).astype(np.int32)


def _make_kernel(
    K: int,
    T: int,
    P: int,
    C: int,
    emit_jmin: bool = True,
    emit_tables: bool = True,
    carry_in: bool = False,
    CC: int = 1,
    seed_in: bool = False,
    emit_m_only: bool = False,
):
    """Kernel variants:
    - emit_jmin=False (T == 1 solve path only): skip the per-column
      transmission-argmin backtrace table entirely — for a single individual
      it is identically zero and never read, and dropping it halves the
      backtrace-table HBM traffic and footprint.
    - emit_tables=False: forward-only pass emitting just the final
      (cost, jmin, key) state — the checkpoint pass of the segmented solve
      (no table HBM writes at all).
    - carry_in=True: initialize the column-0 state from carry inputs instead
      of zeros (segment continuation).
    - seed_in=True: initialize the column-0 cost state from a tiny (T,)
      SMEM seed vector broadcast across all bipartitions (jmin/key start at
      zero) — the seam seeds of the pedigree block chain
      (wmec.run_dp_batched_pedigree), matching wmec._seeded_carry without
      materializing (B, T, S) carry planes in HBM.
    - emit_m_only=True (requires emit_tables=False): the only output is the
      final folded cost vector m (T,) = min over bipartitions, written to
      SMEM — the seam-matrix pass needs nothing else, and skipping the
      (B, T, S) dp output plus the tie-key updates saves HBM traffic and
      VPU work (tie winners have equal cost, so m is key-independent)."""
    assert (emit_jmin or T == 1) or not emit_tables
    assert not (carry_in and seed_in)
    assert not emit_m_only or not emit_tables
    emit_jmin = emit_jmin and T > 1  # T == 1 has no transmission argmin
    S = 1 << K
    R = S >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    pcmat = _popcount_matrix(T)
    abits = _assign_bits(P)
    max_pc = max(int(pcmat.max()), 1)

    def tie_fold(p, cost, key, extras):
        """Butterfly min-fold of bit p with (cost, gray-key) tie-break.
        Both partners receive the winning values (the state becomes
        constant along the dying bit), exactly like the XLA fold; `extras`
        (projection index, transmission argmin) follow the winner."""
        if p < LANE_BITS:
            axis, sh = 1, 1 << p
            bitp = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) >> p) & 1
        else:
            axis, sh = 0, 1 << (p - LANE_BITS)
            bitp = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) >> (p - LANE_BITS)) & 1
        bit_set = bitp == 1

        size = LANES if axis == 1 else R

        def partner(x):
            up = pltpu.roll(x, sh, axis=axis)  # up[i] = x[i - sh]
            dn = pltpu.roll(x, size - sh, axis=axis)  # dn[i] = x[i + sh]
            return jnp.where(bit_set, up, dn)

        pc_, pk_ = partner(cost), partner(key)
        pe_ = [partner(e) for e in extras]
        # a = value at the bit==0 position, b = at bit==1 (reference order)
        a_c = jnp.where(bit_set, pc_, cost)
        b_c = jnp.where(bit_set, cost, pc_)
        a_k = jnp.where(bit_set, pk_, key)
        b_k = jnp.where(bit_set, key, pk_)
        take_b = (b_c < a_c) | ((b_c == a_c) & (b_k < a_k))
        n_cost = jnp.where(take_b, b_c, a_c)
        n_key = jnp.where(take_b, b_k, a_k)
        n_extras = []
        for e, pe in zip(extras, pe_):
            a_e = jnp.where(bit_set, pe, e)
            b_e = jnp.where(bit_set, e, pe)
            n_extras.append(jnp.where(take_b, b_e, a_e))
        return n_cost, n_key, n_extras

    fold_idx = emit_tables
    fold_jmin = emit_tables and emit_jmin

    # For a single individual the transmission argmin is identically zero:
    # carry no jmin state, scratch, or outputs at all (saves ~3 VMEM planes
    # at high K; callers synthesize zeros where the API exposes them).
    has_jmin = T > 1

    def kernel(
        wdiff_ref,  # (1, 1, K, TP2) f32 VMEM
        wbase_ref,  # (1, 1, 1, TP2) i32 SMEM   (T,P,2 flattened)
        rankw_ref,  # (1, 1, 1, K) f32 SMEM
        acost_ref,  # (1, 1, 1, T * nA) i32 SMEM
        die_ref,  # (1, 1, 1, K) i32 SMEM
        rc_ref,  # (1, 1, 1, 1) i32 SMEM
        *refs,
        # [carry inputs if carry_in: cost0/[jmin0 if T>1] (1,T,R,LANES),
        #  key0 (1,R,LANES)]
        # outputs: [pidx (1,1,T,R,LANES), [pjmin if emit_jmin]] if emit_tables,
        #          dp (1,T,R,LANES), [jminl if T>1], keyl (1,R,LANES)
        # scratch: cost_s (T,R,LANES), [jmin_s if T>1], key_s (R,LANES)
    ):
        i = 0
        jmin0_ref = None
        seed_ref = None
        if seed_in:
            seed_ref = refs[i]
            i += 1
        if carry_in:
            cost0_ref = refs[i]
            i += 1
            if has_jmin:
                jmin0_ref = refs[i]
                i += 1
            key0_ref = refs[i]
            i += 1
        pidx_ref = pjmin_ref = None
        if emit_tables:
            pidx_ref = refs[i]
            i += 1
            if emit_jmin:
                pjmin_ref = refs[i]
                i += 1
        if emit_m_only:
            m_ref, cost_s, key_s = refs[i:]
            jmin_s = None
            dp_ref = jminl_ref = keyl_ref = None
        elif has_jmin:
            dp_ref, jminl_ref, keyl_ref, cost_s, jmin_s, key_s = refs[i:]
        else:
            dp_ref, keyl_ref, cost_s, key_s = refs[i:]
            jminl_ref = jmin_s = None
        j_chunk = pl.program_id(1)

        @pl.when(j_chunk == 0)
        def _init():
            for t in range(T):
                if carry_in:
                    cost_s[t] = cost0_ref[0, t]
                    if has_jmin:
                        jmin_s[t] = jmin0_ref[0, t]
                elif seed_in:
                    cost_s[t] = jnp.zeros((R, LANES), jnp.int32) + seed_ref[0, 0, 0, t]
                    if jmin_s is not None:
                        jmin_s[t] = jnp.zeros((R, LANES), jnp.int32)
                else:
                    cost_s[t] = jnp.zeros((R, LANES), jnp.int32)
                    if jmin_s is not None:
                        jmin_s[t] = jnp.zeros((R, LANES), jnp.int32)
            key_s[:] = key0_ref[0] if carry_in else jnp.zeros((R, LANES), jnp.int32)

        # flat bipartition index i = row * 128 + lane
        idx0 = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        )

        # process the CC columns of this grid step sequentially (unrolled):
        # batching columns per step amortizes the per-step dispatch overhead,
        # which otherwise costs about as much as the column's VPU work
        for col in range(CC):
            # ---- fold dying slot bits (predicated: most columns fold none)
            # per-t state: the fold's tie decisions depend on the per-t
            # costs, so key/idx become per-t during folding.  idx/jmin only
            # feed the backtrace tables, so the forward-only pass skips them.
            costs = [cost_s[t] for t in range(T)]
            keys = [key_s[:] for _ in range(T)]
            idxs = [idx0 for _ in range(T)] if fold_idx else []
            jmins = [jmin_s[t] for t in range(T)] if (fold_jmin and has_jmin) else []
            for p in range(K):
                die_p = die_ref[0, col, 0, p] != 0
                # a real branch (not a value-select): most columns fold no
                # bits, so the butterfly is skipped unless slot p dies here

                def _folded(args, p=p):
                    cs, ks, is_, js = args
                    nc, nk, ni, nj = [], [], [], []
                    for t in range(T):
                        extras = []
                        if fold_idx:
                            extras.append(is_[t])
                        if fold_jmin:
                            extras.append(js[t])
                        c1, k1, ex = tie_fold(p, cs[t], ks[t], extras)
                        nc.append(c1)
                        nk.append(k1)
                        if fold_idx:
                            ni.append(ex[0])
                        if fold_jmin:
                            nj.append(ex[-1])
                    return tuple(nc), tuple(nk), tuple(ni), tuple(nj)

                out = jax.lax.cond(
                    die_p,
                    _folded,
                    lambda args: args,
                    (tuple(costs), tuple(keys), tuple(idxs), tuple(jmins)),
                )
                costs, keys, idxs, jmins = (list(x) for x in out)

            proj_cost = costs
            proj_jmin = jmins

            # ---- emit backtrace tables ----
            if emit_tables:
                for t in range(T):
                    pidx_ref[0, col, t] = idxs[t]
                    if emit_jmin:
                        pjmin_ref[0, col, t] = proj_jmin[t]

            # ---- transmission min-plus ----
            rc = rc_ref[0, col, 0, 0]
            rc_safe = jnp.minimum(rc, INF // max_pc)
            if T == 1:
                trans_min = [proj_cost[0]]
                jmin_new = [jnp.zeros((R, LANES), jnp.int32)]
            else:
                trans_min = []
                jmin_new = []
                for ti in range(T):
                    best = None
                    barg = None
                    for tj in range(T):
                        recomb = jnp.minimum(pcmat[ti, tj] * rc_safe, INF)
                        v = jnp.minimum(proj_cost[tj] + recomb, INF)
                        if best is None:
                            best = v
                            if not emit_m_only:
                                barg = jnp.zeros((R, LANES), jnp.int32)
                        else:
                            take = v < best
                            best = jnp.where(take, v, best)
                            if not emit_m_only:
                                barg = jnp.where(take, tj, barg)
                    trans_min.append(best)
                    jmin_new.append(barg)

            # ---- current column cost ----
            # f[j] = sum_k bit_k(i) * wdiff[k, j]; weights are < 2^24 so f32
            # accumulation is exact.  One on-demand bit mask per slot, each
            # consumed immediately (materializing all K at once was the VMEM
            # blowup that capped the kernel at K=16); ascending-k addition
            # order per accumulator keeps values bit-equal to the XLA path.
            facc = [jnp.zeros((R, LANES), jnp.float32) for _ in range(TP2)]
            racc = jnp.zeros((R, LANES), jnp.float32)
            for k in range(K):
                mask = ((idx0 >> k) & 1).astype(jnp.float32)
                for jj in range(TP2):
                    facc[jj] = facc[jj] + mask * wdiff_ref[0, col, k, jj]
                if not emit_m_only:
                    racc = racc + mask * rankw_ref[0, col, 0, k]
            f = [acc.astype(jnp.int32) for acc in facc]
            # cp[t][p][a] = f[(t*P + p)*2 + a] + wbase[t,p,a]
            for t in range(T):
                s0 = jnp.zeros((R, LANES), jnp.int32)
                d = []
                for p in range(P):
                    base0 = wbase_ref[0, col, 0, (t * P + p) * 2 + 0]
                    base1 = wbase_ref[0, col, 0, (t * P + p) * 2 + 1]
                    cp0 = f[(t * P + p) * 2 + 0] + base0
                    cp1 = f[(t * P + p) * 2 + 1] + base1
                    s0 = s0 + cp0
                    d.append(cp1 - cp0)
                best_a = None
                for a in range(nA):
                    pa = jnp.zeros((R, LANES), jnp.int32)
                    for p in range(P):
                        if abits[a, p] == 1:
                            pa = pa + d[p]
                    total = jnp.minimum(s0 + pa + acost_ref[0, col, 0, t * nA + a], INF)
                    best_a = total if best_a is None else jnp.minimum(best_a, total)
                dp_t = jnp.minimum(best_a + trans_min[t], INF)
                cost_s[t] = dp_t
                if T > 1 and not emit_m_only:
                    # the transmission argmin is carried state for pedigrees
                    # (folded into the next column's pjmin table)
                    jmin_s[t] = jmin_new[t]

            # ---- tie-break key for this column ----
            # m-only passes skip it: fold tie winners have equal cost, so
            # the final min is key-independent
            if not emit_m_only:
                n = racc.astype(jnp.int32)
                shift = 1
                while shift < max(K, 1):
                    n = n ^ (n >> shift)
                    shift <<= 1
                key_s[:] = n

        # ---- final outputs (last column) ----
        @pl.when(j_chunk == (C // CC) - 1)
        def _final():
            if emit_m_only:
                for t in range(T):
                    m_ref[0, 0, t] = jnp.min(cost_s[t])
            else:
                for t in range(T):
                    dp_ref[0, t] = cost_s[t]
                    if has_jmin:
                        jminl_ref[0, t] = jmin_s[t]
                keyl_ref[0] = key_s[:]

    return kernel


def _fwd_chunk(C: int, K: int, T: int) -> int:
    """Columns per forward grid step: per-step dispatch costs about one
    column's worth of VPU work at K=14, so batch a few columns — but keep
    the unrolled kernel body small enough that the shape still fits the
    Mosaic compile: K >= 16 (the measured K=17 ceiling) and pedigree
    shapes beyond T * 2^K = 2^14 (a T=4, K=14 chunked body crashed the
    compiler) stay at one column per step."""
    if K >= 16 or T > 4 or (T > 1 and T * (1 << K) > (1 << 14)):
        return 1
    cc = 1
    while cc < 4 and C % (cc * 2) == 0:
        cc *= 2
    return cc


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_scan_pallas(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, interpret=False):
    """Batched forward pass on the Pallas kernel.

    Inputs are the stacked block arrays (leading batch axis B, column axis C)
    as produced by parallel.blocks.stack_blocks:
      wdiff (B, C, K, T*P*2) f32, wbase (B, C, T, P, 2) i32,
      rankw (B, C, K) f32, acost (B, C, T, 2^P) i32,
      die_prev (B, C, K) bool, rc (B, C) i32.
    Returns (dp_last (B,S,T), jmin_last (B,S,T), key_last (B,S),
    proj_idx (B,C,S,T), proj_jmin (B,C,S,T)) matching _forward_scan_impl.
    """
    B, C = wdiff.shape[0], wdiff.shape[1]
    S = 1 << K
    R = S >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    CC = 1 if interpret else _fwd_chunk(C, K, T)  # unrolling only helps real hw
    kernel = _make_kernel(K, T, P, C, CC=CC)

    has_jmin = T > 1
    grid = (B, C // CC)
    out_shape = [
        jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.int32),  # proj idx
    ]
    if has_jmin:
        out_shape.append(jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.int32))  # proj jmin
    out_shape.append(jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32))  # dp last
    if has_jmin:
        out_shape.append(jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32))  # jmin last
    out_shape.append(jax.ShapeDtypeStruct((B, R, LANES), jnp.int32))  # key last
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
    ]
    table_spec = pl.BlockSpec(
        (1, CC, T, R, LANES), lambda b, c: (b, c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (1, T, R, LANES), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [table_spec]
    if has_jmin:
        out_specs.append(table_spec)
    out_specs.append(state_spec)
    if has_jmin:
        out_specs.append(state_spec)
    out_specs.append(
        pl.BlockSpec((1, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    )
    scratch_shapes = [pltpu.VMEM((T, R, LANES), jnp.int32)]
    if has_jmin:
        scratch_shapes.append(pltpu.VMEM((T, R, LANES), jnp.int32))
    scratch_shapes.append(pltpu.VMEM((R, LANES), jnp.int32))

    wbase_flat = wbase.reshape(B, C, 1, TP2)
    acost_flat = acost.reshape(B, C, 1, T * nA)
    rankw = rankw.reshape(B, C, 1, K)
    die_i32 = die_prev.astype(jnp.int32).reshape(B, C, 1, K)
    rc = rc.reshape(B, C, 1, 1)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(wdiff, wbase_flat, rankw, acost_flat, die_i32, rc)
    if has_jmin:
        pidx, pjmin, dp_last, jmin_last, key_last = outs
    else:
        pidx, dp_last, key_last = outs
        pjmin = jnp.zeros_like(pidx)
        jmin_last = jnp.zeros_like(dp_last)

    # reshape to the (S, T) convention of the XLA path
    dp_last = dp_last.reshape(B, T, S).transpose(0, 2, 1)
    jmin_last = jmin_last.reshape(B, T, S).transpose(0, 2, 1)
    key_last = key_last.reshape(B, S)
    proj_idx = pidx.reshape(B, C, T, S).transpose(0, 1, 3, 2)
    proj_jmin = pjmin.reshape(B, C, T, S).transpose(0, 1, 3, 2)
    return dp_last, jmin_last, key_last, proj_idx, proj_jmin


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_m_seeded_pallas(
    K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0, interpret=False
):
    """Seeded table-free forward pass for the pedigree seam route: per batch
    element, run the block's columns from the seam seed dp0 (T,) and return
    only m (T,) = min over bipartitions of the final dp — one row of the
    block's T x T seam matrix (wmec.run_dp_batched_pedigree pass 1).

    Inputs carry a leading batch axis B (the caller repeats each block T
    times, one per unit seed); dp0 is (B, T) int32.  Bit-identical to
    wmec.forward_m_batched (the XLA mirror).
    """
    B, C = wdiff.shape[0], wdiff.shape[1]
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    CC = 1 if interpret else _fwd_chunk(C, K, T)
    kernel = _make_kernel(
        K, T, P, C, emit_tables=False, seed_in=True, emit_m_only=True, CC=CC
    )
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, T), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [pl.BlockSpec((1, 1, T), lambda b, c: (b, 0, 0), memory_space=pltpu.SMEM)]
    scratch_shapes = [
        pltpu.VMEM((T, R, LANES), jnp.int32),
        pltpu.VMEM((R, LANES), jnp.int32),
    ]
    m = pl.pallas_call(
        kernel,
        grid=(B, C // CC),
        out_shape=[jax.ShapeDtypeStruct((B, 1, T), jnp.int32)],
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        wdiff,
        wbase.reshape(B, C, 1, TP2),
        rankw.reshape(B, C, 1, K),
        acost.reshape(B, C, 1, T * nA),
        die_prev.astype(jnp.int32).reshape(B, C, 1, K),
        rc.reshape(B, C, 1, 1),
        dp0.astype(jnp.int32).reshape(B, 1, 1, T),
    )[0]
    return m.reshape(B, T)


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_tables_seeded_pallas(
    K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, dp0, interpret=False
):
    """Seeded forward pass WITH table emission and full final state, for
    pass 2 of the pedigree seam route.  dp0 (B, T) int32 seam seeds.
    Returns (pidx (B,C,T,R,LANES), pjmin, dp_last (B,T,R,LANES), jmin_last,
    key_last (B,R,LANES)) in the raw kernel layout."""
    B, C = wdiff.shape[0], wdiff.shape[1]
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    has_jmin = T > 1
    CC = 1 if interpret else _fwd_chunk(C, K, T)
    kernel = _make_kernel(K, T, P, C, emit_jmin=has_jmin, seed_in=True, CC=CC)
    table_spec = pl.BlockSpec(
        (1, CC, T, R, LANES), lambda b, c: (b, c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    table_shape = jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.int32)
    state_spec = pl.BlockSpec(
        (1, T, R, LANES), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    state_shape = jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32)
    key_spec = pl.BlockSpec((1, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, T), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [table_shape] + ([table_shape] if has_jmin else []) + [state_shape]
    out_specs = [table_spec] + ([table_spec] if has_jmin else []) + [state_spec]
    if has_jmin:
        out_shape.append(state_shape)
        out_specs.append(state_spec)
    out_shape.append(jax.ShapeDtypeStruct((B, R, LANES), jnp.int32))
    out_specs.append(key_spec)
    scratch_shapes = [pltpu.VMEM((T, R, LANES), jnp.int32)]
    if has_jmin:
        scratch_shapes.append(pltpu.VMEM((T, R, LANES), jnp.int32))
    scratch_shapes.append(pltpu.VMEM((R, LANES), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, C // CC),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        wdiff,
        wbase.reshape(B, C, 1, TP2),
        rankw.reshape(B, C, 1, K),
        acost.reshape(B, C, 1, T * nA),
        die_prev.astype(jnp.int32).reshape(B, C, 1, K),
        rc.reshape(B, C, 1, 1),
        dp0.astype(jnp.int32).reshape(B, 1, 1, T),
    )
    outs = list(outs)
    pidx = outs.pop(0)
    pjmin = outs.pop(0) if has_jmin else jnp.zeros_like(pidx)
    dp_last = outs.pop(0)
    jmin_last = outs.pop(0) if has_jmin else jnp.zeros_like(dp_last)
    key_last = outs.pop(0)
    return pidx, pjmin, dp_last, jmin_last, key_last


def _bt_chunk(C: int, table_bytes_per_col: int, vmem_budget: int = 2 << 20, T: int = 1) -> int:
    """Columns per backtrace grid step: the walk itself is a handful of VPU
    ops, so per-step dispatch dominates — batch as many columns as divide C
    and fit the VMEM block budget.  Quartet shapes (T = 16) are only
    hardware-proven at one column per step."""
    if T > 4:
        return 1
    cc = 1
    while (
        cc < 16
        and C % (cc * 2) == 0
        and (cc * 2) * table_bytes_per_col <= vmem_budget
    ):
        cc *= 2
    return cc


def _make_backtrace_kernel(K: int, C: int, CC: int):
    """T == 1 backtrace: the transmission is constant, so the walk is just
    v <- proj_idx[column, v], emitted back to front.  Grid step j handles
    the CC columns [C-(j+1)*CC, C-j*CC) in reverse; each advance is a
    one-hot VPU reduction instead of a scalar gather."""
    S = 1 << K
    R = S >> LANE_BITS

    def kernel(opt_ref, pidx_ref, path_ref, final_ref, v_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            v_s[0] = opt_ref[0, 0, 0, 0]

        idx0 = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        )
        v = v_s[0]
        for t in reversed(range(CC)):
            path_ref[0, t, 0, 0] = v
            sel = idx0 == v
            v = jnp.sum(jnp.where(sel, pidx_ref[0, t], 0))
        v_s[0] = v

        @pl.when(j == (C // CC) - 1)
        def _fin():
            # state entering the preceding segment (segmented solve chaining)
            final_ref[0, 0, 0, 0] = v_s[0]

    return kernel


def _make_backtrace_kernel_t(K: int, T: int, C: int, CC: int):
    """General-T backtrace: walk (index, transmission) back to front.
    Mirrors the host loop in wmec.run_dp / _backtrace_impl: at column c the
    current (v, vt) pair is emitted, then v <- proj_idx[c, v, prev_t],
    vt <- prev_t, prev_t <- proj_jmin[c, v_new, vt_new].  The two gathers
    are one-hot VPU reductions over the (R, LANES) plane of the carried
    transmission (T is tiny, so the plane select is an unrolled sum)."""
    S = 1 << K
    R = S >> LANE_BITS

    def kernel(init_ref, pidx_ref, pjmin_ref, path_ref, tpath_ref, final_ref, st_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            st_s[0] = init_ref[0, 0, 0, 0]  # v (bipartition index)
            st_s[1] = init_ref[0, 0, 0, 1]  # vt (transmission)
            st_s[2] = init_ref[0, 0, 0, 2]  # prev_t

        idx0 = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        )
        v = st_s[0]
        vt = st_s[1]
        pt = st_s[2]
        for c in reversed(range(CC)):
            path_ref[0, c, 0, 0] = v
            tpath_ref[0, c, 0, 0] = vt
            sel = idx0 == v
            nv = jnp.int32(0)
            for t in range(T):
                nv = nv + jnp.where(
                    pt == t, jnp.sum(jnp.where(sel, pidx_ref[0, c, t], 0)), 0
                )
            nvt = pt
            sel2 = idx0 == nv
            npt = jnp.int32(0)
            for t in range(T):
                npt = npt + jnp.where(
                    nvt == t, jnp.sum(jnp.where(sel2, pjmin_ref[0, c, t], 0)), 0
                )
            v, vt, pt = nv, nvt, npt
        st_s[0] = v
        st_s[1] = vt
        st_s[2] = pt

        @pl.when(j == (C // CC) - 1)
        def _fin():
            final_ref[0, 0, 0, 0] = st_s[0]
            final_ref[0, 0, 0, 1] = st_s[1]
            final_ref[0, 0, 0, 2] = st_s[2]

    return kernel


@partial(jax.jit, static_argnames=("K", "T", "interpret"))
def backtrace_pallas_t(K, T, init, pidx, pjmin, interpret=False):
    """Batched general-T backtrace.  init (B, 3) i32 = (opt_idx, opt_trans,
    prev_trans); pidx/pjmin (B, C, T, R, LANES) the raw projection tables.
    Returns (index_path (B, C), trans_path (B, C)) i32."""
    B, C = pidx.shape[0], pidx.shape[1]
    S = 1 << K
    R = S >> LANE_BITS
    CC = 1 if interpret else _bt_chunk(C, T * R * LANES * 4, T=T)
    nchunks = C // CC
    kernel = _make_backtrace_kernel_t(K, T, C, CC)
    path, tpath, final = pl.pallas_call(
        kernel,
        grid=(B, nchunks),
        out_shape=[
            jax.ShapeDtypeStruct((B, C, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, C, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1, 3), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, 1, 3), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, CC, T, R, LANES),
                lambda b, j: (b, nchunks - 1 - j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, CC, T, R, LANES),
                lambda b, j: (b, nchunks - 1 - j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, CC, 1, 1), lambda b, j: (b, nchunks - 1 - j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, CC, 1, 1), lambda b, j: (b, nchunks - 1 - j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, 1, 3), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(init.reshape(B, 1, 1, 3), pidx, pjmin)
    return path.reshape(B, C), tpath.reshape(B, C), final.reshape(B, 3)


@partial(jax.jit, static_argnames=("K", "T", "M", "interpret"))
def backtrace_pallas_t_multi(K, T, M, init, pidx, pjmin, interpret=False):
    """M independent general-T backtraces per block sharing one set of
    projection tables (the seam route walks 1 head + T seam paths through
    the SAME tables).  One pallas_call with grid (B*M, chunks) whose table
    index maps read block b // M — a single kernel payload in the
    executable instead of M duplicates (the seeded-solve executables were
    dominated by repeated backtrace kernels, which made persistent-cache
    loads seconds each).  init (B, M, 3); returns paths (B, M, C) and
    finals (B, M, 3), identical to M separate backtrace_pallas_t calls."""
    B, C = pidx.shape[0], pidx.shape[1]
    S = 1 << K
    R = S >> LANE_BITS
    CC = 1 if interpret else _bt_chunk(C, T * R * LANES * 4, T=T)
    nchunks = C // CC
    kernel = _make_backtrace_kernel_t(K, T, C, CC)
    BM = B * M
    table_spec = pl.BlockSpec(
        (1, CC, T, R, LANES),
        lambda b, j: (b // M, nchunks - 1 - j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    path, tpath, final = pl.pallas_call(
        kernel,
        grid=(BM, nchunks),
        out_shape=[
            jax.ShapeDtypeStruct((BM, C, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((BM, C, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((BM, 1, 1, 3), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, 1, 3), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
            table_spec,
            table_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, CC, 1, 1), lambda b, j: (b, nchunks - 1 - j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, CC, 1, 1), lambda b, j: (b, nchunks - 1 - j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, 1, 3), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(init.reshape(BM, 1, 1, 3), pidx, pjmin)
    return path.reshape(B, M, C), tpath.reshape(B, M, C), final.reshape(B, M, 3)


@partial(jax.jit, static_argnames=("K", "interpret"))
def backtrace_pallas(K, opt_idx, pidx, interpret=False):
    """Batched T == 1 backtrace.  opt_idx (B,) i32 is the selected final
    bipartition; pidx (B, C, R, LANES) the raw projection tables from
    forward_scan_pallas.  Returns index paths (B, C) i32."""
    B, C = pidx.shape[0], pidx.shape[1]
    S = 1 << K
    R = S >> LANE_BITS
    CC = 1 if interpret else _bt_chunk(C, R * LANES * 4)
    nchunks = C // CC
    kernel = _make_backtrace_kernel(K, C, CC)
    path, final = pl.pallas_call(
        kernel,
        grid=(B, nchunks),
        out_shape=[
            jax.ShapeDtypeStruct((B, C, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1, 1), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, CC, R, LANES),
                lambda b, j: (b, nchunks - 1 - j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, CC, 1, 1), lambda b, j: (b, nchunks - 1 - j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, 1, 1), lambda b, j: (b, 0, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(opt_idx.reshape(B, 1, 1, 1), pidx)
    return path.reshape(B, C), final.reshape(B)


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def solve_batched_pallas(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, interpret=False):
    """End-to-end batched solve on the Pallas kernels: forward scan, XLA
    argmin tie-break selection, backtrace.  Returns (costs (B,), index
    paths (B, C), transmission paths (B, C)), matching wmec.solve_batched."""
    B, C = wdiff.shape[0], wdiff.shape[1]
    S = 1 << K
    R = S >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    emit_jmin = T > 1  # for T == 1 the transmission-argmin table is all
    # zeros and never read: skipping it halves backtrace-table HBM traffic
    CC = 1 if interpret else _fwd_chunk(C, K, T)  # unrolling only helps real hw
    kernel = _make_kernel(K, T, P, C, emit_jmin=emit_jmin, CC=CC)
    table_spec = pl.BlockSpec(
        (1, CC, T, R, LANES), lambda b, c: (b, c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    table_shape = jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.int32)
    has_jmin = T > 1
    state_shape = jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32)
    state_spec = pl.BlockSpec(
        (1, T, R, LANES), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [table_shape] + ([table_shape] if emit_jmin else []) + [state_shape]
    if has_jmin:
        out_shape.append(state_shape)
    out_shape.append(jax.ShapeDtypeStruct((B, R, LANES), jnp.int32))
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [table_spec] + ([table_spec] if emit_jmin else []) + [state_spec]
    if has_jmin:
        out_specs.append(state_spec)
    out_specs.append(
        pl.BlockSpec((1, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    )
    scratch_shapes = [pltpu.VMEM((T, R, LANES), jnp.int32)]
    if has_jmin:
        scratch_shapes.append(pltpu.VMEM((T, R, LANES), jnp.int32))
    scratch_shapes.append(pltpu.VMEM((R, LANES), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, C // CC),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        wdiff,
        wbase.reshape(B, C, 1, TP2),
        rankw.reshape(B, C, 1, K),
        acost.reshape(B, C, 1, T * nA),
        die_prev.astype(jnp.int32).reshape(B, C, 1, K),
        rc.reshape(B, C, 1, 1),
    )
    outs = list(outs)
    pidx = outs.pop(0)
    pjmin = outs.pop(0) if emit_jmin else None
    dp_last = outs.pop(0)
    jmin_last = outs.pop(0) if has_jmin else jnp.zeros_like(dp_last)
    key_last = outs.pop(0)

    # final-optimum selection (same tie-break as _backtrace_impl: min cost,
    # then min gray key, then min transmission, then min index)
    dp = dp_last.reshape(B, T, S)
    key = key_last.reshape(B, S)
    big = jnp.int32(2**30)
    m = jnp.min(dp, axis=(1, 2))
    cand = dp == m[:, None, None]
    keyb = jnp.where(cand, key[:, None, :], big)
    km = jnp.min(keyb, axis=(1, 2))
    cand = cand & (keyb == km[:, None, None])
    comb = (
        jnp.arange(T, dtype=jnp.int32)[:, None] * S
        + jnp.arange(S, dtype=jnp.int32)[None, :]
    )
    best = jnp.min(jnp.where(cand, comb[None], big), axis=(1, 2))
    opt_trans = best // S
    opt_idx = best % S

    if T == 1:
        index_path, _ = backtrace_pallas(
            K, opt_idx, pidx.reshape(B, C, R, LANES), interpret=interpret
        )
        trans_path = jnp.zeros((B, C), jnp.int32)
    else:
        jm = jmin_last.reshape(B, T, S)
        prev_trans = jax.vmap(lambda j, t, s: j[t, s])(jm, opt_trans, opt_idx)
        init = jnp.stack([opt_idx, opt_trans, prev_trans], axis=1)
        index_path, trans_path, _ = backtrace_pallas_t(
            K, T, init, pidx, pjmin, interpret=interpret
        )
    return m, index_path, trans_path


# ---------------------------------------------------------------------------
# Segmented solve: unbounded column counts at fixed HBM
# ---------------------------------------------------------------------------
#
# A whole-chromosome problem (C ~ 1e5 columns at K = 15) needs ~13 GB of
# backtrace tables if they are all emitted at once.  The reference bounds
# memory by keeping only every sqrt(n)-th DP column and recomputing the rest
# during backtracking (pedigreedptable.cpp:104,127-173); the TPU equivalent
# here checkpoints the carried state every `seg` columns in a table-free
# forward pass, then re-runs each segment's forward (tables included) right
# before backtracing it.  Peak HBM is O(B * seg * T * 2^K) regardless of C,
# at the cost of one extra (cheaper, write-free) forward pass.


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_carry_pallas(
    K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, cost0, jmin0, key0, interpret=False
):
    """Forward pass over one segment without table emission.  Carry arrays
    are (B, T, R, LANES) / (B, R, LANES) int32; returns the carry after the
    segment's last column."""
    B, C = wdiff.shape[0], wdiff.shape[1]
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    has_jmin = T > 1
    CC = 1 if interpret else _fwd_chunk(C, K, T)  # unrolling only helps real hw
    kernel = _make_kernel(K, T, P, C, emit_tables=False, carry_in=True, CC=CC)
    state_spec = pl.BlockSpec((1, T, R, LANES), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((1, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    state_shape = jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32)
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        state_spec,
    ] + ([state_spec] if has_jmin else []) + [key_spec]
    out_shape = [state_shape] + ([state_shape] if has_jmin else []) + [
        jax.ShapeDtypeStruct((B, R, LANES), jnp.int32)
    ]
    out_specs = [state_spec] + ([state_spec] if has_jmin else []) + [key_spec]
    scratch_shapes = [pltpu.VMEM((T, R, LANES), jnp.int32)]
    if has_jmin:
        scratch_shapes.append(pltpu.VMEM((T, R, LANES), jnp.int32))
    scratch_shapes.append(pltpu.VMEM((R, LANES), jnp.int32))
    carry_args = [cost0] + ([jmin0] if has_jmin else []) + [key0]
    outs = pl.pallas_call(
        kernel,
        grid=(B, C // CC),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        wdiff,
        wbase.reshape(B, C, 1, TP2),
        rankw.reshape(B, C, 1, K),
        acost.reshape(B, C, 1, T * nA),
        die_prev.astype(jnp.int32).reshape(B, C, 1, K),
        rc.reshape(B, C, 1, 1),
        *carry_args,
    )
    if has_jmin:
        return outs
    return outs[0], jnp.zeros_like(outs[0]), outs[1]


@partial(jax.jit, static_argnames=("K", "T", "P", "interpret"))
def forward_tables_pallas(
    K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, cost0, jmin0, key0, interpret=False
):
    """Forward pass over one segment WITH table emission, starting from a
    carry.  Returns (pidx, pjmin-or-None) raw tables for the segment."""
    B, C = wdiff.shape[0], wdiff.shape[1]
    R = (1 << K) >> LANE_BITS
    nA = 1 << P
    TP2 = T * P * 2
    emit_jmin = T > 1
    has_jmin = T > 1
    CC = 1 if interpret else _fwd_chunk(C, K, T)  # unrolling only helps real hw
    kernel = _make_kernel(
        K, T, P, C, emit_jmin=emit_jmin, emit_tables=True, carry_in=True, CC=CC
    )
    state_spec = pl.BlockSpec((1, T, R, LANES), lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((1, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(
        (1, CC, T, R, LANES), lambda b, c: (b, c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    table_shape = jax.ShapeDtypeStruct((B, C, T, R, LANES), jnp.int32)
    state_shape = jax.ShapeDtypeStruct((B, T, R, LANES), jnp.int32)
    out_shape = [table_shape] + ([table_shape] if emit_jmin else []) + [state_shape]
    if has_jmin:
        out_shape.append(state_shape)
    out_shape.append(jax.ShapeDtypeStruct((B, R, LANES), jnp.int32))
    out_specs = [table_spec] + ([table_spec] if emit_jmin else []) + [state_spec]
    if has_jmin:
        out_specs.append(state_spec)
    out_specs.append(key_spec)
    in_specs = [
        pl.BlockSpec((1, CC, K, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CC, 1, TP2), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, T * nA), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, K), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, CC, 1, 1), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
        state_spec,
    ] + ([state_spec] if has_jmin else []) + [key_spec]
    scratch_shapes = [pltpu.VMEM((T, R, LANES), jnp.int32)]
    if has_jmin:
        scratch_shapes.append(pltpu.VMEM((T, R, LANES), jnp.int32))
    scratch_shapes.append(pltpu.VMEM((R, LANES), jnp.int32))
    carry_args = [cost0] + ([jmin0] if has_jmin else []) + [key0]
    outs = pl.pallas_call(
        kernel,
        grid=(B, C // CC),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        wdiff,
        wbase.reshape(B, C, 1, TP2),
        rankw.reshape(B, C, 1, K),
        acost.reshape(B, C, 1, T * nA),
        die_prev.astype(jnp.int32).reshape(B, C, 1, K),
        rc.reshape(B, C, 1, 1),
        *carry_args,
    )
    if emit_jmin:
        return outs[0], outs[1]
    return outs[0], None


def _select_optimum(K, T, dp_last, key_last):
    """Batched final-optimum selection, same tie-break as _backtrace_impl:
    min cost, then min gray key, then min transmission, then min index.
    dp_last (B, T, R, LANES), key_last (B, R, LANES)."""
    S = 1 << K
    B = dp_last.shape[0]
    dp = dp_last.reshape(B, T, S)
    key = key_last.reshape(B, S)
    big = jnp.int32(2**30)
    m = jnp.min(dp, axis=(1, 2))
    cand = dp == m[:, None, None]
    keyb = jnp.where(cand, key[:, None, :], big)
    km = jnp.min(keyb, axis=(1, 2))
    cand = cand & (keyb == km[:, None, None])
    comb = (
        jnp.arange(T, dtype=jnp.int32)[:, None] * S
        + jnp.arange(S, dtype=jnp.int32)[None, :]
    )
    best = jnp.min(jnp.where(cand, comb[None], big), axis=(1, 2))
    return m, best // S, best % S


def solve_segmented(K, T, P, wdiff, wbase, rankw, acost, die_prev, rc, seg=2048, interpret=False):
    """Host-driven segmented solve (see module comment above): checkpointed
    forward, then per-segment recompute + backtrace in reverse.  C must be a
    multiple of `seg`.  Bit-identical to solve_batched_pallas."""
    B, C = wdiff.shape[0], wdiff.shape[1]
    assert C % seg == 0
    nseg = C // seg
    S = 1 << K
    R = S >> LANE_BITS

    def seg_args(i):
        sl = slice(i * seg, (i + 1) * seg)
        return (
            wdiff[:, sl],
            wbase[:, sl],
            rankw[:, sl],
            acost[:, sl],
            die_prev[:, sl],
            rc[:, sl],
        )

    carry = (
        jnp.zeros((B, T, R, LANES), jnp.int32),
        jnp.zeros((B, T, R, LANES), jnp.int32),
        jnp.zeros((B, R, LANES), jnp.int32),
    )
    carries = [carry]
    for i in range(nseg):
        carry = forward_carry_pallas(K, T, P, *seg_args(i), *carry, interpret=interpret)
        carries.append(carry)

    dp_last, jmin_last, key_last = carry
    m, opt_trans, opt_idx = _select_optimum(K, T, dp_last, key_last)

    if T > 1:
        jm = jmin_last.reshape(B, T, S)
        prev_trans = jax.vmap(lambda j, t, s: j[t, s])(jm, opt_trans, opt_idx)
        state = jnp.stack([opt_idx, opt_trans, prev_trans], axis=1)
    else:
        state = opt_idx

    idx_parts = []
    trans_parts = []
    for i in reversed(range(nseg)):
        pidx, pjmin = forward_tables_pallas(
            K, T, P, *seg_args(i), *carries[i], interpret=interpret
        )
        if T > 1:
            ip, tp, state = backtrace_pallas_t(K, T, state, pidx, pjmin, interpret=interpret)
        else:
            ip, state = backtrace_pallas(
                K, state, pidx.reshape(B, seg, R, LANES), interpret=interpret
            )
            tp = jnp.zeros((B, seg), jnp.int32)
        idx_parts.append(ip)
        trans_parts.append(tp)

    index_path = jnp.concatenate(idx_parts[::-1], axis=1)
    trans_path = jnp.concatenate(trans_parts[::-1], axis=1)
    return m, index_path, trans_path

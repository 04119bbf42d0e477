"""
Pure-numpy mirror of the wMEC/PedMEC forward scan (ops/wmec.py).

Semantically identical to the JAX/device path, kept for two reasons:
- tiny problems (unit tests, small phase blocks) run faster than a jit
  compile would take;
- it is the differential-testing target that catches device-specific
  numerics issues (e.g. TPU default-precision matmuls) automatically.
"""

from typing import Optional, Tuple

import numpy as np

from . import wmec


def forward_scan_numpy(packed: "wmec.PackedProblem") -> Optional[Tuple]:
    C, K, T, P = packed.n_cols, packed.K, packed.T, packed.P
    if C == 0:
        return None
    S = 1 << K
    INF = wmec.INF
    bits = wmec._bits_matrix(K).astype(np.int64)
    abits = wmec._assign_bits(P).astype(np.int64)
    pcmat = wmec._popcount_matrix(T).astype(np.int64)
    rankw_all = np.where(
        packed.rank >= 0, (1 << np.maximum(packed.rank, 0).astype(np.int64)), 0
    )
    idx_base = np.arange(S, dtype=np.int64)

    def invgray(n):
        n = n.copy()
        s = 1
        while s < max(K, 1):
            n ^= n >> s
            s <<= 1
        return n

    dp = np.zeros((S, T), dtype=np.int64)
    jmin = np.zeros((S, T), dtype=np.int64)
    key = np.zeros(S, dtype=np.int64)
    proj_idx_all = np.zeros((C, S, T), dtype=np.int64)
    proj_jmin_all = np.zeros((C, S, T), dtype=np.int64)

    wdiff_flat = packed.wdiff.reshape(C, K, T * P * 2).astype(np.int64)

    for c in range(C):
        # fold dying bits of the previous column
        cost = dp.copy()
        keyc = np.broadcast_to(key[:, None], (S, T)).copy()
        idx = np.broadcast_to(idx_base[:, None], (S, T)).copy()
        jm = jmin.copy()
        for p in range(K):
            if not packed.die_prev[c, p]:
                continue
            sh = (1 << (K - 1 - p), 2, 1 << p, T)
            cv, kv, iv, jv = (a.reshape(sh) for a in (cost, keyc, idx, jm))
            a_c, b_c = cv[:, 0], cv[:, 1]
            a_k, b_k = kv[:, 0], kv[:, 1]
            tb = (b_c < a_c) | ((b_c == a_c) & (b_k < a_k))
            for arr, w in (
                (cv, np.where(tb, b_c, a_c)),
                (kv, np.where(tb, b_k, a_k)),
                (iv, np.where(tb, iv[:, 1], iv[:, 0])),
                (jv, np.where(tb, jv[:, 1], jv[:, 0])),
            ):
                arr[:, 0] = w
                arr[:, 1] = w
            cost, keyc, idx, jm = (a.reshape(S, T) for a in (cv, kv, iv, jv))
        proj = cost
        proj_idx_all[c], proj_jmin_all[c] = idx, jm

        recomb = np.minimum(pcmat * int(packed.rc[c]), INF)
        tt = np.minimum(proj[:, None, :] + recomb[None], INF)
        tmin = tt.min(-1)
        jmin = tt.argmin(-1)

        f = bits @ wdiff_flat[c]
        cp = f.reshape(S, T, P, 2) + packed.wbase[c][None].astype(np.int64)
        s0 = cp[..., 0].sum(-1)
        d = cp[..., 1] - cp[..., 0]
        pa = np.einsum("stp,ap->sta", d, abits)
        total = np.minimum(s0[:, :, None] + pa + packed.acost[c][None], INF)
        cc = total.min(-1)
        dp = np.minimum(cc + tmin, INF)

        key = invgray(bits @ rankw_all[c])

    return dp, jmin, key, proj_idx_all, proj_jmin_all

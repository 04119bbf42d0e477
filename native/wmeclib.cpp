// Native exact wMEC/PedMEC column DP (host engine).
//
// Bit-exact mirror of the numpy forward scan + backtrace in
// whatshap_tpu/ops/wmec_numpy.py / wmec.py run_dp (which replicate the
// reference's src/pedigreedptable.cpp semantics including Gray-order
// tie-breaking via the inverse-Gray rank key).  All arithmetic is integer,
// so exactness is a matter of reproducing the same fold pairings,
// clampings and tie rules — asserted by the differential fuzz tests.
//
// Unlike the numpy mirror, which materializes the full padded 2^K state
// space per column, this engine works on COMPACT per-column spaces of the
// k_c active slots (2^k_c states — the reference's own adaptive cost) and
// reproduces the full-space index conventions (zero-filled inactive bits,
// don't-care-bit inheritance during the backtrace) exactly:
//
//   proj_idx[c, v, t] == (v & ~dying_mask_c) | win_bits_c[res(v)][t]
//
// where the fold winners depend only on the residual (non-dying active)
// bits — the full-space arrays are constant along everything else.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

typedef int64_t i64;
const i64 INF = (i64)1 << 29;

struct Solver {
    int C, K, T, P, nA;
    const uint8_t* active;    // C*K
    const uint8_t* die_prev;  // C*K
    const int32_t* wdiff;     // C*K*T*P*2
    const int32_t* wbase;     // C*T*P*2
    const int32_t* acost;     // C*T*nA
    const int8_t* rank;       // C*K
    const int32_t* rc;        // C

    i64 invgray(i64 n) const {
        for (int s = 1; s < (K > 1 ? K : 1); s <<= 1) n ^= n >> s;
        return n;
    }

    static int popcount(int x) {
        int pc = 0;
        while (x) { pc += x & 1; x >>= 1; }
        return pc;
    }

    int run(i64* out_cost, i64* out_index, i64* out_trans) const {
        // per-column backtrace records.  Columns without dying slots store
        // NO tables: their fold is the identity (win_bits all zero, win_jm
        // the carried jmin), which the backtrace reconstructs for free.
        std::vector<i64> dying_mask(C, 0);
        std::vector<std::vector<int>> res_slots(C);       // residual slot list
        std::vector<std::vector<i64>> win_bits(C);        // (2^k_res)*T
        std::vector<std::vector<int32_t>> win_jm(C);      // (2^k_res)*T

        // previous-column compact state
        std::vector<int> prev_act;                         // slot of each bit
        std::vector<i64> dp(1, 0), key(1, 0);              // dp: Sp*T, key: Sp
        std::vector<int32_t> jmin_prev(T, 0);              // Sp*T
        {
            std::vector<i64> dp0((size_t)1 * T, 0);
            dp = dp0;
        }

        std::vector<int> pos_prev(K, -1);

        double total_tables = 0;

        std::vector<int> act;              // current column active slots
        std::vector<int> pos_cur(K, -1);

        // scratch, reused across columns (no per-column allocation)
        std::vector<i64> fcost, fkey, fwb;
        std::vector<int32_t> fjm;
        std::vector<i64> proj;             // (2^k_res)*T
        std::vector<i64> dp_cur, key_cur;
        std::vector<int32_t> jmin_cur;
        std::vector<i64> tmin;
        std::vector<i64> f;                // subset sums, Sc*vec
        std::vector<i64> kacc;             // subset rank-key sums, Sc
        std::vector<int> racc;             // residual gather masks, Sc
        std::vector<i64> recomb((size_t)T * T);

        for (int c = 0; c < C; c++) {
            int kp = (int)prev_act.size();
            int Sp = 1 << kp;

            i64 dmask = 0;
            for (int s = 0; s < K; s++)
                if (die_prev[(size_t)c * K + s]) dmask |= (i64)1 << s;
            // keep only dying bits that were actually active in c-1
            {
                i64 am = 0;
                for (int j = 0; j < kp; j++) am |= (i64)1 << prev_act[j];
                dmask &= am;
            }
            dying_mask[c] = dmask;

            std::vector<int>& rs = res_slots[c];
            int kr, Sr;
            const i64* proj_ptr;
            if (dmask == 0) {
                // nothing dies: the fold is the identity.  The projection
                // aliases dp; no per-column tables are stored (win_bits is
                // all-zero, win_jm equals the carried jmin — reconstructed
                // in the backtrace).  For T > 1 the jmin table is still
                // needed per column; keep it only then.
                rs = prev_act;
                kr = kp;
                Sr = Sp;
                proj_ptr = dp.data();
                if (T > 1) {
                    win_jm[c] = jmin_prev;
                    total_tables += (double)Sr * T * 4;
                    if (total_tables > 8e9) return -1;
                }
            } else {
                // ---- fold dying bits of the previous column ----
                // carried per (state, t): cost, key, winner dying bits, jm
                fcost.assign((size_t)Sp * T, 0);
                fkey.assign((size_t)Sp * T, 0);
                fwb.assign((size_t)Sp * T, 0);
                fjm.assign((size_t)Sp * T, 0);
                for (int x = 0; x < Sp; x++) {
                    i64 die_bits = 0;
                    for (int j = 0; j < kp; j++)
                        if (((x >> j) & 1) && ((dmask >> prev_act[j]) & 1))
                            die_bits |= (i64)1 << prev_act[j];
                    for (int t = 0; t < T; t++) {
                        fcost[(size_t)x * T + t] = dp[(size_t)x * T + t];
                        fkey[(size_t)x * T + t] = key[x];
                        fwb[(size_t)x * T + t] = die_bits;
                        fjm[(size_t)x * T + t] = jmin_prev[(size_t)x * T + t];
                    }
                }
                for (int j = 0; j < kp; j++) {
                    if (!((dmask >> prev_act[j]) & 1)) continue;
                    int hi = 1 << (kp - 1 - j);
                    int lo = 1 << j;
                    for (int h = 0; h < hi; h++)
                        for (int l = 0; l < lo; l++) {
                            size_t i0 = (((size_t)h * 2 + 0) * lo + l) * T;
                            size_t i1 = (((size_t)h * 2 + 1) * lo + l) * T;
                            for (int t = 0; t < T; t++) {
                                i64 ac = fcost[i0 + t], bc = fcost[i1 + t];
                                i64 ak = fkey[i0 + t], bk = fkey[i1 + t];
                                bool tb = (bc < ac) || (bc == ac && bk < ak);
                                if (tb) {
                                    fcost[i0 + t] = bc;
                                    fkey[i0 + t] = bk;
                                    fwb[i0 + t] = fwb[i1 + t];
                                    fjm[i0 + t] = fjm[i1 + t];
                                } else {
                                    fcost[i1 + t] = ac;
                                    fkey[i1 + t] = ak;
                                    fwb[i1 + t] = fwb[i0 + t];
                                    fjm[i1 + t] = fjm[i0 + t];
                                }
                            }
                        }
                }

                // ---- residual extraction (non-dying prev-active slots) ----
                std::vector<int> res_bit_of_prev(kp, -1);
                for (int j = 0; j < kp; j++)
                    if (!((dmask >> prev_act[j]) & 1)) {
                        res_bit_of_prev[j] = (int)rs.size();
                        rs.push_back(prev_act[j]);
                    }
                kr = (int)rs.size();
                Sr = 1 << kr;
                win_bits[c].assign((size_t)Sr * T, 0);
                win_jm[c].assign((size_t)Sr * T, 0);
                proj.assign((size_t)Sr * T, 0);
                total_tables += (double)Sr * T * 12;
                if (total_tables > 8e9) return -1;
                for (int r = 0; r < Sr; r++) {
                    // representative in prev compact space: dying bits = 0
                    int x0 = 0;
                    for (int j = 0; j < kp; j++)
                        if (res_bit_of_prev[j] >= 0 && ((r >> res_bit_of_prev[j]) & 1))
                            x0 |= 1 << j;
                    for (int t = 0; t < T; t++) {
                        proj[(size_t)r * T + t] = fcost[(size_t)x0 * T + t];
                        win_bits[c][(size_t)r * T + t] = fwb[(size_t)x0 * T + t];
                        win_jm[c][(size_t)r * T + t] = fjm[(size_t)x0 * T + t];
                    }
                }
                proj_ptr = proj.data();
            }

            // ---- current column compact layout ----
            act.clear();
            for (int s = 0; s < K; s++) pos_cur[s] = -1;
            for (int s = 0; s < K; s++)
                if (active[(size_t)c * K + s]) {
                    pos_cur[s] = (int)act.size();
                    act.push_back(s);
                }
            int k = (int)act.size();
            int Sc = 1 << k;

            // residual gather masks: bit j of a column-c state y maps to a
            // residual bit iff its slot survived from c-1 (active there and
            // not dying) — residual slots are exactly those
            std::vector<int> rmask(k, 0);
            for (int j = 0; j < k; j++) {
                int s = act[j];
                for (int rb = 0; rb < kr; rb++)
                    if (rs[rb] == s) { rmask[j] = 1 << rb; break; }
            }

            // rank weights for the key
            std::vector<i64> rankw(k, 0);
            for (int j = 0; j < k; j++) {
                int rk = rank[(size_t)c * K + act[j]];
                rankw[j] = rk >= 0 ? ((i64)1 << rk) : 0;
            }

            // ---- subset-sum accumulation over active slots: emission
            // vectors f, raw rank keys kacc, residual gather masks racc ----
            const int vec = T * P * 2;
            if ((size_t)Sc * vec > f.size()) f.resize((size_t)Sc * vec);
            if ((size_t)Sc > kacc.size()) { kacc.resize(Sc); racc.resize(Sc); }
            for (int q = 0; q < vec; q++) f[q] = 0;
            kacc[0] = 0;
            racc[0] = 0;
            for (int y = 1; y < Sc; y++) {
                int low = y & -y;
                int j = 0;
                while (!((low >> j) & 1)) j++;
                int prev = y ^ low;
                const int32_t* wrow = &wdiff[(((size_t)c * K + act[j]) * vec)];
                i64* fy = &f[(size_t)y * vec];
                const i64* fp = &f[(size_t)prev * vec];
                for (int q = 0; q < vec; q++) fy[q] = fp[q] + wrow[q];
                kacc[y] = kacc[prev] + rankw[j];
                racc[y] = racc[prev] | rmask[j];
            }

            const int32_t* wb = &wbase[(size_t)c * vec];
            const int32_t* ac_col = &acost[(size_t)c * T * nA];
            if ((size_t)Sc * T > dp_cur.size()) dp_cur.resize((size_t)Sc * T);
            if ((size_t)Sc > key_cur.size()) key_cur.resize(Sc);

            if (T == 1 && P == 2) {
                // diploid single-sample fast path: no transmission state
                // (jmin is identically 0), 4 allele assignments unrolled
                const i64 wb0 = wb[0], wb1 = wb[1], wb2 = wb[2], wb3 = wb[3];
                const i64 a0 = ac_col[0], a1 = ac_col[1], a2 = ac_col[2],
                          a3 = ac_col[3];
                for (int y = 0; y < Sc; y++) {
                    const i64* fy = &f[(size_t)y * 4];
                    const i64 cp00 = fy[0] + wb0, cp01 = fy[1] + wb1;
                    const i64 cp10 = fy[2] + wb2, cp11 = fy[3] + wb3;
                    const i64 s0 = cp00 + cp10;
                    const i64 d0 = cp01 - cp00, d1 = cp11 - cp10;
                    i64 cc = s0 + a0;
                    i64 t1 = s0 + d0 + a1;
                    if (t1 < cc) cc = t1;
                    i64 t2 = s0 + d1 + a2;
                    if (t2 < cc) cc = t2;
                    i64 t3 = s0 + d0 + d1 + a3;
                    if (t3 < cc) cc = t3;
                    if (cc > INF) cc = INF;
                    i64 v = cc + proj_ptr[racc[y]];
                    dp_cur[y] = v < INF ? v : INF;
                    key_cur[y] = invgray(kacc[y]);
                }
                if ((size_t)Sc > jmin_cur.size()) jmin_cur.resize(Sc);
                // jmin stays all-zero for T == 1; ensure the carried slice
                // is zeroed once per column (cheap, Sc ints)
                std::fill(jmin_cur.begin(), jmin_cur.begin() + Sc, 0);
            } else {
                // ---- transition (min-plus over transmissions) ----
                if ((size_t)Sc * T > jmin_cur.size())
                    jmin_cur.resize((size_t)Sc * T);
                if ((size_t)Sc * T > tmin.size()) tmin.resize((size_t)Sc * T);
                for (int i = 0; i < T; i++)
                    for (int j = 0; j < T; j++) {
                        i64 v = (i64)popcount(i ^ j) * (i64)rc[c];
                        recomb[(size_t)i * T + j] = v < INF ? v : INF;
                    }
                for (int y = 0; y < Sc; y++) {
                    int r = racc[y];
                    for (int i = 0; i < T; i++) {
                        i64 best = INF + 1;
                        int bj = 0;
                        for (int j = 0; j < T; j++) {
                            i64 v = proj_ptr[(size_t)r * T + j] +
                                    recomb[(size_t)i * T + j];
                            if (v > INF) v = INF;
                            if (v < best) { best = v; bj = j; }
                        }
                        tmin[(size_t)y * T + i] = best;
                        jmin_cur[(size_t)y * T + i] = bj;
                    }
                }

                for (int y = 0; y < Sc; y++) {
                    const i64* fy = &f[(size_t)y * vec];
                    for (int t = 0; t < T; t++) {
                        // cp[p][a] = f + wbase; s0 = sum_p cp[p][0];
                        // d = cp[p][1] - cp[p][0]
                        i64 s0 = 0;
                        i64 d[16];
                        for (int p = 0; p < P; p++) {
                            i64 cp0 = fy[(t * P + p) * 2 + 0] + wb[(t * P + p) * 2 + 0];
                            i64 cp1 = fy[(t * P + p) * 2 + 1] + wb[(t * P + p) * 2 + 1];
                            s0 += cp0;
                            d[p] = cp1 - cp0;
                        }
                        i64 cc = INF;
                        for (int a = 0; a < nA; a++) {
                            i64 pa = 0;
                            for (int p = 0; p < P; p++)
                                if ((a >> p) & 1) pa += d[p];
                            i64 tot = s0 + pa + (i64)ac_col[(size_t)t * nA + a];
                            if (tot > INF) tot = INF;
                            if (tot < cc) cc = tot;
                        }
                        i64 v = cc + tmin[(size_t)y * T + t];
                        dp_cur[(size_t)y * T + t] = v < INF ? v : INF;
                    }
                    key_cur[y] = invgray(kacc[y]);
                }
            }

            dp.assign(dp_cur.begin(), dp_cur.begin() + (size_t)Sc * T);
            key.assign(key_cur.begin(), key_cur.begin() + Sc);
            jmin_prev.assign(jmin_cur.begin(), jmin_cur.begin() + (size_t)Sc * T);
            prev_act = act;
            for (int s = 0; s < K; s++) pos_prev[s] = pos_cur[s];
        }

        // ---- final optimum: lexicographic (cost, key, trans, index) ----
        int kl = (int)prev_act.size();
        int Sl = 1 << kl;
        i64 bc = INF + 1, bk = 0, bidx = 0;
        int bt = 0;
        bool first = true;
        for (int t = 0; t < T; t++)
            for (int x = 0; x < Sl; x++) {
                i64 cst = dp[(size_t)x * T + t];
                i64 ky = key[x];
                i64 idx = 0;
                for (int j = 0; j < kl; j++)
                    if ((x >> j) & 1) idx |= (i64)1 << prev_act[j];
                bool better;
                if (first) better = true;
                else if (cst != bc) better = cst < bc;
                else if (ky != bk) better = ky < bk;
                else if (t != bt) better = t < bt;
                else better = idx < bidx;
                if (better) { bc = cst; bk = ky; bt = t; bidx = idx; first = false; }
            }
        *out_cost = bc;

        // ---- backtrace ----
        i64 v = bidx;
        int vt = bt;
        // jmin gather at the compact state of v (inactive bits are don't-care)
        int xl = 0;
        for (int j = 0; j < kl; j++)
            if ((v >> prev_act[j]) & 1) xl |= 1 << j;
        int prev_trans = jmin_prev[(size_t)xl * T + vt];
        out_index[C - 1] = v;
        out_trans[C - 1] = vt;
        for (int i = C - 1; i >= 1; i--) {
            int vtrans = prev_trans;
            if (dying_mask[i] == 0) {
                // identity fold: no tables were stored (win_bits all zero;
                // win_jm kept only for T > 1, where it equals the carried
                // jmin of the previous column)
                if (T > 1) {
                    const std::vector<int>& rs = res_slots[i];
                    int r = 0;
                    for (size_t j = 0; j < rs.size(); j++)
                        if ((v >> rs[j]) & 1) r |= 1 << j;
                    prev_trans = win_jm[i][(size_t)r * T + vtrans];
                }
                out_index[i - 1] = v;
                out_trans[i - 1] = vtrans;
                continue;
            }
            const std::vector<int>& rs = res_slots[i];
            int r = 0;
            for (size_t j = 0; j < rs.size(); j++)
                if ((v >> rs[j]) & 1) r |= 1 << j;
            i64 vnew = (v & ~dying_mask[i]) | win_bits[i][(size_t)r * T + prev_trans];
            prev_trans = win_jm[i][(size_t)r * T + vtrans];
            out_index[i - 1] = vnew;
            out_trans[i - 1] = vtrans;
            v = vnew;
        }
        return 0;
    }
};

}  // namespace

extern "C" int32_t wh_wmec_solve(
    int32_t C, int32_t K, int32_t T, int32_t P,
    const uint8_t* active, const uint8_t* die_prev,
    const int32_t* wdiff, const int32_t* wbase, const int32_t* acost,
    const int8_t* rank, const int32_t* rc,
    int64_t* out_cost, int64_t* out_index, int64_t* out_trans) {
    if (C <= 0 || K <= 0 || K > 40 || P <= 0 || P > 16) return -1;
    Solver s;
    s.C = C; s.K = K; s.T = T; s.P = P; s.nA = 1 << P;
    s.active = active; s.die_prev = die_prev; s.wdiff = wdiff; s.wbase = wbase;
    s.acost = acost; s.rank = rank; s.rc = rc;
    // bail out when any single column's compact space is oversized
    for (int c = 0; c < C; c++) {
        int k = 0;
        for (int sl = 0; sl < K; sl++)
            if (active[(size_t)c * K + sl]) k++;
        if (k > 26) return -1;
    }
    return s.run(out_cost, out_index, out_trans);
}

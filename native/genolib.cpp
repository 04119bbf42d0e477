// Native genotyping forward-backward HMM.
//
// Mirror of whatshap_tpu/ops/genotyping.py (which has semantics parity with
// the reference's src/genotypedptable.cpp, genotypecolumncostcomputer.cpp and
// transitionprobabilitycomputer.cpp): scaled backward then forward pass over
// the bipartition x transmission state space in 80-bit long double, with the
// same fold structure, scaling points and unconditional normalizations
// (0/0 -> NaN exactly like the C++ reference).
//
// Unlike the numpy path, which works on the full padded 2^K slot space with
// power-of-two duplicate factors, this engine works on the COMPACT per-column
// space of the k_c actually-active slots (2^k_c states, exactly like the
// reference's ColumnIndexingScheme) and projects between adjacent columns'
// spaces with bit gathers.  Every pointwise operation, fold pairing and fold
// order (ascending slot index) is identical to the numpy path restricted to
// the distinct states, so results agree to reassociation rounding (~1e-15
// relative, far inside the 1e-9 oracle tolerance; the differential test
// asserts 1e-12 against the numpy path).  Complexity drops from
// O(C * 2^K * T * nA) to O(sum_c 2^k_c * T * nA) — the reference's own
// adaptive cost.
//
// Compile with -ffp-contract=off to keep x87 long double semantics stable.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

typedef long double ld;

namespace {

struct Geno {
    int C, K, T, P, n_ind, trio_count;
    const uint8_t* active;     // C*K
    const int8_t* allele;      // C*K
    const int32_t* weight;     // C*K
    const int32_t* slot_read;  // C*K
    const int32_t* read_source;  // n_reads
    const uint8_t* die_prev;   // C*K
    const int32_t* rc;         // C
    const int32_t* h2p;        // T*n_ind*2
    const double* gl;          // n_ind*C*3

    int nA;

    // per-column compact layout
    std::vector<int> kc;                 // C: number of active slots
    std::vector<std::vector<int>> act;   // C: ascending active slot indices
    std::vector<std::vector<int>> pos;   // C: slot -> compact bit, -1 inactive

    int h2p_at(int t, int ind, int h) const { return h2p[(t * n_ind + ind) * 2 + h]; }

    ld phred_probability(int phred) const {
        if (phred == 0) return 0.9999L;
        return powl(10.0L, -(ld)phred / 10.0L);
    }

    // emission em[x][t][a] over the compact space of column c, built by
    // recursive doubling over the active slots: the emission is a product of
    // independent per-slot factors f_bit[t][a], so the 2^k-state table is k
    // block-duplications (lo block *= f0, hi block = old * f1) — O(2^k*T*nA)
    // multiplies total instead of the O(k*2^k) partition-table sweeps, and a
    // BLANK slot is a plain memcpy.  Same factors and values as the
    // per-partition formulation (genotypecolumncostcomputer.cpp:54-103);
    // only multiplication association differs (ulp-level).
    void column_emission(int c, std::vector<ld>& em, std::vector<ld>& scratch) const {
        int k = kc[c];
        size_t stride = (size_t)T * nA;
        em.assign(((size_t)1 << k) * stride, 1.0L);
        scratch.resize(2 * stride);
        ld* f0 = scratch.data();
        ld* f1 = scratch.data() + stride;
        for (int j = 0; j < k; j++) {
            size_t half = ((size_t)1 << j) * stride;
            int s = act[c][j];
            int al = allele[(size_t)c * K + s];
            if (al == 2) {  // BLANK: factor 1 either way
                std::memcpy(&em[half], &em[0], half * sizeof(ld));
                continue;
            }
            ld proba = phred_probability(weight[(size_t)c * K + s]);
            ld q[2];
            if (al == 0) { q[0] = 1.0L - proba; q[1] = proba; }
            else { q[0] = proba; q[1] = 1.0L - proba; }
            int ridx = slot_read[(size_t)c * K + s];
            int ind = ridx >= 0 ? read_source[ridx] : 0;
            for (int t = 0; t < T; t++) {
                // bit==0 -> haplotype 1, bit==1 -> haplotype 0
                int p0 = h2p_at(t, ind, 1);
                int p1 = h2p_at(t, ind, 0);
                for (int a = 0; a < nA; a++) {
                    f0[(size_t)t * nA + a] = q[(a >> p0) & 1];
                    f1[(size_t)t * nA + a] = q[(a >> p1) & 1];
                }
            }
            for (size_t base = 0; base < half; base += stride) {
                ld* lo = &em[base];
                ld* hi = &em[half + base];
                for (size_t i = 0; i < stride; i++) {
                    ld v = lo[i];
                    hi[i] = v * f1[i];
                    lo[i] = v * f0[i];
                }
            }
        }
    }

    // in-place sum-fold over arr[x][t] ((1<<k)*T) along compact bits where
    // foldbit[j] is set; ascending j matches the numpy path's ascending
    // slot-index fold order (compact positions preserve slot order)
    void sum_fold(std::vector<ld>& arr, int k, const std::vector<uint8_t>& foldbit) const {
        for (int p = 0; p < k; p++) {
            if (!foldbit[p]) continue;
            int hi = 1 << (k - 1 - p);
            int lo = 1 << p;
            for (int h = 0; h < hi; h++)
                for (int l = 0; l < lo; l++) {
                    size_t i0 = (((size_t)h * 2 + 0) * lo + l) * T;
                    size_t i1 = (((size_t)h * 2 + 1) * lo + l) * T;
                    for (int t = 0; t < T; t++) {
                        ld tot = arr[i0 + t] + arr[i1 + t];
                        arr[i0 + t] = tot;
                        arr[i1 + t] = tot;
                    }
                }
        }
    }

    // gather masks mapping compact states of column `dst` into the (folded)
    // compact array of column `src`: x = OR over dst bits j kept in src of
    // ((y >> j) & 1) << keep[j]; bits of src not covered are zero (the
    // source array is constant along them after folding)
    std::vector<int> keep_masks(int dst, int src, const uint8_t* dst_birth) const {
        std::vector<int> m(kc[dst], 0);
        for (int j = 0; j < kc[dst]; j++) {
            int s = act[dst][j];
            if (dst_birth && dst_birth[s]) continue;  // summed out on the src side
            int pj = pos[src][s];
            if (pj >= 0) m[j] = 1 << pj;
        }
        return m;
    }

    static inline int gather(int y, const std::vector<int>& masks) {
        int x = 0;
        for (size_t j = 0; j < masks.size(); j++)
            if ((y >> j) & 1) x |= masks[j];
        return x;
    }

    int run(ld* out) const {
        // ---- transition tables / assignment priors / genotype indices ----
        std::vector<int> pcmat((size_t)T * T, 0);
        for (int i = 0; i < T; i++)
            for (int j = 0; j < T; j++) {
                int x = i ^ j, pc = 0;
                while (x) { pc += x & 1; x >>= 1; }
                pcmat[(size_t)i * T + j] = pc;
            }
        std::vector<int> gt_idx((size_t)T * nA * (n_ind > 0 ? n_ind : 1), 0);
        for (int t = 0; t < T; t++)
            for (int ind = 0; ind < n_ind; ind++) {
                int p0 = h2p_at(t, ind, 0), p1 = h2p_at(t, ind, 1);
                for (int a = 0; a < nA; a++)
                    gt_idx[((size_t)t * nA + a) * n_ind + ind] =
                        ((a >> p0) & 1) + ((a >> p1) & 1);
            }

        std::vector<ld> trans((size_t)C * T * T);
        std::vector<ld> passign((size_t)C * T * nA);
        int nb = 2 * trio_count + 1;
        std::vector<ld> bernoulli(nb);
        for (int c = 0; c < C; c++) {
            ld rp = powl(10.0L, -(ld)rc[c] / 10.0L);
            for (int i = 0; i < nb; i++)
                bernoulli[i] = powl(rp, (ld)i) * powl(1.0L - rp, (ld)(2 * trio_count - i));
            for (int i = 0; i < T; i++) {
                ld row_sum = 0.0L;
                for (int j = 0; j < T; j++) row_sum += bernoulli[pcmat[(size_t)i * T + j]];
                for (int j = 0; j < T; j++)
                    trans[((size_t)c * T + i) * T + j] =
                        bernoulli[pcmat[(size_t)i * T + j]] / row_sum;
            }
            for (int t = 0; t < T; t++) {
                ld* pa = &passign[((size_t)c * T + t) * nA];
                for (int a = 0; a < nA; a++) {
                    ld prob = 1.0L;
                    for (int ind = 0; ind < n_ind; ind++)
                        prob *= (ld)gl[((size_t)ind * C + c) * 3 +
                                       gt_idx[((size_t)t * nA + a) * n_ind + ind]];
                    pa[a] = prob;
                }
                // deduplicate by genotype-vector multiplicity
                for (int a = 0; a < nA; a++) {
                    int mult = 0;
                    for (int a2 = 0; a2 < nA; a2++) {
                        bool same = true;
                        for (int ind = 0; ind < n_ind; ind++)
                            if (gt_idx[((size_t)t * nA + a) * n_ind + ind] !=
                                gt_idx[((size_t)t * nA + a2) * n_ind + ind]) {
                                same = false;
                                break;
                            }
                        if (same) mult++;
                    }
                    pa[a] /= (ld)mult;
                }
                ld psum = 0.0L;
                for (int a = 0; a < nA; a++) psum += pa[a];
                for (int a = 0; a < nA; a++) pa[a] /= psum;  // 0/0 -> NaN, as in the reference
            }
        }

        // birth[c*K+s]: newly active (or reused after a death) entering c —
        // the bits the backward pass sums out when projecting onto c-1
        std::vector<uint8_t> birth((size_t)C * K, 0);
        {
            std::vector<uint8_t> prev(K, 0);
            for (int c = 0; c < C; c++) {
                for (int s = 0; s < K; s++) {
                    uint8_t a = active[(size_t)c * K + s];
                    birth[(size_t)c * K + s] =
                        a && (!prev[s] || die_prev[(size_t)c * K + s]);
                    prev[s] = a;
                }
            }
        }

        double beta_bytes = 0;
        for (int c = 0; c < C; c++) beta_bytes += (double)(1 << kc[c]) * T * sizeof(ld);
        if (beta_bytes > 8e9) return -1;

        // Cache per-column emissions computed in the backward pass for reuse
        // by the forward pass (they are identical); fall back to recomputing
        // when the tables would not fit.
        double em_bytes = 0;
        for (int c = 0; c < C; c++)
            em_bytes += (double)(1 << kc[c]) * T * nA * sizeof(ld);
        bool cache_em = em_bytes < 4e9;
        std::vector<std::vector<ld>> em_store(cache_em ? C : 0);

        // ---- backward pass ----
        std::vector<ld> scaling(C, 0.0L);
        std::vector<std::vector<ld>> beta_store(C);  // empty = None
        std::vector<ld> em_local, cp, weighted, contrib;
        int beta_next = -1;  // index into beta_store, -1 = None
        for (int c = C - 1; c >= 0; c--) {
            int k = kc[c], Sc = 1 << k;
            size_t st = (size_t)Sc * T;
            std::vector<ld>& em = cache_em ? em_store[c] : em_local;
            column_emission(c, em, cp);
            std::vector<ld> ones;
            const std::vector<ld>* bvalp;
            if (beta_next >= 0) {
                bvalp = &beta_store[beta_next];
            } else {
                ones.assign(st, 1.0L);
                bvalp = &ones;
            }
            const std::vector<ld>& bval = *bvalp;
            ld total = 0.0L;
            for (size_t i = 0; i < st; i++) total += bval[i];
            ld scaling_sum = total * (ld)nA;  // == (full sum / dup) * nA
            scaling[c] = scaling_sum;
            if (c > 0) {
                const ld* pa = &passign[(size_t)c * T * nA];
                weighted.assign(st, 0.0L);
                for (int x = 0; x < Sc; x++)
                    for (int i = 0; i < T; i++) {
                        ld acc = 0.0L;
                        const ld* emx = &em[((size_t)x * T + i) * nA];
                        for (int a = 0; a < nA; a++)
                            acc += bval[(size_t)x * T + i] * emx[a] * pa[(size_t)i * nA + a];
                        weighted[(size_t)x * T + i] = acc;
                    }
                contrib.assign(st, 0.0L);
                const ld* tr = &trans[(size_t)c * T * T];
                for (int x = 0; x < Sc; x++)
                    for (int j = 0; j < T; j++) {
                        ld acc = 0.0L;
                        for (int i = 0; i < T; i++)
                            acc += weighted[(size_t)x * T + i] * tr[(size_t)j * T + i];
                        contrib[(size_t)x * T + j] = acc;
                    }
                // sum out bits born entering c, then gather into c-1's space
                std::vector<uint8_t> foldbit(k, 0);
                for (int j = 0; j < k; j++)
                    foldbit[j] = birth[(size_t)c * K + act[c][j]];
                sum_fold(contrib, k, foldbit);
                int kp = kc[c - 1], Sp = 1 << kp;
                std::vector<int> masks = keep_masks(c - 1, c, nullptr);
                // drop bits of c-1 that are not alive (unborn) in c: slots of
                // c-1 absent from c, or reborn in c, contribute mask 0 via
                // pos/birth checks inside keep_masks
                for (int j = 0; j < kp; j++) {
                    int s = act[c - 1][j];
                    if (pos[c][s] >= 0 && birth[(size_t)c * K + s]) masks[j] = 0;
                }
                std::vector<ld>& nbeta = beta_store[c - 1];
                nbeta.assign((size_t)Sp * T, 0.0L);
                // multiply by the reciprocal instead of dividing per element
                // (ulp-level difference; 0/NaN special cases propagate the
                // same way: x*(1/0)=x*inf and 0*inf=NaN match x/0 and 0/0)
                ld inv_scaling = 1.0L / scaling_sum;
                for (int y = 0; y < Sp; y++) {
                    int x = gather(y, masks);
                    for (int t = 0; t < T; t++)
                        nbeta[(size_t)y * T + t] = contrib[(size_t)x * T + t] * inv_scaling;
                }
            }
            if (beta_next >= 0) {
                ld inv_scaling = 1.0L / scaling_sum;
                for (size_t i = 0; i < beta_store[beta_next].size(); i++)
                    beta_store[beta_next][i] *= inv_scaling;
            }
            beta_next = c > 0 ? c - 1 : -1;
        }

        // ---- forward pass ----
        std::vector<ld> fwd, fb_sum_prev, alpha;
        int alpha_col = -1;  // column whose compact space `alpha` lives in
        int n_out_ind = n_ind > 0 ? n_ind : 1;
        for (int c = 0; c < C; c++) {
            int k = kc[c], Sc = 1 << k;
            size_t st = (size_t)Sc * T;
            const std::vector<ld>& em =
                cache_em ? em_store[c] : (column_emission(c, em_local, cp), em_local);
            fb_sum_prev.assign(st, 1.0L);
            if (c > 0) {
                // gather alpha (folded over deaths entering c) from c-1's
                // space, then apply the transmission transition
                std::vector<int> masks = keep_masks(c, alpha_col, &birth[(size_t)c * K]);
                const ld* tr = &trans[(size_t)c * T * T];
                for (int y = 0; y < Sc; y++) {
                    int x = gather(y, masks);
                    for (int i = 0; i < T; i++) {
                        ld acc = 0.0L;
                        for (int j = 0; j < T; j++)
                            acc += alpha[(size_t)x * T + j] * tr[(size_t)j * T + i];
                        fb_sum_prev[(size_t)y * T + i] = acc;
                    }
                }
            }
            const ld* pa = &passign[(size_t)c * T * nA];
            fwd.assign((size_t)Sc * T * nA, 0.0L);
            ld inv_scaling = 1.0L / scaling[c];
            for (int x = 0; x < Sc; x++)
                for (int t = 0; t < T; t++) {
                    const ld* emx = &em[((size_t)x * T + t) * nA];
                    ld* fx = &fwd[((size_t)x * T + t) * nA];
                    ld sp = fb_sum_prev[(size_t)x * T + t];
                    for (int a = 0; a < nA; a++)
                        fx[a] = sp * emx[a] * pa[(size_t)t * nA + a] * inv_scaling;
                }
            const std::vector<ld>& beta_here = beta_store[c];
            bool have_beta = !beta_here.empty();
            // fb = fwd * beta (or fwd); accumulate normalization + marginals
            // (the full-space /dup cancels against the duplicate multiplicity)
            ld normalization = 0.0L;
            std::vector<ld> marg((size_t)n_out_ind * 3, 0.0L);
            for (int x = 0; x < Sc; x++)
                for (int t = 0; t < T; t++)
                    for (int a = 0; a < nA; a++) {
                        ld v = fwd[((size_t)x * T + t) * nA + a];
                        if (have_beta) v *= beta_here[(size_t)x * T + t];
                        normalization += v;
                        for (int ind = 0; ind < n_ind; ind++) {
                            int g = gt_idx[((size_t)t * nA + a) * n_ind + ind];
                            marg[(size_t)ind * 3 + g] += v;
                        }
                    }
            for (int ind = 0; ind < n_ind; ind++)
                for (int g = 0; g < 3; g++)
                    out[((size_t)c * n_out_ind + ind) * 3 + g] =
                        marg[(size_t)ind * 3 + g] / normalization;
            if (c + 1 < C) {
                alpha.assign(st, 0.0L);
                for (int x = 0; x < Sc; x++)
                    for (int t = 0; t < T; t++) {
                        ld acc = 0.0L;
                        const ld* fx = &fwd[((size_t)x * T + t) * nA];
                        for (int a = 0; a < nA; a++) acc += fx[a];
                        alpha[(size_t)x * T + t] = acc;
                    }
                std::vector<uint8_t> foldbit(k, 0);
                for (int j = 0; j < k; j++)
                    foldbit[j] = die_prev[(size_t)(c + 1) * K + act[c][j]];
                sum_fold(alpha, k, foldbit);
                alpha_col = c;
            }
        }
        return 0;
    }
};

}  // namespace

extern "C" int32_t wh_genotype_run(
    int32_t C, int32_t K, int32_t T, int32_t P, int32_t n_ind, int32_t trio_count,
    const uint8_t* active, const int8_t* allele, const int32_t* weight,
    const int32_t* slot_read, const int32_t* read_source,
    const uint8_t* die_prev, const int32_t* rc,
    const int32_t* h2p, const double* gl, long double* out) {
    if (C <= 0 || K <= 0 || K > 30) return -1;
    Geno g;
    g.C = C; g.K = K; g.T = T; g.P = P; g.n_ind = n_ind; g.trio_count = trio_count;
    g.active = active; g.allele = allele; g.weight = weight; g.slot_read = slot_read;
    g.read_source = read_source; g.die_prev = die_prev; g.rc = rc; g.h2p = h2p;
    g.gl = gl;
    g.nA = 1 << P;
    g.kc.resize(C);
    g.act.resize(C);
    g.pos.assign(C, std::vector<int>(K, -1));
    for (int c = 0; c < C; c++) {
        for (int s = 0; s < K; s++)
            if (active[(size_t)c * K + s]) {
                g.pos[c][s] = (int)g.act[c].size();
                g.act[c].push_back(s);
            }
        g.kc[c] = (int)g.act[c].size();
        if (g.kc[c] > 30) return -1;
    }
    return g.run(out);
}

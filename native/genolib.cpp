// Native genotyping forward-backward HMM.
//
// Mirror of whatshap_tpu/ops/genotyping.py (which has semantics parity with
// the reference's src/genotypedptable.cpp, genotypecolumncostcomputer.cpp and
// transitionprobabilitycomputer.cpp): scaled backward then forward pass over
// the bipartition x transmission state space in 80-bit long double, with the
// same slot layout, fold structure, scaling points and unconditional
// normalizations (0/0 -> NaN exactly like the C++ reference).  Loop/operation
// order follows the numpy implementation element-for-element; the only
// deviation is plain left-to-right accumulation where numpy uses pairwise
// summation (bounded by a ~1e-15 relative reassociation difference, far
// inside the 1e-9 parity tolerance against the reference oracle — the
// differential test asserts 1e-12 against the numpy path).
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

    int S, nA;

    int h2p_at(int t, int ind, int h) const { return h2p[(t * n_ind + ind) * 2 + h]; }

    ld phred_probability(int phred) const {
        if (phred == 0) return 0.9999L;
        return powl(10.0L, -(ld)phred / 10.0L);
    }

    // emission em[x][t][a], flattened (S*T*nA)
    void column_emission(int c, std::vector<ld>& em, std::vector<ld>& cp) const {
        // cp[x][t][p][al]
        size_t cpn = (size_t)S * T * P * 2;
        cp.assign(cpn, 1.0L);
        for (int s = 0; s < K; s++) {
            if (!active[(size_t)c * K + s]) continue;
            int al = allele[(size_t)c * K + s];
            if (al == 2) continue;  // BLANK
            ld proba = phred_probability(weight[(size_t)c * K + s]);
            ld q[2];
            if (al == 0) { q[0] = 1.0L - proba; q[1] = proba; }
            else { q[0] = proba; q[1] = 1.0L - proba; }
            int ridx = slot_read[(size_t)c * K + s];
            int ind = ridx >= 0 ? read_source[ridx] : 0;
            for (int x = 0; x < S; x++) {
                int bit = (x >> s) & 1;
                for (int t = 0; t < T; t++) {
                    // bit==0 -> haplotype 1, bit==1 -> haplotype 0
                    int psel = bit == 0 ? h2p_at(t, ind, 1) : h2p_at(t, ind, 0);
                    ld* base = &cp[(((size_t)x * T + t) * P + psel) * 2];
                    base[0] *= q[0];
                    base[1] *= q[1];
                }
            }
        }
        size_t emn = (size_t)S * T * nA;
        em.assign(emn, 1.0L);
        for (int x = 0; x < S; x++)
            for (int t = 0; t < T; t++) {
                const ld* cpt = &cp[((size_t)x * T + t) * P * 2];
                ld* emt = &em[((size_t)x * T + t) * nA];
                for (int p = 0; p < P; p++)
                    for (int a = 0; a < nA; a++) {
                        int b = (a >> p) & 1;
                        emt[a] *= cpt[p * 2 + b];
                    }
            }
    }

    // in-place sum-fold of bits over arr[x][t] (S*T)
    void sum_fold(std::vector<ld>& arr, const uint8_t* bits) const {
        for (int p = 0; p < K; p++) {
            if (!bits[p]) continue;
            int hi = 1 << (K - 1 - p);
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

    int run(ld* out) const {
        size_t st = (size_t)S * T;
        // beta storage: C columns of (S*T); bail out on absurd footprints
        if ((double)C * st * sizeof(ld) > 8e9) return -1;

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

        std::vector<ld> dup(C);
        std::vector<uint8_t> birth((size_t)C * K, 0);
        {
            std::vector<uint8_t> prev(K, 0);
            for (int c = 0; c < C; c++) {
                int k_active = 0;
                for (int s = 0; s < K; s++) {
                    uint8_t a = active[(size_t)c * K + s];
                    if (a) k_active++;
                    birth[(size_t)c * K + s] =
                        a && (!prev[s] || die_prev[(size_t)c * K + s]);
                    prev[s] = a;
                }
                dup[c] = powl(2.0L, (ld)(K - k_active));
            }
        }

        // ---- backward pass ----
        std::vector<ld> scaling(C, 0.0L);
        std::vector<std::vector<ld>> beta_store(C);  // empty = None
        std::vector<ld> em, cp, weighted(st), ones(st, 1.0L);
        int beta_next = -1;  // index into beta_store, -1 = None
        for (int c = C - 1; c >= 0; c--) {
            column_emission(c, em, cp);
            const std::vector<ld>& bval = beta_next >= 0 ? beta_store[beta_next] : ones;
            ld total = 0.0L;
            for (size_t i = 0; i < st; i++) total += bval[i];
            ld scaling_sum = (total / dup[c]) * (ld)nA;
            scaling[c] = scaling_sum;
            if (c > 0) {
                const ld* pa = &passign[(size_t)c * T * nA];
                for (int x = 0; x < S; x++)
                    for (int i = 0; i < T; i++) {
                        ld acc = 0.0L;
                        const ld* emx = &em[((size_t)x * T + i) * nA];
                        for (int a = 0; a < nA; a++)
                            acc += bval[(size_t)x * T + i] * emx[a] * pa[(size_t)i * nA + a];
                        weighted[(size_t)x * T + i] = acc;
                    }
                std::vector<ld>& nbeta = beta_store[c - 1];
                nbeta.assign(st, 0.0L);
                const ld* tr = &trans[(size_t)c * T * T];
                for (int x = 0; x < S; x++)
                    for (int j = 0; j < T; j++) {
                        ld acc = 0.0L;
                        for (int i = 0; i < T; i++)
                            acc += weighted[(size_t)x * T + i] * tr[(size_t)j * T + i];
                        nbeta[(size_t)x * T + j] = acc;
                    }
                sum_fold(nbeta, &birth[(size_t)c * K]);
                for (size_t i = 0; i < st; i++) nbeta[i] /= scaling_sum;
            }
            if (beta_next >= 0)
                for (size_t i = 0; i < st; i++) beta_store[beta_next][i] /= scaling_sum;
            beta_next = c > 0 ? c - 1 : -1;
        }

        // ---- forward pass ----
        std::vector<ld> fwd((size_t)S * T * nA), fb_sum_prev(st), alpha(st);
        int n_out_ind = n_ind > 0 ? n_ind : 1;
        for (int c = 0; c < C; c++) {
            column_emission(c, em, cp);
            if (c > 0) {
                const ld* tr = &trans[(size_t)c * T * T];
                for (int x = 0; x < S; x++)
                    for (int i = 0; i < T; i++) {
                        ld acc = 0.0L;
                        for (int j = 0; j < T; j++)
                            acc += alpha[(size_t)x * T + j] * tr[(size_t)j * T + i];
                        fb_sum_prev[(size_t)x * T + i] = acc;
                    }
            } else {
                for (size_t i = 0; i < st; i++) fb_sum_prev[i] = 1.0L;
            }
            const ld* pa = &passign[(size_t)c * T * nA];
            for (int x = 0; x < S; x++)
                for (int t = 0; t < T; t++) {
                    const ld* emx = &em[((size_t)x * T + t) * nA];
                    ld* fx = &fwd[((size_t)x * T + t) * nA];
                    ld sp = fb_sum_prev[(size_t)x * T + t];
                    for (int a = 0; a < nA; a++)
                        fx[a] = sp * emx[a] * pa[(size_t)t * nA + a] / scaling[c];
                }
            const std::vector<ld>& beta_here = beta_store[c];
            bool have_beta = !beta_here.empty();
            // fb = fwd * beta (or fwd); accumulate normalization + marginals
            ld normalization = 0.0L;
            std::vector<ld> marg((size_t)n_out_ind * 3, 0.0L);
            for (int x = 0; x < S; x++)
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
            normalization /= dup[c];
            for (int ind = 0; ind < n_ind; ind++)
                for (int g = 0; g < 3; g++)
                    out[((size_t)c * n_out_ind + ind) * 3 + g] =
                        (marg[(size_t)ind * 3 + g] / dup[c]) / normalization;
            if (c + 1 < C) {
                for (int x = 0; x < S; x++)
                    for (int t = 0; t < T; t++) {
                        ld acc = 0.0L;
                        const ld* fx = &fwd[((size_t)x * T + t) * nA];
                        for (int a = 0; a < nA; a++) acc += fx[a];
                        alpha[(size_t)x * T + t] = acc;
                    }
                sum_fold(alpha, &die_prev[(size_t)(c + 1) * K]);
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
    g.S = 1 << K;
    g.nA = 1 << P;
    return g.run(out);
}

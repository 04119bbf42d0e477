// Dev-only oracle: drives the *reference* WhatsHap C++ core (compiled from
// /root/reference/src) on a problem read from stdin, printing cost,
// partition, haplotypes, transmission vector, and DP wall time.
// Used to (a) measure the single-core C++ baseline and (b) fuzz-check the
// TPU solver for bit-exact parity. Lives in /tmp; NOT part of the repo.
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <string>
#include <vector>
#include <iostream>

#include "read.h"
#include "readset.h"
#include "pedigree.h"
#include "pedigreedptable.h"
#include "genotype.h"
#include "phredgenotypelikelihoods.h"

int main() {
    int n_reads, n_pos, n_ind, n_trios, distrust;
    if (scanf("%d %d %d %d %d", &n_reads, &n_pos, &n_ind, &n_trios, &distrust) != 5) return 1;
    std::vector<unsigned int> positions(n_pos);
    for (auto &p : positions) scanf("%u", &p);

    ReadSet* rs = new ReadSet();
    for (int i = 0; i < n_reads; ++i) {
        int sample_id, n_vars;
        char name[512];  // real read names (PacBio movie ids) run long
        scanf("%511s %d %d", name, &sample_id, &n_vars);
        Read* r = new Read(std::string(name), 50, 0, sample_id);
        for (int v = 0; v < n_vars; ++v) {
            int pos, allele, q;
            scanf("%d %d %d", &pos, &allele, &q);
            r->addVariant(pos, allele, q);
        }
        rs->add(r);
    }
    rs->sort();

    Pedigree* ped = new Pedigree();
    for (int i = 0; i < n_ind; ++i) {
        std::vector<Genotype*> gts;
        std::vector<PhredGenotypeLikelihoods*> gls;
        for (int c = 0; c < n_pos; ++c) {
            int gt_index;
            scanf("%d", &gt_index);
            gts.push_back(new Genotype((uint64_t)gt_index, 2));
            if (distrust) {
                double g0, g1, g2;
                scanf("%lf %lf %lf", &g0, &g1, &g2);
                gls.push_back(new PhredGenotypeLikelihoods({g0, g1, g2}, 2, 2));
            } else {
                gls.push_back(nullptr);
            }
        }
        ped->addIndividual(i, gts, gls);
    }
    for (int t = 0; t < n_trios; ++t) {
        int f, m, c;
        scanf("%d %d %d", &f, &m, &c);
        ped->addRelationship(f, m, c);
    }
    std::vector<unsigned int> recombcost(n_pos);
    for (auto &r : recombcost) scanf("%u", &r);

    auto t0 = std::chrono::steady_clock::now();
    PedigreeDPTable dp(rs, recombcost, ped, distrust != 0, &positions);
    unsigned int cost = dp.get_optimal_score();
    std::vector<ReadSet*> output_read_sets;
    for (size_t i = 0; i < ped->size(); ++i) output_read_sets.push_back(new ReadSet());
    std::vector<unsigned int> transmission;
    dp.get_super_reads(&output_read_sets, &transmission);
    std::vector<bool>* part = dp.get_optimal_partitioning();
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();

    printf("cost %u\n", cost);
    printf("time %.6f\n", dt);
    printf("partition ");
    // print in sorted-readset order with Cython convention (0 if flagged)
    for (size_t i = 0; i < part->size(); ++i) printf("%d", (*part)[i] ? 0 : 1);
    printf("\n");
    // print read names in sorted order so the host can align partitions
    printf("readorder");
    for (size_t i = 0; i < rs->size(); ++i) printf(" %s", rs->get(i)->getName().c_str());
    printf("\n");
    printf("transmission");
    for (auto t : transmission) printf(" %u", t);
    printf("\n");
    for (size_t k = 0; k < ped->size(); ++k) {
        for (int h = 0; h < 2; ++h) {
            Read* sr = output_read_sets[k]->get(h);
            printf("hap %zu %d ", k, h);
            for (int v = 0; v < sr->getVariantCount(); ++v)
                printf("%d", sr->getAllele(v));
            printf(" q");
            for (int v = 0; v < sr->getVariantCount(); ++v)
                printf(" %d", sr->getVariantQuality(v));
            printf("\n");
        }
    }
    return 0;
}

// Dev-only oracle for reference GenotypeDPTable.
// stdin: n_reads n_pos n_ind n_trios ; positions ; reads; genotype indices
// (per ind per pos) + GLs (3 doubles per ind per pos); trios; recombcost.
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>
#include "read.h"
#include "readset.h"
#include "pedigree.h"
#include "genotype.h"
#include "phredgenotypelikelihoods.h"
#include "genotypedptable.h"

int main() {
    int n_reads, n_pos, n_ind, n_trios;
    scanf("%d %d %d %d", &n_reads, &n_pos, &n_ind, &n_trios);
    std::vector<unsigned int> positions(n_pos);
    for (auto &p : positions) scanf("%u", &p);
    ReadSet* rs = new ReadSet();
    for (int i = 0; i < n_reads; ++i) {
        int sid, nv; char name[512];
        scanf("%511s %d %d", name, &sid, &nv);
        Read* r = new Read(std::string(name), 50, 0, sid);
        for (int v = 0; v < nv; ++v) { int pos, a, q; scanf("%d %d %d", &pos, &a, &q); r->addVariant(pos, a, q); }
        rs->add(r);
    }
    rs->sort();
    Pedigree* ped = new Pedigree();
    for (int i = 0; i < n_ind; ++i) {
        std::vector<Genotype*> gts; std::vector<PhredGenotypeLikelihoods*> gls;
        for (int c = 0; c < n_pos; ++c) {
            int g; double g0, g1, g2;
            scanf("%d %lf %lf %lf", &g, &g0, &g1, &g2);
            gts.push_back(new Genotype((uint64_t)g, 2));
            gls.push_back(new PhredGenotypeLikelihoods({g0, g1, g2}, 2, 2));
        }
        ped->addIndividual(i, gts, gls);
    }
    for (int t = 0; t < n_trios; ++t) { int f,m,c; scanf("%d %d %d", &f,&m,&c); ped->addRelationship(f,m,c); }
    std::vector<unsigned int> recomb(n_pos);
    for (auto &r : recomb) scanf("%u", &r);

    auto t0 = std::chrono::steady_clock::now();
    GenotypeDPTable dp(rs, recomb, ped, &positions);
    auto t1 = std::chrono::steady_clock::now();
    printf("time %.6f\n", std::chrono::duration<double>(t1 - t0).count());
    for (int i = 0; i < n_ind; ++i)
        for (int p = 0; p < n_pos; ++p) {
            auto gl = dp.get_genotype_likelihoods(i, p);
            printf("gl %d %d %.17Le %.17Le %.17Le\n", i, p, gl[0], gl[1], gl[2]);
        }
    return 0;
}

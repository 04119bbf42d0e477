// Dev-only oracle for reference PedMecHeuristic.
// stdin: n_reads n_pos n_ind n_trios distrust row_limit ; positions ;
// reads (name sample_id n_vars; pos allele q ...); genotype indices per ind per pos;
// trios (f m c); recombcost per pos
#include <cstdio>
#include <string>
#include <vector>
#include "read.h"
#include "readset.h"
#include "pedigree.h"
#include "genotype.h"
#include "phredgenotypelikelihoods.h"
#include "pedmecheuristic.h"

int main() {
    int n_reads, n_pos, n_ind, n_trios, distrust, row_limit;
    scanf("%d %d %d %d %d %d", &n_reads, &n_pos, &n_ind, &n_trios, &distrust, &row_limit);
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
        for (int c = 0; c < n_pos; ++c) { int g; scanf("%d", &g); gts.push_back(new Genotype((uint64_t)g, 2)); gls.push_back(nullptr); }
        ped->addIndividual(i, gts, gls);
    }
    for (int t = 0; t < n_trios; ++t) { int f,m,c; scanf("%d %d %d", &f,&m,&c); ped->addRelationship(f,m,c); }
    std::vector<unsigned int> recomb(n_pos);
    for (auto &r : recomb) scanf("%u", &r);

    PedMecHeuristic h(rs, recomb, ped, distrust != 0, &positions, row_limit, true, 0);
    h.solve();
    printf("cost %f\n", (double)h.getOptScore());
    Bipartition* bp = h.getOptBipartition();
    printf("partition ");
    for (bool b : *bp) printf("%d", b ? 1 : 0);
    printf("\n");
    std::vector<Transmission>* tv = h.getOptTransmission();
    printf("trans ");
    for (auto t : *tv) printf("%u ", t);
    printf("\n");
    auto haps = h.getOptHaplotypes();
    for (size_t s = 0; s < haps.size(); ++s)
        for (int k = 0; k < 2; ++k) {
            printf("hap %zu %d ", s, k);
            for (auto a : haps[s][k]) printf("%d", (int)a);
            printf("\n");
        }
    return 0;
}

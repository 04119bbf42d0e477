// Dev-only oracle for the reference polyphase compute core: AlleleMatrix
// construction, ReadScoring::scoreReadset and ClusterEditingSolver::run on
// a serialized ReadSet.  Prints the internal wall time of those stages
// (construction through clustering; the threading/reordering stages the
// reference runs in Python on top are NOT counted, so this is a lower
// bound on the reference polyphase pipeline's time).
// stdin: n_reads ploidy min_overlap err ; reads (name sid nv; pos allele qual)
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>
#include "read.h"
#include "readset.h"
#include "polyphase/allelematrix.h"
#include "polyphase/readscoring.h"
#include "polyphase/trianglesparsematrix.h"
#include "polyphase/clustereditingsolver.h"
#include "polyphase/clustereditingsolution.h"

int main() {
    int n_reads, ploidy, min_overlap;
    double err;
    if (scanf("%d %d %d %lf", &n_reads, &ploidy, &min_overlap, &err) != 4) return 1;
    ReadSet* rs = new ReadSet();
    for (int i = 0; i < n_reads; ++i) {
        int sid, nv; char name[512];
        scanf("%511s %d %d", name, &sid, &nv);
        Read* r = new Read(std::string(name), 50, 0, sid);
        for (int v = 0; v < nv; ++v) {
            int pos, a, q;
            scanf("%d %d %d", &pos, &a, &q);
            r->addVariant(pos, a, q);
        }
        rs->add(r);
    }
    rs->sort();

    auto t0 = std::chrono::steady_clock::now();
    AlleleMatrix am(rs);
    TriangleSparseMatrix sim;
    ReadScoring rs_scorer;
    rs_scorer.scoreReadset(&sim, &am, (uint32_t)min_overlap, (uint32_t)ploidy, err);
    auto ts = std::chrono::steady_clock::now();
    ClusterEditingSolver solver(sim, false);
    ClusterEditingSolution sol = solver.run();
    auto t1 = std::chrono::steady_clock::now();

    printf("time %.6f\n", std::chrono::duration<double>(t1 - t0).count());
    printf("stage_scoring %.6f\n", std::chrono::duration<double>(ts - t0).count());
    printf("stage_clustering %.6f\n", std::chrono::duration<double>(t1 - ts).count());
    printf("clusters %u\n", sol.getNumClusters());
    return 0;
}

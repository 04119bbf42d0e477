// Dev-only oracle: run reference HapChatCore on a problem from stdin.
// Format: n_reads; then per read: name sample_id n_vars; then pos allele q triples.
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "read.h"
#include "readset.h"
#include "hapchat/hapchatcore.cpp"

int main() {
    int n_reads;
    if (scanf("%d", &n_reads) != 1) return 1;
    ReadSet* rs = new ReadSet();
    for (int i = 0; i < n_reads; ++i) {
        int sample_id, n_vars;
        char name[256];
        scanf("%255s %d %d", name, &sample_id, &n_vars);
        Read* r = new Read(std::string(name), 50, 0, sample_id);
        for (int v = 0; v < n_vars; ++v) {
            int pos, allele, q;
            scanf("%d %d %d", &pos, &allele, &q);
            r->addVariant(pos, allele, q);
        }
        rs->add(r);
    }
    rs->sort();
    HapChatCore hc(rs);
    printf("cost %u\n", hc.get_optimal_cost());
    std::vector<ReadSet*> out;
    for (int i = 0; i < hc.get_length(); ++i) out.push_back(new ReadSet());
    hc.get_super_reads(&out);
    for (auto* s : out) {
        for (size_t ri = 0; ri < s->size(); ++ri) {
            Read* r = s->get(ri);
            printf("hap ");
            for (int v = 0; v < r->getVariantCount(); ++v)
                printf("%d:%d ", r->getPosition(v), r->getAllele(v));
            printf("\n");
        }
    }
    return 0;
}

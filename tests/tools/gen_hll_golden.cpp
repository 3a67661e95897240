// Golden-value generator for the HLL++ bit-exactness test.
//
// Compiles against the REFERENCE header (hyperloglogplus.h) and prints
// cardinality estimates for deterministic input sets at precision 10.
// Run once to (re)generate tests/fixtures/hll_golden.json:
//
//   g++ -O2 -I /root/reference -std=c++11 gen_hll_golden.cpp -o /tmp/ghll
//   /tmp/ghll > ../fixtures/hll_golden.json
//
// Items are ranhash(i) values (a deterministic 64-bit stream independent
// of the sketch's own murmur3 finalizer), with duplicates injected so the
// distinct count differs from the stream length.
#include <cstdint>
#include <cstdio>
#include <vector>

#include "hyperloglogplus.h"

int main() {
    const int sizes[] = {0,   1,    10,   100,  1000, 1024, 1025,
                         2048, 5000, 20000, 100000, 400000};
    printf("{\n");
    bool first = true;
    for (int n : sizes) {
        HyperLogLogPlusMinus<uint64_t> h(10);
        for (int i = 0; i < n; i++) {
            uint64_t item = ranhash((uint64_t)i);
            h.add(item);
            if (i % 3 == 0) h.add(item);  // duplicates must not count
        }
        if (!first) printf(",\n");
        first = false;
        printf("  \"%d\": %llu", n, (unsigned long long)h.cardinality(false));
    }
    // a merge case: two sparse halves that exceed m when combined
    {
        HyperLogLogPlusMinus<uint64_t> a(10), b(10);
        for (int i = 0; i < 700; i++) a.add(ranhash((uint64_t)i));
        for (int i = 500; i < 1300; i++) b.add(ranhash((uint64_t)i));
        a.merge(&b);
        printf(",\n  \"merge_700_1300\": %llu",
               (unsigned long long)a.cardinality(false));
    }
    // dense + sparse merge
    {
        HyperLogLogPlusMinus<uint64_t> a(10), b(10);
        for (int i = 0; i < 30000; i++) a.add(ranhash((uint64_t)i));
        for (int i = 20000; i < 20500; i++) b.add(ranhash((uint64_t)i));
        a.merge(&b);
        printf(",\n  \"merge_dense_sparse\": %llu",
               (unsigned long long)a.cardinality(false));
    }
    printf("\n}\n");
    return 0;
}

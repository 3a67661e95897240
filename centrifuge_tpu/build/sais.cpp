// Suffix-array construction via SA-IS (induced sorting), linear time.
//
// This is the native core of the index builder -- the role the
// reference's blockwise_sa.h / diff_sample.h / ls.h stack plays
// (KarkkainenBlockwiseSA, ~4.7k LoC of C++).  We use SA-IS instead:
// simpler, linear-time, and a single pass in memory; bounded-memory
// blockwise construction can be layered on top later for >RAM texts.
//
// Build: g++ -O3 -shared -fPIC sais.cpp -o _sais.so  (done by sa.py)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

inline bool is_lms(const std::vector<bool>& t, i64 i) {
    return i > 0 && t[i] && !t[i - 1];
}

void get_buckets(const i64* s, i64* bkt, i64 n, i64 K, bool tail) {
    std::memset(bkt, 0, sizeof(i64) * K);
    for (i64 i = 0; i < n; i++) bkt[s[i]]++;
    i64 sum = 0;
    for (i64 i = 0; i < K; i++) {
        sum += bkt[i];
        bkt[i] = tail ? sum : sum - bkt[i];
    }
}

void induce_l(const i64* s, i64* sa, i64 n, i64 K, i64* bkt,
              const std::vector<bool>& t) {
    get_buckets(s, bkt, n, K, false);
    for (i64 i = 0; i < n; i++) {
        i64 j = sa[i] - 1;
        if (sa[i] > 0 && !t[j]) sa[bkt[s[j]]++] = j;
    }
}

void induce_s(const i64* s, i64* sa, i64 n, i64 K, i64* bkt,
              const std::vector<bool>& t) {
    get_buckets(s, bkt, n, K, true);
    for (i64 i = n - 1; i >= 0; i--) {
        i64 j = sa[i] - 1;
        if (sa[i] > 0 && t[j]) sa[--bkt[s[j]]] = j;
    }
}

// s[0..n): integer string, s[n-1] must be the unique smallest symbol (0).
void sais(const i64* s, i64* sa, i64 n, i64 K) {
    if (n == 1) { sa[0] = 0; return; }

    std::vector<bool> t(n);
    t[n - 1] = true;
    for (i64 i = n - 2; i >= 0; i--)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);

    std::vector<i64> bkt(K);

    // Stage 1: sort LMS suffixes approximately, induce, extract order
    std::memset(sa, -1, sizeof(i64) * n);
    get_buckets(s, bkt.data(), n, K, true);
    for (i64 i = 1; i < n; i++)
        if (is_lms(t, i)) sa[--bkt[s[i]]] = i;
    induce_l(s, sa, n, K, bkt.data(), t);
    induce_s(s, sa, n, K, bkt.data(), t);

    // Compact sorted LMS substrings to the front
    i64 n1 = 0;
    for (i64 i = 0; i < n; i++)
        if (is_lms(t, sa[i])) sa[n1++] = sa[i];

    // Name LMS substrings
    std::memset(sa + n1, -1, sizeof(i64) * (n - n1));
    i64 name = 0, prev = -1;
    for (i64 i = 0; i < n1; i++) {
        i64 pos = sa[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (i64 d = 0; d < n; d++) {
                if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(t, pos + d) || is_lms(t, prev + d)))
                    break;
            }
        }
        if (diff) { name++; prev = pos; }
        sa[n1 + pos / 2] = name - 1;
    }
    for (i64 i = n - 1, j = n - 1; i >= n1; i--)
        if (sa[i] >= 0) sa[j--] = sa[i];

    // Recurse if names are not yet unique
    i64* s1 = sa + n - n1;
    if (name < n1) {
        sais(s1, sa, n1, name);
    } else {
        for (i64 i = 0; i < n1; i++) sa[s1[i]] = i;
    }

    // Stage 2: place LMS suffixes in their final order and induce
    std::vector<i64> lms(n1);
    for (i64 i = 1, j = 0; i < n; i++)
        if (is_lms(t, i)) lms[j++] = i;
    for (i64 i = 0; i < n1; i++) sa[i] = lms[sa[i]];
    std::memset(sa + n1, -1, sizeof(i64) * (n - n1));
    get_buckets(s, bkt.data(), n, K, true);
    for (i64 i = n1 - 1; i >= 0; i--) {
        i64 j = sa[i];
        sa[i] = -1;
        sa[--bkt[s[j]]] = j;
    }
    induce_l(s, sa, n, K, bkt.data(), t);
    induce_s(s, sa, n, K, bkt.data(), t);
}

}  // namespace

extern "C" {

// Suffix array of `text` (2-bit codes 0..3, length n) under the
// reference's comparison convention: the end-of-text behaves as a
// character LARGER than A/C/G/T, so a suffix that is a proper prefix of
// another sorts AFTER it (bowtie2/blockwise_sa lineage).  Realized by
// appending a '5' terminator before the SA-IS 0-sentinel.  sa_out must
// hold n+1 entries: positions 0..n in sorted order (position n, the
// empty suffix, sorts last).
int build_sa_2bit(const uint8_t* text, i64 n, i64* sa_out) {
    std::vector<i64> s(n + 2);
    for (i64 i = 0; i < n; i++) s[i] = (i64)text[i] + 1;
    s[n] = 5;
    s[n + 1] = 0;
    std::vector<i64> sa(n + 2);
    sais(s.data(), sa.data(), n + 2, 6);
    // sa[0] is the 0-sentinel position (n+1); drop it
    i64 j = 0;
    for (i64 i = 0; i < n + 2; i++)
        if (sa[i] != n + 1) sa_out[j++] = sa[i];
    return 0;
}

}  // extern "C"

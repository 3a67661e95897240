// Bounded-memory blockwise suffix-array construction.
//
// The role of the reference's KarkkainenBlockwiseSA + DifferenceCoverSample
// (blockwise_sa.h:199-1110, diff_sample.h:441-880): build the suffix array
// of an n-base text in O(bmax)-sized sorted blocks so nt-scale indexes
// never materialize an 8-byte-per-base SA. Design (same math, fresh code):
//
//   * text is 2-bit packed (0.25 B/base); suffix comparisons run on
//     32-char chunks via 64-bit loads + ctz on the XOR (the first
//     differing char is the lowest set bit pair).
//   * a difference-cover sample D mod v (v = --dcv) bounds every suffix
//     comparison at < v chars: after t < v chars both positions land in
//     the sample, where precomputed ranks decide in O(1). D is the
//     classic {0..r-1} U {r, 2r, .., (r-1)r} cover of size 2r-1 for
//     v = r^2. Sample ranks come from a v-char sort followed by
//     prefix-doubling with step v (i in S => i+v in S).
//   * bucket boundaries are rank-quantiles of the sample; every text
//     position is binary-searched against the boundaries (DC-bounded
//     compares, threaded) into a uint16 bucket id; each block gathers
//     its positions and sorts them with the same comparator.
//
// End-of-text convention matches sais.cpp / the reference: a suffix that
// is a proper prefix of another sorts AFTER it (the terminator behaves
// as a character larger than ACGT); the empty suffix (position n) sorts
// last and is appended to the final block.
//
// Memory: packed text n/4 + bucket ids 2n/8?? -> 2 B? ids are uint16 =
// 2 B/base when nblocks > 255, 1 B otherwise; DC ranks ~ (2r-1)/v * 4
// B/base (~0.25 B/base at v=1024); block buffer 8*bmax. For a 4 Gbp
// build with bmax = n/16 that is ~2.6 B/base total vs ~16 B/base for
// in-memory SA-IS.
//
// Build: g++ -O3 -shared -fPIC blocksa.cpp -o _blocksa.so -pthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

using i64 = int64_t;
using u64 = uint64_t;
using u32 = uint32_t;
using u16 = uint16_t;
using u8 = uint8_t;

struct Ctx {
    const u8* text;   // 2-bit packed, little-endian bit pairs, padded
    i64 n;
    i64 v;            // difference-cover period (power of two)
    i64 bmax;
    int nthreads;

    std::vector<int> D;          // cover residues, sorted
    std::vector<int> didx;       // residue -> index in D, or -1
    std::vector<u16> delta;      // [v*v] first t with both i+t,j+t in S
    std::vector<u32> rank;       // sample ranks by sample index
    i64 m = 0;                   // sample count

    std::vector<i64> bounds;     // boundary sample positions, ascending order
    // per text position: u8 ids when <=256 blocks (the common case --
    // bmax >= n/256 -- halving the largest build-RAM term at nt scale),
    // u16 otherwise
    std::vector<u8> bucket8;
    std::vector<u16> bucket16;
    bool use8 = true;
    std::vector<i64> bucket_cnt;

    inline u16 bucket_at(i64 p) const {
        return use8 ? (u16)bucket8[p] : bucket16[p];
    }

    inline int ch(i64 p) const {
        return (text[p >> 2] >> ((p & 3) << 1)) & 3;
    }
    // 32 chars starting at p, char j at bits [2j, 2j+1]
    inline u64 fetch64(i64 p) const {
        u64 lo;
        std::memcpy(&lo, text + (p >> 2), 8);
        int s = (int)(p & 3) << 1;
        if (s == 0) return lo;
        u64 hi = text[(p >> 2) + 8];
        return (lo >> s) | (hi << (64 - s));
    }

    inline i64 sample_index(i64 p) const {
        return (p / v) * (i64)D.size() + didx[p % v];
    }

    // full suffix order; returns <0 if suffix i < suffix j
    inline int compare(i64 i, i64 j) const {
        if (i == j) return 0;
        i64 t = delta[(i % v) * v + (j % v)];
        i64 done = 0;
        while (done < t) {
            i64 ri = n - (i + done);
            i64 rj = n - (j + done);
            if (ri <= 0) return 1;    // i ended -> larger
            if (rj <= 0) return -1;
            i64 take = std::min<i64>(32, t - done);
            i64 lim = std::min(take, std::min(ri, rj));
            u64 a = fetch64(i + done);
            u64 b = fetch64(j + done);
            u64 mask = (lim >= 32) ? ~0ULL : ((1ULL << (2 * lim)) - 1);
            u64 x = (a ^ b) & mask;
            if (x) {
                int tz = __builtin_ctzll(x) & ~1;
                return (int)((a >> tz) & 3) < (int)((b >> tz) & 3) ? -1 : 1;
            }
            if (lim < take) {
                // one suffix ended inside the chunk with equal chars
                if (ri < rj) return 1;   // i shorter -> larger
                if (rj < ri) return -1;
            }
            done += take;
        }
        if (i + t >= n) return 1;
        if (j + t >= n) return -1;
        u32 ra = rank[sample_index(i + t)];
        u32 rb = rank[sample_index(j + t)];
        return ra < rb ? -1 : 1;
    }

    // char-only compare capped at `cap` chars; 0 means equal-so-far
    inline int compare_chars(i64 i, i64 j, i64 cap) const {
        i64 done = 0;
        while (done < cap) {
            i64 ri = n - (i + done);
            i64 rj = n - (j + done);
            if (ri <= 0) return 1;
            if (rj <= 0) return -1;
            i64 take = std::min<i64>(32, cap - done);
            i64 lim = std::min(take, std::min(ri, rj));
            u64 a = fetch64(i + done);
            u64 b = fetch64(j + done);
            u64 mask = (lim >= 32) ? ~0ULL : ((1ULL << (2 * lim)) - 1);
            u64 x = (a ^ b) & mask;
            if (x) {
                int tz = __builtin_ctzll(x) & ~1;
                return (int)((a >> tz) & 3) < (int)((b >> tz) & 3) ? -1 : 1;
            }
            if (lim < take) {
                if (ri < rj) return 1;
                if (rj < ri) return -1;
            }
            done += take;
        }
        return 0;
    }
};

// Parallel merge sort: thread-sorted chunks + log2(nt) rounds of
// threaded inplace_merge. Comparator-deterministic: the final order is
// a total function of cmp (ties only ever share group ranks upstream),
// so thread count cannot change any build output.
template <class Cmp>
void psort(i64* data, i64 n, Cmp cmp, int nthreads) {
    i64 nt = 1;
    while (nt * 2 <= nthreads && (n / (nt * 2)) > (1 << 14)) nt <<= 1;
    if (nt <= 1) {
        std::sort(data, data + n, cmp);
        return;
    }
    std::vector<i64> bounds(nt + 1);
    for (i64 t = 0; t <= nt; t++) bounds[t] = n * t / nt;
    {
        std::vector<std::thread> ths;
        for (i64 t = 0; t < nt; t++)
            ths.emplace_back([&, t]() {
                std::sort(data + bounds[t], data + bounds[t + 1], cmp);
            });
        for (auto& th : ths) th.join();
    }
    for (i64 w = 1; w < nt; w <<= 1) {
        std::vector<std::thread> ths;
        for (i64 t = 0; t + w < nt; t += 2 * w) {
            ths.emplace_back([&, t, w]() {
                std::inplace_merge(data + bounds[t], data + bounds[t + w],
                                   data + bounds[std::min(t + 2 * w, nt)],
                                   cmp);
            });
        }
        for (auto& th : ths) th.join();
    }
}

void build_cover(Ctx& c) {
    i64 v = c.v;
    i64 r = 1;
    while (r * r < v) r <<= 1;  // v is a power of two; r = ceil(sqrt(v))
    c.D.clear();
    for (i64 i = 0; i < r; i++) c.D.push_back((int)i);
    // for non-square powers of two (v = 2^odd: 32, 128, 512, ...) r*r =
    // 2v, so the stride multiples must reduce mod v ({0..r-1} U {kr mod
    // v} still covers every difference: d needs j = (-d) mod r in the
    // first set and d + j a stride multiple, which mod v stays in D)
    for (i64 i = 1; i < r; i++) c.D.push_back((int)((i * r) % v));
    std::sort(c.D.begin(), c.D.end());
    c.D.erase(std::unique(c.D.begin(), c.D.end()), c.D.end());
    c.didx.assign(v, -1);
    for (size_t k = 0; k < c.D.size(); k++) c.didx[c.D[k]] = (int)k;

    // Tmask[res] = bitset over t of (res + t) % v in D
    int words = (int)((v + 63) / 64);
    std::vector<u64> tmask((size_t)v * words, 0);
    for (i64 res = 0; res < v; res++)
        for (int d : c.D) {
            i64 t = (d - res % v + v) % v;
            tmask[res * words + t / 64] |= 1ULL << (t % 64);
        }
    c.delta.assign((size_t)v * v, 0);
    for (i64 a = 0; a < v; a++)
        for (i64 b = 0; b < v; b++) {
            const u64* ma = &tmask[a * words];
            const u64* mb = &tmask[b * words];
            for (int w = 0; w < words; w++) {
                u64 x = ma[w] & mb[w];
                if (x) {
                    c.delta[a * v + b] =
                        (u16)(w * 64 + __builtin_ctzll(x));
                    break;
                }
            }
        }
}

void build_sample_ranks(Ctx& c) {
    const i64 v = c.v, n = c.n;
    const i64 dsz = (i64)c.D.size();
    // sample positions in sample-index order are implicit:
    // index = (p/v)*|D| + didx[p%v]
    i64 nper = (n + v - 1) / v;
    std::vector<i64> order;
    order.reserve(nper * dsz);
    for (i64 q = 0; q < nper; q++)
        for (i64 k = 0; k < dsz; k++) {
            i64 p = q * v + c.D[k];
            if (p < n) order.push_back(p);
        }
    // NOTE: positions from the tail residues may be >= n and skipped, so
    // sample_index needs a dense map only when every (q, k) slot < n; to
    // keep O(1) lookup we rank ALL slots and give out-of-range slots a
    // sentinel (they are never looked up).
    i64 m_slots = nper * dsz;
    c.m = (i64)order.size();
    // initial sort by first v chars (strict order on mismatch/end; ties
    // only when the first v chars agree entirely)
    psort(order.data(), (i64)order.size(), [&](i64 a, i64 b) {
        int r = c.compare_chars(a, b, v);
        if (r != 0) return r < 0;
        return a < b;  // stable-ish; real ties resolved by doubling
    }, c.nthreads);
    std::vector<u32> rk(m_slots, 0xFFFFFFFFu);
    // group ranks: equal first-v-chars share a rank. The neighbor
    // compares are v-char-deep, so compute the diff flags threaded and
    // scan the cheap flags sequentially.
    std::vector<u8> diffflag(order.size(), 0);
    {
        int nt = std::max(1, c.nthreads);
        std::vector<std::thread> ths;
        i64 m2 = (i64)order.size();
        i64 chunk2 = (m2 + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            ths.emplace_back([&, t]() {
                i64 lo = std::max<i64>(1, t * chunk2);
                i64 hi = std::min(m2, (t + 1) * chunk2);
                for (i64 i = lo; i < hi; i++)
                    diffflag[i] =
                        c.compare_chars(order[i - 1], order[i], v) != 0;
            });
        }
        for (auto& th : ths) th.join();
    }
    u32 rcur = 0;
    for (size_t i = 0; i < order.size(); i++) {
        if (i > 0 && diffflag[i]) rcur = (u32)i;
        rk[c.sample_index(order[i])] = rcur;
    }
    // prefix doubling with step v
    std::vector<u32> rk2(m_slots);
    for (i64 h = v; ; h <<= 1) {
        auto key2 = [&](i64 p) -> u64 {
            return (p + h < n) ? rk[c.sample_index(p + h)]
                               : 0xFFFFFFFFULL;  // ended -> larger
        };
        auto cmp = [&](i64 a, i64 b) {
            u32 ra = rk[c.sample_index(a)], rb = rk[c.sample_index(b)];
            if (ra != rb) return ra < rb;
            return key2(a) < key2(b);
        };
        psort(order.data(), (i64)order.size(), cmp, c.nthreads);
        bool all_unique = true;
        u32 r2 = 0;
        rk2[c.sample_index(order[0])] = 0;
        for (size_t i = 1; i < order.size(); i++) {
            bool diff = cmp(order[i - 1], order[i]);
            if (!diff) all_unique = false;
            if (diff) r2 = (u32)i;
            rk2[c.sample_index(order[i])] = r2;
        }
        std::swap(rk, rk2);
        if (all_unique || h > n) break;
    }
    c.rank.swap(rk);

    // bucket boundaries: rank-quantiles of the sample
    i64 nblocks = std::max<i64>(1, (n + c.bmax - 1) / c.bmax);
    // oversample the quantiles slightly so typical blocks land under bmax
    nblocks = std::max<i64>(nblocks, (i64)(1.25 * n / c.bmax) + 1);
    if (nblocks > 1 && c.m > 0) {
        std::vector<std::pair<u32, i64>> picks;
        i64 stride = std::max<i64>(1, c.m / nblocks);
        for (i64 p2 : order) {
            u32 r3 = c.rank[c.sample_index(p2)];
            if (r3 != 0 && (r3 % stride) == 0) picks.push_back({r3, p2});
        }
        std::sort(picks.begin(), picks.end());
        for (auto& pr : picks) c.bounds.push_back(pr.second);
    }
}

void assign_buckets(Ctx& c) {
    const i64 n = c.n;
    i64 nb = (i64)c.bounds.size() + 1;
    c.use8 = nb <= 256;
    if (c.use8) c.bucket8.assign(n, 0);
    else c.bucket16.assign(n, 0);
    c.bucket_cnt.assign(nb, 0);
    int nt = std::max(1, c.nthreads);
    std::vector<std::vector<i64>> cnts(nt, std::vector<i64>(nb, 0));
    std::vector<std::thread> ths;
    i64 chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
        ths.emplace_back([&, t]() {
            i64 lo = t * chunk, hi = std::min(n, lo + chunk);
            for (i64 p = lo; p < hi; p++) {
                // first bucket whose boundary suffix sorts >= suffix p
                i64 a = 0, b = (i64)c.bounds.size();
                while (a < b) {
                    i64 mid = (a + b) >> 1;
                    if (c.compare(c.bounds[mid], p) < 0) a = mid + 1;
                    else b = mid;
                }
                if (c.use8) c.bucket8[p] = (u8)a;
                else c.bucket16[p] = (u16)a;
                cnts[t][a]++;
            }
        });
    }
    for (auto& th : ths) th.join();
    for (int t = 0; t < nt; t++)
        for (i64 b = 0; b < nb; b++) c.bucket_cnt[b] += cnts[t][b];
}

}  // namespace

extern "C" {

void* bsa_create(const u8* packed, i64 n, i64 v, i64 bmax, int nthreads) {
    Ctx* c = new Ctx();
    c->text = packed;
    c->n = n;
    c->v = v;
    c->bmax = std::max<i64>(bmax, 1024);
    c->nthreads = nthreads;
    build_cover(*c);
    build_sample_ranks(*c);
    assign_buckets(*c);
    return c;
}

i64 bsa_num_blocks(void* ctx) {
    return (i64)((Ctx*)ctx)->bucket_cnt.size();
}

i64 bsa_block_size(void* ctx, i64 b) {
    Ctx* c = (Ctx*)ctx;
    i64 sz = c->bucket_cnt[b];
    if (b == (i64)c->bucket_cnt.size() - 1) sz++;  // empty suffix
    return sz;
}

// Sorted suffix positions of block b; returns count or -1 if cap short.
i64 bsa_block(void* ctx, i64 b, i64* out, i64 cap) {
    Ctx* c = (Ctx*)ctx;
    bool last = b == (i64)c->bucket_cnt.size() - 1;
    i64 want = c->bucket_cnt[b] + (last ? 1 : 0);
    if (want > cap) return -1;
    i64 k = 0;
    {
        // threaded gather, two passes writing straight into `out`: pass 1
        // counts each slice's matches, pass 2 scatters at prefix-sum
        // offsets. No per-thread grow buffers: the old push_back gather
        // transiently held up to 2x the block (vector doubling) on top
        // of `out` -- at 12 Gbp that slack alone was ~10-20 GB of peak.
        int nt = std::max(1, c->nthreads);
        std::vector<i64> off(nt + 1, 0);
        i64 chunk = (c->n + nt - 1) / nt;
        {
            std::vector<std::thread> ths;
            for (int t = 0; t < nt; t++) {
                ths.emplace_back([&, t]() {
                    i64 lo = t * chunk, hi = std::min(c->n, lo + chunk);
                    i64 cnt = 0;
                    if (c->use8) {
                        const u8* ids = c->bucket8.data();
                        for (i64 p = lo; p < hi; p++)
                            if (ids[p] == (u8)b) cnt++;
                    } else {
                        const u16* ids = c->bucket16.data();
                        for (i64 p = lo; p < hi; p++)
                            if (ids[p] == (u16)b) cnt++;
                    }
                    off[t + 1] = cnt;
                });
            }
            for (auto& th : ths) th.join();
        }
        for (int t = 0; t < nt; t++) off[t + 1] += off[t];
        {
            std::vector<std::thread> ths;
            for (int t = 0; t < nt; t++) {
                ths.emplace_back([&, t]() {
                    i64 lo = t * chunk, hi = std::min(c->n, lo + chunk);
                    i64* dst = out + off[t];
                    if (c->use8) {
                        const u8* ids = c->bucket8.data();
                        for (i64 p = lo; p < hi; p++)
                            if (ids[p] == (u8)b) *dst++ = p;
                    } else {
                        const u16* ids = c->bucket16.data();
                        for (i64 p = lo; p < hi; p++)
                            if (ids[p] == (u16)b) *dst++ = p;
                    }
                });
            }
            for (auto& th : ths) th.join();
        }
        k = off[nt];
    }
    psort(out, k, [&](i64 a, i64 bb) {
        return c->compare(a, bb) < 0;
    }, c->nthreads);
    if (last) out[k++] = c->n;  // empty suffix sorts last
    return k;
}

void bsa_free(void* ctx) { delete (Ctx*)ctx; }

}  // extern "C"

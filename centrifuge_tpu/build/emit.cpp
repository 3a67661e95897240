// Native per-block index emission for the streaming builder.
//
// The role of the reference's per-SA-element loop in Ebwt::buildToDisk
// (bt2_idx.h:3379-3860): consume suffix-array blocks in order, emitting
// the packed BWT sides with occ checkpoints straight to the .1.cf file,
// and accumulating the ftab counts (with short-suffix absorption), the
// SA-sample tidx stream (.2.cf payload) and the genome-boundary map
// (.4.cf payload). Byte-identical to the Python StreamingIndexWriter
// feed (blockwise.py), which stays as the parity oracle; this exists
// because the Python per-side loop costs ~2 us/row while this pass runs
// at a few ns/row -- at 8-16 Gbp the difference is hours.
//
// Build: g++ -O3 -shared -fPIC emit.cpp -o _emit.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;
using u64 = uint64_t;
using u32 = uint32_t;
using u8 = uint8_t;

struct Emit {
    const u8* text;       // 2-bit packed codes (+>=8 pad bytes)
    i64 n;
    int offrate;
    int fc;               // ftab_chars
    int overlap;          // REF_OVERLAP (bt2_idx.h:3508)
    i64 side_bwt_len;     // bases per side
    i64 ftab_len;         // 4^fc + 1

    FILE* f1;

    // streaming state
    i64 row = 0;
    i64 zoff = -1;
    u64 occ[4] = {0, 0, 0, 0};
    u64 side_occ[4] = {0, 0, 0, 0};
    std::vector<u8> cur_side;     // base codes, packed 4/byte on flush
    i64 side_fill = 0;
    std::vector<u64> ftab_count;
    std::vector<u64> absorb;
    i64 pending_short = 0;

    // SA-sample: rstarts joined offsets (ascending) + tidx per fragment
    const u64* rj;
    const u64* rt;
    i64 nfrag;
    u64* offs_out;
    i64 offs_pos = 0;

    // boundary map: sorted mark positions + their refs
    const i64* marks;
    const u32* mrefs;
    i64 nmark;
    u64* brow_out;
    u32* bref_out;
    i64 nb = 0;
    // quick-reject bitset over mark positions >> bshift
    std::vector<u64> mbits;
    int bshift = 0;

    inline int ch(i64 p) const {
        return (text[p >> 2] >> ((p & 3) << 1)) & 3;
    }
    inline u64 fetch64(i64 p) const {
        u64 lo;
        std::memcpy(&lo, text + (p >> 2), 8);
        int s = (int)(p & 3) << 1;
        if (s == 0) return lo;
        u64 hi = text[(p >> 2) + 8];
        return (lo >> s) | (hi << (64 - s));
    }

    void flush_side() {
        // pack 4 codes/byte, LSB-first (the .cf side layout), then the
        // 4 u64 occ checkpoint captured at side start
        i64 nbytes = side_bwt_len / 4;
        std::vector<u8> packed(nbytes, 0);
        for (i64 i = 0; i < side_fill; i++)
            packed[i >> 2] |= (u8)(cur_side[i] << ((i & 3) << 1));
        fwrite(packed.data(), 1, nbytes, f1);
        fwrite(side_occ, 8, 4, f1);
        std::memset(cur_side.data(), 0, side_bwt_len);
        side_fill = 0;
    }
};

}  // namespace

extern "C" {

void* emit_create(const u8* packed_text, i64 n, int offrate, int fc,
                  int overlap, i64 side_bwt_len,
                  const u64* rstarts_joined, const u64* rstarts_tidx,
                  i64 nfrag, const i64* marks, const u32* mrefs, i64 nmark,
                  u64* offs_out, u64* brow_out, u32* bref_out,
                  const char* f1_path) {
    Emit* e = new Emit();
    e->text = packed_text;
    e->n = n;
    e->offrate = offrate;
    e->fc = fc;
    e->overlap = overlap;
    e->side_bwt_len = side_bwt_len;
    e->ftab_len = ((i64)1 << (2 * fc)) + 1;
    e->cur_side.assign(side_bwt_len, 0);
    e->ftab_count.assign(e->ftab_len, 0);
    e->absorb.assign(e->ftab_len, 0);
    e->rj = rstarts_joined;
    e->rt = rstarts_tidx;
    e->nfrag = nfrag;
    e->offs_out = offs_out;
    e->marks = marks;
    e->mrefs = mrefs;
    e->nmark = nmark;
    e->brow_out = brow_out;
    e->bref_out = bref_out;
    // boundary quick-reject: one bit per 2^bshift positions, <= ~2 MB
    e->bshift = 0;
    while ((n >> e->bshift) > (i64)16'000'000) e->bshift++;
    e->mbits.assign(((n >> e->bshift) >> 6) + 2, 0);
    for (i64 i = 0; i < nmark; i++) {
        i64 b = marks[i] >> e->bshift;
        e->mbits[b >> 6] |= 1ULL << (b & 63);
    }
    e->f1 = fopen(f1_path, "ab");
    if (!e->f1) {
        delete e;
        return nullptr;
    }
    return e;
}

// Consume one sorted SA block. Returns rows consumed (= k) or -1.
i64 emit_feed(void* ctx, const i64* sa, i64 k) {
    Emit* e = (Emit*)ctx;
    const i64 n = e->n, fc = e->fc;
    const i64 smask = ((i64)1 << e->offrate) - 1;
    for (i64 i = 0; i < k; i++) {
        const i64 p = sa[i];
        // ---- BWT char + occ + side packing ----
        int c;
        bool count = true;
        if (p == 0) {
            c = 0;
            e->zoff = e->row;
            count = false;
        } else {
            c = e->ch(p - 1);
        }
        if (e->side_fill == 0)
            std::memcpy(e->side_occ, e->occ, sizeof(e->occ));
        e->cur_side[e->side_fill++] = (u8)c;
        if (count) e->occ[c]++;
        if (e->side_fill == e->side_bwt_len) e->flush_side();

        // ---- ftab counts + short-suffix absorption ----
        if (n - p >= fc) {
            u64 w = e->fetch64(p);
            i64 si = 0;
            for (int j = 0; j < fc; j++)
                si = (si << 2) | (i64)((w >> (2 * j)) & 3);
            e->ftab_count[si + 1]++;
            e->absorb[si] += e->pending_short;
            e->pending_short = 0;
        } else {
            e->pending_short++;
        }

        // ---- SA-sample tidx (every 2^offrate-th row) ----
        if ((e->row & smask) == 0) {
            i64 adj = p + e->overlap;
            if (adj >= n) adj = p;
            if (adj >= n) adj = adj - 1;
            // upper_bound(rj, adj) - 1, clamped at 0
            i64 lo = 0, hi = e->nfrag;
            while (lo < hi) {
                i64 mid = (lo + hi) >> 1;
                if ((i64)e->rj[mid] <= adj) lo = mid + 1;
                else hi = mid;
            }
            i64 frag = lo - 1;
            if (frag < 0) frag = 0;
            u64 tidx = e->rt[frag];
            if (p == 0) tidx = 0;
            e->offs_out[e->offs_pos++] = tidx;
        }

        // ---- boundary map ----
        i64 b = p >> e->bshift;
        if (e->mbits[b >> 6] & (1ULL << (b & 63))) {
            // lower_bound over marks (first index with marks[idx] >= p)
            i64 lo = 0, hi = e->nmark;
            while (lo < hi) {
                i64 mid = (lo + hi) >> 1;
                if (e->marks[mid] < p) lo = mid + 1;
                else hi = mid;
            }
            if (lo < e->nmark && e->marks[lo] == p) {
                e->brow_out[e->nb] = (u64)e->row;
                e->bref_out[e->nb] = e->mrefs[lo];
                e->nb++;
            }
        }
        e->row++;
    }
    return k;
}

// Flush the partial side, close the file, and report scalar state.
// ftab_count/absorb are copied into caller buffers of ftab_len u64.
void emit_finish(void* ctx, u64* ftab_count, u64* absorb, u64* occ_out,
                 i64* zoff_out, i64* offs_count, i64* nb_out,
                 i64* pending_out, i64* row_out) {
    Emit* e = (Emit*)ctx;
    if (e->side_fill > 0) e->flush_side();
    fclose(e->f1);
    e->f1 = nullptr;
    std::memcpy(ftab_count, e->ftab_count.data(), e->ftab_len * 8);
    std::memcpy(absorb, e->absorb.data(), e->ftab_len * 8);
    std::memcpy(occ_out, e->occ, 32);
    *zoff_out = e->zoff;
    *offs_count = e->offs_pos;
    *nb_out = e->nb;
    *pending_out = e->pending_short;
    *row_out = e->row;
}

void emit_free(void* ctx) { delete (Emit*)ctx; }

}  // extern "C"

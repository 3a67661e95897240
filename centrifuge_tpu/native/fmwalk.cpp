// Host-side FM resolve walk: SA row -> sequence index, one LF step at a
// time until a sampled row / genome-boundary row / '$' exit.
//
// Why this exists: the device resolve walk (ops/fm_jax.resolve_rows_core)
// runs all rows in lockstep, so every row pays the MAX walk length over
// the batch (~16*ln(B) steps at offrate 4) even though the mean is only
// 2^offrate. On multi-GB block tables each lockstep step is an
// HBM-latency-bound gather over the full batch width, which makes the
// walk dominate the fused search dispatch (measured 1.35 s of a 1.65 s
// dispatch on a 2.2 Gbp index). On the host each row walks independently
// with per-row early exit -- mean work, not max -- and the batch threads
// trivially. Semantics mirror the reference tryOffset/GroupWalk
// (bt2_idx.h:1980-2014) exactly as the device kernels do; the device
// resolver stays authoritative for sharded/multi-host runs.
//
// Block layout (ops/fm_jax.pack_bwt_blocks): uint32 rows of
//   narrow: occ[4]           | words[32]   (word_off = 4)
//   wide:   occ_lo[4] occ_hi[4] | words[32] (word_off = 8)
// 512 bases/block, 16 bases/word, little-endian 2-bit codes. Occ
// checkpoints are global prefix counts; '$' is stored as code 0 and the
// rank subtracts it once (adj below), matching fm_jax.rank_in_block.

#include <cstdint>
#include <thread>
#include <vector>

namespace {

const uint32_t kCharPattern[4] = {0x00000000u, 0x55555555u, 0xAAAAAAAAu,
                                  0xFFFFFFFFu};

inline int popcount32(uint32_t x) { return __builtin_popcount(x); }

// count of char-c bases among the first nvalid (<=16) bases of word
inline int count_c(uint32_t word, uint32_t pattern, int nvalid) {
  uint32_t x = word ^ pattern;
  uint32_t y = (~x) & ((~x) >> 1) & 0x55555555u;
  uint32_t mask =
      nvalid >= 16 ? 0xFFFFFFFFu : ((1u << (2 * (nvalid & 15))) - 1u);
  return popcount32(y & mask);
}

struct WalkCtx {
  const uint32_t* blocks;
  int64_t nblk;
  int32_t word_off;  // 4 narrow, 8 wide
  int32_t row_width; // word_off + 32
  const int64_t* fchr;
  const int32_t* offs;
  int64_t noffs;
  const int64_t* brows;
  const int32_t* brefs;
  int64_t nbounds;
  int64_t zoff;
  int64_t sample_mask;
  int32_t offrate;
  int32_t narrow;
  int64_t max_steps;
};

// sample/boundary/'$' exits for the current row; -1 = keep walking.
// Exit precedence matches fm_jax._try_offset: the '$' row wins over a
// sampled hit (applied last there), sampled wins over boundary.
inline int32_t try_offset(const WalkCtx& c, int64_t r) {
  if (r == c.zoff) return 0;
  if ((r & c.sample_mask) == 0) {
    int64_t si = r >> c.offrate;
    if (si < 0) si = 0;
    if (si >= c.noffs) si = c.noffs - 1;
    return c.offs[si];
  }
  if (c.nbounds > 0) {
    int64_t last = c.brows[c.nbounds - 1];
    // gated on a nonzero max boundary row (bt2_idx.h:2001-2010)
    if (last > 0 && r <= last) {
      int64_t lo = 0, hi = c.nbounds;  // lower_bound
      while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (c.brows[mid] < r) lo = mid + 1; else hi = mid;
      }
      if (lo < c.nbounds && c.brows[lo] == r) {
        int32_t v = c.brefs[lo];
        if (c.narrow) v &= 0xFFFF;
        return v;
      }
    }
  }
  return -1;
}

// rank_c(row): occurrences of c in bwt[0:row], '$' excluded -- the host
// twin of fm_jax.rank_in_block, over the same packed block rows. When
// the row sits in the back half of its block (and a next block exists,
// i.e. every base of this block is real), count DOWN from the next
// block's checkpoint instead: occ[blk+1] - count(c in [within, 512)).
// Halves the average in-block popcount work from 16 words to 8.
inline int64_t rank_c(const WalkCtx& c, int64_t r, int ch) {
  int64_t blk = r >> 9;
  int within = (int)(r & 511);
  const uint32_t* row = c.blocks + blk * c.row_width;
  const uint32_t* words = row + c.word_off;
  uint32_t pattern = kCharPattern[ch];
  int adj = (ch == 0 && c.zoff < r) ? 1 : 0;
  if (within > 256 && blk + 1 < c.nblk) {
    const uint32_t* nrow = c.blocks + (blk + 1) * c.row_width;
    uint64_t nbase;
    if (c.word_off == 8)
      nbase = (uint64_t)nrow[ch] | ((uint64_t)nrow[ch + 4] << 32);
    else
      nbase = nrow[ch];
    int64_t cnt = 0;
    int wi = within >> 4, rem = within & 15;
    if (rem) {
      cnt += count_c(words[wi], pattern, 16)
           - count_c(words[wi], pattern, rem);
      wi++;
    }
    for (int w = wi; w < 32; ++w) cnt += count_c(words[w], pattern, 16);
    return (int64_t)nbase - cnt - adj;
  }
  uint64_t base;
  if (c.word_off == 8)
    base = (uint64_t)row[ch] | ((uint64_t)row[ch + 4] << 32);
  else
    base = row[ch];
  int64_t cnt = 0;
  int full = within >> 4;
  for (int w = 0; w < full; ++w) cnt += count_c(words[w], pattern, 16);
  int rem = within & 15;
  if (rem) cnt += count_c(words[full], pattern, rem);
  return (int64_t)base + cnt - adj;
}

inline int64_t lf_c(const WalkCtx& c, int64_t r, int ch) {
  return c.fchr[ch] + rank_c(c, r, ch);
}

// one LF step: row -> LF(row, BWT[row]); mirrors fm_jax lf_step_with_char
inline int64_t lf_step(const WalkCtx& c, int64_t r) {
  int64_t blk = r >> 9;
  int within = (int)(r & 511);
  const uint32_t* words = c.blocks + blk * c.row_width + c.word_off;
  uint32_t word = words[within >> 4];
  int ch = (int)((word >> (2 * (within & 15))) & 3u);
  return lf_c(c, r, ch);
}

// BWT code of row r (the same word/bit layout lf_step reads)
inline int bwt_at(const WalkCtx& c, int64_t r) {
  const uint32_t* words = c.blocks + (r >> 9) * c.row_width + c.word_off;
  uint32_t word = words[(int)((r & 511) >> 4)];
  return (int)((word >> (2 * (r & 15))) & 3u);
}

inline int32_t resolve_one(const WalkCtx& c, int64_t r,
                           int64_t* steps) {
  int32_t t = try_offset(c, r);
  for (int64_t it = 0; t < 0 && it < c.max_steps; ++it) {
    r = lf_step(c, r);
    ++*steps;
    t = try_offset(c, r);
  }
  return t;
}

}  // namespace

extern "C" void fm_resolve_rows(
    const uint32_t* blocks, int64_t nblk, int32_t word_off,
    const int64_t* fchr, const int32_t* offs, int64_t noffs,
    const int64_t* boundary_rows, const int32_t* boundary_refs,
    int64_t nbounds, int64_t zoff, int64_t sample_mask, int32_t offrate,
    int32_t narrow, int64_t max_steps, const int64_t* rows,
    int32_t* out_tidx, int64_t n, int32_t nthreads,
    int64_t* bwops_out) {
  // bwops_out (nullable): total LF steps taken, the reference's
  // WalkMetrics bwops analog (group_walk.h:884,987) for --met ResBWOp
  WalkCtx c{blocks, nblk,  word_off, word_off + 32, fchr,
            offs,   noffs, boundary_rows, boundary_refs, nbounds,
            zoff,   sample_mask, offrate, narrow, max_steps};
  if (nthreads <= 1 || n < 1024) {
    int64_t steps = 0;
    for (int64_t i = 0; i < n; ++i)
      out_tidx[i] = resolve_one(c, rows[i], &steps);
    if (bwops_out) *bwops_out = steps;
    return;
  }
  std::vector<std::thread> ts;
  std::vector<int64_t> tsteps(nthreads, 0);
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = lo + chunk;
    if (hi > n) hi = n;
    if (lo >= hi) break;
    int64_t* st = &tsteps[t];
    ts.emplace_back([&c, rows, out_tidx, lo, hi, st]() {
      for (int64_t i = lo; i < hi; ++i)
        out_tidx[i] = resolve_one(c, rows[i], st);
    });
  }
  for (auto& t : ts) t.join();
  if (bwops_out) {
    int64_t steps = 0;
    for (int64_t s2 : tsteps) steps += s2;
    *bwops_out = steps;
  }
}


// Derive the depth-12 ftab from the depth-10 one by LF-extending every
// entry with all 16 2-char suffixes (the load-time deepening that kills
// two LF steps per search start on large indexes; no .cf format change
// -- the reference's ftab stays ftabChars=10, bt2_idx.h:1930-1946).
// out_t/out_b hold 4^12 entries indexed fi12 = fi10 | c10<<20 | c11<<22
// (window bit layout of engine._pack_read_words: char at cur+j sits at
// bits 2j, and extension consumes cur+10 then cur+11). Empty depth-10/11
// ranges propagate as (0, 0).
extern "C" void fm_ftab_extend(
    const uint32_t* blocks, int64_t nblk, int32_t word_off,
    const int64_t* fchr, int64_t zoff, int64_t n10,
    const int64_t* ftab_top, const int64_t* ftab_bot,
    int64_t* out_t, int64_t* out_b, int32_t nthreads) {
  WalkCtx c{blocks, nblk, word_off, word_off + 32, fchr,
            nullptr, 0, nullptr, nullptr, 0, zoff, 0, 0, 0, 0};
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> ts;
  int64_t chunk = (n10 + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = lo + chunk;
    if (hi > n10) hi = n10;
    if (lo >= hi) break;
    ts.emplace_back([&c, ftab_top, ftab_bot, out_t, out_b, lo, hi]() {
      for (int64_t e10 = lo; e10 < hi; ++e10) {
        int64_t t0 = ftab_top[e10], b0 = ftab_bot[e10];
        for (int c10 = 0; c10 < 4; ++c10) {
          int64_t t1 = 0, b1 = 0;
          if (b0 > t0) {
            t1 = lf_c(c, t0, c10);
            b1 = lf_c(c, b0, c10);
          }
          for (int c11 = 0; c11 < 4; ++c11) {
            int64_t idx =
                e10 | ((int64_t)c10 << 20) | ((int64_t)c11 << 22);
            if (b1 > t1) {
              out_t[idx] = lf_c(c, t1, c11);
              out_b[idx] = lf_c(c, b1, c11);
            } else {
              out_t[idx] = 0;
              out_b[idx] = 0;
            }
          }
        }
      }
    });
  }
  for (auto& t : ts) t.join();
}

// One greedy partialSearch per lane from a given cursor offset: the
// host twin of the device extension search (engine.search_first_hits),
// used by the native assignment tail so a handful of cross-strand
// extension misses never costs a full-shape device round trip (at the
// 12 Gbp scale one 4096-lane device ext call measured ~100-300 ms per
// batch of <100 real lanes, and it serializes against the overlap
// pipeline's dev_lock). Semantics mirror classify/algo.partial_search
// (hi_aligner.h:902-1031) exactly: N in the ftab window or short tail
// emits an empty hit (top=bot=-1), single-row ranges extend only while
// BWT[top]==c and top!='$' (bt2_idx.h:2910-2934).
extern "C" void fm_first_hits(
    const uint32_t* blocks, int64_t nblk, int32_t word_off,
    const int64_t* fchr, int64_t zoff,
    const int64_t* ftab_top, const int64_t* ftab_bot,
    int32_t ftab_chars,
    const uint8_t* seqs, const int64_t* starts, const int32_t* lens,
    const int32_t* offsets, int64_t n,
    int64_t* h_top, int64_t* h_bot, int32_t* h_off, int32_t* h_len,
    int32_t nthreads) {
  WalkCtx c{blocks, nblk, word_off, word_off + 32, fchr,
            nullptr, 0, nullptr, nullptr, 0,
            zoff, 0, 0, 0, 0};
  auto one = [&](int64_t i) {
    const uint8_t* seq = seqs + starts[i];
    int64_t nlen = lens[i];
    int64_t offset = offsets[i];
    int64_t dep = offset;
    int fc = ftab_chars;
    h_off[i] = (int32_t)offset;
    if (nlen - dep < fc) {
      h_top[i] = -1; h_bot[i] = -1;
      h_len[i] = (int32_t)(nlen - offset);
      return;
    }
    for (int k = 0; k < fc; ++k) {
      if (seq[nlen - dep - 1 - k] > 3) {
        h_top[i] = -1; h_bot[i] = -1;
        h_len[i] = (int32_t)(dep + k + 1 - offset);
        return;
      }
    }
    int64_t fi = 0;
    for (int k = 0; k < fc; ++k)
      fi = (fi << 2) | (int64_t)seq[nlen - dep - fc + k];
    int64_t top = ftab_top[fi], bot = ftab_bot[fi];
    dep += fc;
    if (bot <= top) {
      h_top[i] = -1; h_bot[i] = -1;
      h_len[i] = (int32_t)(dep - offset);
      return;
    }
    while (dep < nlen) {
      int ch = seq[nlen - dep - 1];
      if (ch > 3) break;
      int64_t t2, b2;
      if (bot - top > 1) {
        t2 = lf_c(c, top, ch);
        b2 = lf_c(c, bot, ch);
      } else {
        if (top == c.zoff || bwt_at(c, top) != ch) break;
        t2 = lf_c(c, top, ch);
        b2 = t2 + 1;
      }
      if (b2 <= t2) break;
      top = t2; bot = b2; ++dep;
    }
    h_top[i] = top; h_bot[i] = bot;
    h_len[i] = (int32_t)(dep - offset);
  };
  if (nthreads <= 1 || n < 256) {
    for (int64_t i = 0; i < n; ++i) one(i);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = lo + chunk > n ? n : lo + chunk;
    if (lo >= hi) break;
    ts.emplace_back([&one, lo, hi]() {
      for (int64_t i = lo; i < hi; ++i) one(i);
    });
  }
  for (auto& t : ts) t.join();
}

// Fused read-lane packer: reversed lane layout + 2-codes-per-byte
// transport packing in one pass over the raw read bytes.
//
// Replaces BatchSearchEngine.pack + .transport on the hot path: the
// numpy version builds a (L, lmax+fc) int8 matrix with a fancy-indexed
// scatter and then re-reads it to halve the bytes (~60 ms per
// 16k-lane batch on this host); this writes the final transport bytes
// directly (~2 ms threaded).
//
// Layout contract (classify/engine.py pack/transport, _unpack_rseq):
//   rseq[lane, col] = seq[len-1-col] for col < len, else 0
//   packed[lane, j] = rseq[lane, 2j] | rseq[lane, 2j+1] << 4

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" void cf_pack_reads(
    const uint8_t* allseq,     // concatenated read codes (0..4)
    const int64_t* starts,     // per-read start offset into allseq
    const int32_t* lens,       // per-read length
    int64_t n_seqs,
    int64_t row_bytes,         // (lmax + fc) / 2
    uint8_t* out,              // (n_lanes, row_bytes), written fully
    int64_t n_lanes,
    int32_t nthreads) {
  if (nthreads < 1) nthreads = 1;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t l = lo; l < hi; ++l) {
      uint8_t* row = out + l * row_bytes;
      std::memset(row, 0, row_bytes);
      if (l >= n_seqs) continue;
      const int32_t len = lens[l];
      const uint8_t* s = allseq + starts[l];
      // reversed layout: position p reads seq[len-1-p]; walk the read
      // backwards so the source access is sequential
      int32_t p = 0;
      int32_t i = len - 1;
      for (; i >= 1; i -= 2, p += 2) {
        row[p >> 1] = (uint8_t)((s[i] & 15) | ((s[i - 1] & 15) << 4));
      }
      if (i == 0) row[p >> 1] = (uint8_t)(s[0] & 15);
    }
  };
  if (nthreads == 1 || n_lanes < 2048) {
    work(0, n_lanes);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_lanes + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_lanes ? lo + chunk : n_lanes;
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& th : ts) th.join();
}

// 2-bit transport variant: 4 codes/byte for N-free batches (the common
// case -- most production FASTQ batches carry no N calls). Returns
// has_n=1 if any code > 3 was seen, in which case the output is invalid
// and the caller must fall back to the 4-bit packing.
//
// Layout contract (classify/engine.py _unpack_rseq2):
//   packed[lane, j] = rseq[4j] | rseq[4j+1]<<2 | rseq[4j+2]<<4
//                     | rseq[4j+3]<<6   (rseq reversed, zero-padded)
extern "C" void cf_pack_reads2(
    const uint8_t* allseq,
    const int64_t* starts,
    const int32_t* lens,
    int64_t n_seqs,
    int64_t row_bytes,         // (lmax + fc + 3) / 4
    uint8_t* out,              // (n_lanes, row_bytes)
    int64_t n_lanes,
    int32_t nthreads,
    int32_t* has_n) {          // [nthreads] per-thread N flags
  if (nthreads < 1) nthreads = 1;
  auto work = [&](int64_t lo, int64_t hi, int32_t* flag) {
    uint8_t seen = 0;
    for (int64_t l = lo; l < hi; ++l) {
      uint8_t* row = out + l * row_bytes;
      std::memset(row, 0, row_bytes);
      if (l >= n_seqs) continue;
      const int32_t len = lens[l];
      const uint8_t* s = allseq + starts[l];
      // reversed layout: position p reads seq[len-1-p]
      int32_t i = len - 1;
      int32_t p = 0;
      for (; i >= 3; i -= 4, p += 4) {
        const uint8_t a = s[i], b = s[i - 1], c = s[i - 2], d = s[i - 3];
        seen |= (a | b | c | d) & 4;
        row[p >> 2] = (uint8_t)((a & 3) | ((b & 3) << 2) |
                                ((c & 3) << 4) | ((d & 3) << 6));
      }
      uint8_t tail = 0;
      for (int32_t k = 0; i >= 0; --i, ++k) {
        seen |= s[i] & 4;
        tail |= (uint8_t)((s[i] & 3) << (2 * k));
      }
      if (len & 3) row[p >> 2] = tail;
    }
    *flag = seen ? 1 : 0;
  };
  if (nthreads == 1 || n_lanes < 2048) {
    work(0, n_lanes, has_n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_lanes + nthreads - 1) / nthreads;
  int used = 0;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_lanes ? lo + chunk : n_lanes;
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi, has_n + t);
    ++used;
  }
  for (auto& th : ts) th.join();
  for (int t = 1; t < used; ++t) has_n[0] |= has_n[t];
}

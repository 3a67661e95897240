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

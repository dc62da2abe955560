// BGZF block compression (native, multithreaded).
//
// The BAM output path frames deflate-compressed 64 KiB blocks (BGZF). The
// reference delegates this to its BAM library's Go implementation
// (inference/bamwriter.go:6,117); here it is a C++ routine that compresses
// many blocks in parallel with zlib raw deflate and writes the BGZF framing,
// exposed via a C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int64_t kMaxBlock = 65280;   // uncompressed bytes per BGZF block
constexpr int kHeaderLen = 18;
constexpr int kFooterLen = 8;

// Compress one block; returns total framed size or -1.
int64_t compress_block(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t cap, int level) {
  if (cap < kHeaderLen + kFooterLen + n + 64) return -1;
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return -1;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(n);
  zs.next_out = dst + kHeaderLen;
  zs.avail_out = static_cast<uInt>(cap - kHeaderLen - kFooterLen);
  int rc = deflate(&zs, Z_FINISH);
  int64_t comp = static_cast<int64_t>(zs.total_out);
  deflateEnd(&zs);
  if (rc != Z_STREAM_END) return -1;
  int64_t bsize = comp + kHeaderLen + kFooterLen;
  if (bsize > 65536) return -1;
  // gzip header with BC extra field
  uint8_t* h = dst;
  h[0] = 0x1f; h[1] = 0x8b; h[2] = 8; h[3] = 4;
  std::memset(h + 4, 0, 6);
  h[9] = 0xff;
  h[10] = 6; h[11] = 0;          // XLEN
  h[12] = 66; h[13] = 67;        // 'B','C'
  h[14] = 2; h[15] = 0;          // SLEN
  uint16_t bs16 = static_cast<uint16_t>(bsize - 1);
  h[16] = bs16 & 0xff; h[17] = bs16 >> 8;
  uint32_t crc = crc32(0, src, static_cast<uInt>(n));
  uint8_t* f = dst + kHeaderLen + comp;
  uint32_t isize = static_cast<uint32_t>(n);
  std::memcpy(f, &crc, 4);
  std::memcpy(f + 4, &isize, 4);
  return bsize;
}

}  // namespace

extern "C" {

// Compress src[0..src_len) into BGZF blocks written to dst. Blocks are
// compressed in parallel with up to n_threads workers. Returns bytes written
// to dst, or -1 on failure. dst must have capacity >= src_len + (src_len /
// kMaxBlock + 2) * 128 + 1024.
int64_t bgzf_compress_many(const uint8_t* src, int64_t src_len, uint8_t* dst,
                           int64_t dst_cap, int level, int n_threads) {
  if (src_len <= 0) return 0;
  int64_t n_blocks = (src_len + kMaxBlock - 1) / kMaxBlock;
  std::vector<std::vector<uint8_t>> outs(n_blocks);
  std::vector<int64_t> sizes(n_blocks, -1);
  int workers = n_threads < 1 ? 1 : n_threads;
  if (workers > n_blocks) workers = static_cast<int>(n_blocks);
  std::vector<std::thread> threads;
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&, t]() {
      for (int64_t b = t; b < n_blocks; b += workers) {
        int64_t off = b * kMaxBlock;
        int64_t n = src_len - off < kMaxBlock ? src_len - off : kMaxBlock;
        outs[b].resize(kHeaderLen + kFooterLen + n + 256);
        sizes[b] = compress_block(src + off, n, outs[b].data(),
                                  static_cast<int64_t>(outs[b].size()), level);
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    if (sizes[b] < 0) return -1;
    if (total + sizes[b] > dst_cap) return -1;
    std::memcpy(dst + total, outs[b].data(), sizes[b]);
    total += sizes[b];
  }
  return total;
}

}  // extern "C"

// Native entropy backend for the .ajpg coefficient streams.
//
// Two jobs the Python/zlib path can't do fast enough at pod scale:
//   1. deflate_parallel: compress ONE logical zlib stream from N threads by
//      deflating independent chunks with Z_FULL_FLUSH boundaries and
//      splicing them.  The result is a single spec-valid zlib stream
//      (RFC 1950) that any inflater (including the reference decoder's
//      zlib.decompress) accepts.  Byte-identity with single-threaded
//      zlib-9 is intentionally NOT preserved in parallel mode; pass
//      threads=1 for byte parity with the reference encoder.
//   2. inflate: plain decompression (bounded output).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Build: see build.py (g++ -O3 -shared -fPIC entropy.cpp -lz -lpthread).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ChunkResult {
  std::vector<unsigned char> data;
  bool ok = false;
};

// Deflate one chunk as raw deflate data ending on a byte boundary
// (Z_FULL_FLUSH), no zlib header/trailer.
bool deflate_chunk(const unsigned char* src, size_t len, int level,
                   bool last, ChunkResult* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  // windowBits = -15: raw deflate (we add the zlib wrapper ourselves);
  // memLevel 8 = zlib.compress default, keeps threads=1 byte-identical.
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) !=
      Z_OK) {
    return false;
  }
  out->data.resize(deflateBound(&zs, len) + 16);
  zs.next_in = const_cast<unsigned char*>(src);
  zs.avail_in = static_cast<uInt>(len);
  zs.next_out = out->data.data();
  zs.avail_out = static_cast<uInt>(out->data.size());
  int rc = deflate(&zs, last ? Z_FINISH : Z_FULL_FLUSH);
  bool ok = last ? (rc == Z_STREAM_END) : (rc == Z_OK || rc == Z_BUF_ERROR);
  out->data.resize(zs.total_out);
  deflateEnd(&zs);
  out->ok = ok;
  return ok;
}

uint32_t adler32_combine_all(const unsigned char* src, size_t len) {
  return static_cast<uint32_t>(
      adler32(adler32(0L, Z_NULL, 0), src, static_cast<uInt>(len)));
}

}  // namespace

extern "C" {

// Compress `len` bytes into `dst` (capacity dst_cap) as one zlib stream
// using `threads` workers and `chunk_size` bytes per chunk.  Returns the
// output size, or 0 on failure (including insufficient dst_cap).
size_t aej_deflate_parallel(const unsigned char* src, size_t len,
                            unsigned char* dst, size_t dst_cap, int level,
                            int threads, size_t chunk_size) {
  if (threads < 1) threads = 1;
  if (chunk_size < 1 << 16) chunk_size = 1 << 16;

  size_t n_chunks = (len + chunk_size - 1) / chunk_size;
  if (n_chunks == 0) n_chunks = 1;
  std::vector<ChunkResult> results(n_chunks);

  std::atomic<size_t> next(0);
  std::atomic<bool> failed(false);
  auto worker = [&]() {
    while (true) {
      size_t i = next.fetch_add(1);
      if (i >= n_chunks || failed.load()) return;
      size_t off = i * chunk_size;
      size_t n = (off + chunk_size <= len) ? chunk_size : (len - off);
      if (!deflate_chunk(src + off, n, level, i + 1 == n_chunks,
                         &results[i])) {
        failed.store(true);
      }
    }
  };

  int nt = static_cast<int>(
      std::min<size_t>(static_cast<size_t>(threads), n_chunks));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  if (failed.load()) return 0;

  // Assemble: 2-byte zlib header, chunks, 4-byte adler32 (big-endian).
  size_t total = 2 + 4;
  for (auto& r : results) total += r.data.size();
  if (total > dst_cap) return 0;

  unsigned char* p = dst;
  *p++ = 0x78;  // CMF: deflate, 32K window
  *p++ = (level >= 7) ? 0xDA : (level >= 5) ? 0x9C : (level >= 2) ? 0x5E
                                                                  : 0x01;
  for (auto& r : results) {
    std::memcpy(p, r.data.data(), r.data.size());
    p += r.data.size();
  }
  uint32_t ad = adler32_combine_all(src, len);
  *p++ = (ad >> 24) & 0xFF;
  *p++ = (ad >> 16) & 0xFF;
  *p++ = (ad >> 8) & 0xFF;
  *p++ = ad & 0xFF;
  return static_cast<size_t>(p - dst);
}

// Inflate a zlib stream; returns decompressed size or 0 on failure.
size_t aej_inflate(const unsigned char* src, size_t len, unsigned char* dst,
                   size_t dst_cap) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return 0;
  zs.next_in = const_cast<unsigned char*>(src);
  zs.avail_in = static_cast<uInt>(len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_cap);
  int rc = inflate(&zs, Z_FINISH);
  size_t out = zs.total_out;
  inflateEnd(&zs);
  return rc == Z_STREAM_END ? out : 0;
}

// Upper bound for aej_deflate_parallel output.
size_t aej_deflate_bound(size_t len, size_t chunk_size) {
  if (chunk_size < 1 << 16) chunk_size = 1 << 16;
  size_t n_chunks = (len + chunk_size - 1) / chunk_size + 1;
  return len + len / 500 + 32 * n_chunks + 64;
}

}  // extern "C"

// vitio — native I/O library for vit-tpu.
//
// The reference's loaders are native C (Network.c: weight scan/read with
// 6-decimal rounding; image-batch reads; dirent.c: directory shim).  This is
// their TPU-framework equivalent: bulk little-endian fp32 file reads off the
// Python heap path, exposed through a minimal C ABI consumed via ctypes
// (vit_tpu/io/native.py).  NumPy fallbacks implement identical semantics.
//
// Build: make -C native   (produces libvitio.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#if defined(_WIN32)
#define VITIO_EXPORT extern "C" __declspec(dllexport)
#else
#define VITIO_EXPORT extern "C" __attribute__((visibility("default")))
#endif

namespace {

// The reference's load-time quirk (Network.c:186): roundf(v * 1e6f) / 1e6f.
inline float round6(float v) { return std::roundf(v * 1e6f) / 1e6f; }

long long file_size_impl(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  // 64-bit tell: plain ftell returns a long, which truncates >2 GiB
  // sizes on LLP64 (Windows) — same treatment as the gather path's seek
#ifdef _WIN32
  if (_fseeki64(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    return -1;
  }
  long long size = _ftelli64(f);
#else
  if (fseeko(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    return -1;
  }
  long long size = static_cast<long long>(ftello(f));
#endif
  std::fclose(f);
  return size;
}

}  // namespace

VITIO_EXPORT long long vitio_file_size(const char* path) {
  return file_size_impl(path);
}

// Read up to `count` fp32 values into `out`; applies 6-decimal rounding when
// `round_to_6dp` is nonzero.  Returns the number of floats read, or -1.
VITIO_EXPORT long long vitio_read_fp32(const char* path, float* out,
                                       long long count, int round_to_6dp) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long long got = static_cast<long long>(
      std::fread(out, sizeof(float), static_cast<size_t>(count), f));
  std::fclose(f);
  if (round_to_6dp) {
    for (long long i = 0; i < got; ++i) out[i] = round6(out[i]);
  }
  return got;
}

// input-100.bin header: 4 x little-endian int32 (n, c, h, w) — Network.c:36-44.
VITIO_EXPORT int vitio_read_image_bin_header(const char* path, int* out4) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t got = std::fread(out4, sizeof(int32_t), 4, f);
  std::fclose(f);
  return got == 4 ? 0 : -1;
}

// Gather-read `n_samples` equal-size records scattered across a set of
// files, in parallel — the training data loader's hot path (the reference's
// analog is the serial per-image fread loop, Network.c:66-90).  Sample i
// lives in paths[sample_path[i]] at byte offset sample_offset[i] and is
// sample_bytes long; it lands at out + i * sample_bytes.  `threads` worker
// threads pull sample indices from a shared atomic counter (dynamic load
// balancing — shards may sit on media with different latencies).  Each
// worker keeps at most one FILE* open, reopening only when the path index
// changes (the index is sorted by shard in the Python wrapper, so reopens
// are rare).  Returns the number of fully-read samples (== n_samples on
// success), or -1 on argument errors.
VITIO_EXPORT long long vitio_gather_read(const char* const* paths,
                                         const int32_t* sample_path,
                                         const int64_t* sample_offset,
                                         long long n_samples,
                                         long long sample_bytes, char* out,
                                         int threads) {
  if (n_samples < 0 || sample_bytes <= 0 || threads < 1) return -1;
  if (n_samples == 0) return 0;
  std::atomic<long long> next{0};
  std::atomic<long long> ok{0};
  auto worker = [&]() {
    FILE* f = nullptr;
    int cur_path = -1;
    long long done = 0;
    for (;;) {
      long long i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_samples) break;
      int p = sample_path[i];
      if (p != cur_path) {
        if (f) std::fclose(f);
        f = std::fopen(paths[p], "rb");
        cur_path = p;
      }
      if (!f) continue;
      // 64-bit seek: plain fseek takes a long, which truncates offsets
      // >2 GiB on LLP64 (Windows) / 32-bit platforms into WRONG records.
#if defined(_WIN32)
      if (_fseeki64(f, sample_offset[i], SEEK_SET) != 0) continue;
#else
      if (fseeko(f, static_cast<off_t>(sample_offset[i]), SEEK_SET) != 0)
        continue;
#endif
      size_t got = std::fread(out + i * sample_bytes, 1,
                              static_cast<size_t>(sample_bytes), f);
      if (got == static_cast<size_t>(sample_bytes)) ++done;
    }
    if (f) std::fclose(f);
    ok.fetch_add(done, std::memory_order_relaxed);
  };
  int nt = static_cast<int>(
      threads < n_samples ? threads : static_cast<int>(n_samples));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return ok.load();
}

// Read the fp32 payload following the 16-byte header.  Returns floats read.
VITIO_EXPORT long long vitio_read_image_bin_data(const char* path, float* out,
                                                 long long count) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, 4 * sizeof(int32_t), SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  long long got = static_cast<long long>(
      std::fread(out, sizeof(float), static_cast<size_t>(count), f));
  std::fclose(f);
  return got;
}

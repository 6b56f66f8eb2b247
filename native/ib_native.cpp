// ib_native: host-side data plane for inferbiomechanics_tpu.
//
// Capability parity: the reference's native layer is nimblephysics (C++), which
// owns .b3d decoding and per-window frame assembly (SURVEY.md §2.9). Here the
// native library owns the hot host-side ops of the TPU input pipeline:
//
//   - ib_gather_rows:    batched strided window gather from a featurized
//                        [rows, cols] float32 matrix into a fixed-shape
//                        [n_windows, frames, cols] batch (the per-step op).
//   - ib_gather_columns: fused row+column gather with optional per-column
//                        scaling — featurization (column select + mass
//                        normalize) in one pass over an mmap'd trial matrix.
//   - ib_open/ib_close:  mmap a B3D-TPU payload for zero-copy access.
//
// Python remains the control plane (header JSON, window enumeration); this
// library is pure data movement, multithreaded with std::thread.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <functional>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

struct IbFile {
  int fd;
  void* data;
  size_t size;
};

// mmap a file read-only; returns nullptr on failure.
IbFile* ib_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* data = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (data == MAP_FAILED) { ::close(fd); return nullptr; }
  // advise the kernel we'll read sequentially within windows
  madvise(data, st.st_size, MADV_WILLNEED);
  return new IbFile{fd, data, static_cast<size_t>(st.st_size)};
}

const float* ib_data(IbFile* f, int64_t byte_offset) {
  return reinterpret_cast<const float*>(
      static_cast<const char*>(f->data) + byte_offset);
}

void ib_close(IbFile* f) {
  if (!f) return;
  munmap(f->data, f->size);
  ::close(f->fd);
  delete f;
}

static void parallel_for(int64_t n, int n_threads,
                         const std::function<void(int64_t, int64_t)>& body) {
  if (n_threads <= 1 || n < 2 * n_threads) {
    body(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

// out[w, f, :] = src[starts[w] + f*stride, :]
// src: [src_rows, cols] row-major float32.
void ib_gather_rows(const float* src, int64_t src_rows, int64_t cols,
                    const int64_t* starts, int64_t n_windows,
                    int64_t frames, int64_t stride,
                    float* out, int n_threads) {
  const size_t row_bytes = cols * sizeof(float);
  parallel_for(n_windows, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      const int64_t base = starts[w];
      float* dst = out + w * frames * cols;
      for (int64_t f = 0; f < frames; ++f) {
        const int64_t r = base + f * stride;
        std::memcpy(dst + f * cols, src + r * cols, row_bytes);
      }
    }
  });
}

// Fused featurization gather:
// out[w, f, j] = src[starts[w] + f*stride, col_idx[j]] * scale[j]
void ib_gather_columns(const float* src, int64_t src_rows, int64_t src_cols,
                       const int64_t* starts, int64_t n_windows,
                       int64_t frames, int64_t stride,
                       const int64_t* col_idx, const float* scale,
                       int64_t n_cols, float* out, int n_threads) {
  parallel_for(n_windows, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      const int64_t base = starts[w];
      float* dst = out + w * frames * n_cols;
      for (int64_t f = 0; f < frames; ++f) {
        const float* row = src + (base + f * stride) * src_cols;
        float* o = dst + f * n_cols;
        for (int64_t j = 0; j < n_cols; ++j) {
          o[j] = row[col_idx[j]] * scale[j];
        }
      }
    }
  });
}

}  // extern "C"

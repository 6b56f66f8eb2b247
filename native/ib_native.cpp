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

// ---------------------------------------------------------------------------
// Legacy protobuf .b3d frame decoding (data/b3d_legacy.py's hot loop in C).
//
// Decodes one trial's length-prefixed SubjectOnDiskFrame records into
// per-pass [T, C] float32 matrices. The schema knowledge stays in Python
// (b3d_legacy schema tables): the caller passes the per-field column
// offset/width table indexed by pass-frame field number, plus the field
// number whose payload is packed varints (`contact`) rather than doubles.
// Top-level field 2 = processing_pass submessage (b3d_legacy._F).
// ---------------------------------------------------------------------------

static inline uint64_t read_varint(const uint8_t*& p, const uint8_t* end) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    v |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
    if (shift >= 70) break;
  }
  return v;
}

// Decode one pass-frame submessage into `row` (length row_cols).
// Handles BOTH packed (one LEN record) and non-packed (repeated scalar
// records) encodings, like the Python codec — protobuf parsers must
// accept either. `fill` (size n_fields) tracks how many values each
// field has received so far, for the non-packed case.
// Returns false on a malformed payload (caller falls back to Python).
static bool decode_pass_frame(const uint8_t* p, const uint8_t* end,
                              const int64_t* field_col,
                              const int64_t* field_width,
                              int64_t n_fields, int64_t contact_field,
                              float* row, int64_t row_cols, int64_t* fill) {
  for (int64_t i = 0; i < n_fields; ++i) fill[i] = 0;
  while (p < end) {
    uint64_t key = read_varint(p, end);
    int64_t field = static_cast<int64_t>(key >> 3);
    int wire = static_cast<int>(key & 7);
    bool known = field >= 0 && field < n_fields && field_width[field] > 0;
    if (wire == 2) {
      uint64_t len = read_varint(p, end);
      if (len > static_cast<uint64_t>(end - p)) return false;  // truncated
      const uint8_t* payload_end = p + len;
      if (known) {
        // Append at col + fill[field]: a packed field legally split
        // across multiple LEN records concatenates (like the Python
        // codec's get_packed_doubles), and mixed packed+scalar records
        // for one field must not double-write the same columns.
        int64_t col = field_col[field];
        int64_t width = field_width[field];
        if (field == contact_field) {
          const uint8_t* q = p;
          while (fill[field] < width && q < payload_end) {
            row[col + fill[field]++] =
                static_cast<float>(read_varint(q, payload_end));
          }
        } else {
          int64_t n = static_cast<int64_t>(len / 8);
          for (int64_t i = 0; i < n && fill[field] < width; ++i) {
            double d;
            std::memcpy(&d, p + i * 8, 8);
            row[col + fill[field]++] = static_cast<float>(d);
          }
        }
      }
      p = payload_end;
    } else if (wire == 0) {
      uint64_t v = read_varint(p, end);
      if (known && field == contact_field
          && fill[field] < field_width[field]) {
        row[field_col[field] + fill[field]++] = static_cast<float>(v);
      }
    } else if (wire == 1) {
      if (end - p < 8) return false;
      if (known && field != contact_field
          && fill[field] < field_width[field]) {
        double d;
        std::memcpy(&d, p, 8);
        row[field_col[field] + fill[field]++] = static_cast<float>(d);
      }
      p += 8;
    } else if (wire == 5) {
      if (end - p < 4) return false;
      p += 4;
    } else {
      return false;  // unknown wire type
    }
  }
  return true;
}

// frames_blob: the trial's concatenated [u64 length][frame proto] records.
// frame_offsets[t]: byte offset of frame t's record within frames_blob.
// out: n_passes pointers to [n_frames, row_cols] float32 (zero-initialized
// by the caller). Returns frames decoded.
int64_t ib_decode_legacy_trial(const uint8_t* frames_blob, int64_t blob_len,
                               const int64_t* frame_offsets, int64_t n_frames,
                               const int64_t* field_col,
                               const int64_t* field_width, int64_t n_fields,
                               int64_t contact_field,
                               float** out, int64_t n_passes,
                               int64_t row_cols, int n_threads) {
  std::atomic<int64_t> decoded{0};
  parallel_for(n_frames, n_threads, [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> fill(n_fields);
    for (int64_t k = lo; k < hi; ++k) {
      if (frame_offsets[k] < 0 || frame_offsets[k] + 8 > blob_len) continue;
      const uint8_t* rec = frames_blob + frame_offsets[k];
      uint64_t len;
      std::memcpy(&len, rec, 8);
      if (len > static_cast<uint64_t>(blob_len - frame_offsets[k] - 8))
        continue;  // truncated record
      const uint8_t* p = rec + 8;
      const uint8_t* end = p + len;
      int64_t pass = 0;
      bool ok = true;
      while (p < end && ok) {
        uint64_t key = read_varint(p, end);
        int64_t field = static_cast<int64_t>(key >> 3);
        int wire = static_cast<int>(key & 7);
        if (wire == 2) {
          uint64_t sublen = read_varint(p, end);
          if (sublen > static_cast<uint64_t>(end - p)) { ok = false; break; }
          const uint8_t* sub_end = p + sublen;
          if (field == 2 && pass < n_passes) {  // processing_pass
            ok = decode_pass_frame(p, sub_end, field_col, field_width,
                                   n_fields, contact_field,
                                   out[pass] + k * row_cols, row_cols,
                                   fill.data());
            ++pass;
          }
          p = sub_end;
        } else if (wire == 0) {
          read_varint(p, end);
        } else if (wire == 1) {
          if (end - p < 8) { ok = false; break; }
          p += 8;
        } else if (wire == 5) {
          if (end - p < 4) { ok = false; break; }
          p += 4;
        } else {
          ok = false;
        }
      }
      if (ok) decoded.fetch_add(1, std::memory_order_relaxed);
    }
  });
  return decoded.load();
}

}  // extern "C"

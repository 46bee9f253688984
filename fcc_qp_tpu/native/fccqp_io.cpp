// Native IO runtime for fcc_qp_tpu: packed QP-log reader/writer and
// double-single host conversion.
//
// The reference framework's native layer is C++ on Eigen (solver core,
// SURVEY §2); in the TPU-native redesign the solve path is JAX/Pallas,
// and the native layer owns the host-side data plane instead: zero-copy
// mmap reads of .fqlog packed logs (format spec: fcc_qp_tpu/utils/io.py),
// contiguous batch packing, and the f64 -> (f32 hi, f32 lo) double-single
// split that feeds the device engine (a 3-pass numpy operation done here
// in one fused pass over the data).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[4] = {'F', 'Q', 'L', 'G'};
constexpr uint32_t kVersion = 1;

struct Header {
  char magic[4];
  uint32_t version;
  uint32_t T, n, m, n_cones;
};

// Field order must match fcc_qp_tpu.utils.io.QP_KEYS.
size_t field_elems(const Header& h, int field) {
  const size_t T = h.T, n = h.n, m = h.m, c = h.n_cones;
  switch (field) {
    case 0: return T * n * n;  // Q
    case 1: return T * n;      // b
    case 2: return T * m * n;  // A_eq
    case 3: return T * m;      // b_eq
    case 4: return T * c;      // friction_coeffs
    case 5: return T * n;      // lb
    case 6: return T * n;      // ub
    default: return 0;
  }
}

size_t total_elems(const Header& h) {
  size_t s = 0;
  for (int f = 0; f < 7; ++f) s += field_elems(h, f);
  return s;
}

}  // namespace

extern "C" {

// Reads the header; returns 0 on success, negative error code otherwise.
// dims_out: [T, n, m, n_cones].
int fqlog_read_header(const char* path, uint32_t* dims_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  size_t got = std::fread(&h, 1, sizeof(Header), f);
  std::fclose(f);
  if (got != sizeof(Header)) return -2;
  if (std::memcmp(h.magic, kMagic, 4) != 0) return -3;
  if (h.version != kVersion) return -4;
  dims_out[0] = h.T;
  dims_out[1] = h.n;
  dims_out[2] = h.m;
  dims_out[3] = h.n_cones;
  return 0;
}

// Reads all seven fields into caller-allocated f64 buffers (numpy
// arrays). Uses mmap so the page cache is shared across readers.
// Returns 0 on success.
int fqlog_read_into(const char* path, double** field_ptrs) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return -1;
  }
  Header h;
  if (::read(fd, &h, sizeof(Header)) != (ssize_t)sizeof(Header) ||
      std::memcmp(h.magic, kMagic, 4) != 0 || h.version != kVersion) {
    ::close(fd);
    return -3;
  }
  const size_t need = sizeof(Header) + total_elems(h) * sizeof(double);
  if ((size_t)st.st_size < need) {
    ::close(fd);
    return -5;  // truncated file
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return -6;

  const double* src =
      reinterpret_cast<const double*>(static_cast<const char*>(map) + sizeof(Header));
  for (int fld = 0; fld < 7; ++fld) {
    const size_t cnt = field_elems(h, fld);
    std::memcpy(field_ptrs[fld], src, cnt * sizeof(double));
    src += cnt;
  }
  ::munmap(map, st.st_size);
  return 0;
}

// Writes a packed log from seven contiguous f64 buffers. Returns 0 on
// success.
int fqlog_write(const char* path, uint32_t T, uint32_t n, uint32_t m,
                uint32_t n_cones, const double** field_ptrs) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  Header h;
  std::memcpy(h.magic, kMagic, 4);
  h.version = kVersion;
  h.T = T;
  h.n = n;
  h.m = m;
  h.n_cones = n_cones;
  if (std::fwrite(&h, 1, sizeof(Header), f) != sizeof(Header)) {
    std::fclose(f);
    return -2;
  }
  for (int fld = 0; fld < 7; ++fld) {
    const size_t cnt = field_elems(h, fld);
    if (std::fwrite(field_ptrs[fld], sizeof(double), cnt, f) != cnt) {
      std::fclose(f);
      return -2;
    }
  }
  std::fclose(f);
  return 0;
}

// Double-single split: hi = (f32)x, lo = (f32)(x - (f64)hi), with
// non-finite inputs producing lo = 0 (matches core.ds_engine._split64).
// Multi-threaded over chunks for large batches.
void ds_split(const double* x, float* hi, float* lo, int64_t count,
              int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t lo_i, int64_t hi_i) {
    for (int64_t i = lo_i; i < hi_i; ++i) {
      const double v = x[i];
      const float h = static_cast<float>(v);
      hi[i] = h;
      const double rem = v - static_cast<double>(h);
      // finite check without <cmath>: NaN != NaN; inf - inf = NaN
      lo[i] = (rem == rem) ? static_cast<float>(rem) : 0.0f;
    }
  };
  if (n_threads == 1 || count < (1 << 16)) {
    work(0, count);
    return;
  }
  std::vector<std::thread> ts;
  const int64_t chunk = (count + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t a = t * chunk;
    const int64_t b = a + chunk < count ? a + chunk : count;
    if (a >= b) break;
    ts.emplace_back(work, a, b);
  }
  for (auto& t : ts) t.join();
}

// Batched transpose helper: (T, rows, cols) f64 -> batch-last
// (rows, cols, T) hi/lo ds pair in one pass (the device engine's
// preferred layout; see ops/ds_linalg.py).
void ds_split_batch_last(const double* x, float* hi, float* lo, int64_t T,
                         int64_t rows, int64_t cols) {
  for (int64_t t = 0; t < T; ++t) {
    for (int64_t r = 0; r < rows; ++r) {
      const double* src = x + (t * rows + r) * cols;
      for (int64_t c = 0; c < cols; ++c) {
        const double v = src[c];
        const float h = static_cast<float>(v);
        const double rem = v - static_cast<double>(h);
        const int64_t dst = (r * cols + c) * T + t;
        hi[dst] = h;
        lo[dst] = (rem == rem) ? static_cast<float>(rem) : 0.0f;
      }
    }
  }
}

}  // extern "C"

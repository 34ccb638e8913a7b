// tbrnative: native data-path runtime for the TPU raymarcher.
//
// TPU-native counterpart of the reference's C++ data layer
// (Source/VolumeTextureToolkit/Private/TextureUtilities.cpp): raw/zlib volume
// loading, multithreaded min/max scans, normalization and type conversion,
// and the (z,y,x) -> (x,y,z) axis transpose that puts file-order slices into
// UVW sampling order. These run on the host while XLA owns the device, so
// they are threaded C++ rather than Python (ParallelFor in the reference,
// TextureUtilities.h:153-178).
//
// Exposed as a plain C ABI for ctypes binding (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(begin, end) over [0, n) split across threads.
template <typename F>
void parallel_chunks(int64_t n, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(n / 65536, 1));
  if (nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
    if (b >= e) break;
    ts.emplace_back([=] { fn(b, e); });
  }
  for (auto& t : ts) t.join();
}

template <typename T>
void minmax_impl(const T* src, int64_t n, double* out_min, double* out_max) {
  if (n == 0) {
    *out_min = 0;
    *out_max = 0;
    return;
  }
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(n / 65536, 1));
  std::vector<double> mins(nt, static_cast<double>(src[0]));
  std::vector<double> maxs(nt, static_cast<double>(src[0]));
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
    if (b >= e) break;
    ts.emplace_back([=, &mins, &maxs] {
      T lo = src[b], hi = src[b];
      for (int64_t i = b; i < e; ++i) {
        lo = std::min(lo, src[i]);
        hi = std::max(hi, src[i]);
      }
      mins[t] = static_cast<double>(lo);
      maxs[t] = static_cast<double>(hi);
    });
  }
  for (auto& t : ts) t.join();
  *out_min = *std::min_element(mins.begin(), mins.end());
  *out_max = *std::max_element(maxs.begin(), maxs.end());
}

template <typename T>
void normalize_impl(const T* src, int64_t n, double lo, double hi, float* dst) {
  double scale = (hi > lo) ? 1.0 / (hi - lo) : 0.0;
  parallel_chunks(n, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      dst[i] = static_cast<float>((static_cast<double>(src[i]) - lo) * scale);
    }
  });
}

// dtype codes shared with the Python wrapper.
enum DType : int32_t {
  DT_U8 = 0,
  DT_I8 = 1,
  DT_U16 = 2,
  DT_I16 = 3,
  DT_U32 = 4,
  DT_I32 = 5,
  DT_F32 = 6,
};

}  // namespace

extern "C" {

// Multithreaded min/max scan. Returns 0 on success.
int tbr_minmax(const void* src, int32_t dtype, int64_t n, double* out_min,
               double* out_max) {
  switch (dtype) {
    case DT_U8: minmax_impl(static_cast<const uint8_t*>(src), n, out_min, out_max); break;
    case DT_I8: minmax_impl(static_cast<const int8_t*>(src), n, out_min, out_max); break;
    case DT_U16: minmax_impl(static_cast<const uint16_t*>(src), n, out_min, out_max); break;
    case DT_I16: minmax_impl(static_cast<const int16_t*>(src), n, out_min, out_max); break;
    case DT_U32: minmax_impl(static_cast<const uint32_t*>(src), n, out_min, out_max); break;
    case DT_I32: minmax_impl(static_cast<const int32_t*>(src), n, out_min, out_max); break;
    case DT_F32: minmax_impl(static_cast<const float*>(src), n, out_min, out_max); break;
    default: return -1;
  }
  return 0;
}

// Multithreaded normalize-to-[0,1] float32 given a min/max range.
int tbr_normalize(const void* src, int32_t dtype, int64_t n, double lo,
                  double hi, float* dst) {
  switch (dtype) {
    case DT_U8: normalize_impl(static_cast<const uint8_t*>(src), n, lo, hi, dst); break;
    case DT_I8: normalize_impl(static_cast<const int8_t*>(src), n, lo, hi, dst); break;
    case DT_U16: normalize_impl(static_cast<const uint16_t*>(src), n, lo, hi, dst); break;
    case DT_I16: normalize_impl(static_cast<const int16_t*>(src), n, lo, hi, dst); break;
    case DT_U32: normalize_impl(static_cast<const uint32_t*>(src), n, lo, hi, dst); break;
    case DT_I32: normalize_impl(static_cast<const int32_t*>(src), n, lo, hi, dst); break;
    case DT_F32: normalize_impl(static_cast<const float*>(src), n, lo, hi, dst); break;
    default: return -1;
  }
  return 0;
}

// Read `nbytes` from `path` at `offset` into dst. Returns bytes read, <0 on error.
int64_t tbr_read_file(const char* path, int64_t offset, int64_t nbytes,
                      void* dst) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (offset && std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  size_t got = std::fread(dst, 1, static_cast<size_t>(nbytes), f);
  std::fclose(f);
  return static_cast<int64_t>(got);
}

// zlib inflate; returns decompressed size, <0 on error.
int64_t tbr_zlib_decompress(const void* src, int64_t src_len, void* dst,
                            int64_t dst_len) {
  uLongf out = static_cast<uLongf>(dst_len);
  int rc = uncompress(static_cast<Bytef*>(dst), &out,
                      static_cast<const Bytef*>(src),
                      static_cast<uLong>(src_len));
  if (rc != Z_OK) return -rc;
  return static_cast<int64_t>(out);
}

// Blocked multithreaded transpose of a (z, y, x)-ordered f32 volume into
// (x, y, z) order: dst[x*Y*Z + y*Z + z] = src[z*Y*X + y*X + x].
int tbr_transpose_zyx_to_xyz_f32(const float* src, float* dst, int64_t X,
                                 int64_t Y, int64_t Z) {
  const int64_t B = 32;  // cache-friendly tile
  std::vector<std::pair<int64_t, int64_t>> tiles;
  for (int64_t zb = 0; zb < Z; zb += B)
    for (int64_t xb = 0; xb < X; xb += B) tiles.emplace_back(zb, xb);
  std::atomic<size_t> next{0};
  int nt = std::min<size_t>(hw_threads(), tiles.size());
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&] {
      size_t i;
      while ((i = next.fetch_add(1)) < tiles.size()) {
        int64_t zb = tiles[i].first, xb = tiles[i].second;
        int64_t ze = std::min(Z, zb + B), xe = std::min(X, xb + B);
        for (int64_t y = 0; y < Y; ++y)
          for (int64_t z = zb; z < ze; ++z)
            for (int64_t x = xb; x < xe; ++x)
              dst[(x * Y + y) * Z + z] = src[(z * Y + y) * X + x];
      }
    });
  }
  for (auto& t : ts) t.join();
  return 0;
}

int tbr_version() { return 1; }

}  // extern "C"

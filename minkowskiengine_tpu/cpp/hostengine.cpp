// Native host engine: coordinate quantization for the data-loader path.
//
// TPU-native counterpart of the reference's host-side quantization
// (reference: src/quantization.cpp:57-260 — robin_hood hash map over
// coordinate rows).  The device path (JAX sort-unique) handles on-chip
// coordinate work; this library accelerates the *host* voxelization that
// data loaders run per sample before device transfer, where numpy's
// np.unique(axis=0) (void-dtype row sort) is the bottleneck.
//
// Plain C ABI (loaded via ctypes — no CPython/pybind dependency):
//   open-addressing hash table, 64-bit mixed hash of the row bytes, linear
//   probing, full-row comparison on collision, first-occurrence unique order
//   (matching reference insert_and_map semantics,
//   src/coordinate_map_cpu.hpp:340-380).
//
// Build: g++ -O3 -shared -fPIC (see build.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>

namespace {

inline uint64_t mix_hash(const int32_t* row, int64_t d) {
  // FNV-1a over the row bytes, finalized with a splitmix64-style mixer.
  uint64_t h = 14695981039346656037ull;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(row);
  for (int64_t i = 0; i < d * (int64_t)sizeof(int32_t); ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  h ^= h >> 30;
  h *= 0xbf58476d1ce4e5b9ull;
  h ^= h >> 27;
  h *= 0x94d049bb133111ebull;
  h ^= h >> 31;
  return h;
}

inline bool row_equal(const int32_t* a, const int32_t* b, int64_t d) {
  return std::memcmp(a, b, d * sizeof(int32_t)) == 0;
}

inline uint64_t table_capacity(int64_t n) {
  uint64_t cap = 16;
  // ~50% max occupancy (the reference's SPEED_OPTIMIZED default,
  // coordinate_map_manager.hpp:130-156)
  while (cap < (uint64_t)(n * 2)) cap <<= 1;
  return cap;
}

}  // namespace

extern "C" {

// unique + inverse over int32 rows, first-occurrence order.
//   coords:      n x d int32
//   unique_map:  out, capacity >= n int64 — input row of each unique row
//   inverse:     out, n int64 — unique slot per input row
// returns number of unique rows.
int64_t me_quantize_i32(const int32_t* coords, int64_t n, int64_t d,
                        int64_t* unique_map, int64_t* inverse) {
  if (n <= 0) return 0;
  const uint64_t cap = table_capacity(n);
  const uint64_t mask = cap - 1;
  std::vector<int64_t> slots(cap, -1);  // input row index of the occupant

  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = coords + i * d;
    uint64_t pos = mix_hash(row, d) & mask;
    for (;;) {
      int64_t occ = slots[pos];
      if (occ < 0) {
        slots[pos] = i;
        unique_map[n_unique] = i;
        inverse[i] = n_unique;
        ++n_unique;
        break;
      }
      if (row_equal(coords + occ * d, row, d)) {
        inverse[i] = inverse[occ];
        break;
      }
      pos = (pos + 1) & mask;
    }
  }
  return n_unique;
}

// fused float->voxel quantization + unique (reference:
// utils/quantization.py:310-335 floor(coords / quantization_size)).
//   coords: n x d float32 (or float64 via me_quantize_f64)
//   qsize:  d float64 voxel sizes
//   discrete: out, n x d int32 — floored voxel coordinates
int64_t me_quantize_f32(const float* coords, int64_t n, int64_t d,
                        const double* qsize, int32_t* discrete,
                        int64_t* unique_map, int64_t* inverse) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < d; ++j)
      discrete[i * d + j] =
          (int32_t)std::floor((double)coords[i * d + j] / qsize[j]);
  return me_quantize_i32(discrete, n, d, unique_map, inverse);
}

int64_t me_quantize_f64(const double* coords, int64_t n, int64_t d,
                        const double* qsize, int32_t* discrete,
                        int64_t* unique_map, int64_t* inverse) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < d; ++j)
      discrete[i * d + j] =
          (int32_t)std::floor(coords[i * d + j] / qsize[j]);
  return me_quantize_i32(discrete, n, d, unique_map, inverse);
}

// label-aware quantization: coordinates carrying conflicting labels get
// ignore_label (reference: src/quantization.cpp:141-260).
int64_t me_quantize_label_i32(const int32_t* coords, const int32_t* labels,
                              int64_t n, int64_t d, int32_t ignore_label,
                              int64_t* unique_map, int64_t* inverse,
                              int32_t* out_labels) {
  if (n <= 0) return 0;
  const uint64_t cap = table_capacity(n);
  const uint64_t mask = cap - 1;
  std::vector<int64_t> slots(cap, -1);

  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = coords + i * d;
    uint64_t pos = mix_hash(row, d) & mask;
    for (;;) {
      int64_t occ = slots[pos];
      if (occ < 0) {
        slots[pos] = i;
        unique_map[n_unique] = i;
        inverse[i] = n_unique;
        out_labels[n_unique] = labels[i];
        ++n_unique;
        break;
      }
      if (row_equal(coords + occ * d, row, d)) {
        int64_t slot = inverse[occ];
        inverse[i] = slot;
        if (out_labels[slot] != labels[i]) out_labels[slot] = ignore_label;
        break;
      }
      pos = (pos + 1) & mask;
    }
  }
  return n_unique;
}

// batch-collation kernel: prepend batch index + floor float coords
// (reference: utils/collation.py:30-95).
void me_batch_floor_f32(const float* coords, int64_t n, int64_t d,
                        int32_t batch_index, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i * (d + 1)] = batch_index;
    for (int64_t j = 0; j < d; ++j)
      out[i * (d + 1) + 1 + j] = (int32_t)std::floor(coords[i * d + j]);
  }
}

}  // extern "C"

// Native host-side topology builder for fem_simulation_tpu.
//
// Plays the role the reference delegates to Warp's native BSR machinery
// (/root/reference/exp1/quasi_simulation/sparse.py:251-278 calls
// runtime.core.bsr_matrix_from_triplets_* — C++/CUDA sort+compress). On TPU
// the device-side matrix is block-ELL with static sparsity, so the native
// work moves to scene build time: expanding the Galerkin triple-product plan
// and deduplicating the hex-pair stencil. Exposed with a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Build: see build.py (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Count + fill the Galerkin plan A_c[I,J] += wI*wJ*A[i,j].
//
// Inputs:
//   fi, fj:  (E,) fine row/col of each real fine ELL entry
//   src_flat:(E,) flat fine ELL slot of the entry
//   p_idx:   (Nf*8,) coarse contributor ids per fine vertex (row-major)
//   p_w:     (Nf*8,) trilinear weights (0 = padding)
//   cnbr:    (Nc*Kc,) coarse neighbor table (row-major, real prefix ascending)
//   cdeg:    (Nc,) real row widths of the coarse table
// Outputs (caller allocates capacity cap; returns number written, or -1 if
// a destination slot is missing, or -(needed) - 2 if cap is too small):
//   g_src, g_dst (int32), g_w (float)
int64_t galerkin_plan(const int32_t* fi, const int32_t* fj,
                      const int32_t* src_flat, int64_t E,
                      const int32_t* p_idx, const float* p_w,
                      const int32_t* cnbr, const int32_t* cdeg,
                      int64_t Kc,
                      int32_t* g_src, int32_t* g_dst, float* g_w,
                      int64_t cap) {
  int64_t n = 0;
  for (int64_t e = 0; e < E; ++e) {
    const int32_t i = fi[e];
    const int32_t j = fj[e];
    const int32_t* Ii = p_idx + (int64_t)i * 8;
    const float* wi = p_w + (int64_t)i * 8;
    const int32_t* Jj = p_idx + (int64_t)j * 8;
    const float* wj = p_w + (int64_t)j * 8;
    for (int a = 0; a < 8; ++a) {
      const float wa = wi[a];
      if (wa == 0.0f) continue;
      const int32_t I = Ii[a];
      const int32_t* row = cnbr + (int64_t)I * Kc;
      const int32_t deg = cdeg[I];
      for (int b = 0; b < 8; ++b) {
        const float w = wa * wj[b];
        if (w == 0.0f) continue;
        const int32_t J = Jj[b];
        // binary search in the ascending real prefix of the coarse row
        const int32_t* lo = std::lower_bound(row, row + deg, J);
        if (lo == row + deg || *lo != J) return -1;
        if (n >= cap) return -(E * 64) - 2;
        g_src[n] = src_flat[e];
        g_dst[n] = (int32_t)((int64_t)I * Kc + (lo - row));
        g_w[n] = w;
        ++n;
      }
    }
  }
  return n;
}

// Deduplicate hex-pair couplings into sorted (r, c) pairs.
//
// Inputs: hexes (H*8,) int32 corner ids; n number of vertices.
// Output: pairs_out (cap, 2) int32 sorted lexicographically; returns count
// (or -needed-2 if cap too small — call again with a larger buffer).
int64_t hex_pairs_unique(const int32_t* hexes, int64_t H, int64_t cap,
                         int32_t* pairs_out) {
  std::vector<int64_t> keys;
  keys.reserve((size_t)H * 64);
  for (int64_t h = 0; h < H; ++h) {
    const int32_t* c = hexes + h * 8;
    for (int a = 0; a < 8; ++a)
      for (int b = 0; b < 8; ++b)
        keys.push_back(((int64_t)c[a] << 32) | (uint32_t)c[b]);
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  if ((int64_t)keys.size() > cap) return -(int64_t)keys.size() - 2;
  for (size_t k = 0; k < keys.size(); ++k) {
    pairs_out[2 * k] = (int32_t)(keys[k] >> 32);
    pairs_out[2 * k + 1] = (int32_t)(keys[k] & 0xffffffff);
  }
  return (int64_t)keys.size();
}

// Map each (hex, a, b) coupling to its flat ELL slot row*K + slot.
// nbr rows' real prefixes are ascending; deg gives prefix widths.
int64_t hex_slot_map(const int32_t* hexes, int64_t H,
                     const int32_t* nbr, const int32_t* deg, int64_t K,
                     int32_t* out) {
  for (int64_t h = 0; h < H; ++h) {
    const int32_t* c = hexes + h * 8;
    for (int a = 0; a < 8; ++a) {
      const int32_t r = c[a];
      const int32_t* row = nbr + (int64_t)r * K;
      const int32_t d = deg[r];
      for (int b = 0; b < 8; ++b) {
        const int32_t* lo = std::lower_bound(row, row + d, c[b]);
        if (lo == row + d || *lo != c[b]) return -1;
        out[h * 64 + a * 8 + b] = (int32_t)((int64_t)r * K + (lo - row));
      }
    }
  }
  return H * 64;
}

}  // extern "C"

// Native data-pipeline kernels: ray generation + shuffle gathers.
//
// TPU-native replacement for the runtime role of the reference's native
// layer (Tutel C++/CUDA served the GPU hot path; on TPU the device compute
// is XLA, so the native layer serves the HOST hot path instead): chunk
// generation for Mega-NeRF-scale scenes iterates millions of pixels per
// image (filesystem_dataset.py:163-285 in the reference). These kernels
// compute per-pixel rays (camera -> world, normalize, altitude-plane
// truncation; parity with mega_nerf/ray_utils.py:6-85) and apply shuffle
// permutations with multi-threaded row gathers.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread raygen.cc -o libraygen.so
// (done lazily by native/__init__.py; no external dependencies).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int num_threads(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  int64_t per = 65536;  // minimum rows per thread before fanning out
  int64_t want = (work_items + per - 1) / per;
  return static_cast<int>(want < hw ? (want < 1 ? 1 : want) : hw);
}

template <typename F>
void parallel_rows(int64_t n, F&& body) {
  int t = num_threads(n);
  if (t <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + t - 1) / t;
  for (int i = 0; i < t; ++i) {
    int64_t lo = i * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &body] { body(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// rays out layout: [H*W, 8] = [o(3) | d(3) | near | far].
// c2w: row-major [3, 4]; intrinsics: fx, fy, cx, cy.
// altitude_range: nullptr or [2] (drb frame: x down; plane x == alt).
void compute_rays(const float* c2w, int32_t W, int32_t H,
                  const float* intrinsics, int32_t center_pixels, float near,
                  float far, const float* altitude_range, float* out) {
  const float fx = intrinsics[0], fy = intrinsics[1];
  const float cx = intrinsics[2], cy = intrinsics[3];
  const float off = center_pixels ? 0.5f : 0.0f;
  const float ox = c2w[3], oy = c2w[7], oz = c2w[11];
  const bool alt = altitude_range != nullptr;
  const float alt_near = alt ? altitude_range[0] : 0.f;
  const float alt_far = alt ? altitude_range[1] : 0.f;

  parallel_rows(static_cast<int64_t>(H) * W, [&](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t j = p / W;  // row
      const int64_t i = p % W;  // col
      // camera-frame direction (normalized)
      float dcx = (static_cast<float>(i) + off - cx) / fx;
      float dcy = -(static_cast<float>(j) + off - cy) / fy;
      float dcz = -1.0f;
      float inv = 1.0f / std::sqrt(dcx * dcx + dcy * dcy + dcz * dcz);
      dcx *= inv; dcy *= inv; dcz *= inv;
      // world frame: d = R * dc (c2w rows are world axes)
      float dx = c2w[0] * dcx + c2w[1] * dcy + c2w[2] * dcz;
      float dy = c2w[4] * dcx + c2w[5] * dcy + c2w[6] * dcz;
      float dz = c2w[8] * dcx + c2w[9] * dcy + c2w[10] * dcz;
      float dn = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
      dx *= dn; dy *= dn; dz *= dn;

      float nb = near, fb = far;
      if (alt) {
        // near bound: high-altitude plane (altitude_range[0])
        if (ox < alt_near && dx > 0.f) {
          float si = (alt_near - ox) / dx;
          nb = std::fabs(si);  // |si| * ||d||, d normalized
        }
        if (nb < near) nb = near;
        // far bound: low-altitude plane (altitude_range[1])
        if (ox < alt_far && dx > 0.f) {
          float si = (alt_far - ox) / dx;
          fb = std::fabs(si);
        }
        if (fb > far) fb = far;
        if (fb < nb) fb = nb;
      }

      float* r = out + p * 8;
      r[0] = ox; r[1] = oy; r[2] = oz;
      r[3] = dx; r[4] = dy; r[5] = dz;
      r[6] = nb; r[7] = fb;
    }
  });
}

// out[i, :] = src[perm[i], :]; float32 rows.
void gather_rows_f32(const float* src, const int64_t* perm, int64_t n,
                     int64_t row_elems, float* out) {
  parallel_rows(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * row_elems, src + perm[i] * row_elems,
                  sizeof(float) * row_elems);
    }
  });
}

void gather_rows_u8(const uint8_t* src, const int64_t* perm, int64_t n,
                    int64_t row_elems, uint8_t* out) {
  parallel_rows(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * row_elems, src + perm[i] * row_elems,
                  row_elems);
    }
  });
}

// Reconstruct rays from (pixel index, image index) pairs using cached
// per-image c2w matrices and one shared direction table — the load-time
// path of the shared-intrinsics chunk format
// (filesystem_dataset.py:127-161).
void reconstruct_rays(const float* directions /*[W*H, 3] unit, camera*/,
                      const float* c2ws /*[n_images, 3, 4]*/,
                      const int64_t* pixel_idx, const int16_t* image_idx,
                      int64_t n, float near, float far,
                      const float* altitude_range, float* out) {
  const bool alt = altitude_range != nullptr;
  const float alt_near = alt ? altitude_range[0] : 0.f;
  const float alt_far = alt ? altitude_range[1] : 0.f;
  parallel_rows(n, [&](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      const float* dc = directions + pixel_idx[p] * 3;
      const float* m = c2ws + static_cast<int64_t>(image_idx[p]) * 12;
      float dx = m[0] * dc[0] + m[1] * dc[1] + m[2] * dc[2];
      float dy = m[4] * dc[0] + m[5] * dc[1] + m[6] * dc[2];
      float dz = m[8] * dc[0] + m[9] * dc[1] + m[10] * dc[2];
      float dn = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
      dx *= dn; dy *= dn; dz *= dn;
      float ox = m[3], oy = m[7], oz = m[11];
      float nb = near, fb = far;
      if (alt) {
        if (ox < alt_near && dx > 0.f) nb = std::fabs((alt_near - ox) / dx);
        if (nb < near) nb = near;
        if (ox < alt_far && dx > 0.f) fb = std::fabs((alt_far - ox) / dx);
        if (fb > far) fb = far;
        if (fb < nb) fb = nb;
      }
      float* r = out + p * 8;
      r[0] = ox; r[1] = oy; r[2] = oz;
      r[3] = dx; r[4] = dy; r[5] = dz;
      r[6] = nb; r[7] = fb;
    }
  });
}

}  // extern "C"

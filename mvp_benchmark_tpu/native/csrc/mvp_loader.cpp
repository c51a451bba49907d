// Native data-loader core for MVP-Benchmark-TPU.
//
// Host-side hot paths of the input pipeline, C++ equivalents of what the
// reference delegates to torch DataLoader workers + per-item numpy
// (reference registration/dataset.py:98-128):
//   - gather_batch_f32: batch assembly (index gather into a contiguous
//     pinned-friendly buffer)
//   - se3_augment_batch: per-item random SE(3) pose generation + cloud
//     transforms (the train-time augmentation of registration/dataset.py,
//     same axis-angle/translation distributions)
//
// Built at import with g++ (the same JIT-at-first-use pattern the reference
// uses for its CD/EMD CUDA extensions via torch.utils.cpp_extension.load).
// Exposed through a C ABI and loaded with ctypes — no pybind11 dependency.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// splitmix64: deterministic, seedable, fast.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next_u64() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // Uniform in [0, 1).
  double uniform() {
    return (next_u64() >> 11) * (1.0 / 9007199254740992.0);
  }
  // Standard normal via Box-Muller.
  double normal() {
    double u1 = uniform();
    double u2 = uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
  }
};

// 4x4 homogeneous pose from a random axis-angle rotation (angle ~ U[0, max])
// and a random direction translation (norm ~ U[0, max_trans]); the exact
// construction of reference registration/dataset.py:14-35.
void random_pose(Rng& rng, double max_angle, double max_trans, double T[16]) {
  double ax[3] = {rng.normal(), rng.normal(), rng.normal()};
  double norm = std::sqrt(ax[0] * ax[0] + ax[1] * ax[1] + ax[2] * ax[2]);
  for (double& v : ax) v /= norm;
  double angle = rng.uniform() * max_angle;

  double A[9] = {0, -ax[2], ax[1], ax[2], 0, -ax[0], -ax[1], ax[0], 0};
  double AA[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += A[i * 3 + k] * A[k * 3 + j];
      AA[i * 3 + j] = s;
    }
  double sa = std::sin(angle), ca = 1.0 - std::cos(angle);
  double R[9];
  for (int i = 0; i < 9; i++)
    R[i] = (i % 4 == 0 ? 1.0 : 0.0) + sa * A[i] + ca * AA[i];

  double t[3] = {rng.normal(), rng.normal(), rng.normal()};
  double tn = std::sqrt(t[0] * t[0] + t[1] * t[1] + t[2] * t[2]);
  double scale = rng.uniform() * max_trans / tn;
  for (double& v : t) v *= scale;

  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 3; j++) T[i * 4 + j] = R[i * 3 + j];
    T[i * 4 + 3] = t[i];
  }
  T[12] = T[13] = T[14] = 0.0;
  T[15] = 1.0;
}

void matmul4(const double* a, const double* b, double* out) {
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) {
      double s = 0;
      for (int k = 0; k < 4; k++) s += a[i * 4 + k] * b[k * 4 + j];
      out[i * 4 + j] = s;
    }
}

// y = x @ R^T + t for an (n, 3) cloud.
void transform_cloud(const float* x, int64_t n, const double T[16], float* y) {
  for (int64_t p = 0; p < n; p++) {
    const float* xi = x + p * 3;
    float* yi = y + p * 3;
    for (int i = 0; i < 3; i++) {
      double s = T[i * 4 + 3];
      for (int k = 0; k < 3; k++) s += T[i * 4 + k] * xi[k];
      yi[i] = static_cast<float>(s);
    }
  }
}

}  // namespace

extern "C" {

// Gather rows: out[i] = src[idx[i]]; row_bytes per row.
void gather_batch_f32(const float* src, const int64_t* idx, float* out,
                      int64_t m, int64_t row_elems) {
  for (int64_t i = 0; i < m; i++) {
    std::memcpy(out + i * row_elems, src + idx[i] * row_elems,
                sizeof(float) * static_cast<size_t>(row_elems));
  }
}

// Train-time registration augmentation for a whole batch
// (reference registration/dataset.py:102-107):
//   transform = random_pose(max_angle, max_trans / 2)
//   pose1     = random_pose(pi, max_trans)
//   src' = src @ pose1[:3,:3]^T + pose1[:3,3]
//   tgt' = tgt @ (transform @ pose1) likewise
// out_T receives `transform` (the gt src'->tgt' pose).
void se3_augment_batch(const float* src, const float* tgt, int64_t b,
                       int64_t n, double max_angle, double max_trans,
                       uint64_t seed, float* out_src, float* out_tgt,
                       float* out_T) {
  for (int64_t i = 0; i < b; i++) {
    Rng rng(seed + static_cast<uint64_t>(i) * 0x9e3779b97f4a7c15ULL + 1);
    double transform[16], pose1[16], pose2[16];
    random_pose(rng, max_angle, max_trans / 2.0, transform);
    random_pose(rng, M_PI, max_trans, pose1);
    matmul4(transform, pose1, pose2);

    transform_cloud(src + i * n * 3, n, pose1, out_src + i * n * 3);
    transform_cloud(tgt + i * n * 3, n, pose2, out_tgt + i * n * 3);
    for (int k = 0; k < 16; k++)
      out_T[i * 16 + k] = static_cast<float>(transform[k]);
  }
}

// Version marker so stale cached .so files get rebuilt.
int64_t mvp_loader_abi_version() { return 1; }

}  // extern "C"

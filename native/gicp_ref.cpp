// Reference-baseline micro-harness: CPU GICP at the reference's operating
// point, so bench.py's `vs_baseline` denominator is MEASURED, not guessed.
//
// Reproduces the cost structure of the reference front-end
// (/root/reference/src/icpslam/icp_odometer.cpp:188-199 — PCL
// GeneralizedIterativeClosestPoint, max 10 iterations, 1.0 m max
// correspondence distance, single-threaded):
//   - kd-tree built over the target cloud (PCL uses FLANN kd-trees)
//   - per-point GICP covariances from k=20 nearest neighbors (PCL default)
//   - per iteration: fresh kd-tree correspondences + a Mahalanobis-weighted
//     Gauss-Newton pose update (PCL minimizes the same plane-to-plane cost
//     with BFGS; GN is the cheaper-or-equal classical choice, so this
//     UNDERSTATES the reference's cost — conservative for our multiplier)
//
// Clouds are synthetic room-world scans (~matched to bench.py shapes:
// 8192 points after voxel filtering). Single-threaded like PCL GICP.
//
// Output: one JSON line {"metric": "reference_gicp_scans_per_sec", ...}.
//
// Build: make -C native gicp_ref   Run: ./native/gicp_ref [n_points] [reps]

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <numeric>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// ---------------------------------------------------------------- kd-tree
// Simple median-split kd-tree over points, recursive NN / kNN queries —
// the same algorithmic shape as FLANN's single kd-tree used by PCL.
struct KdTree {
  struct Node {
    int idx = -1;       // point index at this node
    int axis = 0;
    int left = -1, right = -1;
  };
  const std::vector<V3>* pts = nullptr;
  std::vector<Node> nodes;
  int root = -1;

  void build(const std::vector<V3>& p) {
    pts = &p;
    std::vector<int> ids(p.size());
    std::iota(ids.begin(), ids.end(), 0);
    nodes.clear();
    nodes.reserve(p.size());
    root = build_rec(ids, 0, static_cast<int>(ids.size()), 0);
  }

  int build_rec(std::vector<int>& ids, int lo, int hi, int depth) {
    if (lo >= hi) return -1;
    int axis = depth % 3;
    int mid = (lo + hi) / 2;
    auto key = [&](int i) {
      const V3& v = (*pts)[i];
      return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
    };
    std::nth_element(ids.begin() + lo, ids.begin() + mid, ids.begin() + hi,
                     [&](int a, int b) { return key(a) < key(b); });
    int ni = static_cast<int>(nodes.size());
    nodes.push_back({});
    nodes[ni].idx = ids[mid];
    nodes[ni].axis = axis;
    int l = build_rec(ids, lo, mid, depth + 1);
    int r = build_rec(ids, mid + 1, hi, depth + 1);
    nodes[ni].left = l;
    nodes[ni].right = r;
    return ni;
  }

  void nn_rec(int ni, const V3& q, int& best, double& best_d2) const {
    if (ni < 0) return;
    const Node& n = nodes[ni];
    const V3& p = (*pts)[n.idx];
    V3 d = q - p;
    double d2 = dot(d, d);
    if (d2 < best_d2) {
      best_d2 = d2;
      best = n.idx;
    }
    double delta = n.axis == 0 ? q.x - p.x : (n.axis == 1 ? q.y - p.y : q.z - p.z);
    int near = delta <= 0 ? n.left : n.right;
    int far = delta <= 0 ? n.right : n.left;
    nn_rec(near, q, best, best_d2);
    if (delta * delta < best_d2) nn_rec(far, q, best, best_d2);
  }

  int nearest(const V3& q, double* d2_out) const {
    int best = -1;
    double best_d2 = 1e300;
    nn_rec(root, q, best, best_d2);
    if (d2_out) *d2_out = best_d2;
    return best;
  }

  void knn_rec(int ni, const V3& q, int k, std::vector<std::pair<double, int>>& heap) const {
    if (ni < 0) return;
    const Node& n = nodes[ni];
    const V3& p = (*pts)[n.idx];
    V3 d = q - p;
    double d2 = dot(d, d);
    if (static_cast<int>(heap.size()) < k) {
      heap.emplace_back(d2, n.idx);
      std::push_heap(heap.begin(), heap.end());
    } else if (d2 < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {d2, n.idx};
      std::push_heap(heap.begin(), heap.end());
    }
    double delta = n.axis == 0 ? q.x - p.x : (n.axis == 1 ? q.y - p.y : q.z - p.z);
    int near = delta <= 0 ? n.left : n.right;
    int far = delta <= 0 ? n.right : n.left;
    knn_rec(near, q, k, heap);
    double worst = static_cast<int>(heap.size()) < k ? 1e300 : heap.front().first;
    if (delta * delta < worst) knn_rec(far, q, k, heap);
  }
};

// ------------------------------------------------- small matrix helpers
using M3 = double[3][3];

void mat3_mul(const M3 a, const M3 b, M3 out) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += a[i][k] * b[k][j];
      out[i][j] = s;
    }
}

bool mat3_inv(const M3 a, M3 out) {
  double det = a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1]) -
               a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0]) +
               a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]);
  if (std::fabs(det) < 1e-18) return false;
  double inv = 1.0 / det;
  out[0][0] = (a[1][1] * a[2][2] - a[1][2] * a[2][1]) * inv;
  out[0][1] = (a[0][2] * a[2][1] - a[0][1] * a[2][2]) * inv;
  out[0][2] = (a[0][1] * a[1][2] - a[0][2] * a[1][1]) * inv;
  out[1][0] = (a[1][2] * a[2][0] - a[1][0] * a[2][2]) * inv;
  out[1][1] = (a[0][0] * a[2][2] - a[0][2] * a[2][0]) * inv;
  out[1][2] = (a[0][2] * a[1][0] - a[0][0] * a[1][2]) * inv;
  out[2][0] = (a[1][0] * a[2][1] - a[1][1] * a[2][0]) * inv;
  out[2][1] = (a[0][1] * a[2][0] - a[0][0] * a[2][1]) * inv;
  out[2][2] = (a[0][0] * a[1][1] - a[0][1] * a[1][0]) * inv;
  return true;
}

// 6x6 solve via Gaussian elimination with partial pivoting
bool solve66(double A[6][6], double b[6], double x[6]) {
  int piv[6];
  for (int i = 0; i < 6; i++) piv[i] = i;
  for (int c = 0; c < 6; c++) {
    int best = c;
    for (int r = c + 1; r < 6; r++)
      if (std::fabs(A[r][c]) > std::fabs(A[best][c])) best = r;
    if (std::fabs(A[best][c]) < 1e-14) return false;
    for (int k = 0; k < 6; k++) std::swap(A[c][k], A[best][k]);
    std::swap(b[c], b[best]);
    for (int r = c + 1; r < 6; r++) {
      double f = A[r][c] / A[c][c];
      for (int k = c; k < 6; k++) A[r][k] -= f * A[c][k];
      b[r] -= f * b[c];
    }
  }
  for (int r = 5; r >= 0; r--) {
    double s = b[r];
    for (int k = r + 1; k < 6; k++) s -= A[r][k] * x[k];
    x[r] = s / A[r][r];
  }
  (void)piv;
  return true;
}

// ------------------------------------------------------------ SE(3) pose
struct Pose {
  M3 R;
  V3 t;
};

void pose_identity(Pose& p) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) p.R[i][j] = i == j ? 1.0 : 0.0;
  p.t = {0, 0, 0};
}

V3 apply(const Pose& p, const V3& v) {
  return {p.R[0][0] * v.x + p.R[0][1] * v.y + p.R[0][2] * v.z + p.t.x,
          p.R[1][0] * v.x + p.R[1][1] * v.y + p.R[1][2] * v.z + p.t.y,
          p.R[2][0] * v.x + p.R[2][1] * v.y + p.R[2][2] * v.z + p.t.z};
}

// exp of so(3) (Rodrigues) applied on the left: p' = exp(w) R, t' = t + v
void pose_update(Pose& p, const double xi[6]) {
  V3 w = {xi[3], xi[4], xi[5]};
  double th = std::sqrt(dot(w, w));
  M3 dR;
  if (th < 1e-12) {
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) dR[i][j] = i == j ? 1.0 : 0.0;
    dR[0][1] = -w.z; dR[0][2] = w.y; dR[1][0] = w.z;
    dR[1][2] = -w.x; dR[2][0] = -w.y; dR[2][1] = w.x;
  } else {
    V3 a = {w.x / th, w.y / th, w.z / th};
    double c = std::cos(th), s = std::sin(th), C = 1 - c;
    dR[0][0] = c + a.x * a.x * C; dR[0][1] = a.x * a.y * C - a.z * s; dR[0][2] = a.x * a.z * C + a.y * s;
    dR[1][0] = a.y * a.x * C + a.z * s; dR[1][1] = c + a.y * a.y * C; dR[1][2] = a.y * a.z * C - a.x * s;
    dR[2][0] = a.z * a.x * C - a.y * s; dR[2][1] = a.z * a.y * C + a.x * s; dR[2][2] = c + a.z * a.z * C;
  }
  M3 newR;
  mat3_mul(dR, p.R, newR);
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) p.R[i][j] = newR[i][j];
  p.t.x += xi[0];
  p.t.y += xi[1];
  p.t.z += xi[2];
}

// --------------------------------------------------------- synthetic data
// Matches bench.py's workload shape: room-world surfaces sampled to N pts.
struct Rng {
  uint64_t s;
  double uniform() {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return static_cast<double>((s >> 11) & ((1ULL << 53) - 1)) / static_cast<double>(1ULL << 53);
  }
  double uni(double lo, double hi) { return lo + (hi - lo) * uniform(); }
};

std::vector<V3> make_scan(int n, uint64_t seed, double dx) {
  Rng rng{seed};
  std::vector<V3> out;
  out.reserve(n);
  const double half = 20.0, height = 4.0;
  for (int i = 0; i < n; i++) {
    int which = i % 6;
    V3 p;
    switch (which) {
      case 0: p = {rng.uni(-half, half), rng.uni(-half, half), 0.0}; break;
      case 1: p = {rng.uni(-half, half), half, rng.uni(0, height)}; break;
      case 2: p = {rng.uni(-half, half), -half, rng.uni(0, height)}; break;
      case 3: p = {half, rng.uni(-half, half), rng.uni(0, height)}; break;
      case 4: p = {-half, rng.uni(-half, half), rng.uni(0, height)}; break;
      default: {  // pillars
        double cx = std::fmod(static_cast<double>(i) * 7.3, 30.0) - 15.0;
        double cy = std::fmod(static_cast<double>(i) * 3.1, 30.0) - 15.0;
        double th = rng.uni(0, 6.283);
        p = {cx + 0.4 * std::cos(th), cy + 0.4 * std::sin(th), rng.uni(0, height)};
      }
    }
    // scan-frame offset (simulated motion) + sensor noise
    p.x += dx + rng.uni(-0.02, 0.02);
    p.y += rng.uni(-0.02, 0.02);
    p.z += rng.uni(-0.02, 0.02);
    out.push_back(p);
  }
  return out;
}

}  // namespace

// covariance entry: xx, xy, xz, yy, yz, zz
struct Cov6 {
  double c[6];
};

static void compute_covariances(const std::vector<V3>& pts, const KdTree& tree,
                                int k, std::vector<Cov6>& out) {
  out.resize(pts.size());
  std::vector<std::pair<double, int>> heap;
  for (size_t i = 0; i < pts.size(); i++) {
    heap.clear();
    tree.knn_rec(tree.root, pts[i], k, heap);
    V3 mean = {0, 0, 0};
    for (auto& h : heap) mean = mean + (*tree.pts)[h.second];
    double invk = 1.0 / static_cast<double>(heap.size());
    mean = {mean.x * invk, mean.y * invk, mean.z * invk};
    double m[6] = {0, 0, 0, 0, 0, 0};
    for (auto& h : heap) {
      V3 d = (*tree.pts)[h.second] - mean;
      m[0] += d.x * d.x; m[1] += d.x * d.y; m[2] += d.x * d.z;
      m[3] += d.y * d.y; m[4] += d.y * d.z; m[5] += d.z * d.z;
    }
    for (int j = 0; j < 6; j++) out[i].c[j] = m[j] * invk;
    out[i].c[0] += 1e-3; out[i].c[3] += 1e-3; out[i].c[5] += 1e-3;
  }
}

int main(int argc, char** argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 8192;
  int reps = argc > 2 ? std::atoi(argv[2]) : 10;
  const int iters = 10;          // icp_odometer.h:65
  const double max_d = 1.0;      // icp_odometer.h:63
  const int k_cov = 20;          // PCL GICP default correspondence_randomness

  double total_s = 0.0;
  double checksum = 0.0;
  for (int rep = 0; rep < reps; rep++) {
    std::vector<V3> target = make_scan(n, 1234 + static_cast<uint64_t>(rep), 0.0);
    std::vector<V3> source = make_scan(n, 99 + static_cast<uint64_t>(rep), 0.35);

    auto t0 = std::chrono::steady_clock::now();

    KdTree tt;
    tt.build(target);
    KdTree st;
    st.build(source);
    std::vector<Cov6> tcov, scov;
    compute_covariances(target, tt, k_cov, tcov);
    compute_covariances(source, st, k_cov, scov);

    Pose pose;
    pose_identity(pose);
    for (int it = 0; it < iters; it++) {
      double H[6][6] = {{0}};
      double g[6] = {0};
      for (int i = 0; i < n; i++) {
        V3 p = apply(pose, source[i]);
        double d2;
        int j = tt.nearest(p, &d2);
        if (j < 0 || d2 > max_d * max_d) continue;
        // fused covariance M = (Ct + R Cs Rᵀ)⁻¹ (plane-to-plane weight)
        M3 Cs = {{scov[i].c[0], scov[i].c[1], scov[i].c[2]},
                 {scov[i].c[1], scov[i].c[3], scov[i].c[4]},
                 {scov[i].c[2], scov[i].c[4], scov[i].c[5]}};
        M3 RC, RCRt, Csum, W;
        mat3_mul(pose.R, Cs, RC);
        M3 Rt;
        for (int a = 0; a < 3; a++)
          for (int b = 0; b < 3; b++) Rt[a][b] = pose.R[b][a];
        mat3_mul(RC, Rt, RCRt);
        Csum[0][0] = tcov[j].c[0] + RCRt[0][0]; Csum[0][1] = tcov[j].c[1] + RCRt[0][1]; Csum[0][2] = tcov[j].c[2] + RCRt[0][2];
        Csum[1][0] = Csum[0][1];                Csum[1][1] = tcov[j].c[3] + RCRt[1][1]; Csum[1][2] = tcov[j].c[4] + RCRt[1][2];
        Csum[2][0] = Csum[0][2];                Csum[2][1] = Csum[1][2];                Csum[2][2] = tcov[j].c[5] + RCRt[2][2];
        if (!mat3_inv(Csum, W)) continue;
        V3 r = p - target[j];
        // J = [I | -[p]x] for left-perturbation; accumulate JᵀWJ, JᵀWr
        double px = p.x, py = p.y, pz = p.z;
        double J[3][6] = {{1, 0, 0, 0, pz, -py},
                          {0, 1, 0, -pz, 0, px},
                          {0, 0, 1, py, -px, 0}};
        double WJ[3][6];
        for (int a = 0; a < 3; a++)
          for (int b = 0; b < 6; b++) {
            WJ[a][b] = 0;
            for (int c = 0; c < 3; c++) WJ[a][b] += W[a][c] * J[c][b];
          }
        double rv[3] = {r.x, r.y, r.z};
        for (int a = 0; a < 6; a++) {
          for (int b = 0; b < 6; b++) {
            double s = 0;
            for (int c = 0; c < 3; c++) s += J[c][a] * WJ[c][b];
            H[a][b] += s;
          }
          double s = 0;
          for (int c = 0; c < 3; c++) s += J[c][a] * (W[c][0] * rv[0] + W[c][1] * rv[1] + W[c][2] * rv[2]);
          g[a] -= s;
        }
      }
      for (int a = 0; a < 6; a++) H[a][a] += 1e-6;
      double xi[6];
      if (!solve66(H, g, xi)) break;
      pose_update(pose, xi);
      double step2 = 0;
      for (int a = 0; a < 6; a++) step2 += xi[a] * xi[a];
      if (step2 < 1e-12) break;  // transformation epsilon, icp_odometer.h:64
    }
    auto t1 = std::chrono::steady_clock::now();
    total_s += std::chrono::duration<double>(t1 - t0).count();
    checksum += pose.t.x;
  }

  double sps = static_cast<double>(reps) / total_s;
  // recovered x-translation should be ≈ -0.35 (sanity; not asserted hard)
  std::printf(
      "{\"metric\": \"reference_gicp_scans_per_sec\", \"value\": %.3f, "
      "\"unit\": \"scans/s (C++ kd-tree GICP, N=%d, 10 iters, 1 thread)\", "
      "\"recovered_tx\": %.4f}\n",
      sps, n, checksum / reps);
  return 0;
}

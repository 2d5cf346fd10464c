// gantts_tpu native host library.
//
// C++ twins of the per-sample / O(T^2) host-side hot paths whose reference
// equivalents are native code (SURVEY.md section 2.3): the SPTK MLSA
// synthesis filter (C), the WORLD synthesis inner loops (C++), the DTW
// aligner (the nnmnkwii front-end bottleneck), and the banded MLPG solver
// (bandmat/Cython in the reference stack).  Exposed with a plain C ABI and
// bound via ctypes (gantts_tpu/frontend/native.py); every function has a
// NumPy oracle in the Python modules it accelerates, and the test-suite
// checks them element-wise.
//
// Build: cmake -S cpp -B cpp/build && cmake --build cpp/build  (or make -C cpp)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MLSA synthesis filter (Pade(5) approximation of exp(F(z)); see
// gantts_tpu/frontend/sptk.py for the derivation and the oracle).
// ---------------------------------------------------------------------------

// One F(z) = sum_{m>=1} b_m Phi_m(z) stage: state d[0..M] + previous input.
struct WarpedStage {
  std::vector<double> d;
  double x_prev = 0.0;
};

static double stage_step(WarpedStage& s, const double* b, int order,
                         double alpha) {
  const double aa = 1.0 - alpha * alpha;
  std::vector<double>& d = s.d;
  double prev_old = d[1];
  double d_prev_new = aa * s.x_prev + alpha * prev_old;  // new d[1]
  double acc = b[1] * d_prev_new;
  double old_m_minus_1 = d[1];
  d[1] = d_prev_new;
  for (int m = 2; m <= order; ++m) {
    const double old_m = d[m];
    const double new_m = old_m_minus_1 + alpha * (old_m - d[m - 1]);
    acc += b[m] * new_m;
    old_m_minus_1 = old_m;
    d[m] = new_m;
  }
  return acc;
}

// excitation (n,) * exp(b0) gain applied inside; b_frames (T, order+1);
// coefficients switch every `hopsize` samples.  out (n,).
void mlsa_synthesis(const double* excitation, int64_t n,
                    const double* b_frames, int64_t T, int order,
                    double alpha, int hopsize, int pd, double* out) {
  // Pade coefficients A_l for exp, order pd (pd <= 8 supported).
  std::vector<double> pade(pd + 1);
  {
    auto fact = [](int k) { double r = 1; for (int i = 2; i <= k; ++i) r *= i; return r; };
    for (int l = 0; l <= pd; ++l)
      pade[l] = fact(2 * pd - l) * fact(pd) /
                (fact(2 * pd) * fact(l) * fact(pd - l));
  }
  std::vector<WarpedStage> stages(pd);
  for (auto& s : stages) s.d.assign(order + 1, 0.0);
  std::vector<double> v(pd + 1, 0.0);

  for (int64_t i = 0; i < n; ++i) {
    int64_t frame = i / hopsize;
    if (frame >= T) frame = T - 1;
    const double* b = b_frames + frame * (order + 1);
    const double x = excitation[i] * std::exp(b[0]);

    for (int l = 1; l <= pd; ++l) v[l] = stage_step(stages[l - 1], b, order, alpha);
    double u = x, y;
    for (int l = 1; l <= pd; ++l)
      u += (l % 2 == 1 ? pade[l] * v[l] : -pade[l] * v[l]);
    y = u;
    for (int l = 1; l <= pd; ++l) y += pade[l] * v[l];
    stages[0].x_prev = u;
    for (int l = 2; l <= pd; ++l) stages[l - 1].x_prev = v[l - 1];
    out[i] = y;
  }
}

// ---------------------------------------------------------------------------
// WORLD-style synthesis inner loops (oracle: frontend/world.py synthesize)
// ---------------------------------------------------------------------------

// Scatter-add `ir` (len m) into out at offset, clipped.
void ola_add(double* out, int64_t n, const double* ir, int64_t m,
             int64_t offset, double gain) {
  int64_t s = offset < 0 ? 0 : offset;
  int64_t e = offset + m;
  if (e > n) e = n;
  for (int64_t i = s; i < e; ++i) out[i] += gain * ir[i - offset];
}

// ---------------------------------------------------------------------------
// Exact DTW (oracle: gantts_tpu/preprocessing/alignment.py dtw_path)
// ---------------------------------------------------------------------------

// Fills path_x/path_y (caller-allocated, capacity tx+ty) and returns path
// length.  cost metric: Euclidean.
int64_t dtw_path(const double* x, int64_t tx, const double* y, int64_t ty,
                 int64_t dim, int32_t* path_x, int32_t* path_y) {
  std::vector<double> acc_prev(ty), acc_cur(ty);
  std::vector<int8_t> bp((size_t)tx * ty);
  auto dist = [&](int64_t i, int64_t j) {
    double s = 0.0;
    const double* a = x + i * dim;
    const double* b = y + j * dim;
    for (int64_t d = 0; d < dim; ++d) { const double df = a[d] - b[d]; s += df * df; }
    return std::sqrt(s);
  };
  acc_prev[0] = dist(0, 0);
  for (int64_t j = 1; j < ty; ++j) { acc_prev[j] = acc_prev[j - 1] + dist(0, j); bp[j] = 2; }
  for (int64_t i = 1; i < tx; ++i) {
    acc_cur[0] = acc_prev[0] + dist(i, 0);
    bp[i * ty] = 1;
    for (int64_t j = 1; j < ty; ++j) {
      const double diag = acc_prev[j - 1];
      const double up = acc_prev[j];
      const double left = acc_cur[j - 1];
      double best = diag; int8_t mv = 0;
      if (up < best) { best = up; mv = 1; }
      if (left < best) { best = left; mv = 2; }
      acc_cur[j] = best + dist(i, j);
      bp[i * ty + j] = mv;
    }
    std::swap(acc_prev, acc_cur);
  }
  // backtrack
  int64_t i = tx - 1, j = ty - 1, k = 0;
  std::vector<int32_t> rx, ry;
  rx.reserve(tx + ty); ry.reserve(tx + ty);
  rx.push_back((int32_t)i); ry.push_back((int32_t)j);
  while (i > 0 || j > 0) {
    const int8_t mv = bp[i * ty + j];
    if (mv == 0) { --i; --j; }
    else if (mv == 1) { --i; }
    else { --j; }
    rx.push_back((int32_t)i); ry.push_back((int32_t)j);
  }
  k = (int64_t)rx.size();
  for (int64_t p = 0; p < k; ++p) {
    path_x[p] = rx[k - 1 - p];
    path_y[p] = ry[k - 1 - p];
  }
  return k;
}

// ---------------------------------------------------------------------------
// Banded SPD solve for MLPG (oracle: core/windows.py mlpg / scipy
// solveh_banded).  ab: upper-banded storage (b+1, T) row-major;
// rhs: (T, k) row-major, solved in place.
// ---------------------------------------------------------------------------

int banded_cholesky_solve(double* ab, int64_t T, int bw, double* rhs,
                          int64_t k) {
  // Cholesky factorization of the banded SPD matrix: A = L L^T with L lower
  // banded (bandwidth bw).  ab[r*T + j] = A[j - bw + r, j] for the upper
  // storage; we convert to lower band l[r][i] = L[i + r, i], r=0..bw.
  std::vector<double> l((size_t)(bw + 1) * T, 0.0);
  auto A = [&](int64_t i, int64_t j) -> double {  // i <= j
    return ab[(bw + i - j) * T + j];
  };
  for (int64_t j = 0; j < T; ++j) {
    double s = A(j, j);
    for (int r = 1; r <= bw && j - r >= 0; ++r) {
      const double v = l[(size_t)r * T + (j - r)];
      s -= v * v;
    }
    if (s <= 0.0) return -1;
    const double djj = std::sqrt(s);
    l[j] = djj;
    for (int i = 1; i <= bw && j + i < T; ++i) {
      double t = A(j, j + i);
      for (int r = 1; r <= bw - i && j - r >= 0; ++r) {
        t -= l[(size_t)r * T + (j - r)] * l[(size_t)(r + i) * T + (j - r)];
      }
      l[(size_t)i * T + j] = t / djj;
    }
  }
  // solve L z = rhs, then L^T out = z (rhs is (T, k) row-major)
  for (int64_t i = 0; i < T; ++i) {
    for (int64_t c = 0; c < k; ++c) {
      double s = rhs[i * k + c];
      for (int r = 1; r <= bw && i - r >= 0; ++r)
        s -= l[(size_t)r * T + (i - r)] * rhs[(i - r) * k + c];
      rhs[i * k + c] = s / l[i];
    }
  }
  for (int64_t i = T - 1; i >= 0; --i) {
    for (int64_t c = 0; c < k; ++c) {
      double s = rhs[i * k + c];
      for (int r = 1; r <= bw && i + r < T; ++r)
        s -= l[(size_t)r * T + i] * rhs[(i + r) * k + c];
      rhs[i * k + c] = s / l[i];
    }
  }
  return 0;
}

}  // extern "C"

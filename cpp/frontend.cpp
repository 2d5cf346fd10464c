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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ABI version of this library's exported surface.  BUMP whenever any
// exported function's signature changes IN PLACE (a stale prebuilt .so
// would otherwise be called through a mismatched ctypes prototype —
// undefined behavior, typically SIGSEGV, instead of the clean NumPy
// fallback).  gantts_tpu/frontend/native.py refuses a library whose
// reported ABI differs from its expected value.
long long gantts_frontend_abi(void) { return 2; }

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

// ---------------------------------------------------------------------------
// WORLD-style synthesis engine (oracle: gantts_tpu/frontend/world.py
// synthesize).  Pulse-synchronous minimum-phase periodic component plus
// frame-OLA noise component; the caller supplies the windowed/scaled noise
// segments so the C++ and NumPy paths consume the identical random stream
// and agree sample-for-sample.
// ---------------------------------------------------------------------------

namespace {

// Iterative radix-2 complex FFT (n = power of two); inverse includes 1/n.
void fft_c(std::vector<double>& re, std::vector<double>& im, bool inverse) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  const double sgn = inverse ? 1.0 : -1.0;
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = sgn * 2.0 * M_PI / (double)len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double xr = re[b] * cr - im[b] * ci;
        const double xi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - xr; im[b] = im[a] - xi;
        re[a] += xr; im[a] += xi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
  if (inverse) {
    const double inv = 1.0 / (double)n;
    for (size_t i = 0; i < n; ++i) { re[i] *= inv; im[i] *= inv; }
  }
}

// Minimum-phase impulse response from a one-sided power spectrum
// (mirror of world.py _min_phase_ir).
struct MinPhase {
  std::vector<double> re, im;
  explicit MinPhase(int fft_size) : re(fft_size), im(fft_size) {}

  void compute(const double* ps, int n_bins, int fft_size, double* ir) {
    const int n = fft_size;
    // c = irfft(0.5*log(ps)): hermitian real spectrum -> real cepstrum
    for (int k = 0; k < n_bins; ++k) {
      const double v = 0.5 * std::log(ps[k] > 1e-300 ? ps[k] : 1e-300);
      re[k] = v; im[k] = 0.0;
      if (k > 0 && k < n_bins - 1) { re[n - k] = v; im[n - k] = 0.0; }
    }
    fft_c(re, im, /*inverse=*/true);
    // fold to minimum phase: c[1..n/2-1] *= 2, c[n/2+1..] = 0
    const int half = n / 2;
    for (int k = 1; k < half; ++k) re[k] *= 2.0;
    for (int k = half + 1; k < n; ++k) re[k] = 0.0;
    std::fill(im.begin(), im.end(), 0.0);
    // ir = irfft(exp(rfft(c_min)))
    fft_c(re, im, /*inverse=*/false);
    for (int k = 0; k < n; ++k) {
      const double m = std::exp(re[k]);
      re[k] = m * std::cos(im[k]);
      im[k] = m * std::sin(im[k]);
    }
    fft_c(re, im, /*inverse=*/true);
    for (int k = 0; k < n; ++k) ir[k] = re[k];
  }
};

}  // namespace

// Event-based WORLD-style synthesis (oracle: world.py synthesize NumPy
// body).  The event table and the noise stream are computed by the caller
// (world._synthesis_events) so both renderers consume identical inputs:
// sp/ap (T, n_bins); times (E,) fractional sample positions; voiced (E,)
// flags; f_at (E,) per-event F0; noffs/nlens (E,) noise segment layout;
// noise the concatenated unit-variance stream; hop in samples; out
// (N + 2*fft_size) zero-initialized by the caller.
extern "C" void world_synth_events(
    const double* sp, const double* ap, int64_t T, int64_t n_bins,
    const double* times, const uint8_t* voiced, const double* f_at,
    const int64_t* noffs, const int64_t* nlens, int64_t E,
    const double* noise, int64_t noise_len,
    double hop, double fs, double* out, int64_t N) {
  const int fft_size = (int)((n_bins - 1) * 2);
  const int64_t out_len = N + 2 * (int64_t)fft_size;
  const int64_t kPrePad = 64;  // world.py PULSE_PRE_PAD
  MinPhase mp(fft_size);
  std::vector<double> spec(n_bins), ir(fft_size), spe(n_bins), ape(n_bins);
  // scratch for the 2x-padded fractional shift and the FFT convolution
  const int pad2 = 2 * fft_size;
  std::vector<double> re2(pad2), im2(pad2), reB(pad2), imB(pad2);
  std::vector<double> shifted(pad2);

  // FFT convolution size for noise segments: next pow2 >= max_len+fft-1
  int64_t max_nlen = 0;
  for (int64_t e = 0; e < E; ++e)
    if (nlens[e] > max_nlen) max_nlen = nlens[e];
  int conv_n = 1;
  while (conv_n < max_nlen + fft_size - 1) conv_n <<= 1;
  std::vector<double> reC(conv_n), imC(conv_n), reD(conv_n), imD(conv_n);

  for (int64_t e = 0; e < E; ++e) {
    const double t = times[e];
    const double p = t / hop;
    int64_t i0 = (int64_t)p;           // Python int() truncation (p >= 0)
    if (i0 > T - 1) i0 = T - 1;
    int64_t i1 = i0 + 1 < T ? i0 + 1 : T - 1;
    double w = p - (double)i0;
    if (w < 0.0) w = 0.0;
    if (w > 1.0) w = 1.0;
    for (int64_t k = 0; k < n_bins; ++k) {
      spe[k] = (1.0 - w) * sp[i0 * n_bins + k] + w * sp[i1 * n_bins + k];
      ape[k] = (1.0 - w) * ap[i0 * n_bins + k] + w * ap[i1 * n_bins + k];
    }
    const int64_t start = (int64_t)std::floor(t);

    if (voiced[e]) {
      for (int64_t k = 0; k < n_bins; ++k)
        spec[k] = spe[k] * (1.0 - ape[k] * ape[k]);
      mp.compute(spec.data(), (int)n_bins, fft_size, ir.data());
      // exact fractional shift on the zero-padded 2x grid: the sinc
      // pre-ring of the sharp minimum-phase onset lands in the kPrePad
      // samples before the pulse (see world.py synthesize for rationale)
      const double frac = t - (double)start;
      std::fill(re2.begin(), re2.end(), 0.0);
      std::fill(im2.begin(), im2.end(), 0.0);
      std::copy(ir.begin(), ir.end(), re2.begin());
      fft_c(re2, im2, /*inverse=*/false);
      const double dly = (double)kPrePad + frac;
      for (int k = 0; k < pad2; ++k) {
        // exp(-2*pi*i*k'*dly/pad2) with the hermitian-consistent signed
        // frequency index (matches numpy rfft/irfft semantics for k<=N/2
        // and its conjugate mirror above)
        const int kk = k <= pad2 / 2 ? k : k - pad2;
        const double a = -2.0 * M_PI * (double)kk * dly / (double)pad2;
        const double wr = std::cos(a), wi = std::sin(a);
        const double nr = re2[k] * wr - im2[k] * wi;
        im2[k] = re2[k] * wi + im2[k] * wr;
        re2[k] = nr;
      }
      fft_c(re2, im2, /*inverse=*/true);
      for (int k = 0; k < pad2; ++k) shifted[k] = re2[k];
      ola_add(out, out_len, shifted.data(), pad2, start - kPrePad,
              std::sqrt(fs / f_at[e]));
    }

    const int64_t L = nlens[e];
    if (L > 0) {
      for (int64_t k = 0; k < n_bins; ++k)
        spec[k] = spe[k] * ape[k] * ape[k];
      mp.compute(spec.data(), (int)n_bins, fft_size, ir.data());
      // shaped = conv(noise[noff:noff+L], ir) via FFT (full length)
      std::fill(reC.begin(), reC.end(), 0.0);
      std::fill(imC.begin(), imC.end(), 0.0);
      std::fill(reD.begin(), reD.end(), 0.0);
      std::fill(imD.begin(), imD.end(), 0.0);
      const double* seg = noise + noffs[e];
      std::copy(seg, seg + L, reC.begin());
      std::copy(ir.begin(), ir.end(), reD.begin());
      fft_c(reC, imC, /*inverse=*/false);
      fft_c(reD, imD, /*inverse=*/false);
      for (int k = 0; k < conv_n; ++k) {
        const double nr = reC[k] * reD[k] - imC[k] * imD[k];
        imC[k] = reC[k] * imD[k] + imC[k] * reD[k];
        reC[k] = nr;
      }
      fft_c(reC, imC, /*inverse=*/true);
      // full convolution length L + fft_size - 1
      ola_add(out, out_len, reC.data(), L + fft_size - 1, start, 1.0);
    }
  }
}

// ---------------------------------------------------------------------------
// WORLD-style ANALYSIS engine (oracles: frontend/world.py _ncc_refine,
// _subharmonic_fix, cheaptrick, and the d4c band-NCC loop).  These are the
// per-frame Python loops that dominate feature-extraction wall-clock; the
// reference runs the same stage through pyworld's C++ (SURVEY.md §2.3).
// Estimators match the NumPy oracles to float64 rounding (summation order
// differs, so agreement is ~1e-12 relative, not bitwise).
// ---------------------------------------------------------------------------

namespace {

inline double dot_n(const double* a, const double* b, int64_t n) {
  double s = 0.0;
  for (int64_t i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

// seg = x[lo:hi] - mean(x[lo:hi]) into buf; returns length.
inline int64_t centered_segment(const double* x, int64_t n, int64_t lo,
                                int64_t hi, std::vector<double>& buf) {
  if (lo < 0) lo = 0;
  if (hi > n) hi = n;
  const int64_t len = hi > lo ? hi - lo : 0;
  buf.resize(len);
  double mean = 0.0;
  for (int64_t i = 0; i < len; ++i) mean += x[lo + i];
  if (len > 0) mean /= (double)len;
  for (int64_t i = 0; i < len; ++i) buf[i] = x[lo + i] - mean;
  return len;
}

// Normalized cross-correlation of seg with itself at `lag` (both halves
// energy-normalized) — the _subharmonic_fix / _ncc_refine inner product.
inline double ncc_at(const double* seg, int64_t len, int64_t lag) {
  if (lag < 2 || lag >= len - 1) return -1.0;
  const double* a = seg;
  const double* b = seg + lag;
  const int64_t m = len - lag;
  const double d = std::sqrt(std::max(1e-12, dot_n(a, a, m) * dot_n(b, b, m)));
  return dot_n(a, b, m) / d;
}

}  // namespace

extern "C" {

// Oracle: world.py _ncc_refine.  refined/peak_r are (T,) outputs; refined
// must be initialized to f0 by the caller (only updated in-range), peak_r
// zero-initialized.
void ncc_refine(const double* x, int64_t n, const double* f0,
                const double* tpos, int64_t T, double fs,
                double* refined, double* peak_r) {
  std::vector<double> seg, r;
  for (int64_t i = 0; i < T; ++i) {
    const double f = f0[i];
    if (f <= 0.0) continue;
    const double T0 = fs / f;
    const int64_t half = (int64_t)(2.0 * T0);
    const int64_t c = (int64_t)(tpos[i] * fs);  // Python int() truncation
    const int64_t len = centered_segment(x, n, c - half, c + half, seg);
    if (len < (int64_t)(1.5 * T0) + 2) continue;
    const int64_t lag_lo = std::max((int64_t)2, (int64_t)(T0 * 0.8));
    const int64_t lag_hi = std::min(len - 2, (int64_t)(T0 * 1.25));  // excl.
    const int64_t n_lags = lag_hi - lag_lo;
    if (n_lags < 3) continue;
    const double e0 = dot_n(seg.data(), seg.data(), len);
    if (e0 < 1e-12) continue;
    r.resize(n_lags);
    int64_t best = 0;
    for (int64_t k = 0; k < n_lags; ++k) {
      const int64_t lag = lag_lo + k;
      const int64_t m = len - lag;
      const double d = std::max(
          1e-12, std::sqrt(dot_n(seg.data(), seg.data(), m) *
                           dot_n(seg.data() + lag, seg.data() + lag, m)));
      r[k] = dot_n(seg.data(), seg.data() + lag, m) / d;
      if (r[k] > r[best]) best = k;  // first maximum, like np.argmax
    }
    peak_r[i] = r[best];
    double delta = 0.0;
    if (best > 0 && best < n_lags - 1) {
      const double y0 = r[best - 1], y1 = r[best], y2 = r[best + 1];
      const double denom = y0 - 2.0 * y1 + y2;
      if (std::fabs(denom) > 1e-12) delta = 0.5 * (y0 - y2) / denom;
    }
    const double best_lag = (double)(lag_lo + best) + delta;
    const double cand = fs / best_lag;
    if (0.7 * f < cand && cand < 1.4 * f) refined[i] = cand;
  }
}

// Oracle: world.py _coherence_gate_py.  out must be initialized to f0 by
// the caller; frames whose best NCC at the ~horizon_s lag falls below
// thresh are zeroed.  nearbyint matches Python round() (ties to even).
// When the horizon is period-clamped (low f0), the probe is band-limited
// to the first kCoherenceLpHarmonics harmonics and the support shortened —
// see the oracle docstring for the chirp-decorrelation rationale.
void coherence_gate(const double* x, int64_t n, const double* f0,
                    const double* tpos, int64_t T, double fs,
                    double horizon_s, double thresh, double tol,
                    double* out) {
  const double kCoherenceLpHarmonics = 10.0;  // world.py constant
  std::vector<double> seg, fir, flt;
  for (int64_t i = 0; i < T; ++i) {
    const double f = f0[i];
    if (f <= 0.0) continue;
    const double T0 = fs / f;
    const int64_t k_nat = (int64_t)std::nearbyint(horizon_s * fs / T0);
    const int64_t k = k_nat < 2 ? 2 : k_nat;
    const bool clamped = k_nat < 2;
    // NB: ((k + c) * T0), NOT (k*T0 + c*T0) — the oracle computes the sum
    // first and the two forms differ by 1 ulp, which flips the int()
    // truncation when (k + c) * T0 lands on an integer boundary.
    const int64_t half =
        (int64_t)(((double)k + (clamped ? 0.75 : 2.0)) * T0);
    const int64_t c = (int64_t)(tpos[i] * fs);  // Python int() truncation
    int64_t len = centered_segment(x, n, c - half, c + half, seg);
    if (clamped && len > 0) {
      // windowed-sinc low-pass at kCoherenceLpHarmonics * f, 'same' conv
      const double cutoff = kCoherenceLpHarmonics * f;
      const int64_t taps = ((int64_t)(fs / cutoff * 4.0)) | 1;
      fir.resize(taps);
      double hsum = 0.0;
      for (int64_t j = 0; j < taps; ++j) {
        const double nn = (double)(j - taps / 2);
        const double xx = 2.0 * cutoff / fs * nn;
        const double sinc = xx == 0.0 ? 1.0 : std::sin(M_PI * xx) / (M_PI * xx);
        const double m1 = taps > 1 ? (double)j / (double)(taps - 1) : 0.0;
        const double bw = 0.42 - 0.5 * std::cos(2.0 * M_PI * m1) +
                          0.08 * std::cos(4.0 * M_PI * m1);
        fir[j] = sinc * bw;
        hsum += fir[j];
      }
      for (int64_t j = 0; j < taps; ++j) fir[j] /= hsum;
      flt.assign(len, 0.0);
      const int64_t off = (taps - 1) / 2;  // 'same' alignment
      for (int64_t m = 0; m < len; ++m) {
        double acc = 0.0;
        for (int64_t j = 0; j < taps; ++j) {
          const int64_t src = m + off - j;
          if (src >= 0 && src < len) acc += seg[src] * fir[j];
        }
        flt[m] = acc;
      }
      seg.swap(flt);
    }
    const int64_t lag_lo =
        std::max((int64_t)2, (int64_t)((double)k * T0 * (1.0 - tol)));
    const int64_t lag_hi =
        std::min(len - 2, (int64_t)((double)k * T0 * (1.0 + tol)) + 1);
    if (lag_hi <= lag_lo) continue;  // window clipped by edge: keep frame
    double best = -1.0;
    for (int64_t lag = lag_lo; lag < lag_hi; ++lag)
      best = std::max(best, ncc_at(seg.data(), len, lag));
    if (best < thresh) out[i] = 0.0;
  }
}

// Oracle: world.py _subharmonic_fix.  out must be initialized to f0.
void subharmonic_fix(const double* x, int64_t n, const double* f0,
                     const double* tpos, int64_t T, double fs,
                     double f0_floor, int max_div, double improvement,
                     double* out) {
  std::vector<double> seg;
  for (int64_t i = 0; i < T; ++i) {
    const double f = f0[i];
    if (f <= 0.0) continue;
    int kmax = 0;
    for (int k = 2; k <= max_div; ++k)
      if (f / k >= f0_floor) kmax = k;
    if (kmax == 0) continue;
    const double T0max = fs / (f / kmax);
    const int64_t half = (int64_t)(1.2 * T0max);
    const int64_t c = (int64_t)(tpos[i] * fs);  // Python int() truncation
    const int64_t len = centered_segment(x, n, c - half, c + half, seg);
    const double r1 = ncc_at(seg.data(), len, (int64_t)std::nearbyint(fs / f));
    int best_k = 1;
    double best_r = r1;
    for (int k = 2; k <= max_div; ++k) {
      if (f / k < f0_floor) continue;
      const double rk = ncc_at(seg.data(), len, (int64_t)std::nearbyint(k * fs / f));
      if (rk > best_r) { best_k = k; best_r = rk; }
    }
    if (best_k > 1 && best_r > r1 + improvement && best_r > 0.5)
      out[i] = f / best_k;
  }
}

// Oracle: world.py cheaptrick (the per-frame loop).  sp out (T, n_bins) with
// n_bins = fft_size/2 + 1; fft_size a power of two.
void cheaptrick_frames(const double* x, int64_t n, const double* f0,
                       const double* tpos, int64_t T, double fs, double q1,
                       double f0_floor, int fft_size, int uv_clamp,
                       double* sp) {
  const int n_bins = fft_size / 2 + 1;
  std::vector<double> re(fft_size), im(fft_size), ps(n_bins), ext, cs;
  std::vector<double> cep(fft_size), lif(n_bins);
  const int kUvAvgSegments = 9;  // oracle: world.py UV_AVG_SEGMENTS
  // Per-frame voicing-run sample bounds for the unvoiced sub-window clamp
  // (oracle: world.py _uv_run_bounds — integer midpoints of
  // ties-to-even-rounded frame centers; +-inf sentinels at signal edges).
  const int64_t kBig = (int64_t)1 << 60;
  std::vector<int64_t> run_lo(T, -kBig), run_hi(T, kBig);
  {
    std::vector<int64_t> centers(T);
    for (int64_t i = 0; i < T; ++i)
      centers[i] = (int64_t)std::nearbyint(tpos[i] * fs);
    int64_t i = 0;
    while (i < T) {
      const bool vi = f0[i] > f0_floor / 2.0;
      int64_t j = i;
      while (j < T && (f0[j] > f0_floor / 2.0) == vi) ++j;
      for (int64_t k = i; k < j; ++k) {
        if (i > 0) run_lo[k] = (centers[i - 1] + centers[i]) / 2;
        if (j < T) run_hi[k] = (centers[j - 1] + centers[j]) / 2;
      }
      i = j;
    }
  }
  for (int64_t i = 0; i < T; ++i) {
    const bool voiced = f0[i] > f0_floor / 2.0;
    const double f = voiced ? f0[i] : 500.0;
    const double T0 = fs / f;
    const int64_t half = (int64_t)(1.5 * T0);
    const int64_t c = (int64_t)std::nearbyint(tpos[i] * fs);
    const int64_t L = 2 * half + 1;
    const double ang = L > 1 ? 2.0 * M_PI / (double)(L - 1) : 0.0;
    // Unvoiced frames Welch-average K sub-window periodograms spaced T0
    // apart (oracle: world.py cheaptrick; rationale documented there).
    const int K = voiced ? 1 : kUvAvgSegments;
    std::fill(ps.begin(), ps.end(), 0.0);
    for (int sub = 0; sub < K; ++sub) {
      int64_t off =
          (int64_t)std::nearbyint(((double)sub - (double)(K - 1) / 2.0) * T0);
      if (!voiced && uv_clamp) {
        // transition-aware placement (oracle: world.py cheaptrick): shift
        // a sub-window that would cross into an adjacent voiced run back
        // inside this unvoiced run
        const int64_t wlo = c - half + off;
        const int64_t whi = c + half + off;
        if (wlo < run_lo[i]) {
          off += std::max((int64_t)0,
                          std::min(run_lo[i] - wlo, run_hi[i] - whi));
        } else if (whi > run_hi[i]) {
          off -= std::max((int64_t)0,
                          std::min(whi - run_hi[i], wlo - run_lo[i]));
        }
      }
      // windowed, DC-removed segment straight into the FFT input.  The DC
      // sums run over the FULL window even if it exceeds fft_size (the
      // oracle subtracts first, then np.fft.rfft truncates).
      std::fill(re.begin(), re.end(), 0.0);
      std::fill(im.begin(), im.end(), 0.0);
      double wsum = 0.0, xsum = 0.0;
      for (int64_t j = 0; j < L; ++j) {
        const int64_t idx = c - half + off + j;
        const double s = (idx >= 0 && idx < n) ? x[idx] : 0.0;
        const double w = 0.5 - 0.5 * std::cos(ang * (double)j);
        if (j < fft_size) re[j] = s * w;
        wsum += w;
        xsum += s * w;
      }
      const double dc = xsum / std::max(wsum, 1e-12);
      for (int64_t j = 0; j < L && j < fft_size; ++j) {
        const double w = 0.5 - 0.5 * std::cos(ang * (double)j);
        re[j] -= w * dc;
      }
      fft_c(re, im, /*inverse=*/false);
      for (int k = 0; k < n_bins; ++k)
        ps[k] += re[k] * re[k] + im[k] * im[k];
    }
    if (K > 1)
      for (int k = 0; k < n_bins; ++k) ps[k] /= (double)K;
    // rectangular smoothing, width 2f/3 Hz (oracle _linear_smoothing)
    const double w_bins = (2.0 * f / 3.0) * (double)fft_size / fs;
    if (w_bins > 1.0) {
      const int k = (int)std::floor(w_bins / 2.0);
      ext.resize(n_bins + 2 * k);
      for (int j = 0; j < k; ++j) ext[j] = ps[k - j];          // ps[k:0:-1]
      std::copy(ps.begin(), ps.end(), ext.begin() + k);
      for (int j = 0; j < k; ++j)                               // mirrored tail
        ext[k + n_bins + j] = ps[n_bins - 2 - j];
      cs.resize(ext.size());
      double acc = 0.0;
      for (size_t j = 0; j < ext.size(); ++j) { acc += ext[j]; cs[j] = acc; }
      const double inv = 1.0 / (double)(2 * k + 1);
      for (int j = 0; j < n_bins; ++j)
        ps[j] = (cs[2 * k + j] - (j > 0 ? cs[j - 1] : 0.0)) * inv;
    }
    double mx = 1e-300;
    for (int j = 0; j < n_bins; ++j) mx = std::max(mx, ps[j]);
    const double floor_v = 1e-12 * mx;
    // cep = irfft(log(ps)): hermitian real spectrum -> real cepstrum
    for (int k = 0; k < n_bins; ++k) {
      const double v = std::log(std::max(ps[k], floor_v));
      re[k] = v; im[k] = 0.0;
      if (k > 0 && k < n_bins - 1) { re[fft_size - k] = v; im[fft_size - k] = 0.0; }
    }
    fft_c(re, im, /*inverse=*/true);
    for (int k = 0; k < fft_size; ++k) cep[k] = re[k];
    // liftering: sinc recovery of the rect smoothing + q1 compensation
    lif[0] = 1.0;
    for (int k = 1; k < n_bins; ++k) {
      const double quef = (double)k / fs * (double)fft_size;
      const double a = M_PI * f * quef / fs;
      const double lifter = std::sin(a) / a;
      const double comp =
          (1.0 - 2.0 * q1) + 2.0 * q1 * std::cos(2.0 * M_PI * quef * f / fs);
      lif[k] = lifter * comp;
    }
    // full = [lif, lif[1:-1] reversed]; sp = exp(Re(fft(cep * full)))
    for (int k = 0; k < n_bins; ++k) { re[k] = cep[k] * lif[k]; im[k] = 0.0; }
    for (int k = n_bins; k < fft_size; ++k) {
      re[k] = cep[k] * lif[fft_size - k];
      im[k] = 0.0;
    }
    fft_c(re, im, /*inverse=*/false);
    double* row = sp + i * n_bins;
    for (int k = 0; k < n_bins; ++k) row[k] = std::exp(re[k]);
  }
}

// Oracle: the per-frame band-NCC loop of world.py d4c.  band_sigs is
// (n_bands, n) row-major (band-passed copies of the signal); band_ap out
// (T, n_bands) must be pre-filled with 1 - 1e-12 by the caller.
// Oracle: world.py _band_ap_subcplx_py.  band_re/band_im are the analytic
// signals of the band-passed waveform, (n_bands, n) row-major; band_ap out
// (T, n_bands) pre-filled with 1 - 1e-12 by the caller.  Short sub-window
// complex-correlation magnitudes, energy-weighted (rationale in the oracle
// docstring).
void d4c_band_cplx(const double* band_re, const double* band_im,
                   int64_t n_bands, int64_t n, const double* f0,
                   const double* tpos, int64_t T, double fs,
                   double sub_periods, int n_sub, double* band_ap) {
  for (int64_t i = 0; i < T; ++i) {
    const double f = f0[i];
    if (f <= 0.0) continue;
    const double T0 = fs / f;
    const int64_t lag0 = (int64_t)std::nearbyint(T0);
    const int64_t srch =
        std::max((int64_t)1, (int64_t)std::nearbyint(0.03 * T0));
    const int64_t c = (int64_t)std::nearbyint(tpos[i] * fs);
    const int64_t subL = (int64_t)(sub_periods * T0);
    for (int64_t b = 0; b < n_bands; ++b) {
      const double* zr = band_re + b * n;
      const double* zi = band_im + b * n;
      double num = 0.0, den = 0.0;
      for (int s = 0; s < n_sub; ++s) {
        const double off = ((double)s - (double)(n_sub - 1) / 2.0) * T0;
        const int64_t s0 = (int64_t)((double)c + off - (double)subL / 2.0);
        const int64_t s1 = s0 + subL;
        if (s0 < 0 || s1 + lag0 + srch >= n) continue;
        const double* ar = zr + s0;
        const double* ai = zi + s0;
        const double ea = dot_n(ar, ar, subL) + dot_n(ai, ai, subL);
        if (ea < 1e-300) continue;
        double best = 0.0;
        for (int64_t lag = lag0 - srch; lag <= lag0 + srch; ++lag) {
          const double* br = zr + s0 + lag;
          const double* bi = zi + s0 + lag;
          const double eb = dot_n(br, br, subL) + dot_n(bi, bi, subL);
          const double cr = dot_n(ar, br, subL) + dot_n(ai, bi, subL);
          const double ci = dot_n(ar, bi, subL) - dot_n(ai, br, subL);
          const double d = std::sqrt(std::max(1e-300, ea * eb));
          best = std::max(best, std::sqrt(cr * cr + ci * ci) / d);
        }
        num += ea * best;
        den += ea;
      }
      if (den <= 0.0) continue;
      const double r = std::min(std::max(num / den, 0.0), 1.0 - 1e-12);
      band_ap[i * n_bands + b] = std::sqrt(std::max(1.0 - r, 1e-12));
    }
  }
}

}  // extern "C"

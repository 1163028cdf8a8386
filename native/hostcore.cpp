// hostcore — native host-side numerics for mpc_code_tpu.
//
// The reference's native layer lives in CasADi/IPOPT binaries (SURVEY.md
// §2.2); the TPU compute path here is JAX/XLA, and this library provides
// the native host-runtime pieces that sit OUTSIDE the accelerator: the
// doubling-algorithm DARE (steady-state Kalman gains, Riccati terminal
// weights — reference scipy.solve_discrete_are call sites Utilities.py:409,
// Estimator.py:217) and the MHE backward Riccati smoother covariance pass
// (reference Estimator.py:654-664), which runs between NLP solves on the
// host every MHE step.
//
// Plain C++17, no dependencies; dense row-major double matrices; small
// dimensions (n <= ~32). Exposed with C linkage for ctypes.
//
// Build: make -C native   (produces native/libhostcore.so)

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using Mat = std::vector<double>;

inline double &at(Mat &m, int rows, int cols, int r, int c) {
  (void)rows;
  return m[static_cast<size_t>(r) * cols + c];
}

// C = A * B  (ra x ca) * (ca x cb)
void matmul(const double *A, const double *B, double *C, int ra, int ca, int cb) {
  for (int i = 0; i < ra; ++i) {
    for (int j = 0; j < cb; ++j) {
      double acc = 0.0;
      for (int k = 0; k < ca; ++k) acc += A[i * ca + k] * B[k * cb + j];
      C[i * cb + j] = acc;
    }
  }
}

// C = A^T * B  (A: ra x ca used transposed -> ca x ra) * (ra x cb)
void matmul_tn(const double *A, const double *B, double *C, int ra, int ca, int cb) {
  for (int i = 0; i < ca; ++i) {
    for (int j = 0; j < cb; ++j) {
      double acc = 0.0;
      for (int k = 0; k < ra; ++k) acc += A[k * ca + i] * B[k * cb + j];
      C[i * cb + j] = acc;
    }
  }
}

// C = A * B^T  (ra x ca) * (cb x ca used transposed)
void matmul_nt(const double *A, const double *B, double *C, int ra, int ca, int cb) {
  for (int i = 0; i < ra; ++i) {
    for (int j = 0; j < cb; ++j) {
      double acc = 0.0;
      for (int k = 0; k < ca; ++k) acc += A[i * ca + k] * B[j * ca + k];
      C[i * cb + j] = acc;
    }
  }
}

// In-place Gauss-Jordan inverse with partial pivoting; returns false if
// numerically singular.
bool invert(double *M, int n) {
  Mat aug(static_cast<size_t>(n) * 2 * n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) aug[i * 2 * n + j] = M[i * n + j];
    aug[i * 2 * n + n + i] = 1.0;
  }
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(aug[col * 2 * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(aug[r * 2 * n + col]);
      if (v > best) { best = v; piv = r; }
    }
    if (best < 1e-300) return false;
    if (piv != col) {
      for (int j = 0; j < 2 * n; ++j)
        std::swap(aug[col * 2 * n + j], aug[piv * 2 * n + j]);
    }
    double d = aug[col * 2 * n + col];
    for (int j = 0; j < 2 * n; ++j) aug[col * 2 * n + j] /= d;
    for (int r = 0; r < n; ++r) {
      if (r == col) continue;
      double f = aug[r * 2 * n + col];
      if (f == 0.0) continue;
      for (int j = 0; j < 2 * n; ++j) aug[r * 2 * n + j] -= f * aug[col * 2 * n + j];
    }
  }
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) M[i * n + j] = aug[i * 2 * n + n + j];
  return true;
}

void symmetrize(double *M, int n) {
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) {
      double v = 0.5 * (M[i * n + j] + M[j * n + i]);
      M[i * n + j] = v;
      M[j * n + i] = v;
    }
}

}  // namespace

extern "C" {

// Solve A'PA - P - A'PB (B'PB + R)^{-1} B'PA + Q = 0 by the structure-
// preserving doubling algorithm (same recurrence as ops/dare.py).
// A: n*n, B: n*m, Q: n*n, R: m*m, P out: n*n.  Returns 0 on success.
int hc_dare(const double *A, const double *B, const double *Q, const double *R,
            int n, int m, int iters, double *P) {
  Mat Ak(A, A + n * n);
  Mat H(Q, Q + n * n);
  // G0 = B R^{-1} B'
  Mat Rinv(R, R + m * m);
  if (!invert(Rinv.data(), m)) return 1;
  Mat BRi(static_cast<size_t>(n) * m);
  matmul(B, Rinv.data(), BRi.data(), n, m, m);
  Mat G(static_cast<size_t>(n) * n);
  matmul_nt(BRi.data(), B, G.data(), n, m, n);

  Mat W(static_cast<size_t>(n) * n), WA(W.size()), WG(W.size());
  Mat T1(W.size()), T2(W.size());
  for (int it = 0; it < iters; ++it) {
    // W = I + G H
    matmul(G.data(), H.data(), W.data(), n, n, n);
    for (int i = 0; i < n; ++i) W[i * n + i] += 1.0;
    if (!invert(W.data(), n)) return 2;
    // WA = W^{-1} A ; WG = W^{-1} G
    matmul(W.data(), Ak.data(), WA.data(), n, n, n);
    matmul(W.data(), G.data(), WG.data(), n, n, n);
    // A_next = A W^{-1} A
    matmul(Ak.data(), WA.data(), T1.data(), n, n, n);
    // G_next = G + A (W^{-1} G) A'
    matmul(Ak.data(), WG.data(), T2.data(), n, n, n);
    Mat G_next(static_cast<size_t>(n) * n);
    matmul_nt(T2.data(), Ak.data(), G_next.data(), n, n, n);
    for (int i = 0; i < n * n; ++i) G_next[i] += G[i];
    // H_next = H + (W^{-1}A)' (H A)
    Mat HA(static_cast<size_t>(n) * n);
    matmul(H.data(), Ak.data(), HA.data(), n, n, n);
    Mat H_next(static_cast<size_t>(n) * n);
    matmul_tn(WA.data(), HA.data(), H_next.data(), n, n, n);
    for (int i = 0; i < n * n; ++i) H_next[i] += H[i];
    Ak.swap(T1);
    G = G_next;
    H = H_next;
    symmetrize(G.data(), n);
    symmetrize(H.data(), n);
  }
  std::memcpy(P, H.data(), sizeof(double) * n * n);
  symmetrize(P, n);
  return 0;
}

// Steady-state Kalman gain K = P C' (C P C' + R)^{-1} with P from the
// estimation DARE on (A', C') — reference Estimator.py:213-223.
// A: n*n, C: p*n, Q: n*n, R: p*p, K out: n*p.
int hc_kalman_gain(const double *A, const double *C, const double *Q,
                   const double *R, int n, int p, int iters, double *K) {
  // transpose A and C for the estimation DARE
  Mat At(static_cast<size_t>(n) * n), Ct(static_cast<size_t>(n) * p);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) At[i * n + j] = A[j * n + i];
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < p; ++j) Ct[i * p + j] = C[j * n + i];
  Mat P(static_cast<size_t>(n) * n);
  int rc = hc_dare(At.data(), Ct.data(), Q, R, n, p, iters, P.data());
  if (rc) return rc;
  // S = C P C' + R
  Mat CP(static_cast<size_t>(p) * n);
  matmul(C, P.data(), CP.data(), p, n, n);
  Mat S(static_cast<size_t>(p) * p);
  matmul_nt(CP.data(), C, S.data(), p, n, p);
  for (int i = 0; i < p * p; ++i) S[i] += R[i];
  if (!invert(S.data(), p)) return 3;
  // K = P C' S^{-1}
  Mat PCt(static_cast<size_t>(n) * p);
  matmul_nt(P.data(), C, PCt.data(), n, n, p);
  matmul(PCt.data(), S.data(), K, n, p, p);
  return 0;
}

// Backward Riccati smoother for the MHE prior update (Estimator.py:654-664):
//   Pis[N-1] = Pc[N-1]
//   Pis[i] = Pc[i] + Pc[i] A[i]' Pinv (Pis[i+1] - P[i+1]) Pinv A[i] Pc[i],
//            Pinv = P[i+1]^{-1}
// bigP, bigPc, bigA: N stacked n*n row-major matrices. Pis out: N stacked.
int hc_riccati_smoother(const double *bigP, const double *bigPc,
                        const double *bigA, int n, int N, double *Pis) {
  const size_t nn = static_cast<size_t>(n) * n;
  std::memcpy(Pis + (N - 1) * nn, bigPc + (N - 1) * nn, sizeof(double) * nn);
  Mat Pinv(nn), T1(nn), T2(nn), T3(nn), D(nn);
  for (int i = N - 2; i >= 0; --i) {
    std::memcpy(Pinv.data(), bigP + (i + 1) * nn, sizeof(double) * nn);
    if (!invert(Pinv.data(), n)) return 1;
    for (size_t k = 0; k < nn; ++k)
      D[k] = Pis[(i + 1) * nn + k] - bigP[(i + 1) * nn + k];
    // T1 = Pc[i] A[i]' Pinv
    matmul_nt(bigPc + i * nn, bigA + i * nn, T2.data(), n, n, n);  // Pc A'
    matmul(T2.data(), Pinv.data(), T1.data(), n, n, n);
    // T3 = T1 D Pinv A Pc
    matmul(T1.data(), D.data(), T2.data(), n, n, n);
    matmul(T2.data(), Pinv.data(), T3.data(), n, n, n);
    matmul(T3.data(), bigA + i * nn, T2.data(), n, n, n);
    matmul(T2.data(), bigPc + i * nn, T3.data(), n, n, n);
    for (size_t k = 0; k < nn; ++k)
      Pis[i * nn + k] = bigPc[i * nn + k] + T3[k];
    symmetrize(Pis + i * nn, n);
  }
  return 0;
}

}  // extern "C"

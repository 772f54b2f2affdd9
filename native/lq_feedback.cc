// Native single-core LQ feedback-Nash kernel.
//
// An independent C++ implementation of the coupled Riccati recursion for
// time-varying finite-horizon LQ games (Basar & Olsder, Corollary 6.1),
// written from the math (same algorithm family as the reference's
// src/lq_feedback_solver.cpp but a fresh implementation on plain C arrays:
// no Eigen, partial-pivot LU instead of Householder QR). Used as a
// cross-language test oracle for the JAX scan kernel and as a zero-latency
// single-instance CPU fallback in the runtime.
//
// All matrices are row-major float32. Player controls are padded to umax;
// `udims` gives the real dimension per player. Padded control rows/cols
// carry an identity diagonal in the coupling matrix (zero RHS), so padded
// gains come out exactly zero — mirroring the dense/padded convention of
// ilqgames_tpu.solver.lq_feedback.
//
// Exported C ABI:
//   solve_lq_feedback(N, P, xdim, umax, udims[P],
//                     A[N*xdim*xdim], Bs[N*P*xdim*umax],
//                     Q[N*P*xdim*xdim], l[N*P*xdim],
//                     R[N*P*P*umax*umax], r[N*P*P*umax],
//                     x0[xdim], adaptive_regularization,
//                     out_Ps[N*P*umax*xdim], out_alphas[N*P*umax],
//                     out_dxs[N*xdim]) -> 0 on success

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Solve M x = b for `cols` right-hand sides, in place. M is n x n
// row-major; rhs is n x cols row-major. Partial-pivot Gaussian
// elimination — n <= P*umax is tiny (<= ~16), so this is cache-resident.
bool lu_solve(std::vector<float>& M, std::vector<float>& rhs, int n,
              int cols) {
  for (int k = 0; k < n; ++k) {
    int piv = k;
    float best = std::fabs(M[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      const float v = std::fabs(M[i * n + k]);
      if (v > best) {
        best = v;
        piv = i;
      }
    }
    if (best < 1e-20f) return false;
    if (piv != k) {
      for (int j = 0; j < n; ++j) std::swap(M[k * n + j], M[piv * n + j]);
      for (int j = 0; j < cols; ++j)
        std::swap(rhs[k * cols + j], rhs[piv * cols + j]);
    }
    const float inv = 1.0f / M[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const float f = M[i * n + k] * inv;
      if (f == 0.0f) continue;
      for (int j = k; j < n; ++j) M[i * n + j] -= f * M[k * n + j];
      for (int j = 0; j < cols; ++j)
        rhs[i * cols + j] -= f * rhs[k * cols + j];
    }
  }
  for (int k = n - 1; k >= 0; --k) {
    const float inv = 1.0f / M[k * n + k];
    for (int j = 0; j < cols; ++j) {
      float acc = rhs[k * cols + j];
      for (int i = k + 1; i < n; ++i)
        acc -= M[k * n + i] * rhs[i * cols + j];
      rhs[k * cols + j] = acc * inv;
    }
  }
  return true;
}

}  // namespace

extern "C" {

int solve_lq_feedback(int N, int P, int xdim, int umax, const int* udims,
                      const float* A, const float* Bs, const float* Q,
                      const float* l, const float* R, const float* r,
                      const float* x0, int adaptive_regularization,
                      float* out_Ps, float* out_alphas, float* out_dxs) {
  const int nu = P * umax;
  const int cols = xdim + 1;  // [gains | affine]

  // Value function terms per player: Z [P, xdim, xdim], zeta [P, xdim],
  // initialized from the terminal quadraticization.
  std::vector<float> Z(P * xdim * xdim), zeta(P * xdim);
  std::memcpy(Z.data(), Q + (size_t)(N - 1) * P * xdim * xdim,
              sizeof(float) * Z.size());
  std::memcpy(zeta.data(), l + (size_t)(N - 1) * P * xdim,
              sizeof(float) * zeta.size());

  std::memset(out_Ps, 0, sizeof(float) * (size_t)N * P * umax * xdim);
  std::memset(out_alphas, 0, sizeof(float) * (size_t)N * P * umax);

  std::vector<float> S(nu * nu), Y(nu * cols);
  std::vector<float> BiZ(P * umax * xdim);
  std::vector<float> F(xdim * xdim), beta(xdim);
  std::vector<float> Znew(P * xdim * xdim), zetanew(P * xdim);
  // Incoming (k+1) value terms per stage, for the forward pass.
  std::vector<float> Zhist((size_t)(N - 1) * P * xdim * xdim);
  std::vector<float> zhist((size_t)(N - 1) * P * xdim);

  for (int k = N - 2; k >= 0; --k) {
    const float* Ak = A + (size_t)k * xdim * xdim;
    const float* Bk = Bs + (size_t)k * P * xdim * umax;
    const float* Qk = Q + (size_t)k * P * xdim * xdim;
    const float* lk = l + (size_t)k * P * xdim;
    const float* Rk = R + (size_t)k * P * P * umax * umax;
    const float* rk = r + (size_t)k * P * P * umax;

    std::memcpy(Zhist.data() + (size_t)k * P * xdim * xdim, Z.data(),
                sizeof(float) * Z.size());
    std::memcpy(zhist.data() + (size_t)k * P * xdim, zeta.data(),
                sizeof(float) * zeta.size());

    // BiZ[i] = B_i^T Z_i : [umax, xdim]
    for (int i = 0; i < P; ++i) {
      const float* Bi = Bk + (size_t)i * xdim * umax;
      const float* Zi = Z.data() + (size_t)i * xdim * xdim;
      float* out = BiZ.data() + (size_t)i * umax * xdim;
      for (int u = 0; u < umax; ++u)
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int x = 0; x < xdim; ++x)
            acc += Bi[x * umax + u] * Zi[x * xdim + y];
          out[u * xdim + y] = acc;
        }
    }

    // S blocks: S[(i,u),(j,v)] = (B_i^T Z_i B_j)[u,v] (+ R_ii on diagonal
    // blocks, identity on padded entries).
    std::fill(S.begin(), S.end(), 0.0f);
    for (int i = 0; i < P; ++i) {
      const float* bz = BiZ.data() + (size_t)i * umax * xdim;
      for (int j = 0; j < P; ++j) {
        const float* Bj = Bk + (size_t)j * xdim * umax;
        for (int u = 0; u < umax; ++u)
          for (int v = 0; v < umax; ++v) {
            float acc = 0.0f;
            for (int x = 0; x < xdim; ++x)
              acc += bz[u * xdim + x] * Bj[x * umax + v];
            S[(i * umax + u) * nu + (j * umax + v)] = acc;
          }
      }
      const float* Rii = Rk + ((size_t)i * P + i) * umax * umax;
      for (int u = 0; u < umax; ++u)
        for (int v = 0; v < umax; ++v)
          S[(i * umax + u) * nu + (i * umax + v)] += Rii[u * umax + v];
      for (int u = udims[i]; u < umax; ++u)
        S[(i * umax + u) * nu + (i * umax + u)] += 1.0f;
    }

    if (adaptive_regularization) {
      // Gershgorin column-circle shift: ensure min eigenvalue >= 1e-3
      // (reference semantics, src/lq_feedback_solver.cpp:163-176).
      for (int c = 0; c < nu; ++c) {
        float diag = S[c * nu + c];
        float radius = 0.0f;
        for (int rrow = 0; rrow < nu; ++rrow)
          if (rrow != c) radius += std::fabs(S[rrow * nu + c]);
        if (diag - radius < 1e-3f) S[c * nu + c] += radius + 1e-3f;
      }
    }

    // RHS: [B_i^T Z_i A | B_i^T zeta_i + r_ii]
    for (int i = 0; i < P; ++i) {
      const float* bz = BiZ.data() + (size_t)i * umax * xdim;
      const float* Bi = Bk + (size_t)i * xdim * umax;
      const float* zi = zeta.data() + (size_t)i * xdim;
      const float* rii = rk + ((size_t)i * P + i) * umax;
      for (int u = 0; u < umax; ++u) {
        float* row = Y.data() + (size_t)(i * umax + u) * cols;
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int x = 0; x < xdim; ++x)
            acc += bz[u * xdim + x] * Ak[x * xdim + y];
          row[y] = acc;
        }
        float acc = rii[u];
        for (int x = 0; x < xdim; ++x) acc += Bi[x * umax + u] * zi[x];
        row[xdim] = acc;
      }
      for (int u = udims[i]; u < umax; ++u)
        std::memset(Y.data() + (size_t)(i * umax + u) * cols, 0,
                    sizeof(float) * cols);
    }

    if (!lu_solve(S, Y, nu, cols)) return 1;

    float* Pk_out = out_Ps + (size_t)k * P * umax * xdim;
    float* a_out = out_alphas + (size_t)k * P * umax;
    for (int i = 0; i < P; ++i)
      for (int u = 0; u < umax; ++u) {
        const float* row = Y.data() + (size_t)(i * umax + u) * cols;
        std::memcpy(Pk_out + ((size_t)i * umax + u) * xdim, row,
                    sizeof(float) * xdim);
        a_out[i * umax + u] = row[xdim];
      }

    // F = A - sum_i B_i P_i ; beta = -sum_i B_i alpha_i
    std::memcpy(F.data(), Ak, sizeof(float) * xdim * xdim);
    std::fill(beta.begin(), beta.end(), 0.0f);
    for (int i = 0; i < P; ++i) {
      const float* Bi = Bk + (size_t)i * xdim * umax;
      const float* Pi = Pk_out + (size_t)i * umax * xdim;
      const float* ai = a_out + (size_t)i * umax;
      for (int x = 0; x < xdim; ++x) {
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int u = 0; u < umax; ++u)
            acc += Bi[x * umax + u] * Pi[u * xdim + y];
          F[x * xdim + y] -= acc;
        }
        float acc = 0.0f;
        for (int u = 0; u < umax; ++u) acc += Bi[x * umax + u] * ai[u];
        beta[x] -= acc;
      }
    }

    // Value updates:
    //   zeta_i <- F^T (zeta_i + Z_i beta) + l_i + sum_j P_j^T (R_ij a_j - r_ij)
    //   Z_i    <- F^T Z_i F + Q_i + sum_j P_j^T R_ij P_j
    for (int i = 0; i < P; ++i) {
      const float* Zi = Z.data() + (size_t)i * xdim * xdim;
      const float* zi = zeta.data() + (size_t)i * xdim;
      float* Zn = Znew.data() + (size_t)i * xdim * xdim;
      float* zn = zetanew.data() + (size_t)i * xdim;

      // tmp = zeta_i + Z_i beta
      std::vector<float> tmp(xdim);
      for (int x = 0; x < xdim; ++x) {
        float acc = zi[x];
        for (int y = 0; y < xdim; ++y) acc += Zi[x * xdim + y] * beta[y];
        tmp[x] = acc;
      }
      for (int y = 0; y < xdim; ++y) {
        float acc = lk[(size_t)i * xdim + y];
        for (int x = 0; x < xdim; ++x) acc += F[x * xdim + y] * tmp[x];
        zn[y] = acc;
      }
      // ZF = Z_i F ; Zn = F^T ZF + Q_i
      std::vector<float> ZF(xdim * xdim);
      for (int x = 0; x < xdim; ++x)
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int z2 = 0; z2 < xdim; ++z2)
            acc += Zi[x * xdim + z2] * F[z2 * xdim + y];
          ZF[x * xdim + y] = acc;
        }
      const float* Qi = Qk + (size_t)i * xdim * xdim;
      for (int x = 0; x < xdim; ++x)
        for (int y = 0; y < xdim; ++y) {
          float acc = Qi[x * xdim + y];
          for (int z2 = 0; z2 < xdim; ++z2)
            acc += F[z2 * xdim + x] * ZF[z2 * xdim + y];
          Zn[x * xdim + y] = acc;
        }

      // Cross-control terms.
      for (int j = 0; j < P; ++j) {
        const float* Rij = Rk + ((size_t)i * P + j) * umax * umax;
        const float* rij = rk + ((size_t)i * P + j) * umax;
        const float* Pj = Pk_out + (size_t)j * umax * xdim;
        const float* aj = a_out + (size_t)j * umax;
        // w = R_ij a_j - r_ij ; zn += P_j^T w
        for (int u = 0; u < umax; ++u) {
          float w = -rij[u];
          for (int v = 0; v < umax; ++v) w += Rij[u * umax + v] * aj[v];
          for (int y = 0; y < xdim; ++y) zn[y] += Pj[u * xdim + y] * w;
        }
        // M = R_ij P_j ; Zn += P_j^T M
        for (int u = 0; u < umax; ++u) {
          for (int y = 0; y < xdim; ++y) {
            float acc = 0.0f;
            for (int v = 0; v < umax; ++v)
              acc += Rij[u * umax + v] * Pj[v * xdim + y];
            // accumulate P_j^T (row u) outer
            for (int x = 0; x < xdim; ++x)
              Zn[x * xdim + y] += Pj[u * xdim + x] * acc;
          }
        }
      }
    }
    Z.swap(Znew);
    zeta.swap(zetanew);
  }

  // Forward pass: delta_x trajectory under the closed loop.
  std::vector<float> dx(x0, x0 + xdim), dnext(xdim);
  for (int k = 0; k < N - 1; ++k) {
    std::memcpy(out_dxs + (size_t)k * xdim, dx.data(),
                sizeof(float) * xdim);
    const float* Ak = A + (size_t)k * xdim * xdim;
    const float* Bk = Bs + (size_t)k * P * xdim * umax;
    const float* ak = out_alphas + (size_t)k * P * umax;
    for (int x = 0; x < xdim; ++x) {
      float acc = 0.0f;
      for (int y = 0; y < xdim; ++y) acc += Ak[x * xdim + y] * dx[y];
      for (int i = 0; i < P; ++i) {
        const float* Bi = Bk + (size_t)i * xdim * umax;
        for (int u = 0; u < umax; ++u)
          acc -= Bi[x * umax + u] * ak[(size_t)i * umax + u];
      }
      dnext[x] = acc;
    }
    dx.swap(dnext);
  }
  std::memcpy(out_dxs + (size_t)(N - 1) * xdim, dx.data(),
              sizeof(float) * xdim);
  return 0;
}

// Open-loop LQ Nash (Lambda recursion; same algorithm family as the
// reference's src/lq_open_loop_solver.cpp:110-194, fresh implementation
// from the math on plain C arrays). Strategies come back as affine terms
// only (alpha = -u*, P == 0 by convention), matching
// ilqgames_tpu.solver.lq_open_loop.
//
// Exported C ABI:
//   solve_lq_open_loop(N, P, xdim, umax, udims[P],
//                      A[N*xdim*xdim], Bs[N*P*xdim*umax],
//                      Q[N*P*xdim*xdim], l[N*P*xdim],
//                      R[N*P*P*umax*umax], r[N*P*P*umax],
//                      x0[xdim],
//                      out_alphas[N*P*umax], out_dxs[N*xdim],
//                      out_costates[N*P*xdim]) -> 0 on success
int solve_lq_open_loop(int N, int P, int xdim, int umax, const int* udims,
                       const float* A, const float* Bs, const float* Q,
                       const float* l, const float* R, const float* r,
                       const float* x0, float* out_alphas, float* out_dxs,
                       float* out_costates) {
  const int ns = N - 1;

  // Value terms per player at k+1: M [P, xdim, xdim], m [P, xdim].
  std::vector<float> M(P * xdim * xdim), m(P * xdim);
  std::memcpy(M.data(), Q + (size_t)(N - 1) * P * xdim * xdim,
              sizeof(float) * M.size());
  std::memcpy(m.data(), l + (size_t)(N - 1) * P * xdim,
              sizeof(float) * m.size());

  std::memset(out_alphas, 0, sizeof(float) * (size_t)N * P * umax);
  std::memset(out_costates, 0, sizeof(float) * (size_t)N * P * xdim);

  // Per-stage history for the forward pass.
  std::vector<float> hist_wB((size_t)ns * P * umax * xdim);
  std::vector<float> hist_wr((size_t)ns * P * umax);
  std::vector<float> hist_Lam((size_t)ns * xdim * xdim);
  std::vector<float> hist_inter((size_t)ns * xdim);
  std::vector<float> hist_M((size_t)ns * P * xdim * xdim);
  std::vector<float> hist_m((size_t)ns * P * xdim);

  std::vector<float> Mnew(P * xdim * xdim), mnew(P * xdim);

  for (int k = ns - 1; k >= 0; --k) {
    const float* Ak = A + (size_t)k * xdim * xdim;
    const float* Bk = Bs + (size_t)k * P * xdim * umax;
    const float* Qk = Q + (size_t)k * P * xdim * xdim;
    const float* lk = l + (size_t)k * P * xdim;
    const float* Rk = R + (size_t)k * P * P * umax * umax;
    const float* rk = r + (size_t)k * P * P * umax;

    std::memcpy(hist_M.data() + (size_t)k * P * xdim * xdim, M.data(),
                sizeof(float) * M.size());
    std::memcpy(hist_m.data() + (size_t)k * P * xdim, m.data(),
                sizeof(float) * m.size());

    float* wB = hist_wB.data() + (size_t)k * P * umax * xdim;
    float* wr = hist_wr.data() + (size_t)k * P * umax;
    float* Lam = hist_Lam.data() + (size_t)k * xdim * xdim;
    float* inter = hist_inter.data() + (size_t)k * xdim;

    // warped_B_i = R_ii^{-1} B_i^T, warped_r_i = R_ii^{-1} r_ii
    // (padded diagonal gets identity so the solve stays well-posed).
    for (int i = 0; i < P; ++i) {
      std::vector<float> Rii(umax * umax);
      std::memcpy(Rii.data(), Rk + ((size_t)i * P + i) * umax * umax,
                  sizeof(float) * Rii.size());
      for (int u = udims[i]; u < umax; ++u) Rii[u * umax + u] += 1.0f;
      const float* Bi = Bk + (size_t)i * xdim * umax;
      // rhs = [B_i^T | r_ii] : umax x (xdim + 1)
      std::vector<float> rhs(umax * (xdim + 1));
      for (int u = 0; u < umax; ++u) {
        for (int x = 0; x < xdim; ++x)
          rhs[u * (xdim + 1) + x] = Bi[x * umax + u];
        rhs[u * (xdim + 1) + xdim] = rk[((size_t)i * P + i) * umax + u];
      }
      if (!lu_solve(Rii, rhs, umax, xdim + 1)) return 1;
      for (int u = 0; u < umax; ++u) {
        std::memcpy(wB + ((size_t)i * umax + u) * xdim,
                    rhs.data() + (size_t)u * (xdim + 1),
                    sizeof(float) * xdim);
        wr[(size_t)i * umax + u] = rhs[u * (xdim + 1) + xdim];
      }
    }

    // Lambda = I + sum_i B_i warped_B_i M_i ;
    // inter = -sum_i B_i (warped_B_i m_i + warped_r_i)
    for (int x = 0; x < xdim; ++x)
      for (int y = 0; y < xdim; ++y)
        Lam[x * xdim + y] = (x == y) ? 1.0f : 0.0f;
    std::memset(inter, 0, sizeof(float) * xdim);
    for (int i = 0; i < P; ++i) {
      const float* Bi = Bk + (size_t)i * xdim * umax;
      const float* wBi = wB + (size_t)i * umax * xdim;
      const float* Mi = M.data() + (size_t)i * xdim * xdim;
      const float* mi = m.data() + (size_t)i * xdim;
      // wBM = warped_B_i M_i : [umax, xdim]; wbm = warped_B_i m_i : [umax]
      std::vector<float> wBM(umax * xdim);
      std::vector<float> wbm(umax);
      for (int u = 0; u < umax; ++u) {
        float accm = 0.0f;
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int x = 0; x < xdim; ++x)
            acc += wBi[u * xdim + x] * Mi[x * xdim + y];
          wBM[u * xdim + y] = acc;
        }
        for (int x = 0; x < xdim; ++x) accm += wBi[u * xdim + x] * mi[x];
        wbm[u] = accm;
      }
      for (int x = 0; x < xdim; ++x) {
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int u = 0; u < umax; ++u)
            acc += Bi[x * umax + u] * wBM[u * xdim + y];
          Lam[x * xdim + y] += acc;
        }
        float acc = 0.0f;
        for (int u = 0; u < umax; ++u)
          acc += Bi[x * umax + u] * (wbm[u] + wr[(size_t)i * umax + u]);
        inter[x] -= acc;
      }
    }

    // Solve Lam * [LamA | Lami] = [A | inter].
    std::vector<float> Lcopy(Lam, Lam + xdim * xdim);
    std::vector<float> rhs(xdim * (xdim + 1));
    for (int x = 0; x < xdim; ++x) {
      for (int y = 0; y < xdim; ++y)
        rhs[x * (xdim + 1) + y] = Ak[x * xdim + y];
      rhs[x * (xdim + 1) + xdim] = inter[x];
    }
    if (!lu_solve(Lcopy, rhs, xdim, xdim + 1)) return 2;

    // M_i <- Q_i + A^T M_i LamA ; m_i <- l_i + A^T (m_i + M_i Lami)
    for (int i = 0; i < P; ++i) {
      const float* Mi = M.data() + (size_t)i * xdim * xdim;
      const float* mi = m.data() + (size_t)i * xdim;
      float* Mn = Mnew.data() + (size_t)i * xdim * xdim;
      float* mn = mnew.data() + (size_t)i * xdim;
      // MLamA = M_i * LamA ; Mlami = M_i * Lami
      std::vector<float> MLamA(xdim * xdim), Mlami(xdim);
      for (int x = 0; x < xdim; ++x) {
        float accv = 0.0f;
        for (int y = 0; y < xdim; ++y) {
          float acc = 0.0f;
          for (int z2 = 0; z2 < xdim; ++z2)
            acc += Mi[x * xdim + z2] * rhs[z2 * (xdim + 1) + y];
          MLamA[x * xdim + y] = acc;
        }
        for (int z2 = 0; z2 < xdim; ++z2)
          accv += Mi[x * xdim + z2] * rhs[z2 * (xdim + 1) + xdim];
        Mlami[x] = accv;
      }
      const float* Qi = Qk + (size_t)i * xdim * xdim;
      for (int x = 0; x < xdim; ++x)
        for (int y = 0; y < xdim; ++y) {
          float acc = Qi[x * xdim + y];
          for (int z2 = 0; z2 < xdim; ++z2)
            acc += Ak[z2 * xdim + x] * MLamA[z2 * xdim + y];
          Mn[x * xdim + y] = acc;
        }
      for (int y = 0; y < xdim; ++y) {
        float acc = lk[(size_t)i * xdim + y];
        for (int z2 = 0; z2 < xdim; ++z2)
          acc += Ak[z2 * xdim + y] * (mi[z2] + Mlami[z2]);
        mn[y] = acc;
      }
    }
    M.swap(Mnew);
    m.swap(mnew);
  }

  // Forward pass.
  std::vector<float> dx(x0, x0 + xdim), dnext(xdim);
  for (int k = 0; k < ns; ++k) {
    std::memcpy(out_dxs + (size_t)k * xdim, dx.data(),
                sizeof(float) * xdim);
    const float* Ak = A + (size_t)k * xdim * xdim;
    const float* Lam = hist_Lam.data() + (size_t)k * xdim * xdim;
    const float* inter = hist_inter.data() + (size_t)k * xdim;
    const float* wB = hist_wB.data() + (size_t)k * P * umax * xdim;
    const float* wr = hist_wr.data() + (size_t)k * P * umax;
    const float* Mk = hist_M.data() + (size_t)k * P * xdim * xdim;
    const float* mk = hist_m.data() + (size_t)k * P * xdim;

    // x_next = Lam^{-1} (A x + inter)
    std::vector<float> Lcopy(Lam, Lam + xdim * xdim);
    std::vector<float> rhs(xdim);
    for (int x = 0; x < xdim; ++x) {
      float acc = inter[x];
      for (int y = 0; y < xdim; ++y) acc += Ak[x * xdim + y] * dx[y];
      rhs[x] = acc;
    }
    if (!lu_solve(Lcopy, rhs, xdim, 1)) return 3;
    std::memcpy(dnext.data(), rhs.data(), sizeof(float) * xdim);

    // inner_i = M_i x_next + m_i ; alpha_i = wB_i inner_i + wr_i ;
    // costate_i = A^T inner_i
    for (int i = 0; i < P; ++i) {
      const float* Mi = Mk + (size_t)i * xdim * xdim;
      const float* mi = mk + (size_t)i * xdim;
      std::vector<float> inner(xdim);
      for (int x = 0; x < xdim; ++x) {
        float acc = mi[x];
        for (int y = 0; y < xdim; ++y) acc += Mi[x * xdim + y] * dnext[y];
        inner[x] = acc;
      }
      float* ai = out_alphas + ((size_t)k * P + i) * umax;
      const float* wBi = wB + (size_t)i * umax * xdim;
      for (int u = 0; u < udims[i]; ++u) {
        float acc = wr[(size_t)i * umax + u];
        for (int x = 0; x < xdim; ++x) acc += wBi[u * xdim + x] * inner[x];
        ai[u] = acc;
      }
      float* ci = out_costates + ((size_t)k * P + i) * xdim;
      for (int y = 0; y < xdim; ++y) {
        float acc = 0.0f;
        for (int x = 0; x < xdim; ++x) acc += Ak[x * xdim + y] * inner[x];
        ci[y] = acc;
      }
    }
    dx.swap(dnext);
  }
  std::memcpy(out_dxs + (size_t)(N - 1) * xdim, dx.data(),
              sizeof(float) * xdim);
  return 0;
}

}  // extern "C"

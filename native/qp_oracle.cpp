// Dense QP oracle: ADMM + iterative active-set polish (qpOASES-equivalent
// accuracy), exported with a C API for ctypes.
//
// Solves   min 1/2 x^T H x + g^T x   s.t.  lb <= A x <= ub
// in float64 to machine-precision KKT via an OSQP-style ADMM warm start
// followed by an active-set refinement loop (the same algorithm as the
// python test oracle in tests/oracle.py, reimplemented natively). This is
// the framework's CPU ground-truth solver: the reference stack trusts
// qpOASES/OSQP for this role (reference: src/wbc_ctrl/HoQp.cpp:158-174,
// src/mpc_ctrl/convex_mpc/ConvexQPSolver.cpp:182-194).
//
// Self-contained: no external linear-algebra dependency; factorizations are
// plain partial-pivot LU on dense matrices (problem sizes here are <= ~1k).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using Vec = std::vector<double>;

// Solve M x = b with partial-pivot LU; M is n x n row-major and is
// destroyed. Returns false if singular.
bool lu_solve(Vec &M, Vec &b, int n) {
  std::vector<int> piv(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double mx = std::fabs(M[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(M[i * n + k]);
      if (v > mx) { mx = v; p = i; }
    }
    if (mx < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(M[k * n + j], M[p * n + j]);
      std::swap(b[k], b[p]);
    }
    double inv = 1.0 / M[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      double f = M[i * n + k] * inv;
      if (f == 0.0) continue;
      M[i * n + k] = f;
      for (int j = k + 1; j < n; ++j) M[i * n + j] -= f * M[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= M[i * n + j] * b[j];
    b[i] = s / M[i * n + i];
  }
  return true;
}

struct Work {
  int n, m;
  const double *H, *g, *A, *lb, *ub;

  void mul_A(const double *x, double *out) const {
    for (int r = 0; r < m; ++r) {
      double s = 0;
      const double *row = A + (size_t)r * n;
      for (int j = 0; j < n; ++j) s += row[j] * x[j];
      out[r] = s;
    }
  }
};

}  // namespace

extern "C" {

// Returns 0 on success. x (n) holds the solution.
int qp_oracle_solve(int n, int m, const double *H, const double *g,
                    const double *A, const double *lb, const double *ub,
                    int admm_iters, int polish_rounds, double *x_out) {
  Work w{n, m, H, g, A, lb, ub};

  const double rho = 0.1, sigma = 1e-6, alpha = 1.6;
  std::vector<uint8_t> eq_row(m);
  Vec rho_vec(m);
  for (int r = 0; r < m; ++r) {
    eq_row[r] = (ub[r] - lb[r]) < 1e-12;
    rho_vec[r] = eq_row[r] ? rho * 1e3 : rho;
  }

  // K = H + sigma I + A^T diag(rho) A  (factor once, reuse via stored LU? we
  // refactor per solve for simplicity — ADMM iterations share one factor)
  Vec K((size_t)n * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double s = H[(size_t)i * n + j] + (i == j ? sigma : 0.0);
      K[(size_t)i * n + j] = s;
    }
  for (int r = 0; r < m; ++r) {
    const double *row = A + (size_t)r * n;
    double rv = rho_vec[r];
    for (int i = 0; i < n; ++i) {
      if (row[i] == 0.0) continue;
      double ri = rv * row[i];
      for (int j = 0; j < n; ++j)
        K[(size_t)i * n + j] += ri * row[j];
    }
  }

  // crude dense LU factor stored for repeated solves
  Vec Kf = K;
  std::vector<int> piv(n);
  {
    for (int i = 0; i < n; ++i) piv[i] = i;
    for (int k = 0; k < n; ++k) {
      int p = k;
      double mx = std::fabs(Kf[(size_t)k * n + k]);
      for (int i = k + 1; i < n; ++i) {
        double v = std::fabs(Kf[(size_t)i * n + k]);
        if (v > mx) { mx = v; p = i; }
      }
      if (mx < 1e-300) return 1;
      if (p != k) {
        for (int j = 0; j < n; ++j)
          std::swap(Kf[(size_t)k * n + j], Kf[(size_t)p * n + j]);
        std::swap(piv[k], piv[p]);
      }
      double inv = 1.0 / Kf[(size_t)k * n + k];
      for (int i = k + 1; i < n; ++i) {
        double f = Kf[(size_t)i * n + k] * inv;
        Kf[(size_t)i * n + k] = f;
        for (int j = k + 1; j < n; ++j)
          Kf[(size_t)i * n + j] -= f * Kf[(size_t)k * n + j];
      }
    }
  }
  auto k_solve = [&](Vec &b) {
    Vec pb(n);
    for (int i = 0; i < n; ++i) pb[i] = b[piv[i]];
    for (int i = 0; i < n; ++i) {
      double s = pb[i];
      for (int j = 0; j < i; ++j) s -= Kf[(size_t)i * n + j] * pb[j];
      pb[i] = s;
    }
    for (int i = n - 1; i >= 0; --i) {
      double s = pb[i];
      for (int j = i + 1; j < n; ++j) s -= Kf[(size_t)i * n + j] * pb[j];
      pb[i] = s / Kf[(size_t)i * n + i];
    }
    b = pb;
  };

  Vec x(n, 0.0), z(m, 0.0), y(m, 0.0), Ax(m), zt(m), rhs(n);
  for (int it = 0; it < admm_iters; ++it) {
    for (int i = 0; i < n; ++i) rhs[i] = sigma * x[i] - g[i];
    for (int r = 0; r < m; ++r) {
      double t = rho_vec[r] * z[r] - y[r];
      const double *row = A + (size_t)r * n;
      for (int i = 0; i < n; ++i) rhs[i] += row[i] * t;
    }
    k_solve(rhs);
    x = rhs;
    w.mul_A(x.data(), Ax.data());
    for (int r = 0; r < m; ++r) {
      zt[r] = alpha * Ax[r] + (1 - alpha) * z[r];
      double zn = zt[r] + y[r] / rho_vec[r];
      if (zn < lb[r]) zn = lb[r];
      if (zn > ub[r]) zn = ub[r];
      y[r] += rho_vec[r] * (zt[r] - zn);
      z[r] = zn;
    }
  }

  // --- active-set polish rounds ---
  w.mul_A(x.data(), Ax.data());
  std::vector<uint8_t> low_act(m), up_act(m);
  const double ptol = 1e-6;
  for (int r = 0; r < m; ++r) {
    double sl = std::fmax(1.0, std::fabs(lb[r]));
    double su = std::fmax(1.0, std::fabs(ub[r]));
    low_act[r] = (Ax[r] - lb[r]) < ptol * sl;
    up_act[r] = (ub[r] - Ax[r]) < ptol * su;
  }

  Vec best = x;
  for (int round = 0; round < polish_rounds; ++round) {
    std::vector<int> act;
    for (int r = 0; r < m; ++r)
      if (low_act[r] || up_act[r] || eq_row[r]) act.push_back(r);
    int ka = (int)act.size();
    int dim = n + ka;
    Vec KKT((size_t)dim * dim, 0.0), b(dim, 0.0);
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < n; ++j)
        KKT[(size_t)i * dim + j] = H[(size_t)i * n + j];
      KKT[(size_t)i * dim + i] += 1e-12;
      b[i] = -g[i];
    }
    for (int a = 0; a < ka; ++a) {
      int r = act[a];
      const double *row = A + (size_t)r * n;
      for (int j = 0; j < n; ++j) {
        KKT[(size_t)(n + a) * dim + j] = row[j];
        KKT[(size_t)j * dim + (n + a)] = row[j];
      }
      KKT[(size_t)(n + a) * dim + (n + a)] = -1e-12;
      b[n + a] = (up_act[r] && !eq_row[r]) ? ub[r] : lb[r];
    }
    if (!lu_solve(KKT, b, dim)) break;

    Vec xp(b.begin(), b.begin() + n);
    Vec nu(b.begin() + n, b.end());
    Vec Axp(m);
    w.mul_A(xp.data(), Axp.data());

    bool feas = true;
    for (int r = 0; r < m; ++r)
      if (Axp[r] < lb[r] - 1e-7 || Axp[r] > ub[r] + 1e-7) feas = false;

    bool any_wrong = false, any_viol = false;
    // wrong-sign multipliers: lower-active need nu <= 0, upper nu >= 0
    for (int a = 0; a < ka; ++a) {
      int r = act[a];
      if (eq_row[r]) continue;
      if (low_act[r] && nu[a] > 1e-9) {
        low_act[r] = up_act[r] = 0;
        any_wrong = true;
      } else if (up_act[r] && nu[a] < -1e-9) {
        low_act[r] = up_act[r] = 0;
        any_wrong = true;
      }
    }
    for (int r = 0; r < m; ++r) {
      double sl = std::fmax(1.0, std::fabs(lb[r]));
      double su = std::fmax(1.0, std::fabs(ub[r]));
      if (!low_act[r] && !eq_row[r] && (lb[r] - Axp[r]) > 1e-9 * sl) {
        low_act[r] = 1;
        any_viol = true;
      }
      if (!up_act[r] && !eq_row[r] && (Axp[r] - ub[r]) > 1e-9 * su) {
        up_act[r] = 1;
        any_viol = true;
      }
    }
    best = xp;
    if (feas && !any_wrong && !any_viol) break;
  }

  std::memcpy(x_out, best.data(), sizeof(double) * n);
  return 0;
}

}  // extern "C"

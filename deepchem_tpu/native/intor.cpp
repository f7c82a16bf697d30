// Native McMurchie-Davidson molecular integral engine.
//
// C++ port of deepchem_tpu/dft/integrals.py (same algorithm: Hermite
// Gaussian expansion coefficients E, Hermite Coulomb integrals R, Boys
// function), playing the role of the reference's vendored DQC hamiltonian
// stack (deepchem/utils/dft_utils/hamilton/intor) with the performance
// of a compiled engine: contracted shell-pair precomputation (Hermite
// expansion tables reused across all ket partners), memoized R tables,
// and Schwarz screening for the two-electron tensor.  Exposed to Python
// through ctypes (deepchem_tpu/dft/integrals.py builds/loads the .so and
// falls back to the pure-Python path when no toolchain exists).
//
// Basis layout passed from Python (one entry per contracted cartesian
// basis function i in 0..nbf):
//   lmn[3*i..3*i+2]     cartesian powers (l, m, n)
//   centers[3*i..3*i+2] center (bohr)
//   off[i]..off[i+1]    slice into exps[] / coefs[] (coefs include all
//                       normalization factors, as in BasisFunction)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double PI = 3.14159265358979323846;

// ---------------------------------------------------------------- Boys
// F_m(x) for m = 0..mmax, stable for all x:
//  - x small/moderate: series for F_mmax then downward recursion
//    F_m(x) = (2x F_{m+1}(x) + exp(-x)) / (2m + 1)
//  - x large: asymptotic F_m(x) ~ (2m-1)!! / (2x)^m * sqrt(pi/x) / 2,
//    refined by the same downward recursion from an upward start.
void boys_all(int mmax, double x, double* F) {
  if (x < 1e-13) {
    for (int m = 0; m <= mmax; ++m) F[m] = 1.0 / (2.0 * m + 1.0);
    return;
  }
  if (x < 35.0 + 2.0 * mmax) {
    // series: F_m(x) = exp(-x) * sum_{i>=0} (2x)^i /
    //                  ((2m+1)(2m+3)...(2m+2i+1))
    double term = 1.0 / (2.0 * mmax + 1.0);
    double sum = term;
    double tx = 2.0 * x;
    for (int i = 1; i < 400; ++i) {
      term *= tx / (2.0 * mmax + 2.0 * i + 1.0);
      sum += term;
      if (term < 1e-17 * sum) break;
    }
    double ex = std::exp(-x);
    F[mmax] = ex * sum;
    for (int m = mmax - 1; m >= 0; --m)
      F[m] = (2.0 * x * F[m + 1] + ex) / (2.0 * m + 1.0);
  } else {
    // large-x asymptotics: F_0 = 0.5*sqrt(pi/x); upward recursion
    // F_{m+1} = ((2m+1) F_m - exp(-x)) / (2x) is stable when the
    // exp(-x) term is negligible (x >= 35 + 2mmax guarantees it).
    double ex = std::exp(-x);
    F[0] = 0.5 * std::sqrt(PI / x);
    for (int m = 0; m < mmax; ++m)
      F[m + 1] = ((2.0 * m + 1.0) * F[m] - ex) / (2.0 * x);
  }
}

// ------------------------------------------- Hermite expansion coeffs E
// E_t^{ij} along one axis (recursive; i, j <= 4 in practice).
double Ecoef(int i, int j, int t, double Qx, double a, double b) {
  double p = a + b;
  double q = a * b / p;
  if (t < 0 || t > i + j) return 0.0;
  if (i == 0 && j == 0 && t == 0) return std::exp(-q * Qx * Qx);
  if (j == 0)
    return Ecoef(i - 1, j, t - 1, Qx, a, b) / (2.0 * p)
         - q * Qx / a * Ecoef(i - 1, j, t, Qx, a, b)
         + (t + 1) * Ecoef(i - 1, j, t + 1, Qx, a, b);
  return Ecoef(i, j - 1, t - 1, Qx, a, b) / (2.0 * p)
       + q * Qx / b * Ecoef(i, j - 1, t, Qx, a, b)
       + (t + 1) * Ecoef(i, j - 1, t + 1, Qx, a, b);
}

// ------------------------------------------ Hermite Coulomb integrals R
// Table R^0_{tuv} for all t<=tmax, u<=umax, v<=vmax via the auxiliary
// n-index recursion, built from Boys values.
struct RTable {
  int nt, nu, nv;
  std::vector<double> val;  // [t][u][v] at n = 0
  double at(int t, int u, int v) const {
    return val[(t * nu + u) * nv + v];
  }
};

void hermite_R(int tmax, int umax, int vmax, double p, const double* PC,
               double RPC2, RTable* out) {
  int nmax = tmax + umax + vmax;
  std::vector<double> F(nmax + 1);
  boys_all(nmax, p * RPC2, F.data());
  // R^n_{000} = (-2p)^n F_n
  int nt = tmax + 1, nu = umax + 1, nv = vmax + 1;
  // layered build: layer n holds R^n_{tuv} for t+u+v <= nmax - n
  std::vector<double> cur((size_t)nt * nu * nv, 0.0),
      nxt((size_t)nt * nu * nv, 0.0);
  auto idx = [&](int t, int u, int v) { return ((size_t)t * nu + u) * nv + v; };
  // start at n = nmax (only 000 is needed), walk down to n = 0
  double m2p = -2.0 * p;
  double pw = 1.0;
  std::vector<double> R000(nmax + 1);
  for (int n = 0; n <= nmax; ++n) { R000[n] = pw * F[n]; pw *= m2p; }
  // cur = layer nmax
  cur[idx(0, 0, 0)] = R000[nmax];
  for (int n = nmax - 1; n >= 0; --n) {
    // nxt(=layer n) from cur(=layer n+1)
    std::fill(nxt.begin(), nxt.end(), 0.0);
    nxt[idx(0, 0, 0)] = R000[n];
    int cap = nmax - n;
    for (int t = 0; t <= tmax && t <= cap; ++t)
      for (int u = 0; u <= umax && t + u <= cap; ++u)
        for (int v = 0; v <= vmax && t + u + v <= cap; ++v) {
          if (t == 0 && u == 0 && v == 0) continue;
          double r = 0.0;
          if (t > 0) {
            if (t > 1) r += (t - 1) * cur[idx(t - 2, u, v)];
            r += PC[0] * cur[idx(t - 1, u, v)];
          } else if (u > 0) {
            if (u > 1) r += (u - 1) * cur[idx(t, u - 2, v)];
            r += PC[1] * cur[idx(t, u - 1, v)];
          } else {
            if (v > 1) r += (v - 1) * cur[idx(t, u, v - 2)];
            r += PC[2] * cur[idx(t, u, v - 1)];
          }
          nxt[idx(t, u, v)] = r;
        }
    std::swap(cur, nxt);
  }
  out->nt = nt; out->nu = nu; out->nv = nv;
  out->val = cur;
}

// ------------------------------------------------------- basis structs
struct Prim { double a, c; };

struct BF {
  int l, m, n;
  double A[3];
  std::vector<Prim> prims;
};

std::vector<BF> unpack(int nbf, const int32_t* lmn, const double* centers,
                       const int32_t* off, const double* exps,
                       const double* coefs) {
  std::vector<BF> bfs(nbf);
  for (int i = 0; i < nbf; ++i) {
    BF& b = bfs[i];
    b.l = lmn[3 * i]; b.m = lmn[3 * i + 1]; b.n = lmn[3 * i + 2];
    b.A[0] = centers[3 * i]; b.A[1] = centers[3 * i + 1];
    b.A[2] = centers[3 * i + 2];
    for (int k = off[i]; k < off[i + 1]; ++k)
      b.prims.push_back({exps[k], coefs[k]});
  }
  return bfs;
}

// ------------------------------------------------ one-electron kernels
double overlap_prim(double a, int l1, int m1, int n1, const double* A,
                    double b, int l2, int m2, int n2, const double* B) {
  double s1 = Ecoef(l1, l2, 0, A[0] - B[0], a, b);
  double s2 = Ecoef(m1, m2, 0, A[1] - B[1], a, b);
  double s3 = Ecoef(n1, n2, 0, A[2] - B[2], a, b);
  return s1 * s2 * s3 * std::pow(PI / (a + b), 1.5);
}

double kinetic_prim(double a, int l1, int m1, int n1, const double* A,
                    double b, int l2, int m2, int n2, const double* B) {
  double t0 = b * (2.0 * (l2 + m2 + n2) + 3.0) *
              overlap_prim(a, l1, m1, n1, A, b, l2, m2, n2, B);
  double t1 = -2.0 * b * b *
      (overlap_prim(a, l1, m1, n1, A, b, l2 + 2, m2, n2, B) +
       overlap_prim(a, l1, m1, n1, A, b, l2, m2 + 2, n2, B) +
       overlap_prim(a, l1, m1, n1, A, b, l2, m2, n2 + 2, B));
  double t2 = -0.5 *
      (l2 * (l2 - 1) * overlap_prim(a, l1, m1, n1, A, b, l2 - 2, m2, n2, B) +
       m2 * (m2 - 1) * overlap_prim(a, l1, m1, n1, A, b, l2, m2 - 2, n2, B) +
       n2 * (n2 - 1) * overlap_prim(a, l1, m1, n1, A, b, l2, m2, n2 - 2, B));
  return t0 + t1 + t2;
}

double nuclear_prim(double a, int l1, int m1, int n1, const double* A,
                    double b, int l2, int m2, int n2, const double* B,
                    const double* C) {
  double p = a + b;
  double P[3], PC[3];
  for (int x = 0; x < 3; ++x) {
    P[x] = (a * A[x] + b * B[x]) / p;
    PC[x] = P[x] - C[x];
  }
  double RPC2 = PC[0] * PC[0] + PC[1] * PC[1] + PC[2] * PC[2];
  int tmax = l1 + l2, umax = m1 + m2, vmax = n1 + n2;
  RTable R;
  hermite_R(tmax, umax, vmax, p, PC, RPC2, &R);
  double val = 0.0;
  for (int t = 0; t <= tmax; ++t) {
    double Ex = Ecoef(l1, l2, t, A[0] - B[0], a, b);
    if (Ex == 0.0) continue;
    for (int u = 0; u <= umax; ++u) {
      double Ey = Ecoef(m1, m2, u, A[1] - B[1], a, b);
      if (Ey == 0.0) continue;
      for (int v = 0; v <= vmax; ++v) {
        double Ez = Ecoef(n1, n2, v, A[2] - B[2], a, b);
        if (Ez == 0.0) continue;
        val += Ex * Ey * Ez * R.at(t, u, v);
      }
    }
  }
  return 2.0 * PI / p * val;
}

// ------------------------------- shell-pair Hermite expansion for ERIs
// For a function pair (i, j) and each primitive pair, store the combined
// Hermite coefficients Etuv = Ex[t] Ey[u] Ez[v] * c_i c_j, the composite
// center P and exponent p.  (ij|kl) then contracts two such expansions
// through the R table — the standard MD algorithm.
struct PrimPair {
  double p;        // a + b
  double P[3];     // composite center
  std::vector<double> E;  // [t][u][v] flattened, includes c_i*c_j
};

struct PairExp {
  int tmax, umax, vmax;  // per-axis Hermite orders (l1+l2 etc.)
  std::vector<PrimPair> pps;
};

PairExp make_pair(const BF& bi, const BF& bj) {
  PairExp pe;
  pe.tmax = bi.l + bj.l; pe.umax = bi.m + bj.m; pe.vmax = bi.n + bj.n;
  int nt = pe.tmax + 1, nu = pe.umax + 1, nv = pe.vmax + 1;
  for (const Prim& pa : bi.prims)
    for (const Prim& pb : bj.prims) {
      PrimPair pp;
      pp.p = pa.a + pb.a;
      for (int x = 0; x < 3; ++x)
        pp.P[x] = (pa.a * bi.A[x] + pb.a * bj.A[x]) / pp.p;
      pp.E.assign((size_t)nt * nu * nv, 0.0);
      double cc = pa.c * pb.c;
      std::vector<double> Ex(nt), Ey(nu), Ez(nv);
      for (int t = 0; t < nt; ++t)
        Ex[t] = Ecoef(bi.l, bj.l, t, bi.A[0] - bj.A[0], pa.a, pb.a);
      for (int u = 0; u < nu; ++u)
        Ey[u] = Ecoef(bi.m, bj.m, u, bi.A[1] - bj.A[1], pa.a, pb.a);
      for (int v = 0; v < nv; ++v)
        Ez[v] = Ecoef(bi.n, bj.n, v, bi.A[2] - bj.A[2], pa.a, pb.a);
      for (int t = 0; t < nt; ++t)
        for (int u = 0; u < nu; ++u)
          for (int v = 0; v < nv; ++v)
            pp.E[((size_t)t * nu + u) * nv + v] = cc * Ex[t] * Ey[u] * Ez[v];
      pe.pps.push_back(std::move(pp));
    }
  return pe;
}

// contracted (ij|kl) from two pair expansions
// omega > 0 attenuates the Coulomb kernel to erf(omega r12)/r12 (the
// long-range half of range separation): F_m(T) -> s^{m+1/2} F_m(sT)
// with s = omega^2/(alpha+omega^2), which is EXACTLY the standard
// Hermite R recursion run at alpha_eff = alpha*s and scaled by
// sqrt(s) (R000[n] = (-2 alpha s)^n s^{1/2} F_n(alpha s RPQ^2)).
// omega = 0 means the full 1/r12 kernel.
double eri_pair(const PairExp& bra, const PairExp& ket,
                double omega = 0.0) {
  int bt = bra.tmax, bu = bra.umax, bv = bra.vmax;
  int kt = ket.tmax, ku = ket.umax, kv = ket.vmax;
  int bnu = bu + 1, bnv = bv + 1, knu = ku + 1, knv = kv + 1;
  double total = 0.0;
  for (const PrimPair& bp : bra.pps)
    for (const PrimPair& kp : ket.pps) {
      double alpha = bp.p * kp.p / (bp.p + kp.p);
      double scale = 1.0;
      if (omega > 0.0) {
        double s = omega * omega / (alpha + omega * omega);
        alpha *= s;
        scale = std::sqrt(s);
      }
      double PQ[3] = {bp.P[0] - kp.P[0], bp.P[1] - kp.P[1],
                      bp.P[2] - kp.P[2]};
      double RPQ2 = PQ[0] * PQ[0] + PQ[1] * PQ[1] + PQ[2] * PQ[2];
      RTable R;
      hermite_R(bt + kt, bu + ku, bv + kv, alpha, PQ, RPQ2, &R);
      double val = 0.0;
      for (int t = 0; t <= bt; ++t)
        for (int u = 0; u <= bu; ++u)
          for (int v = 0; v <= bv; ++v) {
            double Eb = bp.E[((size_t)t * bnu + u) * bnv + v];
            if (Eb == 0.0) continue;
            double sub = 0.0;
            for (int tau = 0; tau <= kt; ++tau)
              for (int nu_ = 0; nu_ <= ku; ++nu_)
                for (int phi = 0; phi <= kv; ++phi) {
                  double Ek = kp.E[((size_t)tau * knu + nu_) * knv + phi];
                  if (Ek == 0.0) continue;
                  double sgn = ((tau + nu_ + phi) & 1) ? -1.0 : 1.0;
                  sub += sgn * Ek * R.at(t + tau, u + nu_, v + phi);
                }
            val += Eb * sub;
          }
      total += scale * val * 2.0 * std::pow(PI, 2.5) /
               (bp.p * kp.p * std::sqrt(bp.p + kp.p));
    }
  return total;
}

}  // namespace

extern "C" {

void intor_overlap(int nbf, const int32_t* lmn, const double* centers,
                   const int32_t* off, const double* exps,
                   const double* coefs, double* S) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  for (int i = 0; i < nbf; ++i)
    for (int j = i; j < nbf; ++j) {
      double v = 0.0;
      for (const Prim& pa : bfs[i].prims)
        for (const Prim& pb : bfs[j].prims)
          v += pa.c * pb.c *
               overlap_prim(pa.a, bfs[i].l, bfs[i].m, bfs[i].n, bfs[i].A,
                            pb.a, bfs[j].l, bfs[j].m, bfs[j].n, bfs[j].A);
      S[(size_t)i * nbf + j] = S[(size_t)j * nbf + i] = v;
    }
}

void intor_kinetic(int nbf, const int32_t* lmn, const double* centers,
                   const int32_t* off, const double* exps,
                   const double* coefs, double* T) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  for (int i = 0; i < nbf; ++i)
    for (int j = i; j < nbf; ++j) {
      double v = 0.0;
      for (const Prim& pa : bfs[i].prims)
        for (const Prim& pb : bfs[j].prims)
          v += pa.c * pb.c *
               kinetic_prim(pa.a, bfs[i].l, bfs[i].m, bfs[i].n, bfs[i].A,
                            pb.a, bfs[j].l, bfs[j].m, bfs[j].n, bfs[j].A);
      T[(size_t)i * nbf + j] = T[(size_t)j * nbf + i] = v;
    }
}

void intor_nuclear(int nbf, const int32_t* lmn, const double* centers,
                   const int32_t* off, const double* exps,
                   const double* coefs, int natom, const double* Z,
                   const double* atom_coords, double* V) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  for (int i = 0; i < nbf; ++i)
    for (int j = i; j < nbf; ++j) {
      double v = 0.0;
      for (int a = 0; a < natom; ++a) {
        double va = 0.0;
        for (const Prim& pa : bfs[i].prims)
          for (const Prim& pb : bfs[j].prims)
            va += pa.c * pb.c *
                  nuclear_prim(pa.a, bfs[i].l, bfs[i].m, bfs[i].n,
                               bfs[i].A, pb.a, bfs[j].l, bfs[j].m,
                               bfs[j].n, bfs[j].A, atom_coords + 3 * a);
        v -= Z[a] * va;
      }
      V[(size_t)i * nbf + j] = V[(size_t)j * nbf + i] = v;
    }
}

// Full (ij|kl) tensor with 8-fold symmetry + Schwarz screening.
void intor_eri(int nbf, const int32_t* lmn, const double* centers,
               const int32_t* off, const double* exps,
               const double* coefs, double* eri) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  // pair expansions for i >= j (canonical pairs)
  int npair = nbf * (nbf + 1) / 2;
  std::vector<PairExp> pairs(npair);
  auto pidx = [&](int i, int j) {  // i >= j
    return i * (i + 1) / 2 + j;
  };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j)
      pairs[pidx(i, j)] = make_pair(bfs[i], bfs[j]);
  // Schwarz bounds Q_ij = sqrt((ij|ij))
  std::vector<double> Q(npair);
  for (int ij = 0; ij < npair; ++ij)
    Q[ij] = std::sqrt(std::fabs(eri_pair(pairs[ij], pairs[ij])));
  const double tau = 1e-13;
  std::memset(eri, 0, sizeof(double) * (size_t)nbf * nbf * nbf * nbf);
  size_t n = nbf, n2 = n * n, n3 = n2 * n;
  auto put = [&](int p, int q, int r, int s, double v) {
    eri[(size_t)p * n3 + q * n2 + r * n + s] = v;
  };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j) {
      int ij = pidx(i, j);
      for (int k = 0; k <= i; ++k)
        for (int l = 0; l <= k; ++l) {
          int kl = pidx(k, l);
          if (kl > ij) continue;
          if (Q[ij] * Q[kl] < tau) continue;
          double v = eri_pair(pairs[ij], pairs[kl]);
          put(i, j, k, l, v); put(j, i, k, l, v);
          put(i, j, l, k, v); put(j, i, l, k, v);
          put(k, l, i, j, v); put(l, k, i, j, v);
          put(k, l, j, i, v); put(l, k, j, i, v);
        }
    }
}

// Long-range (erf-attenuated) ERIs for range-separated hybrids:
// (ij|erf(omega r12)/r12|kl), same 8-fold-symmetric Schwarz-screened
// loop as intor_eri (the attenuated kernel is positive definite, so
// Cauchy-Schwarz bounds from attenuated self-integrals remain valid).
void intor_eri_erf(int nbf, const int32_t* lmn, const double* centers,
                   const int32_t* off, const double* exps,
                   const double* coefs, double omega, double* eri) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  int npair = nbf * (nbf + 1) / 2;
  std::vector<PairExp> pairs(npair);
  auto pidx = [&](int i, int j) { return i * (i + 1) / 2 + j; };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j)
      pairs[pidx(i, j)] = make_pair(bfs[i], bfs[j]);
  std::vector<double> Q(npair);
  for (int ij = 0; ij < npair; ++ij)
    Q[ij] = std::sqrt(std::fabs(eri_pair(pairs[ij], pairs[ij], omega)));
  const double tau = 1e-13;
  std::memset(eri, 0, sizeof(double) * (size_t)nbf * nbf * nbf * nbf);
  size_t n = nbf, n2 = n * n, n3 = n2 * n;
  auto put = [&](int p, int q, int r, int s, double v) {
    eri[(size_t)p * n3 + q * n2 + r * n + s] = v;
  };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j) {
      int ij = pidx(i, j);
      for (int k = 0; k <= i; ++k)
        for (int l = 0; l <= k; ++l) {
          int kl = pidx(k, l);
          if (kl > ij) continue;
          if (Q[ij] * Q[kl] < tau) continue;
          double v = eri_pair(pairs[ij], pairs[kl], omega);
          put(i, j, k, l, v); put(j, i, k, l, v);
          put(i, j, l, k, v); put(j, i, l, k, v);
          put(k, l, i, j, v); put(l, k, i, j, v);
          put(k, l, j, i, v); put(l, k, j, i, v);
        }
    }
}

// AO values + gradients on grid points: phi [G, nbf], dphi [G, 3, nbf].
void intor_ao_values(int nbf, const int32_t* lmn, const double* centers,
                     const int32_t* off, const double* exps,
                     const double* coefs, int G, const double* pts,
                     double* phi, double* dphi) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  std::memset(phi, 0, sizeof(double) * (size_t)G * nbf);
  std::memset(dphi, 0, sizeof(double) * (size_t)G * 3 * nbf);
  for (int j = 0; j < nbf; ++j) {
    const BF& b = bfs[j];
    int pw[3] = {b.l, b.m, b.n};
    for (int g = 0; g < G; ++g) {
      double d[3] = {pts[3 * g] - b.A[0], pts[3 * g + 1] - b.A[1],
                     pts[3 * g + 2] - b.A[2]};
      double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
      double poly = 1.0;
      for (int x = 0; x < 3; ++x)
        for (int e = 0; e < pw[x]; ++e) poly *= d[x];
      double gsum = 0.0, agsum = 0.0;
      for (const Prim& p : b.prims) {
        double gv = p.c * std::exp(-p.a * r2);
        gsum += gv;
        agsum += p.a * gv;
      }
      phi[(size_t)g * nbf + j] += poly * gsum;
      for (int ax = 0; ax < 3; ++ax) {
        double dp = -2.0 * d[ax] * poly * agsum;
        if (pw[ax] > 0) {
          double lower = 1.0;
          for (int x = 0; x < 3; ++x) {
            int e = pw[x] - (x == ax ? 1 : 0);
            for (int q = 0; q < e; ++q) lower *= d[x];
          }
          dp += pw[ax] * lower * gsum;
        }
        dphi[((size_t)g * 3 + ax) * nbf + j] += dp;
      }
    }
  }
}

}  // extern "C"

// ===================================================================
// Analytic nuclear gradients (RHF / RKS skeleton terms).
//
// d/dA of a contracted Gaussian phi(l) = sum_k c_k G(l, a_k) along one
// axis is the synthetic contraction 2 a_k c_k G(l+1) - l c_k G(l-1) —
// so every derivative integral reduces to ordinary MD integrals over
// shifted functions, evaluated with the machinery above.

namespace {

// pair expansion of (d phi_i / d(center_i axis), phi_j): merged
// plus/minus synthetic primitives (eri_pair is linear in the pair list).
PairExp make_pair_dbra(const BF& bi, const BF& bj, int axis) {
  BF plus = bi, minus = bi;
  int lmn[3] = {bi.l, bi.m, bi.n};
  // plus: l_axis + 1, coefs 2 a c
  (axis == 0 ? plus.l : axis == 1 ? plus.m : plus.n) += 1;
  for (Prim& p : plus.prims) p.c *= 2.0 * p.a;
  PairExp pe = make_pair(plus, bj);
  if (lmn[axis] > 0) {
    (axis == 0 ? minus.l : axis == 1 ? minus.m : minus.n) -= 1;
    for (Prim& p : minus.prims) p.c *= -double(lmn[axis]);
    PairExp m = make_pair(minus, bj);
    // merge: pad the lower-order E tables into the plus-sized layout
    int nu = pe.umax + 1, nv = pe.vmax + 1;
    int mu = m.umax + 1, mv = m.vmax + 1;
    for (const PrimPair& pp : m.pps) {
      PrimPair q;
      q.p = pp.p;
      q.P[0] = pp.P[0]; q.P[1] = pp.P[1]; q.P[2] = pp.P[2];
      q.E.assign((size_t)(pe.tmax + 1) * nu * nv, 0.0);
      for (int t = 0; t <= m.tmax; ++t)
        for (int u = 0; u <= m.umax; ++u)
          for (int v = 0; v <= m.vmax; ++v)
            q.E[((size_t)t * nu + u) * nv + v] =
                pp.E[((size_t)t * mu + u) * mv + v];
      pe.pps.push_back(std::move(q));
    }
  }
  return pe;
}

// 1e derivative primitives: dX(d phi_i / dA_axis, phi_j)
double d1e_bra(double (*prim)(double, int, int, int, const double*,
                              double, int, int, int, const double*),
               const BF& bi, const BF& bj, int axis) {
  int l1[3] = {bi.l, bi.m, bi.n};
  int lp[3] = {l1[0], l1[1], l1[2]};
  lp[axis] += 1;
  double val = 0.0;
  for (const Prim& pa : bi.prims)
    for (const Prim& pb : bj.prims) {
      double v = 2.0 * pa.a *
          prim(pa.a, lp[0], lp[1], lp[2], bi.A, pb.a, bj.l, bj.m, bj.n,
               bj.A);
      if (l1[axis] > 0) {
        int lm[3] = {l1[0], l1[1], l1[2]};
        lm[axis] -= 1;
        v -= l1[axis] *
            prim(pa.a, lm[0], lm[1], lm[2], bi.A, pb.a, bj.l, bj.m,
                 bj.n, bj.A);
      }
      val += pa.c * pb.c * v;
    }
  return val;
}

double d1e_nuc_bra(const BF& bi, const BF& bj, int axis, int natom,
                   const double* Z, const double* atom_coords) {
  int l1[3] = {bi.l, bi.m, bi.n};
  int lp[3] = {l1[0], l1[1], l1[2]};
  lp[axis] += 1;
  double val = 0.0;
  for (int a = 0; a < natom; ++a) {
    double va = 0.0;
    for (const Prim& pa : bi.prims)
      for (const Prim& pb : bj.prims) {
        double v = 2.0 * pa.a *
            nuclear_prim(pa.a, lp[0], lp[1], lp[2], bi.A, pb.a, bj.l,
                         bj.m, bj.n, bj.A, atom_coords + 3 * a);
        if (l1[axis] > 0) {
          int lm[3] = {l1[0], l1[1], l1[2]};
          lm[axis] -= 1;
          v -= l1[axis] *
              nuclear_prim(pa.a, lm[0], lm[1], lm[2], bi.A, pb.a, bj.l,
                           bj.m, bj.n, bj.A, atom_coords + 3 * a);
        }
        va += pa.c * pb.c * v;
      }
    val -= Z[a] * va;
  }
  return val;
}

// Hellmann-Feynman: d V_ij / d C (operator center) for one nucleus.
// R_{tuv} are the PC-derivatives of R_000, so d/dC_x = -R_{t+1,u,v}.
void nuclear_prim_dC(double a, int l1, int m1, int n1, const double* A,
                     double b, int l2, int m2, int n2, const double* B,
                     const double* C, double* out3) {
  double p = a + b;
  double P[3], PC[3];
  for (int x = 0; x < 3; ++x) {
    P[x] = (a * A[x] + b * B[x]) / p;
    PC[x] = P[x] - C[x];
  }
  double RPC2 = PC[0] * PC[0] + PC[1] * PC[1] + PC[2] * PC[2];
  int tmax = l1 + l2, umax = m1 + m2, vmax = n1 + n2;
  RTable R;
  hermite_R(tmax + 1, umax + 1, vmax + 1, p, PC, RPC2, &R);
  double gx = 0.0, gy = 0.0, gz = 0.0;
  for (int t = 0; t <= tmax; ++t) {
    double Ex = Ecoef(l1, l2, t, A[0] - B[0], a, b);
    if (Ex == 0.0) continue;
    for (int u = 0; u <= umax; ++u) {
      double Ey = Ecoef(m1, m2, u, A[1] - B[1], a, b);
      if (Ey == 0.0) continue;
      for (int v = 0; v <= vmax; ++v) {
        double Ez = Ecoef(n1, n2, v, A[2] - B[2], a, b);
        if (Ez == 0.0) continue;
        double e3 = Ex * Ey * Ez;
        gx -= e3 * R.at(t + 1, u, v);
        gy -= e3 * R.at(t, u + 1, v);
        gz -= e3 * R.at(t, u, v + 1);
      }
    }
  }
  double pref = 2.0 * PI / p;
  out3[0] = pref * gx; out3[1] = pref * gy; out3[2] = pref * gz;
}

}  // namespace

extern "C" {

// Analytic gradient of the SCF energy terms that live in AO integrals:
//   core:     2 sum_{ij} D_ij (dT + dV_basis)(di, j)   (bra derivative)
//   HF force: sum_{ij} D_ij dV/dC_a
//   overlap: -2 sum_{ij} W_ij dS(di, j)
//   2e:       sum over unique quartets of P-contracted dERI
// with P_ijkl = 0.5 D_ij D_kl - 0.25 cx D_ik D_jl (restricted closed
// shell).  XC quadrature and nuclear-repulsion terms are assembled on
// the Python side.  grad has natom*3 doubles, overwritten.
// shared implementation: D = Da + Db (total), W = total energy-weighted
// density, spin-resolved exchange contraction (RHF passes Da = Db = D/2,
// which reproduces the closed-shell 0.5 DD - 0.25 cx DD exactly).
static void grad_scf_impl(int nbf, const int32_t* lmn,
                          const double* centers, const int32_t* off,
                          const double* exps, const double* coefs,
                          const int32_t* atom_of, int natom,
                          const double* Z, const double* atom_coords,
                          const double* D, const double* Da,
                          const double* Db, const double* W, double cx,
                          double* grad) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  std::memset(grad, 0, sizeof(double) * (size_t)natom * 3);
  size_t n = nbf;
  // ---- one-electron terms
  for (int i = 0; i < nbf; ++i) {
    int ai = atom_of[i];
    for (int j = 0; j < nbf; ++j) {
      double d = D[(size_t)i * n + j], w = W[(size_t)i * n + j];
      if (std::fabs(d) < 1e-14 && std::fabs(w) < 1e-14) continue;
      for (int ax = 0; ax < 3; ++ax) {
        double dT = d1e_bra(kinetic_prim, bfs[i], bfs[j], ax);
        double dV = d1e_nuc_bra(bfs[i], bfs[j], ax, natom, Z,
                                atom_coords);
        double dS = d1e_bra(overlap_prim, bfs[i], bfs[j], ax);
        grad[ai * 3 + ax] += 2.0 * d * (dT + dV) - 2.0 * w * dS;
      }
    }
  }
  // ---- Hellmann-Feynman (operator-center) term
  for (int c = 0; c < natom; ++c) {
    double acc[3] = {0.0, 0.0, 0.0};
    for (int i = 0; i < nbf; ++i)
      for (int j = i; j < nbf; ++j) {
        double d = D[(size_t)i * n + j];
        if (std::fabs(d) < 1e-14) continue;
        double mult = (i == j) ? 1.0 : 2.0;
        double o3[3];
        double sum3[3] = {0.0, 0.0, 0.0};
        for (const Prim& pa : bfs[i].prims)
          for (const Prim& pb : bfs[j].prims) {
            nuclear_prim_dC(pa.a, bfs[i].l, bfs[i].m, bfs[i].n,
                            bfs[i].A, pb.a, bfs[j].l, bfs[j].m,
                            bfs[j].n, bfs[j].A, atom_coords + 3 * c,
                            o3);
            double cc = pa.c * pb.c;
            sum3[0] += cc * o3[0]; sum3[1] += cc * o3[1];
            sum3[2] += cc * o3[2];
          }
        for (int ax = 0; ax < 3; ++ax)
          acc[ax] += mult * d * sum3[ax];
      }
    for (int ax = 0; ax < 3; ++ax)
      grad[c * 3 + ax] -= Z[c] * acc[ax];
  }
  // ---- two-electron term
  int npair = nbf * (nbf + 1) / 2;
  std::vector<PairExp> pairs(npair);
  auto pidx = [&](int i, int j) { return i * (i + 1) / 2 + j; };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j)
      pairs[pidx(i, j)] = make_pair(bfs[i], bfs[j]);
  std::vector<double> Q(npair);
  for (int ij = 0; ij < npair; ++ij)
    Q[ij] = std::sqrt(std::fabs(eri_pair(pairs[ij], pairs[ij])));
  const double tau = 1e-12;
  auto Pcoef = [&](int a, int b, int c, int d_) {
    return 0.5 * D[(size_t)a * n + b] * D[(size_t)c * n + d_] -
           0.5 * cx *
               (Da[(size_t)a * n + c] * Da[(size_t)b * n + d_] +
                Db[(size_t)a * n + c] * Db[(size_t)b * n + d_]);
  };
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j) {
      int ij = pidx(i, j);
      for (int k = 0; k <= i; ++k)
        for (int l = 0; l <= k; ++l) {
          int kl = pidx(k, l);
          if (kl > ij) continue;
          if (Q[ij] * Q[kl] < tau) continue;
          // sum P over the DISTINCT members of the 8-fold orbit
          int perms[8][4] = {{i, j, k, l}, {j, i, k, l}, {i, j, l, k},
                             {j, i, l, k}, {k, l, i, j}, {l, k, i, j},
                             {k, l, j, i}, {l, k, j, i}};
          double pfac = 0.0;
          for (int p = 0; p < 8; ++p) {
            bool dup = false;
            for (int q = 0; q < p && !dup; ++q)
              dup = perms[p][0] == perms[q][0] &&
                    perms[p][1] == perms[q][1] &&
                    perms[p][2] == perms[q][2] &&
                    perms[p][3] == perms[q][3];
            if (!dup)
              pfac += Pcoef(perms[p][0], perms[p][1], perms[p][2],
                            perms[p][3]);
          }
          if (std::fabs(pfac) < 1e-14) continue;
          int at[4] = {atom_of[i], atom_of[j], atom_of[k], atom_of[l]};
          for (int ax = 0; ax < 3; ++ax) {
            double di = eri_pair(make_pair_dbra(bfs[i], bfs[j], ax),
                                 pairs[kl]);
            double dj = eri_pair(make_pair_dbra(bfs[j], bfs[i], ax),
                                 pairs[kl]);
            double dk = eri_pair(make_pair_dbra(bfs[k], bfs[l], ax),
                                 pairs[ij]);
            double dl = -(di + dj + dk);  // translational invariance
            grad[at[0] * 3 + ax] += pfac * di;
            grad[at[1] * 3 + ax] += pfac * dj;
            grad[at[2] * 3 + ax] += pfac * dk;
            grad[at[3] * 3 + ax] += pfac * dl;
          }
        }
    }
}

void intor_grad_rhf(int nbf, const int32_t* lmn, const double* centers,
                    const int32_t* off, const double* exps,
                    const double* coefs, const int32_t* atom_of,
                    int natom, const double* Z,
                    const double* atom_coords, const double* D,
                    const double* W, double cx, double* grad) {
  size_t n2 = (size_t)nbf * nbf;
  std::vector<double> Dh(n2);
  for (size_t i = 0; i < n2; ++i) Dh[i] = 0.5 * D[i];
  grad_scf_impl(nbf, lmn, centers, off, exps, coefs, atom_of, natom, Z,
                atom_coords, D, Dh.data(), Dh.data(), W, cx, grad);
}

// Unrestricted gradient: spin densities Da/Db (occupation-1 orbitals),
// W = total energy-weighted density Wa + Wb.
void intor_grad_uhf(int nbf, const int32_t* lmn, const double* centers,
                    const int32_t* off, const double* exps,
                    const double* coefs, const int32_t* atom_of,
                    int natom, const double* Z,
                    const double* atom_coords, const double* Da,
                    const double* Db, const double* W, double cx,
                    double* grad) {
  size_t n2 = (size_t)nbf * nbf;
  std::vector<double> D(n2);
  for (size_t i = 0; i < n2; ++i) D[i] = Da[i] + Db[i];
  // E_K^UHF = -cx/2 sum (Da_ik Da_jl + Db_ik Db_jl)(ij|kl): the shared
  // 0.5*cx*(DaDa + DbDb) contraction wants cx unchanged (the RHF
  // special case Da = Db = D/2 folds it to the closed-shell 0.25 cx)
  grad_scf_impl(nbf, lmn, centers, off, exps, coefs, atom_of, natom, Z,
                atom_coords, D.data(), Da, Db, W, cx, grad);
}

// AO second derivatives on grid points for GGA/meta-GGA gradient
// terms: hess [G, 6, nbf] in (xx, xy, xz, yy, yz, zz) order.
void intor_ao_hessian(int nbf, const int32_t* lmn, const double* centers,
                      const int32_t* off, const double* exps,
                      const double* coefs, int G, const double* pts,
                      double* hess) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  std::memset(hess, 0, sizeof(double) * (size_t)G * 6 * nbf);
  int pairs[6][2] = {{0, 0}, {0, 1}, {0, 2}, {1, 1}, {1, 2}, {2, 2}};
  for (int j = 0; j < nbf; ++j) {
    const BF& b = bfs[j];
    int pw[3] = {b.l, b.m, b.n};
    for (int g = 0; g < G; ++g) {
      double d[3] = {pts[3 * g] - b.A[0], pts[3 * g + 1] - b.A[1],
                     pts[3 * g + 2] - b.A[2]};
      double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
      // polynomial with per-axis decrements: P(dec_x, dec_y, dec_z)
      auto P = [&](int dx, int dy, int dz) -> double {
        int e[3] = {pw[0] - dx, pw[1] - dy, pw[2] - dz};
        double v = 1.0;
        for (int x = 0; x < 3; ++x) {
          if (e[x] < 0) return 0.0;
          for (int q = 0; q < e[x]; ++q) v *= d[x];
        }
        return v;
      };
      for (const Prim& p : b.prims) {
        double gv = p.c * std::exp(-p.a * r2);
        double a = p.a;
        for (int c6 = 0; c6 < 6; ++c6) {
          int x = pairs[c6][0], y = pairs[c6][1];
          int dex[3] = {0, 0, 0}, dey[3] = {0, 0, 0}, dexy[3] = {0, 0, 0};
          dex[x] = 1; dey[y] = 1; dexy[x] += 1; dexy[y] += 1;
          double lx = pw[x], ly = pw[y];
          // second derivative of the polynomial part
          double Ppp;
          if (x == y)
            Ppp = lx * (lx - 1) * P(dexy[0], dexy[1], dexy[2]);
          else
            Ppp = lx * ly * P(dexy[0], dexy[1], dexy[2]);
          double Px = lx * P(dex[0], dex[1], dex[2]);
          double Py = ly * P(dey[0], dey[1], dey[2]);
          double P0 = P(0, 0, 0);
          double val;
          if (x == y)
            val = Ppp - 2.0 * a * P0 - 4.0 * a * d[x] * Px +
                  4.0 * a * a * d[x] * d[x] * P0;
          else
            val = Ppp - 2.0 * a * d[x] * Py - 2.0 * a * d[y] * Px +
                  4.0 * a * a * d[x] * d[y] * P0;
          hess[((size_t)g * 6 + c6) * nbf + j] += val * gv;
        }
      }
    }
  }
}

}  // extern "C"

// ===================================================================
// Density-fitting (RI-J) integrals: 3-center (ij|P) and 2-center (P|Q)
// Coulomb tensors over an auxiliary basis.  An auxiliary function
// enters the MD machinery as a pair with a dummy zero-exponent s
// primitive (exponent 0, coefficient 1): q = a*0/(a+0) = 0 makes the
// pair expansion collapse to the single function's own Hermite table.

extern "C" {

void intor_eri_3c(int nbf, const int32_t* lmn, const double* centers,
                  const int32_t* off, const double* exps,
                  const double* coefs, int naux, const int32_t* lmn_p,
                  const double* centers_p, const int32_t* off_p,
                  const double* exps_p, const double* coefs_p,
                  double* out /* [nbf, nbf, naux] */) {
  auto bfs = unpack(nbf, lmn, centers, off, exps, coefs);
  auto aux = unpack(naux, lmn_p, centers_p, off_p, exps_p, coefs_p);
  // aux pair expansions: (P, dummy)
  std::vector<PairExp> apairs(naux);
  for (int p = 0; p < naux; ++p) {
    BF dummy;
    dummy.l = dummy.m = dummy.n = 0;
    dummy.A[0] = aux[p].A[0]; dummy.A[1] = aux[p].A[1];
    dummy.A[2] = aux[p].A[2];
    dummy.prims.push_back({0.0, 1.0});
    apairs[p] = make_pair(aux[p], dummy);
  }
  size_t n = nbf, m = naux;
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j <= i; ++j) {
      PairExp pe = make_pair(bfs[i], bfs[j]);
      for (int p = 0; p < naux; ++p) {
        double v = eri_pair(pe, apairs[p]);
        out[((size_t)i * n + j) * m + p] = v;
        out[((size_t)j * n + i) * m + p] = v;
      }
    }
}

void intor_eri_2c(int naux, const int32_t* lmn_p,
                  const double* centers_p, const int32_t* off_p,
                  const double* exps_p, const double* coefs_p,
                  double* out /* [naux, naux] */) {
  auto aux = unpack(naux, lmn_p, centers_p, off_p, exps_p, coefs_p);
  std::vector<PairExp> apairs(naux);
  for (int p = 0; p < naux; ++p) {
    BF dummy;
    dummy.l = dummy.m = dummy.n = 0;
    dummy.A[0] = aux[p].A[0]; dummy.A[1] = aux[p].A[1];
    dummy.A[2] = aux[p].A[2];
    dummy.prims.push_back({0.0, 1.0});
    apairs[p] = make_pair(aux[p], dummy);
  }
  for (int p = 0; p < naux; ++p)
    for (int q = p; q < naux; ++q) {
      double v = eri_pair(apairs[p], apairs[q]);
      out[(size_t)p * naux + q] = out[(size_t)q * naux + p] = v;
    }
}

}  // extern "C"

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
double eri_pair(const PairExp& bra, const PairExp& ket) {
  int bt = bra.tmax, bu = bra.umax, bv = bra.vmax;
  int kt = ket.tmax, ku = ket.umax, kv = ket.vmax;
  int bnu = bu + 1, bnv = bv + 1, knu = ku + 1, knv = kv + 1;
  double total = 0.0;
  for (const PrimPair& bp : bra.pps)
    for (const PrimPair& kp : ket.pps) {
      double alpha = bp.p * kp.p / (bp.p + kp.p);
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
      total += val * 2.0 * std::pow(PI, 2.5) /
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

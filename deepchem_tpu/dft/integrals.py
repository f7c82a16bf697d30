"""Molecular integrals over contracted Gaussians (McMurchie-Davidson).

Host-side numpy: integrals are computed once per geometry and handed to
the JAX SCF loop as constants — the differentiable path (NN-XC params ->
SCF energy) never needs integral derivatives.  Replaces the role of the
reference's vendored DQC hamiltonian stack
(deepchem/utils/dft_utils/hamilton/intor) with the textbook
McMurchie-Davidson scheme (Helgaker, Jorgensen & Olsen ch. 9).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
from scipy.special import hyp1f1

from deepchem_tpu.dft.basis import BasisFunction


def boys(n: int, x: float) -> float:
    return hyp1f1(n + 0.5, n + 1.5, -x) / (2.0 * n + 1.0)


def _E(i: int, j: int, t: int, Qx: float, a: float, b: float) -> float:
    """Hermite Gaussian expansion coefficient E_t^{ij}."""
    p = a + b
    q = a * b / p
    if t < 0 or t > i + j:
        return 0.0
    if i == j == t == 0:
        return math.exp(-q * Qx * Qx)
    if j == 0:
        return (_E(i - 1, j, t - 1, Qx, a, b) / (2 * p)
                - q * Qx / a * _E(i - 1, j, t, Qx, a, b)
                + (t + 1) * _E(i - 1, j, t + 1, Qx, a, b))
    return (_E(i, j - 1, t - 1, Qx, a, b) / (2 * p)
            + q * Qx / b * _E(i, j - 1, t, Qx, a, b)
            + (t + 1) * _E(i, j - 1, t + 1, Qx, a, b))


def _overlap_prim(a, lmn1, A, b, lmn2, B) -> float:
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    s1 = _E(l1, l2, 0, A[0] - B[0], a, b)
    s2 = _E(m1, m2, 0, A[1] - B[1], a, b)
    s3 = _E(n1, n2, 0, A[2] - B[2], a, b)
    return s1 * s2 * s3 * (math.pi / (a + b)) ** 1.5


def _kinetic_prim(a, lmn1, A, b, lmn2, B) -> float:
    l2, m2, n2 = lmn2
    term0 = b * (2 * (l2 + m2 + n2) + 3) * \
        _overlap_prim(a, lmn1, A, b, lmn2, B)
    term1 = -2 * b * b * (
        _overlap_prim(a, lmn1, A, b, (l2 + 2, m2, n2), B)
        + _overlap_prim(a, lmn1, A, b, (l2, m2 + 2, n2), B)
        + _overlap_prim(a, lmn1, A, b, (l2, m2, n2 + 2), B))
    term2 = -0.5 * (
        l2 * (l2 - 1) * _overlap_prim(a, lmn1, A, b, (l2 - 2, m2, n2), B)
        + m2 * (m2 - 1) * _overlap_prim(a, lmn1, A, b, (l2, m2 - 2, n2), B)
        + n2 * (n2 - 1) * _overlap_prim(a, lmn1, A, b, (l2, m2, n2 - 2), B))
    return term0 + term1 + term2


def _R(t: int, u: int, v: int, n: int, p: float, PC, RPC2: float) -> float:
    """Hermite Coulomb integral R^n_{tuv}."""
    if t == u == v == 0:
        return (-2.0 * p) ** n * boys(n, p * RPC2)
    if t > 0:
        val = 0.0
        if t > 1:
            val += (t - 1) * _R(t - 2, u, v, n + 1, p, PC, RPC2)
        val += PC[0] * _R(t - 1, u, v, n + 1, p, PC, RPC2)
        return val
    if u > 0:
        val = 0.0
        if u > 1:
            val += (u - 1) * _R(t, u - 2, v, n + 1, p, PC, RPC2)
        val += PC[1] * _R(t, u - 1, v, n + 1, p, PC, RPC2)
        return val
    val = 0.0
    if v > 1:
        val += (v - 1) * _R(t, u, v - 2, n + 1, p, PC, RPC2)
    val += PC[2] * _R(t, u, v - 1, n + 1, p, PC, RPC2)
    return val


def _nuclear_prim(a, lmn1, A, b, lmn2, B, C) -> float:
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    p = a + b
    P = (a * np.asarray(A) + b * np.asarray(B)) / p
    PC = P - np.asarray(C)
    RPC2 = float(PC @ PC)
    val = 0.0
    for t in range(l1 + l2 + 1):
        Ex = _E(l1, l2, t, A[0] - B[0], a, b)
        if Ex == 0.0:
            continue
        for u in range(m1 + m2 + 1):
            Ey = _E(m1, m2, u, A[1] - B[1], a, b)
            if Ey == 0.0:
                continue
            for v in range(n1 + n2 + 1):
                Ez = _E(n1, n2, v, A[2] - B[2], a, b)
                if Ez == 0.0:
                    continue
                val += Ex * Ey * Ez * _R(t, u, v, 0, p, PC, RPC2)
    return 2.0 * math.pi / p * val


def _eri_prim(a, lmn1, A, b, lmn2, B, c, lmn3, C, d, lmn4, D,
              omega: float = 0.0) -> float:
    """Primitive (ab|cd); omega > 0 attenuates the kernel to
    erf(omega r12)/r12 — F_m(T) -> s^{m+1/2} F_m(sT) with
    s = omega^2/(alpha + omega^2), i.e. the SAME Hermite R recursion
    at alpha_eff = alpha s, scaled by sqrt(s)."""
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    l3, m3, n3 = lmn3
    l4, m4, n4 = lmn4
    p = a + b
    q = c + d
    alpha = p * q / (p + q)
    scale = 1.0
    if omega > 0.0:
        s = omega * omega / (alpha + omega * omega)
        alpha = alpha * s
        scale = math.sqrt(s)
    P = (a * np.asarray(A) + b * np.asarray(B)) / p
    Q = (c * np.asarray(C) + d * np.asarray(D)) / q
    PQ = P - Q
    RPQ2 = float(PQ @ PQ)
    val = 0.0
    for t in range(l1 + l2 + 1):
        E1 = _E(l1, l2, t, A[0] - B[0], a, b)
        if E1 == 0.0:
            continue
        for u in range(m1 + m2 + 1):
            E2 = _E(m1, m2, u, A[1] - B[1], a, b)
            if E2 == 0.0:
                continue
            for v in range(n1 + n2 + 1):
                E3 = _E(n1, n2, v, A[2] - B[2], a, b)
                if E3 == 0.0:
                    continue
                for tau in range(l3 + l4 + 1):
                    E4 = _E(l3, l4, tau, C[0] - D[0], c, d)
                    if E4 == 0.0:
                        continue
                    for nu in range(m3 + m4 + 1):
                        E5 = _E(m3, m4, nu, C[1] - D[1], c, d)
                        if E5 == 0.0:
                            continue
                        for phi in range(n3 + n4 + 1):
                            E6 = _E(n3, n4, phi, C[2] - D[2], c, d)
                            if E6 == 0.0:
                                continue
                            val += (E1 * E2 * E3 * E4 * E5 * E6
                                    * (-1.0) ** (tau + nu + phi)
                                    * _R(t + tau, u + nu, v + phi, 0,
                                         alpha, PQ, RPQ2))
    return scale * val * 2.0 * math.pi ** 2.5 / (p * q
                                                 * math.sqrt(p + q))


def _contract2(fn, b1: BasisFunction, b2: BasisFunction, *extra) -> float:
    val = 0.0
    for a, ca in zip(b1.exps, b1.coefs):
        for b, cb in zip(b2.exps, b2.coefs):
            val += ca * cb * fn(a, b1.lmn, b1.center, b, b2.lmn,
                                b2.center, *extra)
    return val


def _pack_basis(basis: List[BasisFunction]):
    """Flatten a basis into the ctypes layout intor.cpp consumes."""
    import ctypes
    n = len(basis)
    lmn = np.zeros(3 * n, dtype=np.int32)
    centers = np.zeros(3 * n, dtype=np.float64)
    off = np.zeros(n + 1, dtype=np.int32)
    exps: List[float] = []
    coefs: List[float] = []
    for i, bf in enumerate(basis):
        lmn[3 * i:3 * i + 3] = bf.lmn
        centers[3 * i:3 * i + 3] = bf.center
        exps.extend(float(a) for a in bf.exps)
        coefs.extend(float(c) for c in bf.coefs)
        off[i + 1] = len(exps)
    from deepchem_tpu.native import _ptr
    e = np.asarray(exps, dtype=np.float64)
    c = np.asarray(coefs, dtype=np.float64)
    args = (n, _ptr(lmn, ctypes.c_int32), _ptr(centers, ctypes.c_double),
            _ptr(off, ctypes.c_int32), _ptr(e, ctypes.c_double),
            _ptr(c, ctypes.c_double))
    # keep the arrays alive alongside the pointers
    return args, (lmn, centers, off, e, c)


def _native_1e(basis: List[BasisFunction], which: str):
    from deepchem_tpu.native import get_intor_lib, _ptr
    import ctypes
    lib = get_intor_lib()
    if lib is None:
        return None
    args, keep = _pack_basis(basis)
    n = len(basis)
    out = np.zeros((n, n), dtype=np.float64)
    getattr(lib, which)(*args, _ptr(out, ctypes.c_double))
    return out


def overlap_matrix(basis: List[BasisFunction]) -> np.ndarray:
    out = _native_1e(basis, 'intor_overlap')
    if out is not None:
        return out
    n = len(basis)
    S = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            S[i, j] = S[j, i] = _contract2(_overlap_prim, basis[i],
                                           basis[j])
    return S


def kinetic_matrix(basis: List[BasisFunction]) -> np.ndarray:
    out = _native_1e(basis, 'intor_kinetic')
    if out is not None:
        return out
    n = len(basis)
    T = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            T[i, j] = T[j, i] = _contract2(_kinetic_prim, basis[i],
                                           basis[j])
    return T


def nuclear_matrix(basis: List[BasisFunction], charges: Sequence[int],
                   coords: np.ndarray) -> np.ndarray:
    n = len(basis)
    coords = np.asarray(coords, dtype=np.float64)
    from deepchem_tpu.native import get_intor_lib, _ptr
    import ctypes
    lib = get_intor_lib()
    if lib is not None:
        args, keep = _pack_basis(basis)
        Z = np.asarray(charges, dtype=np.float64)
        ac = np.ascontiguousarray(coords, dtype=np.float64)
        out = np.zeros((n, n), dtype=np.float64)
        lib.intor_nuclear(*args, len(Z), _ptr(Z, ctypes.c_double),
                          _ptr(ac, ctypes.c_double),
                          _ptr(out, ctypes.c_double))
        return out
    V = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            v = 0.0
            for Z, C in zip(charges, coords):
                v -= Z * _contract2(_nuclear_prim, basis[i], basis[j], C)
            V[i, j] = V[j, i] = v
    return V


def eri_tensor(basis: List[BasisFunction],
               omega: float = 0.0) -> np.ndarray:
    """Full (ij|kl) tensor with 8-fold permutational symmetry.
    omega > 0 gives the long-range erf(omega r12)/r12 kernel (range-
    separated hybrids)."""
    n = len(basis)
    from deepchem_tpu.native import get_intor_lib, _ptr
    import ctypes
    lib = get_intor_lib()
    if lib is not None:
        args, keep = _pack_basis(basis)
        out = np.zeros((n, n, n, n), dtype=np.float64)
        if omega > 0.0:
            lib.intor_eri_erf(*args, float(omega),
                              _ptr(out, ctypes.c_double))
        else:
            lib.intor_eri(*args, _ptr(out, ctypes.c_double))
        return out
    eri = np.zeros((n, n, n, n))

    def contracted(i, j, k, l):
        b1, b2, b3, b4 = basis[i], basis[j], basis[k], basis[l]
        val = 0.0
        for a, ca in zip(b1.exps, b1.coefs):
            for b, cb in zip(b2.exps, b2.coefs):
                for c, cc in zip(b3.exps, b3.coefs):
                    for d, cd in zip(b4.exps, b4.coefs):
                        val += ca * cb * cc * cd * _eri_prim(
                            a, b1.lmn, b1.center, b, b2.lmn, b2.center,
                            c, b3.lmn, b3.center, d, b4.lmn, b4.center,
                            omega)
        return val

    for i in range(n):
        for j in range(i + 1):
            for k in range(n):
                for l in range(k + 1):
                    if (i * (i + 1) // 2 + j) < (k * (k + 1) // 2 + l):
                        continue
                    v = contracted(i, j, k, l)
                    for (p, q, r, s) in ((i, j, k, l), (j, i, k, l),
                                         (i, j, l, k), (j, i, l, k),
                                         (k, l, i, j), (l, k, i, j),
                                         (k, l, j, i), (l, k, j, i)):
                        eri[p, q, r, s] = v
    return eri


def ao_values(basis: List[BasisFunction],
              points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """AO values and gradients on grid points.

    Returns (phi [G, N], dphi [G, 3, N]).
    """
    pts = np.asarray(points, dtype=np.float64)
    G, n = len(pts), len(basis)
    from deepchem_tpu.native import get_intor_lib, _ptr
    import ctypes
    lib = get_intor_lib()
    if lib is not None:
        args, keep = _pack_basis(basis)
        pc = np.ascontiguousarray(pts)
        phi = np.zeros((G, n), dtype=np.float64)
        dphi = np.zeros((G, 3, n), dtype=np.float64)
        lib.intor_ao_values(*args, G, _ptr(pc, ctypes.c_double),
                            _ptr(phi, ctypes.c_double),
                            _ptr(dphi, ctypes.c_double))
        return phi, dphi
    phi = np.zeros((G, n))
    dphi = np.zeros((G, 3, n))
    for j, bf in enumerate(basis):
        d = pts - bf.center[None, :]
        r2 = np.einsum('ga,ga->g', d, d)
        l, m, nn_ = bf.lmn
        poly = d[:, 0] ** l * d[:, 1] ** m * d[:, 2] ** nn_
        for a, c in zip(bf.exps, bf.coefs):
            g = c * np.exp(-a * r2)
            phi[:, j] += poly * g
            for ax, pw in enumerate((l, m, nn_)):
                dp = -2.0 * a * d[:, ax] * poly
                if pw > 0:
                    lower = list(bf.lmn)
                    lower[ax] -= 1
                    dp += pw * (d[:, 0] ** lower[0] * d[:, 1] ** lower[1]
                                * d[:, 2] ** lower[2])
                dphi[:, ax, j] += dp * g
    return phi, dphi

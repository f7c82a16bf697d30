"""Post-Hartree-Fock correlation (MP2, 2-electron FCI) and electric
properties (dipole, Mulliken populations, finite-field polarizability).

Post-HF is outside the reference's DFT port (its DQC stack stops at
KS-SCF), but completes the quantum-chemistry story the fast native
integral engine enables.  Validation is self-contained: for H2-class
(2-electron) systems the FCI matrix is tiny and exact, and minimal-basis
MP2 has a closed form in the integrals themselves
(tests/test_dft_scf.py); dipoles are checked two independent ways
(analytic expectation vs the finite-field energy derivative).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF, eigh_safe


def _mo_coeffs(system: DFTSystem, calc) -> Tuple[np.ndarray, np.ndarray]:
    """Converged MO coefficients and energies from a finished RHF calc
    (rebuild F(D) once and diagonalize in the orthonormal basis)."""
    D = np.asarray(calc.D, dtype=np.float64)
    H = system.T + system.V
    J = np.einsum('ijkl,kl->ij', system.eri, D)
    K = np.einsum('ikjl,kl->ij', system.eri, D)
    F = H + J - 0.5 * K
    Sih = system.S_invsqrt
    mo_e, Cp = np.linalg.eigh(Sih.T @ F @ Sih)
    return Sih @ Cp, mo_e


def mp2_energy(system: DFTSystem, calc=None,
               iterations: int = 100) -> Tuple[float, float]:
    """Closed-shell MP2: returns (E_total, E_corr) in Hartree.

    E_corr = sum_{ijab} (ia|jb) [2 (ia|jb) - (ib|ja)] /
             (e_i + e_j - e_a - e_b)
    with i,j occupied and a,b virtual spatial orbitals.
    """
    if calc is None:
        calc = KohnShamSCF('hf', iterations=iterations).run(system)
    C, mo_e = _mo_coeffs(system, calc)
    n_occ = system.n_elec // 2
    n = C.shape[0]
    # AO -> MO transform, O(N^5) via staged contractions
    eri_mo = np.einsum('pi,pqrs->iqrs', C, system.eri)
    eri_mo = np.einsum('qa,iqrs->iars', C, eri_mo)
    eri_mo = np.einsum('rj,iars->iajs', C, eri_mo)
    eri_mo = np.einsum('sb,iajs->iajb', C, eri_mo)
    o = slice(0, n_occ)
    v = slice(n_occ, n)
    iajb = eri_mo[o, v, o, v]
    e_i = mo_e[o]
    e_a = mo_e[v]
    denom = (e_i[:, None, None, None] - e_a[None, :, None, None]
             + e_i[None, None, :, None] - e_a[None, None, None, :])
    e_corr = float(np.sum(iajb * (2.0 * iajb
                                  - iajb.transpose(0, 3, 2, 1)) / denom))
    return float(calc.energy()) + e_corr, e_corr


def fci_2e_energy(system: DFTSystem, calc=None,
                  iterations: int = 100) -> float:
    """Exact (full CI) ground-state total energy for a 2-ELECTRON
    closed-shell system: diagonalize H in the complete singlet
    two-electron space |pq> = (p_alpha q_beta + q_alpha p_beta)/norm
    over all spatial-orbital pairs p <= q.  For two electrons this IS
    full CI (the ground state is a singlet), so it upper-bounds MP2
    and provides an exact in-repo correlation oracle."""
    if calc is None:
        calc = KohnShamSCF('hf', iterations=iterations).run(system)
    if system.n_elec != 2:
        raise ValueError('fci_2e_energy is exact only for 2 electrons')
    C, mo_e = _mo_coeffs(system, calc)
    n = C.shape[0]
    h_ao = system.T + system.V
    h = C.T @ h_ao @ C
    eri_mo = np.einsum('pi,qa,rj,sb,pqrs->iajb', C, C, C, C, system.eri,
                       optimize=True)
    # singlet basis: pairs (p <= q), |pq> = (p_a q_b + q_a p_b)/sqrt(2(1+d))
    pairs = [(p, q) for p in range(n) for q in range(p, n)]
    m = len(pairs)
    Hci = np.zeros((m, m))
    for x, (p, q) in enumerate(pairs):
        npq = math.sqrt(2.0 * (1.0 + (p == q)))
        for y, (r, s) in enumerate(pairs):
            nrs = math.sqrt(2.0 * (1.0 + (r == s)))
            val = 0.0
            # expand |rs> = (r_a s_b + s_a r_b)/nrs, <pq| likewise;
            # <p_a q_b|H|r_a s_b> = h_pr d_qs + h_qs d_pr + (pr|qs)
            for (a1, b1) in ((p, q), (q, p)):
                for (a2, b2) in ((r, s), (s, r)):
                    val += (h[a1, a2] * (b1 == b2)
                            + h[b1, b2] * (a1 == a2)
                            + eri_mo[a1, a2, b1, b2])
            Hci[x, y] = val / (npq * nrs)
    w = np.linalg.eigvalsh(Hci)
    return float(w[0]) + system.e_nuc


def dipole_integrals(basis) -> np.ndarray:
    """AO electric-dipole matrices [3, n, n]: <i| r_c |j> about the
    origin.  McMurchie-Davidson: the x-moment of a primitive pair is
    E_1 + X_P E_0 (Hermite expansion about the composite center P)."""
    from deepchem_tpu.dft.integrals import _E
    n = len(basis)
    M = np.zeros((3, n, n))
    for i in range(n):
        for j in range(i, n):
            bi, bj = basis[i], basis[j]
            li, lj = bi.lmn, bj.lmn
            AB = bi.center - bj.center
            for a, ca in zip(bi.exps, bi.coefs):
                for b, cb in zip(bj.exps, bj.coefs):
                    p = a + b
                    P = (a * bi.center + b * bj.center) / p
                    pref = ca * cb * (math.pi / p) ** 1.5
                    S = [None] * 3
                    D1 = [None] * 3
                    for ax in range(3):
                        e0 = _E(li[ax], lj[ax], 0, AB[ax], a, b)
                        e1 = _E(li[ax], lj[ax], 1, AB[ax], a, b)
                        S[ax] = e0
                        D1[ax] = e1 + P[ax] * e0
                    for ax in range(3):
                        val = pref * D1[ax] * S[(ax + 1) % 3] * \
                            S[(ax + 2) % 3]
                        M[ax, i, j] += val
                        if i != j:
                            M[ax, j, i] += val
    return M


def dipole_moment(system: DFTSystem, calc=None, xc='hf',
                  iterations: int = 100) -> np.ndarray:
    """Molecular dipole vector (atomic units, e*bohr):
    mu = sum_A Z_A R_A - Tr(D M).  Multiply by 2.5417464 for Debye."""
    if calc is None:
        calc = KohnShamSCF(xc, iterations=iterations).run(system)
    D = np.asarray(calc.D, dtype=np.float64)
    M = dipole_integrals(system.basis)
    nuc = np.einsum('a,ax->x', np.asarray(system.charges, float),
                    system.coords)
    return nuc - np.einsum('xij,ij->x', M, D)


def mulliken_charges(system: DFTSystem, calc=None, xc='hf',
                     iterations: int = 100) -> np.ndarray:
    """Mulliken atomic partial charges: q_A = Z_A - sum_{i in A} (DS)_ii."""
    if calc is None:
        calc = KohnShamSCF(xc, iterations=iterations).run(system)
    D = np.asarray(calc.D, dtype=np.float64)
    DS = D @ system.S
    q = np.asarray(system.charges, dtype=np.float64).copy()
    for i, bf in enumerate(system.basis):
        q[bf.atom_index] -= DS[i, i]
    return q


def energy_in_field(system: DFTSystem, field, xc='hf',
                    iterations: int = 100, mixing: float = 0.5) -> float:
    """Total SCF energy with a uniform external electric field F
    (length-gauge H' = H + F . r_electron - F . sum Z R): the
    finite-field route to dipoles/polarizabilities."""
    from deepchem_tpu.dft.scf import scf_loop
    field = np.asarray(field, dtype=np.float64)
    M = dipole_integrals(system.basis)
    # electrons carry charge -1: interaction +F.r in the AO basis
    H = system.T + system.V + np.einsum('x,xij->ij', field, M)
    solver = KohnShamSCF(xc, iterations=iterations, mixing=mixing)
    E, D, mo_e = scf_loop(
        jnp.asarray(H), jnp.asarray(system.S_invsqrt),
        jnp.asarray(system.eri), system.n_elec // 2,
        exc_fn=solver.exc_fn, phi=jnp.asarray(system.phi),
        dphi=jnp.asarray(system.dphi),
        weights=jnp.asarray(system.grid_weights),
        use_sigma=solver.use_sigma, hf_exchange=solver.hf_exchange,
        iterations=iterations, mixing=mixing, use_tau=solver.use_tau)
    e_nuc_field = -float(np.dot(field, np.einsum(
        'a,ax->x', np.asarray(system.charges, float), system.coords)))
    return float(E) + system.e_nuc + e_nuc_field


def polarizability(system: DFTSystem, xc='hf', h: float = 2e-3,
                   iterations: int = 120) -> np.ndarray:
    """Static dipole polarizability tensor alpha [3, 3] (a.u.) by
    central finite differences of the field-dependent energy:
    alpha_xy = -d^2 E / dF_x dF_y."""
    alpha = np.zeros((3, 3))
    e0 = energy_in_field(system, np.zeros(3), xc=xc,
                         iterations=iterations)
    for x in range(3):
        for y in range(x, 3):
            if x == y:
                ep = energy_in_field(system, h * np.eye(3)[x], xc=xc,
                                     iterations=iterations)
                em = energy_in_field(system, -h * np.eye(3)[x], xc=xc,
                                     iterations=iterations)
                alpha[x, x] = -(ep - 2.0 * e0 + em) / h ** 2
            else:
                f = np.zeros(3)
                f[x] = f[y] = h
                epp = energy_in_field(system, f, xc=xc,
                                      iterations=iterations)
                f[y] = -h
                epm = energy_in_field(system, f, xc=xc,
                                      iterations=iterations)
                f[x] = -h
                emm = energy_in_field(system, f, xc=xc,
                                      iterations=iterations)
                f[y] = h
                emp = energy_in_field(system, f, xc=xc,
                                      iterations=iterations)
                alpha[x, y] = alpha[y, x] = \
                    -(epp - epm - emp + emm) / (4.0 * h ** 2)
    return alpha

"""Excited states: CIS / TDA-(TD)DFT on top of the in-repo SCF.

The exchange-correlation KERNEL (f_xc, the second functional derivative
that every TDDFT code hand-derives per functional family) is obtained
here entirely by autodiff: the quadrature Exc is already a jnp function
of the density matrix (dft/scf.py ``_exc_energy`` / ``_exc_energy_spin``),
so the kernel contraction with a trial transition density is one
Hessian-vector product — ``jax.jvp`` through ``jax.grad``.  LDA, GGA,
meta-GGA and hybrids all ride the same two lines; no functional-specific
kernel code exists anywhere.

Spin adaptation (closed shell, spatial-orbital TDA):

  singlet  A_{ia,jb} = d_ij d_ab (e_a - e_i) + 2 (ia|jb)
                       - c_x (ij|ab) + (f^aa_xc + f^ab_xc)_{ia,jb}
  triplet  A_{ia,jb} = d_ij d_ab (e_a - e_i)
                       - c_x (ij|ab) + (f^aa_xc - f^ab_xc)_{ia,jb}

With Exc_closed(D) = Exc_spin(D/2, D/2), the chain rule gives
(f^aa + f^ab) = 2 * Hess[Exc_closed] and (f^aa - f^ab) = the
Da-component of Hess[Exc_spin] along (P, -P) — both exact HVPs.

xc='hf' reduces to CIS (Configuration Interaction Singles); pure
functionals drop the exact-exchange (ij|ab) term.

Reference anchor: the reference's DFT stack (DQC port,
deepchem/utils/dft_utils/qccalc/ks.py) stops at ground-state SCF;
excited states are new capability on the same differentiable substrate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepchem_tpu.dft.scf import (DFTSystem, KohnShamSCF, _exc_energy,
                                  f32_matmuls,
                                  _exc_energy_spin)


def _ks_mo_coeffs(system: DFTSystem, solver: KohnShamSCF,
                  D: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """MO coefficients/energies of the converged (restricted) KS Fock:
    rebuild F(D) = H + J - (c_x/2) K [- (c_lr/2) K_lr] + Vxc and
    diagonalize in the orthonormal basis."""
    H = system.T + system.V
    J = np.einsum('ijkl,kl->ij', system.eri, D)
    F = H + J
    if solver.hf_exchange:
        K = np.einsum('ikjl,kl->ij', system.eri, D)
        F = F - 0.5 * solver.hf_exchange * K
    if getattr(solver, 'hf_exchange_lr', 0.0):
        from deepchem_tpu.dft.scf import _eri_lr_for
        eri_lr = np.asarray(_eri_lr_for(system, solver.omega))
        K = np.einsum('ikjl,kl->ij', eri_lr, D)
        F = F - 0.5 * solver.hf_exchange_lr * K
    if solver.exc_fn is not None:
        Vxc = jax.grad(_exc_energy)(
            jnp.asarray(D), jnp.asarray(system.phi),
            jnp.asarray(system.dphi), jnp.asarray(system.grid_weights),
            solver.exc_fn, solver.use_sigma, solver.use_tau)
        F = F + 0.5 * (np.asarray(Vxc) + np.asarray(Vxc).T)
    Sih = system.S_invsqrt
    mo_e, Cp = np.linalg.eigh(Sih.T @ F @ Sih)
    return Sih @ Cp, mo_e


@dataclass
class TDAResult:
    """Excitation energies (Hartree, ascending), TDA amplitudes
    X[nstates, nocc, nvir] (unit-normalized), oscillator strengths
    (length gauge; zeros for triplets — spin-forbidden), and the SCF
    ground-state energy."""
    energies: np.ndarray
    amplitudes: np.ndarray
    oscillator_strengths: np.ndarray
    e_ground: float
    triplet: bool

    def energies_ev(self) -> np.ndarray:
        return self.energies * 27.211386245988


@f32_matmuls
def tda_excitations(system: DFTSystem, xc='hf', nstates: int = 3,
                    triplet: bool = False, iterations: int = 100,
                    calc=None, solver: Optional[KohnShamSCF] = None
                    ) -> TDAResult:
    """Lowest TDA/CIS excited states of a closed-shell system.

    Builds the full A matrix in the occupied x virtual space (dense —
    fine for the molecule sizes the in-repo bases reach) with the XC
    kernel evaluated by autodiff HVPs, and diagonalizes.  xc='hf' is
    CIS; any KS preset or callable gives TDA-TDDFT.
    """
    if solver is None:
        solver = KohnShamSCF(xc, iterations=iterations)
    if calc is None:
        calc = solver.run(system)
    D0 = np.asarray(calc.D, dtype=np.float64)
    C, mo_e = _ks_mo_coeffs(system, solver, D0)
    nocc = system.n_elec // 2
    nbf = C.shape[0]
    nvir = nbf - nocc
    if nvir == 0:
        raise ValueError('no virtual orbitals: basis too small')
    Co, Cv = C[:, :nocc], C[:, nocc:]
    eo, ev = mo_e[:nocc], mo_e[nocc:]

    # MO-transformed ERI blocks (dense, staged one index at a time)
    eri = system.eri
    t = np.einsum('pqrs,pi->iqrs', eri, Co, optimize=True)
    n_ov = nocc * nvir
    if not triplet:
        t_ia = np.einsum('iqrs,qa->iars', t, Cv, optimize=True)
        ov_ov = np.einsum('iars,rj,sb->iajb', t_ia, Co, Cv,
                          optimize=True)
        A = 2.0 * ov_ov.reshape(n_ov, n_ov)
    else:
        # the Coulomb (ia|jb) term cancels in the triplet combination
        A = np.zeros((n_ov, n_ov))
    if solver.hf_exchange:
        oo_vv = np.einsum('iqrs,qj,ra,sb->ijab', t, Co, Cv, Cv,
                          optimize=True)
        A -= solver.hf_exchange * oo_vv.transpose(0, 2, 1, 3).reshape(
            n_ov, n_ov)
    if getattr(solver, 'hf_exchange_lr', 0.0):
        # range-separated exchange kernel: the exact-exchange block
        # uses the LONG-RANGE (ij|ab) integrals (this is why LC
        # functionals fix charge-transfer states: the -1/R attraction
        # between separated hole and electron survives at large R)
        from deepchem_tpu.dft.scf import _eri_lr_for
        eri_lr = np.asarray(_eri_lr_for(system, solver.omega))
        t_lr = np.einsum('pqrs,pi->iqrs', eri_lr, Co, optimize=True)
        oo_vv = np.einsum('iqrs,qj,ra,sb->ijab', t_lr, Co, Cv, Cv,
                          optimize=True)
        A -= solver.hf_exchange_lr * oo_vv.transpose(
            0, 2, 1, 3).reshape(n_ov, n_ov)
    de = (ev[None, :] - eo[:, None]).ravel()
    A[np.diag_indices_from(A)] += de

    # XC kernel by Hessian-vector products: one HVP per (jb) column.
    if solver.exc_fn is not None:
        phi = jnp.asarray(system.phi)
        dphi = jnp.asarray(system.dphi)
        w = jnp.asarray(system.grid_weights)
        Coj, Cvj = jnp.asarray(Co), jnp.asarray(Cv)
        Dj = jnp.asarray(D0)
        if not triplet:
            # (f_aa + f_ab) = 2 * Hess[Exc_closed(D)]
            def exc_grad(D):
                return jax.grad(_exc_energy)(D, phi, dphi, w,
                                             solver.exc_fn,
                                             solver.use_sigma,
                                             solver.use_tau)

            @jax.jit
            def kernel_cols(P_batch):
                def one(P):
                    _, W = jax.jvp(exc_grad, (Dj,), (P,))
                    return 2.0 * (Coj.T @ W @ Cvj)
                return jax.vmap(one)(P_batch)
        else:
            exc_s = (solver.exc_fn_spin if solver.exc_fn_spin
                     is not None else None)
            if exc_s is None:
                raise ValueError(
                    'triplet TDA needs a spin-resolved functional '
                    '(this preset has none)')

            def exc_grad_a(Da, Db):
                return jax.grad(_exc_energy_spin, argnums=0)(
                    Da, Db, phi, dphi, w, exc_s, solver.use_sigma,
                    solver.use_tau)

            @jax.jit
            def kernel_cols(P_batch):
                def one(P):
                    _, Wa = jax.jvp(exc_grad_a, (Dj / 2, Dj / 2),
                                    (P, -P))
                    return Coj.T @ Wa @ Cvj
                return jax.vmap(one)(P_batch)

        # unit perturbations P^jb = C_j C_b^T, batched over (jb)
        P_all = jnp.einsum('mj,nb->jbmn', Coj, Cvj).reshape(
            n_ov, nbf, nbf)
        K = np.asarray(kernel_cols(P_all)).reshape(n_ov, n_ov)
        # K[jb, ia] = kernel(ia, jb); symmetric by construction, add as
        # computed (transpose for clarity)
        A += K.T

    wvals, wvecs = np.linalg.eigh(0.5 * (A + A.T))
    nstates = min(nstates, n_ov)
    energies = wvals[:nstates]
    X = wvecs[:, :nstates].T.reshape(nstates, nocc, nvir)

    # oscillator strengths f = (2/3) w |<0|r|n>|^2, transition dipole
    # sqrt(2) sum_ia X_ia <i|r|a> (spin-adapted singlet); triplets are
    # spin-forbidden in the dipole approximation
    osc = np.zeros(nstates)
    if not triplet:
        from deepchem_tpu.dft.posthf import dipole_integrals
        mu = dipole_integrals(system.basis)          # [3, nbf, nbf]
        mu_ov = np.einsum('xmn,mi,na->xia', mu, Co, Cv, optimize=True)
        for n in range(nstates):
            td = np.sqrt(2.0) * np.einsum('xia,ia->x', mu_ov, X[n])
            osc[n] = (2.0 / 3.0) * energies[n] * float(td @ td)
    return TDAResult(energies=energies, amplitudes=X,
                     oscillator_strengths=osc,
                     e_ground=float(calc.energy()), triplet=triplet)


@f32_matmuls
def cis_excitations(system: DFTSystem, nstates: int = 3,
                    triplet: bool = False,
                    iterations: int = 100) -> TDAResult:
    """Configuration Interaction Singles = TDA on a Hartree-Fock
    reference."""
    return tda_excitations(system, xc='hf', nstates=nstates,
                           triplet=triplet, iterations=iterations)

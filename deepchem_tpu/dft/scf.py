"""Kohn-Sham / Hartree-Fock SCF driver, differentiable in JAX.

Redesign of reference deepchem/models/dft/scf.py:16 (``XCNNSCF`` wrapping
the vendored DQC solver) as a TPU-first program:

- Integrals (deepchem_tpu/dft/integrals.py) and the Becke grid are built
  once on the host; the SCF itself is a fixed-iteration ``lax.scan`` over
  dense eigh/matmul — static shapes, fully jittable, MXU-friendly.
- The XC potential is never hand-derived: ``Vxc = dExc/dD`` via
  ``jax.grad`` of the quadrature energy, which handles LDA and GGA
  functionals (and neural XC modules) uniformly.
- Because the loop is a differentiable scan, gradients of the converged
  energy w.r.t. neural-XC parameters flow by ordinary backprop — the
  role xitorch's implicit differentiation plays in the reference.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepchem_tpu.dft.basis import (ATOMIC_NUMBER, build_basis,
                                    nuclear_repulsion)
from deepchem_tpu.dft import integrals as ints
from deepchem_tpu.dft.functionals import lda_xc, pbe_xc
from deepchem_tpu.dft.grid import molecular_grid

ANGSTROM_TO_BOHR = 1.0 / 0.52917721092


def _exc_energy(D, phi, dphi, weights, exc_fn, use_sigma):
    """Quadrature Exc as a function of the density matrix (jnp)."""
    rho = jnp.einsum('ij,gi,gj->g', D, phi, phi)
    rho = jnp.maximum(rho, 1e-12)
    if use_sigma:
        grad_rho = 2.0 * jnp.einsum('ij,gai,gj->ga', D, dphi, phi)
        sigma = jnp.einsum('ga,ga->g', grad_rho, grad_rho)
        e = exc_fn(rho, sigma)
    else:
        e = exc_fn(rho)
    return jnp.sum(weights * e)


def scf_loop(H, S_invsqrt, eri, n_occ: int,
             exc_fn: Optional[Callable] = None,
             phi=None, dphi=None, weights=None,
             use_sigma: bool = False, hf_exchange: float = 0.0,
             iterations: int = 50, mixing: float = 0.5):
    """Fixed-iteration restricted SCF; returns (E_electronic, D, mo_e).

    exc_fn=None with hf_exchange=1.0 is Hartree-Fock; exc_fn set with
    hf_exchange=0.0 is pure Kohn-Sham.  All inputs jnp arrays.
    """
    n = H.shape[0]

    def fock(D):
        J = jnp.einsum('ijkl,kl->ij', eri, D)
        F = H + J
        E2 = 0.5 * jnp.einsum('ij,ij->', D, J)
        if hf_exchange:
            K = jnp.einsum('ikjl,kl->ij', eri, D)
            F = F - 0.5 * hf_exchange * K
            E2 = E2 - 0.25 * hf_exchange * jnp.einsum('ij,ij->', D, K)
        Exc = 0.0
        if exc_fn is not None:
            Exc, Vxc = jax.value_and_grad(_exc_energy)(
                D, phi, dphi, weights, exc_fn, use_sigma)
            # d/dD of einsum('ij,...') is already symmetric; symmetrize
            # anyway to guard numerical asymmetry
            F = F + 0.5 * (Vxc + Vxc.T)
        E = jnp.einsum('ij,ij->', D, H) + E2 + Exc
        return F, E

    def density(F):
        Fp = S_invsqrt.T @ F @ S_invsqrt
        mo_e, Cp = jnp.linalg.eigh(Fp)
        C = S_invsqrt @ Cp
        occ = C[:, :n_occ]
        return 2.0 * occ @ occ.T, mo_e

    def step(carry, _):
        D, _ = carry
        F, E = fock(D)
        D_new, mo_e = density(F)
        D = mixing * D_new + (1.0 - mixing) * D
        return (D, mo_e), E

    D0 = jnp.zeros((n, n), dtype=H.dtype)
    (D, mo_e), Es = jax.lax.scan(step, (D0, jnp.zeros(n, dtype=H.dtype)),
                                 None, length=iterations)
    _, E_final = fock(D)
    return E_final, D, mo_e


class DFTSystem:
    """A molecule prepared for SCF: integrals + grid, host-side once.

    Mirrors the reference's DFTSystem (feat/dft_data.py) but carries the
    concrete arrays the JAX solver needs.
    """

    def __init__(self, symbols: Sequence[str], coords,
                 charge: int = 0, units: str = 'angstrom',
                 n_radial: int = 50, grid_level: int = 2):
        coords = np.asarray(coords, dtype=np.float64)
        if units == 'angstrom':
            coords = coords * ANGSTROM_TO_BOHR
        elif units != 'bohr':
            raise ValueError(units)
        self.symbols = list(symbols)
        self.coords = coords
        self.charges = [ATOMIC_NUMBER[s] for s in self.symbols]
        self.n_elec = sum(self.charges) - charge
        if self.n_elec % 2:
            raise ValueError('restricted SCF needs an even electron '
                             f'count, got {self.n_elec}')
        self.basis = build_basis(self.symbols, coords)
        self.S = ints.overlap_matrix(self.basis)
        self.T = ints.kinetic_matrix(self.basis)
        self.V = ints.nuclear_matrix(self.basis, self.charges, coords)
        self.eri = ints.eri_tensor(self.basis)
        self.e_nuc = nuclear_repulsion(self.charges, coords)
        pts, wts = molecular_grid(self.symbols, coords,
                                  n_radial=n_radial, level=grid_level)
        self.grid_points = pts
        self.grid_weights = wts
        self.phi, self.dphi = ints.ao_values(self.basis, pts)
        w, U = np.linalg.eigh(self.S)
        self.S_invsqrt = U @ np.diag(w ** -0.5) @ U.T


class KSCalc:
    """Result of one SCF run (reference utils/dftutils.py:KSCalc)."""

    def __init__(self, system: DFTSystem, energy_elec, D, mo_energies):
        self.system = system
        self._e_elec = energy_elec
        self.D = D
        self.mo_energies = mo_energies

    def energy(self):
        """Total energy (electronic + nuclear repulsion), Hartree."""
        return self._e_elec + self.system.e_nuc

    def density(self, points: Optional[np.ndarray] = None):
        """Electron density on grid points (defaults to the XC grid)."""
        if points is None:
            phi = self.system.phi
        else:
            phi, _ = ints.ao_values(self.system.basis, points)
        return jnp.einsum('ij,gi,gj->g', self.D, phi, phi)


class KohnShamSCF:
    """Restricted KS-DFT / HF driver.

    xc: 'hf', 'lda', 'pbe', or a callable rho[, sigma] -> energy density
    (e.g. a bound flax NN-XC apply).  Use ``run()`` for one system, or
    build a jitted closure over many systems with shared basis sizes.
    """

    def __init__(self, xc='lda', use_sigma: Optional[bool] = None,
                 iterations: int = 50, mixing: float = 0.5):
        self.iterations = iterations
        self.mixing = mixing
        self.hf_exchange = 0.0
        if callable(xc):
            self.exc_fn = xc
            self.use_sigma = bool(use_sigma)
        elif xc == 'hf':
            self.exc_fn = None
            self.use_sigma = False
            self.hf_exchange = 1.0
        elif xc == 'lda':
            self.exc_fn = lda_xc
            self.use_sigma = False
        elif xc == 'pbe':
            self.exc_fn = pbe_xc
            self.use_sigma = True
        else:
            raise ValueError(f'unknown xc {xc!r}')

    def run(self, system: DFTSystem) -> KSCalc:
        E, D, mo_e = scf_loop(
            jnp.asarray(system.T + system.V),
            jnp.asarray(system.S_invsqrt),
            jnp.asarray(system.eri), system.n_elec // 2,
            exc_fn=self.exc_fn,
            phi=jnp.asarray(system.phi),
            dphi=jnp.asarray(system.dphi),
            weights=jnp.asarray(system.grid_weights),
            use_sigma=self.use_sigma, hf_exchange=self.hf_exchange,
            iterations=self.iterations, mixing=self.mixing)
        return KSCalc(system, E, D, mo_e)


class XCNNSCF:
    """SCF with a neural XC functional (reference models/dft/scf.py:16).

    Wraps a flax module (NNLDA/NNPBE/HybridXC) + its params; ``run``
    returns a KSCalc whose energy is differentiable w.r.t. params via
    ``energy_fn``.
    """

    def __init__(self, nnxc, params, use_sigma: bool = False,
                 iterations: int = 50, mixing: float = 0.5):
        self.nnxc = nnxc
        self.params = params
        self.use_sigma = use_sigma
        self.iterations = iterations
        self.mixing = mixing

    def energy_fn(self, system: DFTSystem) -> Callable:
        """Returns params -> total energy (jit/grad-able)."""
        H = jnp.asarray(system.T + system.V)
        Sih = jnp.asarray(system.S_invsqrt)
        eri = jnp.asarray(system.eri)
        phi = jnp.asarray(system.phi)
        dphi = jnp.asarray(system.dphi)
        w = jnp.asarray(system.grid_weights)
        n_occ = system.n_elec // 2
        e_nuc = system.e_nuc

        def total_energy(params):
            if self.use_sigma:
                def exc(rho, sigma):
                    return self.nnxc.apply(params, rho, sigma)
            else:
                def exc(rho):
                    return self.nnxc.apply(params, rho)
            E, _, _ = scf_loop(H, Sih, eri, n_occ, exc_fn=exc,
                               phi=phi, dphi=dphi, weights=w,
                               use_sigma=self.use_sigma,
                               iterations=self.iterations,
                               mixing=self.mixing)
            return E + e_nuc
        return total_energy

    def run(self, system: DFTSystem) -> KSCalc:
        if self.use_sigma:
            def exc(rho, sigma):
                return self.nnxc.apply(self.params, rho, sigma)
        else:
            def exc(rho):
                return self.nnxc.apply(self.params, rho)
        solver = KohnShamSCF(exc, use_sigma=self.use_sigma,
                             iterations=self.iterations,
                             mixing=self.mixing)
        return solver.run(system)

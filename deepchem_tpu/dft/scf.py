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

from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepchem_tpu.dft.basis import (ATOMIC_NUMBER, build_basis,
                                    nuclear_repulsion)
from deepchem_tpu.dft import integrals as ints
from deepchem_tpu.dft.functionals import (lda_xc, pbe_xc, b3lyp_xc,
                                          pbe0_xc, lsda_xc, pbe_xc_spin,
                                          b3lyp_xc_spin, pbe0_xc_spin)
from deepchem_tpu.dft.grid import molecular_grid

ANGSTROM_TO_BOHR = 1.0 / 0.52917721092

#: XC density screen: grid points whose total density falls below this
#: contribute zero XC energy/potential (libxc-style dens_threshold) —
#: far-tail points carry ~1e8 radial weights and amplify clamp-floor
#: functional noise into milli-Hartrees otherwise
_RHO_SCREEN = 1e-10


def f32_matmuls(fn):
    """Force true-f32 matmul precision inside ``fn``.

    TPU executes f32 matmuls at bf16 MXU precision by default — fine
    for neural nets, fatal for SCF: H2/STO-3G Hartree-Fock converges
    8.8 mHa high (-1.10789 vs the literature -1.11671) under bf16
    contractions.  The context is trace-time, so it applies whether
    ``fn`` runs eagerly or inside an outer jit, and it is scoped to
    quantum chemistry only (the ML model zoo keeps MXU-speed bf16).
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision('float32'):
            return fn(*args, **kwargs)
    return wrapped


@f32_matmuls
def _exc_energy(D, phi, dphi, weights, exc_fn, use_sigma,
                use_tau=False):
    """Quadrature Exc as a function of the density matrix (jnp).

    With ``use_tau`` (meta-GGA) the kinetic-energy density
    tau = 1/2 sum_occ |grad psi|^2 = 1/2 sum_d (dphi D dphi) enters as a
    third argument; its contribution to Vxc comes out of the same
    d/dD autodiff (generalized Kohn-Sham)."""
    rho_raw = jnp.einsum('ij,gi,gj->g', D, phi, phi)
    rho = jnp.maximum(rho_raw, 1e-12)
    if use_sigma:
        grad_rho = 2.0 * jnp.einsum('ij,gai,gj->ga', D, dphi, phi)
        sigma = jnp.einsum('ga,ga->g', grad_rho, grad_rho)
        if use_tau:
            tau = 0.5 * jnp.einsum('ij,gai,gaj->g', D, dphi, dphi)
            e = exc_fn(rho, sigma, tau)
        else:
            e = exc_fn(rho, sigma)
    else:
        e = exc_fn(rho)
    # density screen (standard in every grid-DFT code): far-tail points
    # carry enormous radial quadrature weights, and evaluating the
    # functional at the clamp floor there turns numerical noise into
    # milli-Hartrees for gradient-hungry functionals (B88's ~1e-12
    # energy density x 1e8 weights summed over ~20% of the grid)
    return jnp.sum(weights * jnp.where(rho_raw > _RHO_SCREEN, e, 0.0))


@f32_matmuls
def _exc_energy_spin(Da, Db, phi, dphi, weights, exc_fn, use_sigma,
                     use_tau=False):
    """Quadrature Exc for spin-resolved functionals
    exc(rho_a, rho_b[, sigma_aa, sigma_ab, sigma_bb[, tau_a, tau_b]])."""
    ra_raw = jnp.einsum('ij,gi,gj->g', Da, phi, phi)
    rb_raw = jnp.einsum('ij,gi,gj->g', Db, phi, phi)
    rho_a = jnp.maximum(ra_raw, 1e-12)
    rho_b = jnp.maximum(rb_raw, 1e-12)
    if use_sigma:
        ga = 2.0 * jnp.einsum('ij,gai,gj->ga', Da, dphi, phi)
        gb = 2.0 * jnp.einsum('ij,gai,gj->ga', Db, dphi, phi)
        saa = jnp.einsum('ga,ga->g', ga, ga)
        sab = jnp.einsum('ga,ga->g', ga, gb)
        sbb = jnp.einsum('ga,ga->g', gb, gb)
        if use_tau:
            ta = 0.5 * jnp.einsum('ij,gai,gaj->g', Da, dphi, dphi)
            tb = 0.5 * jnp.einsum('ij,gai,gaj->g', Db, dphi, dphi)
            e = exc_fn(rho_a, rho_b, saa, sab, sbb, ta, tb)
        else:
            e = exc_fn(rho_a, rho_b, saa, sab, sbb)
    else:
        e = exc_fn(rho_a, rho_b)
    # density screen on the TOTAL density — see _exc_energy; the same
    # threshold on rho_a + rho_b keeps the restricted and unrestricted
    # paths exactly consistent on closed shells
    mask = (ra_raw + rb_raw) > _RHO_SCREEN
    return jnp.sum(weights * jnp.where(mask, e, 0.0))


@jax.custom_vjp
def eigh_safe(A):
    """eigh whose BACKWARD zeroes the 1/(lambda_i - lambda_j) terms for
    (near-)degenerate pairs instead of producing inf/NaN.  Exact atomic
    p/d-shell degeneracies otherwise NaN every gradient through the SCF
    (the density matrix is rotation-invariant within fully occupied or
    fully virtual degenerate blocks, so dropping those terms is exact
    there; partially occupied degenerate shells are ill-defined for any
    eigh gradient)."""
    w, V = jnp.linalg.eigh(A)
    return w, V                       # plain tuple (not EighResult)


def _eigh_safe_fwd(A):
    w, V = jnp.linalg.eigh(A)
    return (w, V), (w, V)


def _eigh_safe_bwd(res, cotangents):
    w, V = res
    gw, gV = cotangents
    diff = w[None, :] - w[:, None]
    safe = jnp.abs(diff) > 1e-9
    F = jnp.where(safe, 1.0 / jnp.where(safe, diff, 1.0), 0.0)
    mid = jnp.diag(gw) + F * (V.T @ gV)
    gA = V @ mid @ V.T
    return (0.5 * (gA + gA.T),)


eigh_safe.defvjp(_eigh_safe_fwd, _eigh_safe_bwd)


def _diis_fock(Fbuf, Ebuf, idx, window):
    """Pulay DIIS extrapolation over a static ring buffer (jit/scan
    safe, differentiable: the coefficient solve is jnp.linalg.solve on
    the Lagrange-augmented B matrix; empty slots are masked by unit
    diagonal rows so their coefficients are exactly zero)."""
    valid = jnp.arange(window) < jnp.minimum(idx + 1, window)
    B = jnp.einsum('aij,bij->ab', Ebuf, Ebuf)
    vv = valid[:, None] & valid[None, :]
    # scale-normalize B (the DIIS coefficients are invariant to a
    # uniform scaling of B) and ridge at the dtype's precision so the
    # augmented solve stays conditioned in f32 as well as f64
    Bmax = jnp.maximum(jnp.max(jnp.abs(jnp.where(vv, B, 0.0))),
                       jnp.asarray(1e-30, Fbuf.dtype))
    B = B / Bmax
    eps = 1e-12 if Fbuf.dtype == jnp.float64 else 1e-5
    A = jnp.zeros((window + 1, window + 1), dtype=Fbuf.dtype)
    A = A.at[:window, :window].set(
        jnp.where(vv, B, 0.0)
        + jnp.diag(jnp.where(valid, eps, 1.0)))
    ones = jnp.where(valid, 1.0, 0.0)
    A = A.at[:window, window].set(ones)
    A = A.at[window, :window].set(ones)
    rhs = jnp.zeros(window + 1, dtype=Fbuf.dtype).at[window].set(1.0)
    # the extrapolation COEFFICIENTS are a solver detail: at the fixed
    # point the energy is stationary in them (F_diis -> F), so their
    # parameter sensitivity is second-order — stop_gradient keeps the
    # backward pass on the well-conditioned Fbuf path (the near-singular
    # converged B matrix otherwise NaNs the solve backward in f32)
    c = jax.lax.stop_gradient(jnp.linalg.solve(A, rhs)[:window])
    return jnp.einsum('a,aij->ij', c, Fbuf)


@f32_matmuls
def scf_loop(H, S_invsqrt, eri, n_occ: int,
             exc_fn: Optional[Callable] = None,
             phi=None, dphi=None, weights=None,
             use_sigma: bool = False, hf_exchange: float = 0.0,
             iterations: int = 50, mixing: float = 0.5,
             use_tau: bool = False, diis: bool = True,
             diis_window: int = 6, diis_start: int = 2,
             eri_lr=None, hf_exchange_lr: float = 0.0):
    """Fixed-iteration restricted SCF; returns (E_electronic, D, mo_e).

    exc_fn=None with hf_exchange=1.0 is Hartree-Fock; exc_fn set with
    hf_exchange=0.0 is pure Kohn-Sham.  All inputs jnp arrays.  DIIS
    (Pulay commutator extrapolation over a ``diis_window`` ring buffer,
    engaged after ``diis_start`` plain-mixing iterations) is on by
    default; the whole accelerator lives inside the lax.scan with
    static shapes and stays differentiable end to end.
    """
    n = H.shape[0]
    ri = eri.ndim == 3          # whitened RI factors B_w [n, n, m]
    if ri and hf_exchange:
        raise ValueError('RI-J supports pure functionals only (no '
                         'exact-exchange K with fitted integrals)')

    def coulomb(D):
        if ri:
            c = jnp.einsum('klp,kl->p', eri, D)
            return jnp.einsum('ijp,p->ij', eri, c)
        return jnp.einsum('ijkl,kl->ij', eri, D)

    def fock(D):
        J = coulomb(D)
        F = H + J
        E2 = 0.5 * jnp.einsum('ij,ij->', D, J)
        if hf_exchange:
            K = jnp.einsum('ikjl,kl->ij', eri, D)
            F = F - 0.5 * hf_exchange * K
            E2 = E2 - 0.25 * hf_exchange * jnp.einsum('ij,ij->', D, K)
        if hf_exchange_lr:
            # range-separated hybrids: exact exchange only through the
            # long-range erf(omega r12)/r12 kernel
            K = jnp.einsum('ikjl,kl->ij', eri_lr, D)
            F = F - 0.5 * hf_exchange_lr * K
            E2 = E2 - 0.25 * hf_exchange_lr * jnp.einsum('ij,ij->', D,
                                                         K)
        Exc = 0.0
        if exc_fn is not None:
            Exc, Vxc = jax.value_and_grad(_exc_energy)(
                D, phi, dphi, weights, exc_fn, use_sigma, use_tau)
            # d/dD of einsum('ij,...') is already symmetric; symmetrize
            # anyway to guard numerical asymmetry
            F = F + 0.5 * (Vxc + Vxc.T)
        E = jnp.einsum('ij,ij->', D, H) + E2 + Exc
        return F, E

    def density_p(Fp):
        mo_e, Cp = eigh_safe(Fp)
        C = S_invsqrt @ Cp
        occ = C[:, :n_occ]
        return 2.0 * occ @ occ.T, mo_e

    W = int(diis_window)
    S_sqrt = jnp.linalg.inv(S_invsqrt) if diis else None

    def step(carry, idx):
        D, _, Fbuf, Ebuf = carry
        F, E = fock(D)
        Fp = S_invsqrt.T @ F @ S_invsqrt
        if diis:
            # commutator error in the orthonormal basis
            Dp = S_sqrt @ D @ S_sqrt.T
            err = Fp @ Dp - Dp @ Fp
            slot = idx % W
            Fbuf = Fbuf.at[slot].set(Fp)
            Ebuf = Ebuf.at[slot].set(err)
            F_diis = _diis_fock(Fbuf, Ebuf, idx, W)
            use_diis = idx >= diis_start
            Fp_use = jnp.where(use_diis, F_diis, Fp)
            D_new, mo_e = density_p(Fp_use)
            mix = jnp.where(use_diis, 1.0, mixing)
        else:
            D_new, mo_e = density_p(Fp)
            mix = mixing
        D = mix * D_new + (1.0 - mix) * D
        return (D, mo_e, Fbuf, Ebuf), E

    D0 = jnp.zeros((n, n), dtype=H.dtype)
    Fbuf0 = jnp.zeros((W, n, n), dtype=H.dtype)
    Ebuf0 = jnp.zeros((W, n, n), dtype=H.dtype)
    (D, mo_e, _, _), Es = jax.lax.scan(
        step, (D0, jnp.zeros(n, dtype=H.dtype), Fbuf0, Ebuf0),
        jnp.arange(iterations))
    _, E_final = fock(D)
    return E_final, D, mo_e


class DFTSystem:
    """A molecule prepared for SCF: integrals + grid, host-side once.

    Mirrors the reference's DFTSystem (feat/dft_data.py) but carries the
    concrete arrays the JAX solver needs.
    """

    def __init__(self, symbols: Sequence[str], coords,
                 charge: int = 0, units: str = 'angstrom',
                 n_radial: int = 50, grid_level: int = 2,
                 basis: str = 'sto-3g', density_fit: bool = False,
                 aux_beta: float = 2.5, grid_scheme: str = 'product'):
        coords = np.asarray(coords, dtype=np.float64)
        if units == 'angstrom':
            coords = coords * ANGSTROM_TO_BOHR
        elif units != 'bohr':
            raise ValueError(units)
        self.symbols = list(symbols)
        self.coords = coords
        self.basis_name = basis
        self.charges = [ATOMIC_NUMBER[s] for s in self.symbols]
        self.n_elec = sum(self.charges) - charge
        self.basis = build_basis(self.symbols, coords, basis=basis)
        self.S = ints.overlap_matrix(self.basis)
        self.T = ints.kinetic_matrix(self.basis)
        self.V = ints.nuclear_matrix(self.basis, self.charges, coords)
        self.density_fit = bool(density_fit)
        if density_fit:
            # RI-J: whitened 3-center factors instead of the n^4 tensor
            from deepchem_tpu.dft.df import ri_fit
            self.eri, self.aux_basis = ri_fit(self.basis, beta=aux_beta)
        else:
            self.eri = ints.eri_tensor(self.basis)
        self.e_nuc = nuclear_repulsion(self.charges, coords)
        self.grid_params = (n_radial, grid_level)
        if grid_scheme == 'pruned':
            # NWChem zone pruning over the RadialGrid/transform stack
            # (dft/radial.py) — fewer points at matched accuracy
            from deepchem_tpu.dft.radial import pruned_molecular_grid
            pts, wts = pruned_molecular_grid(
                self.symbols, coords, n_radial=n_radial,
                prec=(9, 17, 23)[min(grid_level, 3) - 1])
        elif grid_scheme == 'product':
            pts, wts = molecular_grid(self.symbols, coords,
                                      n_radial=n_radial,
                                      level=grid_level)
        else:
            raise ValueError(f'unknown grid_scheme {grid_scheme!r} '
                             "(available: 'product', 'pruned')")
        self.grid_points = pts
        self.grid_weights = wts
        self.phi, self.dphi = ints.ao_values(self.basis, pts)
        w, U = np.linalg.eigh(self.S)
        self.S_invsqrt = U @ np.diag(w ** -0.5) @ U.T


def _eri_lr_for(system: 'DFTSystem', omega: float):
    """Long-range erf-attenuated ERI tensor, cached on the system
    (one per omega — range-separated SCFs reuse it across runs)."""
    cache = getattr(system, '_eri_lr_cache', None)
    if cache is None:
        cache = {}
        system._eri_lr_cache = cache
    key = round(float(omega), 12)
    if key not in cache:
        if getattr(system, 'eri', None) is not None and \
                system.eri.ndim == 3:
            raise ValueError('range-separated hybrids need the exact '
                             'ERI path (density_fit=False)')
        cache[key] = jnp.asarray(ints.eri_tensor(system.basis,
                                                 omega=omega))
    return cache[key]


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
                 iterations: int = 50, mixing: float = 0.5,
                 use_tau: bool = False):
        self.iterations = iterations
        self.mixing = mixing
        self.hf_exchange = 0.0
        self.hf_exchange_lr = 0.0
        self.omega = 0.0
        self.use_tau = use_tau
        self.exc_fn_spin: Optional[Callable] = None
        if callable(xc):
            self.exc_fn = xc
            self.use_sigma = bool(use_sigma)
        elif xc == 'hf':
            self.exc_fn = None
            self.use_sigma = False
            self.hf_exchange = 1.0
        elif xc in ('lda', 'lsda', 'svwn'):
            self.exc_fn = lda_xc
            self.exc_fn_spin = lsda_xc
            self.use_sigma = False
        elif xc == 'pbe':
            self.exc_fn = pbe_xc
            self.exc_fn_spin = pbe_xc_spin
            self.use_sigma = True
        elif xc in ('lc-lda', 'lc-lsda', 'lc-svwn'):
            # range-separated hybrid: short-range LDA exchange + full
            # VWN correlation in the functional; 100% exact exchange
            # through the LONG-RANGE erf(omega r12)/r12 kernel only
            from deepchem_tpu.dft.functionals import lc_lda_xc
            self.omega = 0.40
            closed, spin = lc_lda_xc(self.omega)
            self.exc_fn = closed
            self.exc_fn_spin = spin
            self.use_sigma = False
            self.hf_exchange_lr = 1.0
        elif xc == 'blyp':
            # pure GGA: B88 exchange + LYP correlation
            from deepchem_tpu.dft.functionals import (blyp_xc,
                                                      blyp_xc_spin)
            self.exc_fn = blyp_xc
            self.exc_fn_spin = blyp_xc_spin
            self.use_sigma = True
        elif xc == 'b3lyp':
            # hybrid: 20% exact exchange + B88/LYP semilocal mix
            self.exc_fn = b3lyp_xc
            self.exc_fn_spin = b3lyp_xc_spin
            self.use_sigma = True
            self.hf_exchange = 0.20
        elif xc == 'pbe0':
            # hybrid: 25% exact exchange + 75% PBE_x + PBE_c
            self.exc_fn = pbe0_xc
            self.exc_fn_spin = pbe0_xc_spin
            self.use_sigma = True
            self.hf_exchange = 0.25
        elif xc == 'scan':
            # meta-GGA (tau-dependent); dft/functionals.py SCAN port
            from deepchem_tpu.dft.functionals import (scan_xc,
                                                      scan_xc_spin)
            self.exc_fn = scan_xc
            self.exc_fn_spin = scan_xc_spin
            self.use_sigma = True
            self.use_tau = True
        else:
            raise ValueError(f'unknown xc {xc!r}')

    def run(self, system: DFTSystem) -> KSCalc:
        if system.n_elec % 2:
            raise ValueError(
                'restricted SCF needs an even electron count, got '
                f'{system.n_elec}; use run_unrestricted for open shells')
        E, D, mo_e = scf_loop(
            jnp.asarray(system.T + system.V),
            jnp.asarray(system.S_invsqrt),
            jnp.asarray(system.eri), system.n_elec // 2,
            exc_fn=self.exc_fn,
            phi=jnp.asarray(system.phi),
            dphi=jnp.asarray(system.dphi),
            weights=jnp.asarray(system.grid_weights),
            use_sigma=self.use_sigma, hf_exchange=self.hf_exchange,
            iterations=self.iterations, mixing=self.mixing,
            use_tau=self.use_tau,
            eri_lr=_eri_lr_for(system, self.omega)
            if self.hf_exchange_lr else None,
            hf_exchange_lr=self.hf_exchange_lr)
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

    def _exc_closure(self, params):
        if self.use_sigma:
            def exc(rho, sigma):
                return self.nnxc.apply(params, rho, sigma)
        else:
            def exc(rho):
                return self.nnxc.apply(params, rho)
        return exc

    def energy_fn_unrestricted(self, system: DFTSystem,
                               spin: int = 0) -> Callable:
        """params -> total energy for open-shell systems (total-density
        neural functional over spin-summed rho)."""
        if not spin:
            spin = system.n_elec % 2
        n_alpha = (system.n_elec + spin) // 2
        n_beta = system.n_elec - n_alpha
        H = jnp.asarray(system.T + system.V)
        Sih = jnp.asarray(system.S_invsqrt)
        eri = jnp.asarray(system.eri)
        phi = jnp.asarray(system.phi)
        dphi = jnp.asarray(system.dphi)
        w = jnp.asarray(system.grid_weights)
        e_nuc = system.e_nuc

        def total_energy(params):
            E, _, _ = scf_loop_unrestricted(
                H, Sih, eri, n_alpha, n_beta,
                exc_fn=self._exc_closure(params), phi=phi, dphi=dphi,
                weights=w, use_sigma=self.use_sigma,
                iterations=self.iterations, mixing=self.mixing)
            return E + e_nuc
        return total_energy

    def system_energy_fn(self, system: DFTSystem,
                         spin: int = 0) -> Callable:
        """params -> total energy, restricted when closed-shell and
        spin-unpolarized, else unrestricted."""
        if spin or system.n_elec % 2:
            return self.energy_fn_unrestricted(system, spin)
        return self.energy_fn(system)

    def density_matrix_fn(self, system: DFTSystem) -> Callable:
        """params -> total AO density matrix (reference _EntryDM
        get_val: qcs[0].aodmtot())."""
        H = jnp.asarray(system.T + system.V)
        Sih = jnp.asarray(system.S_invsqrt)
        eri = jnp.asarray(system.eri)
        phi = jnp.asarray(system.phi)
        dphi = jnp.asarray(system.dphi)
        w = jnp.asarray(system.grid_weights)
        n_occ = system.n_elec // 2

        def dm(params):
            _, D, _ = scf_loop(H, Sih, eri, n_occ,
                               exc_fn=self._exc_closure(params),
                               phi=phi, dphi=dphi, weights=w,
                               use_sigma=self.use_sigma,
                               iterations=self.iterations,
                               mixing=self.mixing)
            return D
        return dm

    def density_fn(self, system: DFTSystem) -> Callable:
        """params -> electron density on the system's grid (reference
        _EntryDens get_val via its integration grid)."""
        dm = self.density_matrix_fn(system)
        phi = jnp.asarray(system.phi)

        @f32_matmuls
        def dens(params):
            # f32_matmuls: the grid einsum otherwise contracts at bf16
            # MXU precision on TPU, silently degrading dens-entry
            # neural-XC training targets (same class as the SCF bug).
            D = dm(params)
            return jnp.einsum('ij,gi,gj->g', D, phi, phi)
        return dens

    def run(self, system: DFTSystem) -> KSCalc:
        solver = KohnShamSCF(self._exc_closure(self.params),
                             use_sigma=self.use_sigma,
                             iterations=self.iterations,
                             mixing=self.mixing)
        return solver.run(system)


@f32_matmuls
def scf_loop_unrestricted(H, S_invsqrt, eri, n_alpha: int, n_beta: int,
                          exc_fn: Optional[Callable] = None,
                          phi=None, dphi=None, weights=None,
                          use_sigma: bool = False,
                          hf_exchange: float = 0.0,
                          iterations: int = 50, mixing: float = 0.5,
                          spin_polarized_xc: bool = False,
                          use_tau: bool = False, diis: bool = True,
                          diis_window: int = 6, diis_start: int = 8,
                          eri_lr=None, hf_exchange_lr: float = 0.0,
                          D0=None, return_fock: bool = False):
    """Unrestricted (spin-polarized occupations) SCF for open-shell
    systems — atomization-energy references need isolated atoms.

    With ``spin_polarized_xc=True`` the functional is the TRUE
    spin-density form exc(rho_a, rho_b[, sigmas]) with independent
    Vxc_a/Vxc_b = dExc/dDa, dExc/dDb (the reference's libxc spin
    interface); otherwise the total-density approximation is used.
    UHF-style DIIS (one coefficient set over the stacked alpha/beta
    Fock and commutator-error buffers) is on by default; it engages
    only after ``diis_start`` plain-mixing iterations because DIIS
    converges to ANY commutator-stationary point — engaged too early
    on open shells it can lock onto an excited SCF solution (Li/SCAN
    landed 1.28 Ha high with diis_start=4; >= 8 recovers the ground
    state).
    Returns (E_electronic, (Da, Db), (mo_a, mo_b))."""
    n = H.shape[0]

    ri = eri.ndim == 3
    if ri and hf_exchange:
        raise ValueError('RI-J supports pure functionals only')

    def fock(Da, Db):
        D = Da + Db
        if ri:
            c = jnp.einsum('klp,kl->p', eri, D)
            J = jnp.einsum('ijp,p->ij', eri, c)
        else:
            J = jnp.einsum('ijkl,kl->ij', eri, D)
        Fa = H + J
        Fb = H + J
        E2 = 0.5 * jnp.einsum('ij,ij->', D, J)
        if hf_exchange:
            Ka = jnp.einsum('ikjl,kl->ij', eri, Da)
            Kb = jnp.einsum('ikjl,kl->ij', eri, Db)
            Fa = Fa - hf_exchange * Ka
            Fb = Fb - hf_exchange * Kb
            E2 = E2 - 0.5 * hf_exchange * (
                jnp.einsum('ij,ij->', Da, Ka)
                + jnp.einsum('ij,ij->', Db, Kb))
        if hf_exchange_lr:
            Ka = jnp.einsum('ikjl,kl->ij', eri_lr, Da)
            Kb = jnp.einsum('ikjl,kl->ij', eri_lr, Db)
            Fa = Fa - hf_exchange_lr * Ka
            Fb = Fb - hf_exchange_lr * Kb
            E2 = E2 - 0.5 * hf_exchange_lr * (
                jnp.einsum('ij,ij->', Da, Ka)
                + jnp.einsum('ij,ij->', Db, Kb))
        Exc = 0.0
        if exc_fn is not None and spin_polarized_xc:
            Exc, (Vxa, Vxb) = jax.value_and_grad(
                _exc_energy_spin, argnums=(0, 1))(
                Da, Db, phi, dphi, weights, exc_fn, use_sigma, use_tau)
            Fa = Fa + 0.5 * (Vxa + Vxa.T)
            Fb = Fb + 0.5 * (Vxb + Vxb.T)
        elif exc_fn is not None:
            Exc, Vxc = jax.value_and_grad(_exc_energy)(
                D, phi, dphi, weights, exc_fn, use_sigma, use_tau)
            Vxc = 0.5 * (Vxc + Vxc.T)
            Fa = Fa + Vxc
            Fb = Fb + Vxc
        E = jnp.einsum('ij,ij->', D, H) + E2 + Exc
        return Fa, Fb, E

    def density(F, nocc):
        Fp = S_invsqrt.T @ F @ S_invsqrt
        mo_e, Cp = eigh_safe(Fp)
        C = S_invsqrt @ Cp
        occ = C[:, :nocc] if nocc > 0 else C[:, :1] * 0.0
        return occ @ occ.T, mo_e

    W = int(diis_window)
    S_sqrt = jnp.linalg.inv(S_invsqrt) if diis else None

    def step(carry, idx):
        Da, Db, Fbuf, Ebuf = carry
        Fa, Fb, E = fock(Da, Db)
        if diis:
            Fpa = S_invsqrt.T @ Fa @ S_invsqrt
            Fpb = S_invsqrt.T @ Fb @ S_invsqrt
            Dpa = S_sqrt @ Da @ S_sqrt.T
            Dpb = S_sqrt @ Db @ S_sqrt.T
            err = jnp.stack([Fpa @ Dpa - Dpa @ Fpa,
                             Fpb @ Dpb - Dpb @ Fpb])
            slot = idx % W
            Fbuf = Fbuf.at[slot].set(jnp.stack([Fpa, Fpb]))
            Ebuf = Ebuf.at[slot].set(err)
            Fd = _diis_fock(
                Fbuf.reshape(W, -1, n), Ebuf.reshape(W, -1, n), idx, W
            ).reshape(2, n, n)
            use_diis = idx >= diis_start
            Fpa_use = jnp.where(use_diis, Fd[0], Fpa)
            Fpb_use = jnp.where(use_diis, Fd[1], Fpb)
            mo_ea, Cpa = eigh_safe(Fpa_use)
            mo_eb, Cpb = eigh_safe(Fpb_use)
            Ca = S_invsqrt @ Cpa
            Cb = S_invsqrt @ Cpb
            occa = Ca[:, :n_alpha] if n_alpha > 0 else Ca[:, :1] * 0.0
            occb = Cb[:, :n_beta] if n_beta > 0 else Cb[:, :1] * 0.0
            Da_new = occa @ occa.T
            Db_new = occb @ occb.T
            mix = jnp.where(use_diis, 1.0, mixing)
        else:
            Da_new, _ = density(Fa, n_alpha)
            Db_new, _ = density(Fb, n_beta)
            mix = mixing
        Da = mix * Da_new + (1.0 - mix) * Da
        Db = mix * Db_new + (1.0 - mix) * Db
        return (Da, Db, Fbuf, Ebuf), E

    if D0 is None:
        # break spin symmetry slightly so alpha != beta solutions can
        # emerge
        D0a = jnp.eye(n, dtype=H.dtype) * (n_alpha / max(n, 1)) * 0.1
        D0b = jnp.zeros((n, n), dtype=H.dtype)
    else:
        D0a = jnp.asarray(D0[0], dtype=H.dtype)
        D0b = jnp.asarray(D0[1], dtype=H.dtype)
    Fbuf0 = jnp.zeros((W, 2, n, n), dtype=H.dtype)
    Ebuf0 = jnp.zeros((W, 2, n, n), dtype=H.dtype)
    (Da, Db, _, _), _ = jax.lax.scan(step, (D0a, D0b, Fbuf0, Ebuf0),
                                     jnp.arange(iterations))
    Fa, Fb, E_final = fock(Da, Db)
    _, mo_a = density(Fa, n_alpha)
    _, mo_b = density(Fb, n_beta)
    if return_fock:
        return E_final, (Da, Db), (mo_a, mo_b), (Fa, Fb)
    return E_final, (Da, Db), (mo_a, mo_b)


def scf_loop_unrestricted_stable(H, S_invsqrt, eri, n_alpha: int,
                                 n_beta: int, restarts: int = 3,
                                 **kw):
    """Multi-seed UHF/UKS: aufbau self-consistency does NOT imply the
    ground-state SCF solution — NH2/STO-3G converges 81 mHa above a
    plain same-spatial-orbital determinant from the default symmetry-
    broken seed (caught by the determinant-FCI oracle: the 'correlation
    energy' came out 2.5x water's, impossible for a 98.6%-single-
    reference state).  This wrapper re-seeds the scan from the aufbau
    determinants of the converged alpha and beta Fock operators (both
    spins in the SAME spatial set) and keeps the lowest converged
    energy, iterating until no seed improves.  Eager-only (host
    control flow around the jitted scan); traced paths keep the raw
    loop."""
    best = scf_loop_unrestricted(H, S_invsqrt, eri, n_alpha, n_beta,
                                 return_fock=True, **kw)
    Sih = np.asarray(S_invsqrt)
    for _ in range(max(restarts, 0)):
        E_best = float(best[0])
        Fa, Fb = best[3]
        improved = False
        for F in (Fa, Fb):
            Fp = Sih.T @ np.asarray(F) @ Sih
            _, Cp = np.linalg.eigh(Fp)
            C = Sih @ Cp
            Da0 = C[:, :n_alpha] @ C[:, :n_alpha].T
            Db0 = C[:, :n_beta] @ C[:, :n_beta].T
            trial = scf_loop_unrestricted(
                H, S_invsqrt, eri, n_alpha, n_beta,
                D0=(Da0, Db0), return_fock=True, **kw)
            if float(trial[0]) < E_best - 1e-10:
                best = trial
                E_best = float(trial[0])
                improved = True
        if not improved:
            break
    return best[0], best[1], best[2]


#: ground-state unpaired electrons for light atoms (Hund's rule)
_ATOM_SPIN = {1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 2, 7: 3, 8: 2, 9: 1,
              10: 0, 11: 1, 12: 0, 13: 1, 14: 2, 15: 3, 16: 2, 17: 1,
              18: 0}


def run_unrestricted(system: 'DFTSystem', xc='lda',
                     spin: Optional[int] = None, iterations: int = 80,
                     mixing: float = 0.4):
    """Convenience: one unrestricted SCF on a DFTSystem; spin = n_alpha -
    n_beta (defaults to the atomic ground state for single atoms, else
    n_elec % 2)."""
    if spin is None:
        if len(system.symbols) == 1:
            spin = _ATOM_SPIN.get(system.charges[0], system.n_elec % 2)
        else:
            spin = system.n_elec % 2
    n_alpha = (system.n_elec + spin) // 2
    n_beta = system.n_elec - n_alpha
    solver = KohnShamSCF(xc, iterations=iterations, mixing=mixing)
    # prefer the true spin-density functional when the preset has one
    exc = solver.exc_fn_spin if solver.exc_fn_spin is not None \
        else solver.exc_fn
    E, (Da, Db), _ = scf_loop_unrestricted_stable(
        jnp.asarray(system.T + system.V),
        jnp.asarray(system.S_invsqrt), jnp.asarray(system.eri),
        n_alpha, n_beta, exc_fn=exc,
        phi=jnp.asarray(system.phi), dphi=jnp.asarray(system.dphi),
        weights=jnp.asarray(system.grid_weights),
        use_sigma=solver.use_sigma, hf_exchange=solver.hf_exchange,
        iterations=iterations, mixing=mixing,
        spin_polarized_xc=solver.exc_fn_spin is not None,
        use_tau=solver.use_tau,
        eri_lr=_eri_lr_for(system, solver.omega)
        if solver.hf_exchange_lr else None,
        hf_exchange_lr=solver.hf_exchange_lr)
    return float(E) + system.e_nuc


def parse_moldesc(moldesc: str) -> Tuple[List[str], 'np.ndarray']:
    """'Li 1.5070 0 0; H -1.5070 0 0' -> (symbols, coords[bohr])
    (DQC moldesc format used by the reference's DFT yaml entries)."""
    symbols, coords = [], []
    for part in moldesc.split(';'):
        toks = part.split()
        if not toks:
            continue
        symbols.append(toks[0])
        coords.append([float(x) for x in toks[1:4]])
    return symbols, np.asarray(coords, dtype=np.float64)


class DFTEntry:
    """One labeled DFT datapoint (reference feat/dft_data.py DFTEntry
    hierarchy _EntryAE/_EntryIE/_EntryDM/_EntryDens):

    - 'ae'/'ie': energy combination sum_i n_i E_i - 2 n_0 E_0 over the
      listed systems (the reference's get_val formula,
      feat/dft_data.py _EntryIE.get_val) — for a single-system 'ae'
      entry the isolated-atom references are derived from the formula
      instead;
    - 'e': plain total energy sum;
    - 'dm': the single system's total AO density matrix (true_val may
      be a .npy path);
    - 'dens': the single system's density profile on its own grid.

    Each system desc may carry 'charge', 'spin' (n_alpha - n_beta) and
    'n' (multiplicity in the energy combination; reference's
    ``system.no``)."""

    def __init__(self, e_type: str, true_val, systems: Sequence[dict],
                 weight: float = 1.0, n_radial: int = 40,
                 grid_level: int = 1):
        self.e_type = e_type
        if e_type in ('dm', 'dens') and isinstance(true_val, str):
            self.true_val = np.load(true_val)
        elif e_type in ('dm', 'dens'):
            self.true_val = np.asarray(true_val, dtype=np.float64)
        else:
            self.true_val = float(true_val)
        self.weight = float(weight)
        self.system_descs = list(systems)
        if e_type in ('dm', 'dens') and len(self.system_descs) != 1:
            raise ValueError(f'{e_type} entries take exactly one system')
        self._kw = dict(n_radial=n_radial, grid_level=grid_level)
        self._systems: Optional[List[DFTSystem]] = None

    def get_true_val(self):
        return self.true_val

    def get_weight(self) -> float:
        return self.weight

    @property
    def ns(self) -> List[int]:
        return [int(d.get('n', 1)) for d in self.system_descs]

    @property
    def spins(self) -> List[int]:
        return [int(d.get('spin', 0)) for d in self.system_descs]

    def get_systems(self) -> List['DFTSystem']:
        if self._systems is None:
            self._systems = []
            for desc in self.system_descs:
                symbols, coords = parse_moldesc(desc['moldesc'])
                self._systems.append(DFTSystem(
                    symbols, coords, charge=int(desc.get('charge', 0)),
                    units='bohr', **self._kw))
        return self._systems

    def combine_energies(self, energies: Sequence) -> Any:
        """The reference get_val energy combination for 'ae'/'ie':
        sum_i n_i E_i - 2 n_0 E_0 (molecule/neutral first)."""
        terms = [n * e for n, e in zip(self.ns, energies)]
        return sum(terms) - 2.0 * terms[0]

    def atom_systems(self) -> List[Tuple[str, int]]:
        """Unique (symbol, count) pairs across all systems — the isolated
        atoms an atomization energy references."""
        from collections import Counter
        c: Counter = Counter()
        for desc in self.system_descs:
            symbols, _ = parse_moldesc(desc['moldesc'])
            c.update(symbols)
        return sorted(c.items())

    def _system_energy(self, system: 'DFTSystem', spin: int, xc,
                       iterations: int) -> float:
        if spin or system.n_elec % 2:
            return run_unrestricted(system, xc, spin=spin or None,
                                    iterations=iterations)
        return float(KohnShamSCF(xc, iterations=iterations)
                     .run(system).energy())

    def compute(self, xc='lda', iterations: int = 80):
        """Evaluate this entry's quantity with a classical functional.

        'ae' with one system -> derive isolated-atom references from
        the molecular formula (the r2 protocol); 'ae'/'ie' with
        explicitly listed systems -> the reference's get_val
        combination; 'dm'/'dens' -> the single system's density
        matrix / grid density profile."""
        systems = self.get_systems()
        if self.e_type == 'dm':
            calc = KohnShamSCF(xc, iterations=iterations).run(systems[0])
            return np.asarray(calc.D)
        if self.e_type == 'dens':
            calc = KohnShamSCF(xc, iterations=iterations).run(systems[0])
            return np.asarray(calc.density())
        if self.e_type in ('ae', 'ie') and len(systems) > 1:
            energies = [self._system_energy(s, sp, xc, iterations)
                        for s, sp in zip(systems, self.spins)]
            return float(self.combine_energies(energies))
        if self.e_type == 'ae':
            e_mol = sum(self._system_energy(s, sp, xc, iterations)
                        for s, sp in zip(systems, self.spins))
            e_atoms = 0.0
            for sym, count in self.atom_systems():
                atom_sys = DFTSystem([sym], np.zeros((1, 3)),
                                     units='bohr', **self._kw)
                e_atoms += count * run_unrestricted(
                    atom_sys, xc, iterations=iterations)
            return e_atoms - e_mol
        return sum(self._system_energy(s, sp, xc, iterations)
                   for s, sp in zip(systems, self.spins))

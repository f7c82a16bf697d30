"""Orthogonal-orbital parametrizations and direct-minimization SCF.

TPU-first redesign of the reference's variational-SCF machinery
(reference ``deepchem/utils/dft_utils/hamilton/orbparams.py:10``
BaseOrbParams, ``:88`` QROrbParams, ``:174`` MatExpOrbParams — the
free-parameterizations its dqc-derived engines minimize over with
xitorch).  Here the parametrizations are pure jnp functions and the
minimizer is the in-repo L-BFGS with implicit differentiation
(``utils/differentiation_utils.lbfgs_minimize``), so the whole
variational SCF is ONE jittable, end-to-end differentiable closure —
no fixed-point iteration, no DIIS, no convergence heuristics.  Direct
minimization is the robust fallback when the aufbau fixed point is
hard to reach (stretched bonds, small gaps) and the natural formulation
for differentiable-DFT training: dE*/dtheta comes from the stationarity
condition, exactly.

The minimizer itself rotates only the occupied-virtual block
(``nocc*(nao-nocc)`` parameters): occupied-occupied rotations leave the
density invariant, so including them (as the general MatExp
parametrization does) makes the Hessian exactly singular along gauge
directions.  The reference-contract classes below keep the general
(gauge-redundant) forms for API parity.
"""
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from deepchem_tpu.dft.scf import f32_matmuls

__all__ = ['BaseOrbParams', 'QROrbParams', 'MatExpOrbParams',
           'scf_direct_minimize']


class BaseOrbParams:
    """Free-parameterization of orthogonal orbitals (reference
    orbparams.py:10).  ``params`` is optimized variationally; ``coeffs``
    is carried but not optimized.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> class Identity(BaseOrbParams):
    ...     @staticmethod
    ...     def params2orb(params, coeffs, with_penalty=0.0):
    ...         return [params] if with_penalty == 0.0 else [params, 0.0]
    ...     @staticmethod
    ...     def orb2params(orb):
    ...         return [orb, jnp.zeros(1)]
    >>> p = jnp.eye(3)
    >>> orb, = Identity.params2orb(p, None)
    >>> bool(jnp.allclose(Identity.orb2params(orb)[0], p))
    True
    """

    @staticmethod
    def params2orb(params, coeffs, with_penalty: float = 0.0) -> List:
        """-> [orb] (or [orb, penalty] when with_penalty != 0)."""
        raise NotImplementedError

    @staticmethod
    def orb2params(orb) -> List:
        """-> [params, coeffs] recovering the free parameters."""
        raise NotImplementedError


class QROrbParams(BaseOrbParams):
    """Orthogonal orbitals as the Q factor of ``qr(params)`` (reference
    orbparams.py:88).  ``coeffs`` is unused (kept for the contract).

    Examples
    --------
    >>> import jax, jax.numpy as jnp
    >>> params = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    >>> orb, = QROrbParams.params2orb(params, None)
    >>> bool(jnp.allclose(orb.T @ orb, jnp.eye(3), atol=1e-6))
    True
    """

    @staticmethod
    def params2orb(params, coeffs=None, with_penalty: float = 0.0):
        orb, _ = jnp.linalg.qr(params)
        if with_penalty == 0.0:
            return [orb]
        # QR is unique only up to per-column sign; fix signs by making
        # the column sums positive before comparing (reference
        # orbparams.py:137-146)
        s1 = jnp.sign(orb.sum(axis=-2, keepdims=True))
        s2 = jnp.sign(params.sum(axis=-2, keepdims=True))
        penalty = jnp.mean((orb * s1 - params * s2) ** 2) * with_penalty
        return [orb, penalty]

    @staticmethod
    def orb2params(orb):
        return [orb, jnp.zeros(1, dtype=orb.dtype)]


def _antisym_from_triu(params: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fill the strict upper triangle of an (n, n) matrix with
    ``params`` (row-major triu order) and antisymmetrize."""
    iu = jnp.triu_indices(n, k=1)
    nparams = params.shape[-1]
    A = jnp.zeros(params.shape[:-1] + (n, n), dtype=params.dtype)
    A = A.at[..., iu[0][:nparams], iu[1][:nparams]].set(params)
    return A - jnp.swapaxes(A, -1, -2)


class MatExpOrbParams(BaseOrbParams):
    """Orthogonal orbitals as ``expm(A(params)) @ coeffs`` with A the
    antisymmetric matrix built from ``params`` on the strict upper
    triangle (reference orbparams.py:174).  expm of antisymmetric is
    exactly orthogonal, so there is never a penalty term.

    Examples
    --------
    >>> import jax, jax.numpy as jnp
    >>> coeffs = jnp.eye(4)[:, :2]
    >>> params = jnp.asarray([0.1, -0.2, 0.3])
    >>> orb, = MatExpOrbParams.params2orb(params, coeffs)
    >>> bool(jnp.allclose(orb.T @ orb, jnp.eye(2), atol=1e-6))
    True
    """

    @staticmethod
    def params2orb(params, coeffs, with_penalty: float = 0.0):
        nao = coeffs.shape[-2]
        A = _antisym_from_triu(jnp.asarray(params), nao)
        orb = jax.scipy.linalg.expm(A) @ coeffs
        if with_penalty == 0.0:
            return [orb]
        return [orb, jnp.zeros((), dtype=orb.dtype)]

    @staticmethod
    def orb2params(orb):
        # the identity rotation reproduces orb with coeffs = orb
        nao = orb.shape[-2]
        nparams = nao * (nao - 1) // 2
        return [jnp.zeros(nparams, dtype=orb.dtype), orb]


def _electronic_energy(D, H, eri, exc_fn, phi, dphi, weights,
                       use_sigma, use_tau, hf_exchange,
                       eri_lr=None, hf_exchange_lr: float = 0.0):
    """Total electronic energy of a restricted density matrix (the same
    expression ``scf.scf_loop``'s fock closure accumulates)."""
    from deepchem_tpu.dft.scf import _exc_energy
    J = jnp.einsum('ijkl,kl->ij', eri, D)
    E = jnp.einsum('ij,ij->', D, H) + 0.5 * jnp.einsum('ij,ij->', D, J)
    if hf_exchange:
        K = jnp.einsum('ikjl,kl->ij', eri, D)
        E = E - 0.25 * hf_exchange * jnp.einsum('ij,ij->', D, K)
    if hf_exchange_lr:
        K = jnp.einsum('ikjl,kl->ij', eri_lr, D)
        E = E - 0.25 * hf_exchange_lr * jnp.einsum('ij,ij->', D, K)
    if exc_fn is not None:
        E = E + _exc_energy(D, phi, dphi, weights, exc_fn, use_sigma,
                            use_tau)
    return E


@f32_matmuls
def scf_direct_minimize(system, xc='hf', maxiter: int = 200,
                        tol: float = 1e-12,
                        perturbation: Optional[Callable] = None):
    """Variational (direct-minimization) restricted SCF.

    Minimizes E over occupied-virtual orbital rotations
    C(theta) = S^{-1/2} expm(A(theta)) C0 with A antisymmetric and
    supported only on the occ-virt block, theta0 = 0 at the core-guess
    orbitals.  Equivalent at convergence to the fixed-point SCF
    (``scf.scf_loop``) but needs no mixing/DIIS and differentiates
    through the STATIONARITY condition (L-BFGS wrapped in
    ``lax.custom_root``), the textbook implicit-diff route the
    reference reaches via xitorch's EditableModule machinery.

    Parameters
    ----------
    system: DFTSystem
    xc: preset name or callable (same contract as KohnShamSCF)
    perturbation: optional ``f(D) -> scalar`` added to the energy
        (e.g. a field coupling ``lambda D: F * tr(D mu)``) — useful for
        response properties via the implicit gradient.

    Returns
    -------
    KSCalc with the variational minimum energy/density; mo_energies are
    the eigenvalues of the converged Fock operator.
    """
    from deepchem_tpu.dft.scf import KohnShamSCF, KSCalc, eigh_safe
    from deepchem_tpu.utils.differentiation_utils import lbfgs_minimize

    ks = KohnShamSCF(xc=xc) if not isinstance(xc, KohnShamSCF) else xc
    if system.n_elec % 2:
        raise ValueError('scf_direct_minimize is restricted; use an '
                         'even electron count')
    nocc = system.n_elec // 2
    H = jnp.asarray(system.T + system.V)
    S_invsqrt = jnp.asarray(system.S_invsqrt)
    eri = jnp.asarray(system.eri)
    phi = jnp.asarray(system.phi)
    dphi = jnp.asarray(system.dphi)
    weights = jnp.asarray(system.grid_weights)
    nao = H.shape[0]
    nvirt = nao - nocc

    # core guess in the Lowdin-orthonormal basis
    Hp = S_invsqrt.T @ H @ S_invsqrt
    _, C0p = eigh_safe(Hp)

    eri_lr = None
    if ks.hf_exchange_lr:
        from deepchem_tpu.dft.scf import _eri_lr_for
        eri_lr = _eri_lr_for(system, ks.omega)

    def density(theta):
        # occ-virt generator: A[occ, virt] = theta, antisymmetric
        A = jnp.zeros((nao, nao), dtype=H.dtype)
        block = theta.reshape(nocc, nvirt)
        A = A.at[:nocc, nocc:].set(block)
        A = A - A.T
        # rotation in the guess-orbital basis: expm(antisym) is
        # exactly orthogonal, so C stays S-orthonormal for any theta
        C = S_invsqrt @ (C0p @ jax.scipy.linalg.expm(A))[:, :nocc]
        return 2.0 * C @ C.T

    def energy(theta):
        D = density(theta)
        E = _electronic_energy(
            D, H, eri, ks.exc_fn, phi, dphi, weights,
            ks.use_sigma, ks.use_tau, ks.hf_exchange,
            eri_lr=eri_lr, hf_exchange_lr=ks.hf_exchange_lr)
        if perturbation is not None:
            E = E + perturbation(D)
        return E

    theta0 = jnp.zeros(nocc * nvirt, dtype=H.dtype)
    theta = lbfgs_minimize(energy, theta0, maxiter=maxiter, tol=tol)
    D = density(theta)
    E = energy(theta)

    # converged Fock spectrum for parity with the fixed-point path
    J = jnp.einsum('ijkl,kl->ij', eri, D)
    F = H + J
    if ks.hf_exchange:
        F = F - 0.5 * ks.hf_exchange * jnp.einsum('ikjl,kl->ij', eri, D)
    if ks.hf_exchange_lr:
        F = F - 0.5 * ks.hf_exchange_lr * jnp.einsum(
            'ikjl,kl->ij', eri_lr, D)
    if ks.exc_fn is not None:
        from deepchem_tpu.dft.scf import _exc_energy
        Vxc = jax.grad(_exc_energy)(D, phi, dphi, weights, ks.exc_fn,
                                    ks.use_sigma, ks.use_tau)
        F = F + 0.5 * (Vxc + Vxc.T)
    mo_e, _ = eigh_safe(S_invsqrt.T @ F @ S_invsqrt)
    return KSCalc(system, E, D, mo_e)

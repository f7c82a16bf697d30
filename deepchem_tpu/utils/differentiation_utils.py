"""Differentiable linear-algebra utilities.

Redesign of reference deepchem/utils/differentiation_utils (the vendored
xitorch port: LinearOperator linop.py, solve.py, symeig.py — ~4.5k LoC of
hand-written autograd machinery).  On JAX the same capabilities are thin
wrappers: matrix-free operators compose as functions, ``jax.scipy`` has
CG/GMRES with implicit differentiation, and eigh is natively
differentiable — so this module is deliberately small.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


class LinearOperator:
    """Matrix-free linear operator (reference linop.py ``LinearOperator``):
    wraps ``mv`` (matrix-vector) with shape metadata; composes with +, *,
    and @."""

    def __init__(self, mv: Callable, shape: Tuple[int, int],
                 mv_t: Optional[Callable] = None,
                 is_hermitian: bool = False):
        self._mv = mv
        self.shape = tuple(shape)
        self._mv_t = mv_t if mv_t is not None else (
            mv if is_hermitian else None)
        self.is_hermitian = is_hermitian

    @classmethod
    def from_matrix(cls, mat: jnp.ndarray) -> 'LinearOperator':
        mat = jnp.asarray(mat)
        return cls(lambda x: mat @ x, mat.shape,
                   mv_t=lambda x: mat.T @ x,
                   is_hermitian=bool(mat.shape[0] == mat.shape[1]))

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._mv(x)

    def rmv(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._mv_t is None:
            raise ValueError('transpose mv not provided')
        return self._mv_t(x)

    def mm(self, X: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(self._mv, in_axes=1, out_axes=1)(X)

    def fullmatrix(self) -> jnp.ndarray:
        n = self.shape[1]
        return self.mm(jnp.eye(n))

    def __matmul__(self, x):
        return self.mv(x) if x.ndim == 1 else self.mm(x)

    def __add__(self, other: 'LinearOperator') -> 'LinearOperator':
        return LinearOperator(
            lambda x: self.mv(x) + other.mv(x), self.shape,
            mv_t=(lambda x: self.rmv(x) + other.rmv(x))
            if self._mv_t and other._mv_t else None,
            is_hermitian=self.is_hermitian and other.is_hermitian)

    def __mul__(self, c) -> 'LinearOperator':
        return LinearOperator(lambda x: c * self.mv(x), self.shape,
                              mv_t=(lambda x: c * self.rmv(x))
                              if self._mv_t else None,
                              is_hermitian=self.is_hermitian)

    __rmul__ = __mul__


def solve(A: LinearOperator, b: jnp.ndarray,
          method: str = 'cg', tol: float = 1e-6,
          maxiter: Optional[int] = None) -> jnp.ndarray:
    """Solve A x = b matrix-free (reference solve.py).  Gradients flow
    implicitly through jax.scipy's solvers."""
    if method == 'cg':
        x, _ = jax.scipy.sparse.linalg.cg(A.mv, b, tol=tol,
                                          maxiter=maxiter)
    elif method == 'gmres':
        x, _ = jax.scipy.sparse.linalg.gmres(A.mv, b, tol=tol,
                                             maxiter=maxiter)
    elif method == 'exact':
        x = jnp.linalg.solve(A.fullmatrix(), b)
    else:
        raise ValueError(method)
    return x


def symeig(A: LinearOperator, neig: Optional[int] = None,
           mode: str = 'lowest') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a Hermitian operator (reference symeig.py;
    xitorch implements degenerate-safe backward — jnp.linalg.eigh is
    natively differentiable for distinct eigenvalues)."""
    mat = A.fullmatrix() if isinstance(A, LinearOperator) else \
        jnp.asarray(A)
    evals, evecs = jnp.linalg.eigh(mat)
    if neig is not None:
        if mode == 'lowest':
            evals, evecs = evals[:neig], evecs[:, :neig]
        else:
            evals, evecs = evals[-neig:], evecs[:, -neig:]
    return evals, evecs


def cg_solve(mv: Callable, b: jnp.ndarray, tol: float = 1e-8,
             maxiter: int = 200) -> jnp.ndarray:
    """Conjugate-gradient solve of A x = b for a symmetric
    positive-definite matrix-free operator, with IMPLICIT differentiation
    (reference solve.py + xitorch's hand-written solve backward).

    Wrapped in ``jax.lax.custom_linear_solve(symmetric=True)``: the
    backward pass solves the same system with the adjoint right-hand side
    instead of differentiating through CG iterations.
    """
    def cg(matvec, rhs):
        def body(state):
            x, r, p, rs, k = state
            Ap = matvec(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return x, r, p, rs_new, k + 1

        def cond(state):
            _, _, _, rs, k = state
            return jnp.logical_and(rs > tol * tol, k < maxiter)

        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        x, *_ = jax.lax.while_loop(
            cond, body, (x0, r0, r0, jnp.vdot(r0, r0), 0))
        return x

    return jax.lax.custom_linear_solve(mv, b, solve=cg, symmetric=True)


def _davidson_forward(mv: Callable, n: int, neig: int, v0: jnp.ndarray,
                      max_space: int, restarts: int, tol: float):
    """Block Davidson for the lowest ``neig`` eigenpairs: expand the
    subspace with diagonally-preconditioned residuals, Rayleigh-Ritz in
    the subspace, restart from the Ritz vectors.  Python loop over a
    STATIC iteration schedule so it traces to a fixed XLA program."""
    diag = jax.vmap(lambda i: mv(
        jnp.zeros(n).at[i].set(1.0))[i])(jnp.arange(n))
    V = v0                                   # (n, k) current subspace
    theta = jnp.zeros(neig)
    X = v0[:, :neig]
    for _ in range(restarts):
        for _ in range(max_space // neig - 1):
            V, _ = jnp.linalg.qr(V)
            AV = jax.vmap(mv, in_axes=1, out_axes=1)(V)
            H = V.T @ AV
            w, U = jnp.linalg.eigh(H)
            theta = w[:neig]
            X = V @ U[:, :neig]
            R = jax.vmap(mv, in_axes=1, out_axes=1)(X) - X * theta[None, :]
            # clamped diagonal (Jacobi) preconditioner
            d = diag[:, None] - theta[None, :]
            d = jnp.where(jnp.abs(d) < 0.1,
                          jnp.where(d >= 0, 0.1, -0.1), d)
            V = jnp.concatenate([V, R / d], axis=1)
        V = X                                # restart from Ritz vectors
    return theta, X


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def davidson(A: jnp.ndarray, neig: int = 1, max_space: int = 12,
             restarts: int = 4, tol: float = 1e-9):
    """Lowest-``neig`` eigenpairs of a symmetric matrix by block Davidson
    iteration (reference symeig.py davidson), with the eigenpair IMPLICIT
    differentiation rule as a custom VJP: dL/dA = sum_i [ dλ_i x_i x_iᵀ +
    z_i x_iᵀ ] where z solves the projected (A - λI) z = -(I - xxᵀ) v̄.
    """
    return _davidson_impl(A, neig, max_space, restarts, tol)


def _davidson_impl(A, neig, max_space, restarts, tol):
    n = A.shape[0]
    # start from unit vectors at the neig SMALLEST diagonal entries: the
    # initial Ritz values then sit near the target eigenvalues, which is
    # what makes the Jacobi preconditioner effective (a random start puts
    # them mid-spectrum and stalls convergence)
    idx = jnp.argsort(jnp.diag(A))[:neig]
    v0 = jnp.zeros((n, neig)).at[idx, jnp.arange(neig)].set(1.0)
    theta, X = _davidson_forward(lambda x: A @ x, n, neig, v0,
                                 max_space, restarts, tol)
    # fix sign for deterministic output
    sign = jnp.sign(jnp.sum(X, axis=0) + 1e-30)
    return theta, X * sign[None, :]


def _davidson_fwd(A, neig, max_space, restarts, tol):
    out = _davidson_impl(A, neig, max_space, restarts, tol)
    return out, (A, out[0], out[1])


def _davidson_bwd(neig, max_space, restarts, tol, res, cotangents):
    A, theta, X = res
    dtheta, dX = cotangents
    n = A.shape[0]
    dA = jnp.zeros_like(A)
    for i in range(theta.shape[0]):
        lam, x = theta[i], X[:, i]
        # eigenvalue part: dλ/dA = x xᵀ
        dA = dA + dtheta[i] * jnp.outer(x, x)
        # eigenvector part: solve (A - λ I) z = -(I - x xᵀ) dX_i in the
        # subspace orthogonal to x (projected CG keeps it well-posed)
        v = dX[:, i]
        v = v - x * jnp.dot(x, v)

        def proj_mv(z, lam=lam, x=x):
            z = z - x * jnp.dot(x, z)
            out = A @ z - lam * z
            return out - x * jnp.dot(x, out)
        z = cg_solve(proj_mv, -v, maxiter=4 * n)
        z = z - x * jnp.dot(x, z)
        dA = dA + jnp.outer(z, x)
    return (dA,)


davidson.defvjp(_davidson_fwd, _davidson_bwd)


def minimize(fcn: Callable, x0: jnp.ndarray, lr: float = 0.1,
             maxiter: int = 200) -> jnp.ndarray:
    """Simple differentiable gradient-descent minimizer (reference
    optimize/minimizer.py role); the loop is a lax.scan so it jits and
    backprops."""
    g = jax.grad(fcn)

    def step(x, _):
        return x - lr * g(x), None
    x, _ = jax.lax.scan(step, x0, None, length=maxiter)
    return x


def rootfinder(fcn: Callable, x0: jnp.ndarray,
               maxiter: int = 50) -> jnp.ndarray:
    """Newton root finder for f(x)=0 (reference optimize/rootfinder.py
    role); the fixed-iteration loop is a lax.scan so it jits and
    backprops."""
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    jac = jax.jacfwd(fcn)

    def step(x, _):
        f = fcn(x)
        J = jac(x)
        if x.ndim == 0:
            dx = f / J
        else:
            dx = jnp.linalg.solve(J, f)
        return x - dx, None
    x, _ = jax.lax.scan(step, x0, None, length=maxiter)
    return x

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

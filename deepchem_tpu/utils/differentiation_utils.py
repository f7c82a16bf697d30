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
        return MatrixLinearOperator(mat)

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
        if isinstance(x, LinearOperator):
            return self.matmul(x)
        return self.mv(x) if x.ndim == 1 else self.mm(x)

    def matmul(self, other: 'LinearOperator') -> 'LinearOperator':
        """Operator composition A @ B (reference linop.py
        MatmulLinearOperator)."""
        return MatmulLinearOperator(self, other)

    @property
    def H(self) -> 'LinearOperator':
        """Adjoint operator (reference linop.py AdjointLinearOperator)."""
        if self.is_hermitian:
            return self
        return AdjointLinearOperator(self)

    def __add__(self, other: 'LinearOperator') -> 'LinearOperator':
        return AddLinearOperator(self, other)

    def __sub__(self, other: 'LinearOperator') -> 'LinearOperator':
        return self + (-1.0) * other

    def __neg__(self) -> 'LinearOperator':
        return (-1.0) * self

    def __mul__(self, c) -> 'LinearOperator':
        return MulLinearOperator(self, c)

    __rmul__ = __mul__


class MatrixLinearOperator(LinearOperator):
    """Dense-matrix-backed operator (reference linop.py
    MatrixLinearOperator)."""

    def __init__(self, mat: jnp.ndarray):
        mat = jnp.asarray(mat)
        self.mat = mat
        super().__init__(
            lambda x: mat @ x, mat.shape, mv_t=lambda x: mat.T @ x,
            is_hermitian=bool(mat.shape[0] == mat.shape[1]))


class AddLinearOperator(LinearOperator):
    """A + B (reference linop.py AddLinearOperator)."""

    def __init__(self, a: LinearOperator, b: LinearOperator):
        if a.shape != b.shape:
            raise ValueError(f'shape mismatch {a.shape} + {b.shape}')
        super().__init__(
            lambda x: a.mv(x) + b.mv(x), a.shape,
            mv_t=(lambda x: a.rmv(x) + b.rmv(x))
            if a._mv_t and b._mv_t else None,
            is_hermitian=a.is_hermitian and b.is_hermitian)


class MulLinearOperator(LinearOperator):
    """c * A for scalar c (reference linop.py MulLinearOperator)."""

    def __init__(self, a: LinearOperator, c):
        super().__init__(lambda x: c * a.mv(x), a.shape,
                         mv_t=(lambda x: c * a.rmv(x))
                         if a._mv_t else None,
                         is_hermitian=a.is_hermitian)


class MatmulLinearOperator(LinearOperator):
    """A @ B (reference linop.py MatmulLinearOperator)."""

    def __init__(self, a: LinearOperator, b: LinearOperator):
        if a.shape[1] != b.shape[0]:
            raise ValueError(f'shape mismatch {a.shape} @ {b.shape}')
        super().__init__(
            lambda x: a.mv(b.mv(x)), (a.shape[0], b.shape[1]),
            mv_t=(lambda x: b.rmv(a.rmv(x)))
            if a._mv_t and b._mv_t else None)


class AdjointLinearOperator(LinearOperator):
    """A^H (reference linop.py AdjointLinearOperator)."""

    def __init__(self, a: LinearOperator):
        if a._mv_t is None:
            raise ValueError('transpose mv not provided')
        super().__init__(a._mv_t, (a.shape[1], a.shape[0]),
                         mv_t=a._mv)


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
           mode: str = 'lowest',
           degen_tol: Optional[float] = None
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a Hermitian operator (reference symeig.py).

    With ``degen_tol`` set, the backward pass uses the degenerate-safe
    rule of the reference (symeig.py:742 ``degen_atol``/``degen_rtol``
    handling): eigenvector-rotation terms inside a degenerate cluster
    (|lam_j - lam_i| <= degen_tol) are projected out, so gradients of
    functions that are invariant under rotations within the degenerate
    subspace stay finite where plain ``jnp.linalg.eigh`` backward
    divides by zero."""
    mat = A.fullmatrix() if isinstance(A, LinearOperator) else \
        jnp.asarray(A)
    if degen_tol is None:
        evals, evecs = jnp.linalg.eigh(mat)
    else:
        evals, evecs = _symeig_degen(mat, degen_tol)
    if neig is not None:
        if mode == 'lowest':
            evals, evecs = evals[:neig], evecs[:, :neig]
        else:
            evals, evecs = evals[-neig:], evecs[:, -neig:]
    return evals, evecs


@jax.custom_vjp
def _symeig_degen(mat: jnp.ndarray, degen_tol: float):
    return jnp.linalg.eigh(mat)


def _symeig_degen_fwd(mat, degen_tol):
    evals, evecs = jnp.linalg.eigh(mat)
    return (evals, evecs), (evals, evecs, degen_tol)


def _symeig_degen_bwd(res, cotangents):
    evals, evecs, degen_tol = res
    g_evals, g_evecs = cotangents
    # standard eigh backward with the degenerate pairs masked out of the
    # eigenvector-rotation term: F_ij = 1/(lam_j - lam_i) off the
    # degenerate clusters, 0 inside them (reference symeig.py degenerate
    # handling).
    diff = evals[None, :] - evals[:, None]
    safe = jnp.abs(diff) > degen_tol
    F = jnp.where(safe, 1.0 / jnp.where(safe, diff, 1.0), 0.0)
    inner = evecs.T @ g_evecs
    gA = evecs @ (jnp.diag(g_evals) + F * inner) @ evecs.T
    # symmetrize: the input is Hermitian, so the cotangent lives on the
    # symmetric subspace
    gA = 0.5 * (gA + gA.T)
    return gA, None


_symeig_degen.defvjp(_symeig_degen_fwd, _symeig_degen_bwd)


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


def _gmres_cycle(matvec: Callable, b: jnp.ndarray, x0: jnp.ndarray,
                 m: int) -> jnp.ndarray:
    """One GMRES(m) cycle: Arnoldi (modified Gram-Schmidt) + dense
    least-squares in the Krylov subspace.  ``m`` is static so the whole
    cycle traces to one fixed XLA program (no dynamic shapes)."""
    n = b.shape[0]
    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    V = jnp.zeros((n, m + 1)).at[:, 0].set(
        r0 / jnp.maximum(beta, 1e-30))
    H = jnp.zeros((m + 1, m))

    def arnoldi(j, carry):
        V, H = carry
        w = matvec(V[:, j])

        def mgs(i, wh):
            w, H = wh
            h = jnp.vdot(V[:, i], w) * (i <= j)
            return w - h * V[:, i], H.at[i, j].add(h)
        w, H = jax.lax.fori_loop(0, m, mgs, (w, H))
        hj = jnp.linalg.norm(w)
        H = H.at[j + 1, j].set(hj)
        V = V.at[:, j + 1].set(w / jnp.maximum(hj, 1e-30))
        return V, H
    V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
    e1 = jnp.zeros(m + 1).at[0].set(beta)
    y, *_ = jnp.linalg.lstsq(H, e1)
    return x0 + V[:, :m] @ y


def gmres_solve(mv: Callable, b: jnp.ndarray,
                mv_t: Optional[Callable] = None,
                restart: int = 30, maxiter: int = 150) -> jnp.ndarray:
    """Restarted GMRES for general (non-symmetric) A x = b with IMPLICIT
    differentiation (reference solve.py gmres; xitorch hand-writes the
    solve backward — here ``jax.lax.custom_linear_solve`` routes the
    cotangent through a transpose solve with the same solver).

    ``mv_t`` is the transpose matvec (required for gradients of
    non-symmetric operators; defaults to ``mv``, i.e. symmetric).
    """
    mv_t = mv_t or mv
    cycles = max(1, maxiter // restart)

    def run(matvec, rhs):
        x = jnp.zeros_like(rhs)
        for _ in range(cycles):
            x = _gmres_cycle(matvec, rhs, x, restart)
        return x

    return jax.lax.custom_linear_solve(
        mv, b, solve=run, transpose_solve=lambda _, y: run(mv_t, y))


def bicgstab_solve(mv: Callable, b: jnp.ndarray,
                   mv_t: Optional[Callable] = None,
                   tol: float = 1e-8, maxiter: int = 200) -> jnp.ndarray:
    """BiCGStab for general A x = b with implicit differentiation
    (reference solve.py bicgstab).  ``mv_t`` as in :func:`gmres_solve`.
    """
    mv_t = mv_t or mv

    def run_clean(matvec, rhs):
        # state = ((x, r, rhat, p, rho, alpha, omega, k), v_prev):
        # standard BiCGStab carries the previous v in the p-update
        x0 = jnp.zeros_like(rhs)
        st = ((x0, rhs, rhs, jnp.zeros_like(rhs),
               jnp.asarray(1.0, rhs.dtype), jnp.asarray(1.0, rhs.dtype),
               jnp.asarray(1.0, rhs.dtype), 0), jnp.zeros_like(rhs))

        def cond(s):
            (_, r, _, _, _, _, _, k), _ = s
            return jnp.logical_and(jnp.vdot(r, r) > tol * tol,
                                   k < maxiter)

        def body(s):
            (x, r, rhat, p, rho, alpha, omega, k), v_prev = s
            rho_new = jnp.vdot(rhat, r)
            beta = (rho_new / jnp.where(rho == 0, 1e-30, rho)) * \
                (alpha / jnp.where(omega == 0, 1e-30, omega))
            p = r + beta * (p - omega * v_prev)
            v = matvec(p)
            denom = jnp.vdot(rhat, v)
            alpha = rho_new / jnp.where(denom == 0, 1e-30, denom)
            h = x + alpha * p
            s_vec = r - alpha * v
            t = matvec(s_vec)
            tt = jnp.vdot(t, t)
            omega = jnp.vdot(t, s_vec) / jnp.where(tt == 0, 1e-30, tt)
            return ((h + omega * s_vec, s_vec - omega * t, rhat, p,
                     rho_new, alpha, omega, k + 1), v)
        (x, *_), _ = jax.lax.while_loop(cond, body, st)
        return x

    return jax.lax.custom_linear_solve(
        mv, b, solve=run_clean,
        transpose_solve=lambda _, y: run_clean(mv_t, y))


def broyden(fcn: Callable, x0: jnp.ndarray, maxiter: int = 50,
            tol: float = 1e-10) -> jnp.ndarray:
    """Broyden's good method for f(x)=0 with IMPLICIT differentiation
    (reference optimize/rootfinder.py broyden1): maintains an inverse-
    Jacobian estimate, rank-1 updated per step; gradients route through
    ``jax.lax.custom_root`` (linearized solve at the root), never
    through the iterations."""
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    scalar = x0.ndim == 0
    xf = x0.reshape(-1)
    n = xf.shape[0]

    def f_flat(z):
        out = fcn(z.reshape(x0.shape) if not scalar else z[0])
        return jnp.reshape(out, (-1,))

    def solve_fn(f, z0):
        def body(state):
            x, fx, Jinv, k = state
            d = -(Jinv @ fx)
            # damped step: backtrack until the residual norm drops
            # (undamped Newton-Broyden diverges on e.g. coupled
            # quadratics; scipy's broyden1 line-searches too)
            fn0 = jnp.vdot(fx, fx)

            def ls(i, t):
                fn = f(x + t * d)
                ok = jnp.vdot(fn, fn) < fn0
                return jnp.where(ok, t, t * 0.5)
            t = jax.lax.fori_loop(
                0, 15, ls, jnp.asarray(1.0, x.dtype))
            dx = t * d
            x_new = x + dx
            f_new = f(x_new)
            df = f_new - fx
            # good Broyden inverse update (Sherman-Morrison)
            Jdf = Jinv @ df
            denom = jnp.vdot(dx, Jdf)
            Jinv = Jinv + jnp.outer(dx - Jdf, dx @ Jinv) / \
                jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            return x_new, f_new, Jinv, k + 1

        def cond(state):
            _, fx, _, k = state
            return jnp.logical_and(jnp.vdot(fx, fx) > tol, k < maxiter)
        x, *_ = jax.lax.while_loop(
            cond, body, (z0, f(z0), jnp.eye(n), 0))
        return x

    def tangent_solve(g, y):
        # solve linearized g(x) = y; g is linear, so its matrix is the
        # jacobian — small systems here, dense solve
        J = jax.jacfwd(g)(jnp.zeros_like(y))
        return jnp.linalg.solve(J.reshape(n, n), y.reshape(-1)).reshape(
            y.shape)

    xr = jax.lax.custom_root(f_flat, xf, solve_fn, tangent_solve)
    return xr[0] if scalar else xr.reshape(x0.shape)


def lbfgs_minimize(fcn: Callable, x0: jnp.ndarray, maxiter: int = 100,
                   history: int = 10, tol: float = 1e-9) -> jnp.ndarray:
    """L-BFGS minimizer with IMPLICIT differentiation (reference
    optimize/minimizer.py lbfgs / gd): two-loop recursion over a rolling
    (s, y) history inside ``lax.while_loop`` with backtracking line
    search; the gradient of the solution w.r.t. closure parameters
    routes through ``custom_root`` on the stationarity condition
    grad f(x*) = 0 (Hessian solve by CG)."""
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    shape = x0.shape
    xf = x0.reshape(-1)
    n = xf.shape[0]
    m = history

    def g_flat(z):
        return jax.grad(lambda v: fcn(v.reshape(shape)))(
            z.reshape(shape)).reshape(-1)

    def f_flat(z):
        return fcn(z.reshape(shape))

    def solve_fn(g, z0):
        S = jnp.zeros((m, n))
        Y = jnp.zeros((m, n))
        rho = jnp.zeros(m)

        def direction(grad, S, Y, rho, k):
            q = grad
            alphas = jnp.zeros(m)

            def bwd(i, qa):
                q, alphas = qa
                j = (k - 1 - i) % m
                valid = i < jnp.minimum(k, m)
                a = rho[j] * jnp.vdot(S[j], q) * valid
                return q - a * Y[j], alphas.at[j].set(a)
            q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))
            # initial Hessian scaling gamma = s.y / y.y of newest pair
            jn = (k - 1) % m
            yy = jnp.vdot(Y[jn], Y[jn])
            gamma = jnp.where(
                jnp.logical_and(k > 0, yy > 1e-30),
                jnp.vdot(S[jn], Y[jn]) / jnp.maximum(yy, 1e-30), 1.0)
            r = gamma * q

            def fwd(i, r):
                j = (k - jnp.minimum(k, m) + i) % m
                valid = i < jnp.minimum(k, m)
                b = rho[j] * jnp.vdot(Y[j], r) * valid
                return r + (alphas[j] - b) * S[j] * valid
            r = jax.lax.fori_loop(0, m, fwd, r)
            return -r

        def body(state):
            x, grad, S, Y, rho, k = state
            d = direction(grad, S, Y, rho, k)
            # backtracking Armijo line search (static 20 halvings)
            f0 = f_flat(x)
            slope = jnp.vdot(grad, d)

            def ls(i, t):
                fx = f_flat(x + t * d)
                ok = fx <= f0 + 1e-4 * t * slope
                return jnp.where(ok, t, t * 0.5)
            t = jax.lax.fori_loop(0, 20, ls, jnp.asarray(1.0, x.dtype))
            x_new = x + t * d
            g_new = g(x_new)
            s, y = x_new - x, g_new - grad
            sy = jnp.vdot(s, y)
            j = k % m
            upd = sy > 1e-10
            S = jnp.where(upd, S.at[j].set(s), S)
            Y = jnp.where(upd, Y.at[j].set(y), Y)
            rho = jnp.where(upd, rho.at[j].set(1.0 / jnp.maximum(
                sy, 1e-30)), rho)
            return x_new, g_new, S, Y, rho, k + jnp.where(upd, 1, 0)

        def cond(state):
            _, grad, _, _, _, k = state
            return jnp.logical_and(jnp.vdot(grad, grad) > tol,
                                   k < maxiter)
        x, *_ = jax.lax.while_loop(
            cond, body, (z0, g(z0), S, Y, rho, 0))
        return x

    def tangent_solve(g, y):
        # g is the linearized gradient map (Hessian action): symmetric
        return cg_solve(g, y, maxiter=10 * n)

    xr = jax.lax.custom_root(g_flat, xf, solve_fn, tangent_solve)
    return xr.reshape(shape)


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


def anderson_acc(g: Callable, x0: jnp.ndarray, maxiter: int = 50,
                 window: int = 5, beta: float = 1.0,
                 ridge: Optional[float] = None) -> jnp.ndarray:
    """Anderson-accelerated fixed-point solve x* = g(x*) (the
    equilibrium-solver role of the reference's xitorch
    ``equilibrium``; also the workhorse for deep-equilibrium-style
    models).  Static-shape ring buffers inside a lax.scan — jits,
    vmaps, and backprops (the mixing-coefficient least squares is
    stop-gradiented as a solver detail; gradients flow through the
    iterates, and at the fixed point the implicit-function sensitivity
    is carried by the final g application).

    For exact implicit-diff gradients of deep iterations, compose with
    ``jax.lax.custom_root`` or use ``rootfinder`` on f(x) = g(x) - x;
    this function's reverse pass differentiates through the (short)
    unrolled iteration history.
    """
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    n = x0.size
    W = int(window)
    if ridge is None:
        # the bordered solve sees condition ~1/ridge: keep it inside
        # the dtype's precision (exactly-converged buffers zero G)
        ridge = 1e-10 if x0.dtype == jnp.float64 else 1e-4

    def step(carry, idx):
        x, Xbuf, Fbuf = carry
        gx = g(x.reshape(x0.shape)).reshape(-1)
        f = gx - x                       # residual
        slot = idx % W
        Xbuf = Xbuf.at[slot].set(x + beta * f)   # damped picard iterate
        Fbuf = Fbuf.at[slot].set(f)
        valid = jnp.arange(W) < jnp.minimum(idx + 1, W)
        # least-squares mixing: minimize |sum_i c_i f_i|, sum c = 1
        G = jnp.einsum('ai,bi->ab', Fbuf, Fbuf)
        Gmax = jnp.maximum(jnp.max(jnp.abs(G)), 1e-30)
        G = G / Gmax
        vv = valid[:, None] & valid[None, :]
        A = jnp.zeros((W + 1, W + 1), dtype=x.dtype)
        A = A.at[:W, :W].set(jnp.where(vv, G, 0.0)
                             + jnp.diag(jnp.where(valid, ridge, 1.0)))
        ones = jnp.where(valid, 1.0, 0.0)
        A = A.at[:W, W].set(ones)
        A = A.at[W, :W].set(ones)
        rhs = jnp.zeros(W + 1, dtype=x.dtype).at[W].set(1.0)
        c = jax.lax.stop_gradient(jnp.linalg.solve(A, rhs)[:W])
        x_new = jnp.einsum('a,ai->i', c, Xbuf)
        # fall back to plain damped iteration on the very first step
        x_new = jnp.where(idx < 1, x + beta * f, x_new)
        return (x_new, Xbuf, Fbuf), jnp.linalg.norm(f)

    Xbuf0 = jnp.zeros((W, n), dtype=x0.dtype)
    Fbuf0 = jnp.zeros((W, n), dtype=x0.dtype)
    (x, _, _), _ = jax.lax.scan(step, (x0.reshape(-1), Xbuf0, Fbuf0),
                                jnp.arange(maxiter))
    return x.reshape(x0.shape)


# -- ODE initial-value integrators (reference integrate/explicit_rk.py:
# fwd_euler_ivp, mid_point_ivp, rk4_ivp, rk38_ivp, explicit_rk) ---------

#: named Butcher tableaus (c, A, b)
_RK_TABLEAUS = {
    'fwd_euler': ((0.0,), ((0.0,),), (1.0,)),
    'mid_point': ((0.0, 0.5), ((0.0, 0.0), (0.5, 0.0)), (0.0, 1.0)),
    'rk4': ((0.0, 0.5, 0.5, 1.0),
            ((0.0, 0.0, 0.0, 0.0), (0.5, 0.0, 0.0, 0.0),
             (0.0, 0.5, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0)),
            (1 / 6, 1 / 3, 1 / 3, 1 / 6)),
    'rk38': ((0.0, 1 / 3, 2 / 3, 1.0),
             ((0.0, 0.0, 0.0, 0.0), (1 / 3, 0.0, 0.0, 0.0),
              (-1 / 3, 1.0, 0.0, 0.0), (1.0, -1.0, 1.0, 0.0)),
             (1 / 8, 3 / 8, 3 / 8, 1 / 8)),
}


def explicit_rk(tableau, fcn: Callable, y0, ts,
                params=()) -> jnp.ndarray:
    """Generic explicit Runge-Kutta IVP integrator (reference
    integrate/explicit_rk.py): integrates dy/dt = fcn(t, y, *params)
    over the time grid ``ts`` and returns y at every grid point,
    [len(ts), *y0.shape].  The stepping is a lax.scan, so the solution
    differentiates w.r.t. y0, params, and ts by ordinary backprop
    (discretize-then-optimize adjoint).  ``tableau`` is a name from
    {fwd_euler, mid_point, rk4, rk38} or an explicit (c, A, b) tuple.
    """
    if isinstance(tableau, str):
        tableau = _RK_TABLEAUS[tableau]
    c, A, b = tableau
    s = len(b)
    y0 = jnp.asarray(y0, dtype=jnp.result_type(float))
    ts = jnp.asarray(ts, dtype=jnp.result_type(float))

    def step(y, t_pair):
        t0, t1 = t_pair
        h = t1 - t0
        ks = []
        for i in range(s):
            yi = y
            for j in range(i):
                if A[i][j] != 0.0:
                    yi = yi + h * A[i][j] * ks[j]
            ks.append(fcn(t0 + c[i] * h, yi, *params))
        ynew = y
        for i in range(s):
            if b[i] != 0.0:
                ynew = ynew + h * b[i] * ks[i]
        return ynew, ynew

    _, ys = jax.lax.scan(step, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def fwd_euler_ivp(fcn, y0, ts, params=()):
    """Forward-Euler IVP (reference integrate fwd_euler_ivp)."""
    return explicit_rk('fwd_euler', fcn, y0, ts, params)


def mid_point_ivp(fcn, y0, ts, params=()):
    """Explicit midpoint IVP (reference mid_point_ivp)."""
    return explicit_rk('mid_point', fcn, y0, ts, params)


def rk4_ivp(fcn, y0, ts, params=()):
    """Classic RK4 IVP (reference rk4_ivp)."""
    return explicit_rk('rk4', fcn, y0, ts, params)


def rk38_ivp(fcn, y0, ts, params=()):
    """3/8-rule fourth-order RK IVP (reference rk38_ivp)."""
    return explicit_rk('rk38', fcn, y0, ts, params)


# -- equilibrium / dense fallbacks / misc (reference solve.py, symeig.py,
# optimize/equilibrium.py) ----------------------------------------------

def equilibrium(fcn: Callable, x0, params=(), maxiter: int = 100,
                history: int = 6, mixing: float = 0.5):
    """Fixed point x* = fcn(x*, *params) with implicit-function-theorem
    gradients (reference optimize/equilibrium.py): forward solve by the
    in-module Anderson acceleration, backward by ``jax.lax.custom_root``
    semantics via rootfinding on g(x) = fcn(x) - x."""
    def g(x):
        return fcn(x, *params) - x

    def solve_fwd(g_, x_init):
        return anderson_acc(lambda x: fcn(x, *params), x_init,
                            maxiter=maxiter, window=history,
                            beta=mixing)

    def tangent_solve(h, y):
        # h is the linearization of g at the root; solve h(dx) = y
        n = y.size
        J = jax.jacfwd(h)(jnp.zeros_like(y))
        return jnp.linalg.solve(J.reshape(n, n),
                                y.reshape(n)).reshape(y.shape)

    return jax.lax.custom_root(g, jnp.asarray(x0), solve_fwd,
                               tangent_solve)


def exactsolve(A, B):
    """Dense linear solve fallback (reference solve.py exactsolve);
    accepts a matrix or LinearOperator."""
    if isinstance(A, LinearOperator):
        A = A.mm(jnp.eye(A.shape[1]))
    return jnp.linalg.solve(A, B)


def exacteig(A, neig: Optional[int] = None):
    """Dense symmetric eigendecomposition fallback (reference
    symeig.py exacteig): lowest ``neig`` pairs."""
    if isinstance(A, LinearOperator):
        A = A.mm(jnp.eye(A.shape[1]))
    w, V = jnp.linalg.eigh(A)
    if neig is not None:
        w, V = w[:neig], V[:, :neig]
    return w, V


def get_largest_eival(A, maxiter: int = 100):
    """Largest-|lambda| eigenvalue by power iteration on a matrix or
    LinearOperator (reference solve.py get_largest_eival role, used to
    scale preconditioners); differentiable through the scan."""
    mv = A.mv if isinstance(A, LinearOperator) else (lambda x: A @ x)
    n = A.shape[0]
    v0 = jnp.ones(n) / jnp.sqrt(n)

    def step(v, _):
        w = mv(v)
        return w / jnp.linalg.norm(w), None

    v, _ = jax.lax.scan(step, v0, None, length=maxiter)
    return v @ mv(v)


def ortho(A: jnp.ndarray) -> jnp.ndarray:
    """Orthonormalize the columns of A (reference symeig.py ortho):
    thin-QR basis."""
    Q, _ = jnp.linalg.qr(jnp.asarray(A))
    return Q


def solve_ABE(A: jnp.ndarray, B: jnp.ndarray,
              E: jnp.ndarray) -> jnp.ndarray:
    """Solve A X - X B = E columnwise via the eigendecomposition of B
    (reference solve.py solve_ABE, the Sylvester-like system behind
    implicit symeig gradients): X = U Y U^-1 with column j solving
    (A - b_j I) y_j = (E U)_j."""
    cdt = (jnp.complex128 if jnp.asarray(B).dtype
           in (jnp.float64, jnp.complex128) else jnp.complex64)
    w, U = jnp.linalg.eig(jnp.asarray(B, dtype=cdt))
    Et = jnp.asarray(E, w.dtype) @ U
    n = A.shape[0]

    def col(bj, ej):
        return jnp.linalg.solve(jnp.asarray(A, w.dtype)
                                - bj * jnp.eye(n, dtype=w.dtype), ej)

    Y = jax.vmap(col, in_axes=(0, 1), out_axes=1)(w, Et)
    X = Y @ jnp.linalg.inv(U)
    return jnp.real(X) if not jnp.iscomplexobj(E) else X


def gd(fcn: Callable, x0, lr: float = 0.1, maxiter: int = 200):
    """Gradient descent minimizer (reference optimize gd); alias of the
    module's ``minimize`` defaults."""
    return minimize(fcn, jnp.asarray(x0), lr=lr, maxiter=maxiter)


def adam(fcn: Callable, x0, lr: float = 0.05, beta1: float = 0.9,
         beta2: float = 0.999, eps: float = 1e-8, maxiter: int = 500):
    """Adam minimizer (reference optimize adam) as a differentiable
    lax.scan."""
    g = jax.grad(fcn)
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))

    def step(carry, i):
        x, m, v = carry
        gr = g(x)
        m = beta1 * m + (1 - beta1) * gr
        v = beta2 * v + (1 - beta2) * gr * gr
        mh = m / (1 - beta1 ** (i + 1.0))
        vh = v / (1 - beta2 ** (i + 1.0))
        return (x - lr * mh / (jnp.sqrt(vh) + eps), m, v), None

    (x, _, _), _ = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
        jnp.arange(maxiter))
    return x


# ---------------------------------------------------------------------------
# Reference-name surface: solver aliases, broadcast/dict helpers, and
# the functionalization shims (reference differentiation_utils exports
# that remain after the JAX redesign collapses xitorch's autograd
# machinery into plain function composition).

def cg(A: LinearOperator, B: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Conjugate-gradient solve with a matrix RHS [n, ncols]
    (reference solve.py cg)."""
    B = jnp.asarray(B)
    if B.ndim == 1:
        return cg_solve(A.mv, B, **kwargs)
    return jax.vmap(lambda b: cg_solve(A.mv, b, **kwargs),
                    in_axes=1, out_axes=1)(B)


def gmres(A: LinearOperator, B: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Restarted-GMRES solve with a matrix RHS (reference solve.py
    gmres)."""
    B = jnp.asarray(B)
    mv_t = A._mv_t
    if B.ndim == 1:
        return gmres_solve(A.mv, B, mv_t=mv_t, **kwargs)
    return jax.vmap(lambda b: gmres_solve(A.mv, b, mv_t=mv_t, **kwargs),
                    in_axes=1, out_axes=1)(B)


wrap_gmres = gmres


def bicgstab(A: LinearOperator, B: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """BiCGStab solve with a matrix RHS (reference solve.py
    bicgstab)."""
    B = jnp.asarray(B)
    mv_t = A._mv_t
    if B.ndim == 1:
        return bicgstab_solve(A.mv, B, mv_t=mv_t, **kwargs)
    return jax.vmap(
        lambda b: bicgstab_solve(A.mv, b, mv_t=mv_t, **kwargs),
        in_axes=1, out_axes=1)(B)


broyden1 = broyden
broyden1_solve = broyden


def broyden2(fcn: Callable, x0: jnp.ndarray, maxiter: int = 50,
             tol: float = 1e-9, alpha: float = -1.0) -> jnp.ndarray:
    """Broyden's SECOND ("bad") method: rank-1 updates of the inverse
    Jacobian using dx = -H f, H <- H + (s - H y) y^T / (y^T y)
    (reference rootfinder broyden2), with the same implicit-diff
    custom_root wrapper as broyden1."""
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    shape = x0.shape

    def f_flat(z):
        return jnp.ravel(fcn(z.reshape(shape)))

    def solve_fn(f, z0):
        n = z0.shape[0]

        def body(state):
            x, fx, H, it = state
            dx = -H @ fx
            x_new = x + dx
            f_new = f(x_new)
            y = f_new - fx
            yy = jnp.vdot(y, y)
            H_new = H + jnp.outer(dx - H @ y, y) / jnp.maximum(yy,
                                                               1e-30)
            H_new = jnp.where(yy > 1e-30, H_new, H)
            return x_new, f_new, H_new, it + 1

        def cond(state):
            _, fx, _, it = state
            return jnp.logical_and(jnp.vdot(fx, fx) > tol,
                                   it < maxiter)

        H0 = -alpha * jnp.eye(n, dtype=z0.dtype)
        x, *_ = jax.lax.while_loop(cond, body,
                                   (z0, f(z0), H0, 0))
        return x

    def tangent_solve(g, y):
        n = y.shape[0]
        J = jax.vmap(g, in_axes=1, out_axes=1)(jnp.eye(n,
                                                       dtype=y.dtype))
        return jnp.linalg.solve(J, y)

    xr = jax.lax.custom_root(f_flat, x0.reshape(-1), solve_fn,
                             tangent_solve)
    return xr.reshape(shape)


def linearmixing(fcn: Callable, x0: jnp.ndarray, maxiter: int = 100,
                 tol: float = 1e-9, alpha: float = -1.0) -> jnp.ndarray:
    """Damped fixed-point/root iteration x <- x - alpha f(x)
    (reference rootfinder linearmixing) with implicit-diff gradients."""
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    shape = x0.shape

    def f_flat(z):
        return jnp.ravel(fcn(z.reshape(shape)))

    def solve_fn(f, z0):
        def body(state):
            x, it = state
            return x + alpha * f(x), it + 1

        def cond(state):
            x, it = state
            fx = f(x)
            return jnp.logical_and(jnp.vdot(fx, fx) > tol,
                                   it < maxiter)
        x, _ = jax.lax.while_loop(cond, body, (z0, 0))
        return x

    def tangent_solve(g, y):
        n = y.shape[0]
        J = jax.vmap(g, in_axes=1, out_axes=1)(jnp.eye(n,
                                                       dtype=y.dtype))
        return jnp.linalg.solve(J, y)

    xr = jax.lax.custom_root(f_flat, x0.reshape(-1), solve_fn,
                             tangent_solve)
    return xr.reshape(shape)


def lsymeig(A, neig: Optional[int] = None, **kwargs):
    """Lowest-``neig`` eigenpairs of a Hermitian operator (reference
    symeig.py lsymeig)."""
    return symeig(A, neig=neig, mode='lowest', **kwargs)


def usymeig(A, neig: Optional[int] = None, **kwargs):
    """Highest-``neig`` eigenpairs (reference symeig.py usymeig)."""
    return symeig(A, neig=neig, mode='uppest', **kwargs)


def svd(A, k: Optional[int] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable (truncated) SVD of a LinearOperator or matrix
    (reference linop svd): right vectors from symeig of A^T A, left
    vectors from A v / s."""
    mat = A.fullmatrix() if isinstance(A, LinearOperator) \
        else jnp.asarray(A)
    evals, V = jnp.linalg.eigh(mat.T @ mat)
    order = jnp.argsort(-evals)
    evals, V = evals[order], V[:, order]
    if k is not None:
        evals, V = evals[:k], V[:, :k]
    s = jnp.sqrt(jnp.maximum(evals, 1e-300))
    U = (mat @ V) / s[None, :]
    return U, s, V.T


def jac(fcn: Callable, x: jnp.ndarray) -> LinearOperator:
    """The Jacobian of ``fcn`` at ``x`` as a matrix-free
    LinearOperator: mv = jvp, rmv = vjp (reference grad/jachess.py
    jac) — in JAX the linearization IS the operator."""
    x = jnp.asarray(x)
    y, jvp_fn = jax.linearize(fcn, x)
    _, vjp_fn = jax.vjp(fcn, x)
    return LinearOperator(jvp_fn, (y.size, x.size),
                          mv_t=lambda v: vjp_fn(v)[0])


# --------------------------------------------- misc xitorch helpers

def dot(A, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x for LinearOperator or array A (reference solve.py dot)."""
    if isinstance(A, LinearOperator):
        return A.mv(x) if x.ndim == 1 else A.mm(x)
    return jnp.asarray(A) @ x


def safedenom(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Push tiny denominators away from zero keeping their sign
    (reference solve.py safedenom)."""
    sign = jnp.where(x >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(x) < eps, sign * eps, x)


def normalize_bcast_dims(*shapes):
    """Left-pad shapes with 1s to a common rank (reference
    utils/bcast.py)."""
    maxlen = max(len(s) for s in shapes)
    return [[1] * (maxlen - len(s)) + list(s) for s in shapes]


def get_bcasted_dims(*shapes):
    """Broadcasted result shape of the padded shapes."""
    shapes = normalize_bcast_dims(*shapes)
    return [max(dims) for dims in zip(*shapes)]


def match_dim(*xs: jnp.ndarray, contiguous: bool = False):
    """Broadcast all arrays' batch dims (all but the last two) to a
    common shape (reference utils/bcast.py match_dim)."""
    batch_shapes = [x.shape[:-2] for x in xs]
    bdims = tuple(get_bcasted_dims(*batch_shapes))
    return tuple(jnp.broadcast_to(x, bdims + x.shape[-2:]) for x in xs)


def get_batchdims(a: jnp.ndarray, na: int, b: Optional[jnp.ndarray],
                  nb: Optional[int]):
    """Common batch shape of two batched matrices (reference
    solve.py get_batchdims)."""
    if b is not None:
        return get_bcasted_dims(a.shape[:-na], b.shape[:-nb])
    return list(a.shape[:-na])


def set_default_option(defopt: dict, opt: Optional[dict]) -> dict:
    """Overlay user options on defaults (reference utils/misc.py)."""
    out = dict(defopt)
    if opt:
        out.update(opt)
    return out


def get_and_pop_keys(d: dict, keys) -> dict:
    """Remove ``keys`` from d and return them as a new dict (reference
    utils/misc.py)."""
    return {k: d.pop(k) for k in list(keys)}


def get_method(algname: str, methods: dict, method):
    """Resolve a method that may be a name or a callable (reference
    utils/misc.py get_method)."""
    if callable(method):
        return method
    if isinstance(method, str) and method.lower() in methods:
        return methods[method.lower()]
    raise RuntimeError(
        f'invalid method {method!r} for {algname} '
        f'(available: {sorted(methods)})')


class dummy_context_manager:
    """No-op context manager (reference utils/misc.py)."""

    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


def assert_runtime(cond, msg: str = '') -> None:
    """Raise RuntimeError unless cond (reference utils/assertfuncs.py)."""
    if not cond:
        raise RuntimeError(msg)


def make_sibling(*pfuncs) -> Callable:
    """Decorator marking a function as a sibling of pure functions —
    xitorch uses this to register shared autograd state; with JAX
    functions already pure it simply tags and returns the function
    (reference utils/misc.py make_sibling, degenerate by design)."""
    def decorator(fcn):
        fcn._siblings = pfuncs
        return fcn
    return decorator


# --------------------------------- functionalization (EditableModule)

class EditableModule:
    """Parameter-carrying object whose methods can be functionalized
    (reference editable_module.py).  xitorch needs this to thread
    tensors through torch autograd; in JAX the same contract is three
    small methods over named attributes."""

    def getparamnames(self, methodname: str, prefix: str = ''):
        raise NotImplementedError

    def getparams(self, methodname: str):
        return [_rgetattr(self, name)
                for name in self.getparamnames(methodname)]

    def setparams(self, methodname: str, *params):
        names = self.getparamnames(methodname)
        for name, val in zip(names, params):
            _rsetattr(self, name, val)
        return len(names)


def _rgetattr(obj, name: str):
    for part in name.split('.'):
        obj = getattr(obj, part)
    return obj


def _rsetattr(obj, name: str, val):
    parts = name.split('.')
    for part in parts[:-1]:
        obj = getattr(obj, part)
    setattr(obj, parts[-1], val)


class PureFunction:
    """A bound method turned into a pure function of (params, *args)
    (reference pure_function.py PureFunction): captures the object's
    parameters so solvers can differentiate through them explicitly."""

    def __init__(self, fcn: Callable):
        self._fcn = fcn
        obj = getattr(fcn, '__self__', None)
        self._obj = obj if isinstance(obj, EditableModule) else None
        self._method = fcn.__name__ if self._obj is not None else None

    def objparams(self):
        if self._obj is None:
            return []
        return self._obj.getparams(self._method)

    def __call__(self, *args, **kwargs):
        return self._fcn(*args, **kwargs)

    def useobjparams(self, params):
        """Context manager temporarily swapping the object's params."""
        outer = self

        class _Swap:
            def __enter__(self):
                if outer._obj is not None:
                    self._saved = outer._obj.getparams(outer._method)
                    outer._obj.setparams(outer._method, *params)
                return outer

            def __exit__(self, *exc):
                if outer._obj is not None:
                    outer._obj.setparams(outer._method, *self._saved)
                return False
        return _Swap()


def get_pure_function(fcn: Callable) -> PureFunction:
    """Wrap a callable/bound method as a PureFunction (reference
    pure_function.py get_pure_function)."""
    return fcn if isinstance(fcn, PureFunction) else PureFunction(fcn)


# ------------------------------------------------- solver plumbing

def setup_precond(precond: Optional[LinearOperator] = None) -> Callable:
    """Return a preconditioner-apply function (identity when None)
    (reference solve.py setup_precond)."""
    if precond is None:
        return lambda x: x
    return lambda x: (precond.mv(x) if x.ndim == 1 else precond.mm(x))


def setup_linear_problem(A: LinearOperator, B: jnp.ndarray,
                         E: Optional[jnp.ndarray] = None,
                         M: Optional[LinearOperator] = None):
    """Reduce (A - E M) x = B to a plain matvec + RHS pair (reference
    solve.py setup_linear_problem: the generalized shifted problem
    every symeig/solve backward needs).  Returns (matvec, B)."""
    if E is None:
        return A.mv, jnp.asarray(B)
    E = jnp.asarray(E)
    M_mv = M.mv if M is not None else (lambda x: x)

    def matvec(x):
        return A.mv(x) - E * M_mv(x)
    return matvec, jnp.asarray(B)

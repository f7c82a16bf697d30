"""CG solve + Davidson symeig with implicit-diff custom VJPs
(VERDICT r1 item 6; reference utils/differentiation_utils/solve.py,
symeig.py), validated against scipy and eigh autodiff."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepchem_tpu.utils.differentiation_utils import cg_solve, davidson


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


def _spd(n=40, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n)
    return M @ M.T + n * np.eye(n)


def test_cg_matches_scipy_and_direct_solve():
    import scipy.sparse.linalg as spla
    A = _spd()
    b = np.random.RandomState(1).randn(40)
    x = cg_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b))
    x_sp = spla.cg(A, b, rtol=1e-10)[0]
    assert float(np.abs(np.asarray(x) - x_sp).max()) < 1e-8


def test_cg_implicit_gradient():
    A = jnp.asarray(_spd())
    b = jnp.asarray(np.random.RandomState(1).randn(40))
    g1 = jax.grad(lambda bb: jnp.sum(
        cg_solve(lambda v: A @ v, bb) ** 2))(b)
    g2 = jax.grad(lambda bb: jnp.sum(jnp.linalg.solve(A, bb) ** 2))(b)
    assert float(jnp.abs(g1 - g2).max()) < 1e-8


def _diag_dominant(n=60, seed=0):
    rng = np.random.RandomState(seed)
    B = rng.randn(n, n) * 0.05
    return np.diag(np.arange(1.0, n + 1.0)) + (B + B.T) / 2


def test_davidson_matches_scipy_eigsh():
    import scipy.sparse.linalg as spla
    S = _diag_dominant()
    theta, X = davidson(jnp.asarray(S), neig=3, max_space=15, restarts=3)
    w_sp = spla.eigsh(S, k=3, which='SA')[0]
    assert float(np.abs(np.asarray(theta) - np.sort(w_sp)).max()) < 1e-8
    # eigenvectors satisfy A x = theta x
    R = S @ np.asarray(X) - np.asarray(X) * np.asarray(theta)[None, :]
    assert float(np.abs(R).max()) < 1e-6


def test_davidson_implicit_vjp_matches_eigh():
    S = jnp.asarray(_diag_dominant())

    def f_dav(Am):
        Am = (Am + Am.T) / 2
        t, Xv = davidson(Am, neig=2, max_space=15, restarts=3)
        return jnp.sum(t * jnp.array([1.0, 2.0])) + jnp.sum(Xv[:, 0] ** 3)

    def f_eigh(Am):
        Am = (Am + Am.T) / 2
        w, U = jnp.linalg.eigh(Am)
        sign = jnp.sign(jnp.sum(U[:, :2], axis=0) + 1e-30)
        U2 = U[:, :2] * sign[None, :]
        return jnp.sum(w[:2] * jnp.array([1.0, 2.0])) \
            + jnp.sum(U2[:, 0] ** 3)

    gd = jax.grad(f_dav)(S)
    ge = jax.grad(f_eigh)(S)
    assert float(jnp.abs(gd - ge).max()) < 1e-7

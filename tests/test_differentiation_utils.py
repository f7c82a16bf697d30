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


# -- round 3: GMRES / BiCGStab / Broyden / L-BFGS --------------------------

def _nonsym(n=30, seed=2):
    rng = np.random.RandomState(seed)
    return np.diag(np.arange(2.0, n + 2.0)) + rng.randn(n, n) * 0.3


def test_gmres_matches_direct_solve():
    from deepchem_tpu.utils.differentiation_utils import gmres_solve
    A = _nonsym()
    b = np.random.RandomState(3).randn(30)
    x = gmres_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                    mv_t=lambda v: jnp.asarray(A).T @ v)
    x_ref = np.linalg.solve(A, b)
    assert float(np.abs(np.asarray(x) - x_ref).max()) < 1e-7


def test_gmres_implicit_gradient_nonsymmetric():
    from deepchem_tpu.utils.differentiation_utils import gmres_solve
    A = jnp.asarray(_nonsym())
    b = jnp.asarray(np.random.RandomState(3).randn(30))
    g1 = jax.grad(lambda bb: jnp.sum(gmres_solve(
        lambda v: A @ v, bb, mv_t=lambda v: A.T @ v) ** 2))(b)
    g2 = jax.grad(lambda bb: jnp.sum(jnp.linalg.solve(A, bb) ** 2))(b)
    assert float(jnp.abs(g1 - g2).max()) < 1e-6


def test_bicgstab_matches_scipy():
    import scipy.sparse.linalg as spla
    from deepchem_tpu.utils.differentiation_utils import bicgstab_solve
    A = _nonsym()
    b = np.random.RandomState(4).randn(30)
    x = bicgstab_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                       mv_t=lambda v: jnp.asarray(A).T @ v, tol=1e-12)
    x_sp = spla.bicgstab(A, b, rtol=1e-12)[0]
    assert float(np.abs(np.asarray(x) - x_sp).max()) < 1e-6


def test_bicgstab_implicit_gradient():
    from deepchem_tpu.utils.differentiation_utils import bicgstab_solve
    A = jnp.asarray(_spd(30, 5))
    b = jnp.asarray(np.random.RandomState(5).randn(30))
    g1 = jax.grad(lambda bb: jnp.sum(bicgstab_solve(
        lambda v: A @ v, bb, tol=1e-12) ** 2))(b)
    g2 = jax.grad(lambda bb: jnp.sum(jnp.linalg.solve(A, bb) ** 2))(b)
    assert float(jnp.abs(g1 - g2).max()) < 1e-6


def test_broyden_root_and_gradient():
    from deepchem_tpu.utils.differentiation_utils import broyden
    # root of f(x) = x^3 + a x - b, parameterized; d(root)/da via
    # implicit function theorem: -x / (3x^2 + a)
    a, b = 2.0, 10.0

    def root_of(av):
        return broyden(lambda x: x ** 3 + av * x - b,
                       jnp.asarray(1.0))
    x = root_of(a)
    assert abs(float(x ** 3 + a * x - b)) < 1e-7
    g = jax.grad(root_of)(jnp.asarray(a))
    expected = -float(x) / (3 * float(x) ** 2 + a)
    assert abs(float(g) - expected) < 1e-6


def test_broyden_vector_system():
    from deepchem_tpu.utils.differentiation_utils import broyden
    import scipy.optimize as sopt

    def f_np(v):
        return [v[0] ** 2 + v[1] - 3.0, v[0] - v[1] ** 2 + 1.0]
    x_sp = sopt.fsolve(f_np, [1.0, 1.0], xtol=1e-12)
    x = broyden(lambda v: jnp.stack([v[0] ** 2 + v[1] - 3.0,
                                     v[0] - v[1] ** 2 + 1.0]),
                jnp.asarray([1.0, 1.0]), maxiter=200, tol=1e-20)
    assert float(jnp.abs(x - jnp.asarray(np.asarray(x_sp))).max()) < 1e-6
    assert float(np.abs(np.asarray(f_np(np.asarray(x)))).max()) < 1e-8


def test_lbfgs_matches_scipy_minimum():
    import scipy.optimize as sopt
    from deepchem_tpu.utils.differentiation_utils import lbfgs_minimize
    # rosenbrock
    def f(v):
        return (1 - v[0]) ** 2 + 100 * (v[1] - v[0] ** 2) ** 2
    x = lbfgs_minimize(f, jnp.asarray([-1.2, 1.0]), maxiter=200)
    ref = sopt.minimize(lambda v: float(f(jnp.asarray(v))),
                        [-1.2, 1.0], method='L-BFGS-B').x
    assert float(jnp.abs(x - jnp.asarray(ref)).max()) < 1e-4


def test_lbfgs_implicit_gradient():
    from deepchem_tpu.utils.differentiation_utils import lbfgs_minimize
    # argmin_x (x - a)^2 + 0.1 x^4; d(x*)/da via IFT = 2 / (2 + 1.2 x*^2)
    def xstar(a):
        return lbfgs_minimize(
            lambda x: jnp.sum((x - a) ** 2 + 0.1 * x ** 4),
            jnp.zeros(1))[0]
    a = jnp.asarray(1.5)
    x = xstar(a)
    g = jax.grad(xstar)(a)
    expected = 2.0 / (2.0 + 1.2 * float(x) ** 2)
    assert abs(float(g) - expected) < 1e-5


# ---------------------------------------------------------------------------
# LinearOperator algebra (reference linop.py composition surface)
# ---------------------------------------------------------------------------

def test_linear_operator_algebra_matches_dense():
    from deepchem_tpu.utils.differentiation_utils import LinearOperator
    rng = np.random.RandomState(3)
    A = rng.randn(5, 4)
    B = rng.randn(4, 6)
    C = rng.randn(5, 4)
    opA = LinearOperator.from_matrix(jnp.asarray(A))
    opB = LinearOperator.from_matrix(jnp.asarray(B))
    opC = LinearOperator.from_matrix(jnp.asarray(C))
    # composition
    comp = opA @ opB
    assert comp.shape == (5, 6)
    np.testing.assert_allclose(np.asarray(comp.fullmatrix()), A @ B,
                               atol=1e-12)
    # adjoint of the composition = B^T A^T
    np.testing.assert_allclose(np.asarray(comp.H.fullmatrix()),
                               (A @ B).T, atol=1e-12)
    # add / sub / neg / scalar
    np.testing.assert_allclose(np.asarray((opA + opC).fullmatrix()),
                               A + C, atol=1e-12)
    np.testing.assert_allclose(np.asarray((opA - opC).fullmatrix()),
                               A - C, atol=1e-12)
    np.testing.assert_allclose(np.asarray((-opA).fullmatrix()), -A,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray((2.5 * opA).fullmatrix()),
                               2.5 * A, atol=1e-12)
    # rmv == transpose mv
    v = jnp.asarray(rng.randn(5))
    np.testing.assert_allclose(np.asarray(opA.rmv(v)), A.T @ v,
                               atol=1e-12)
    with pytest.raises(ValueError):
        opA @ opC          # 4 != 5
    with pytest.raises(ValueError):
        opA + opB


def test_symeig_degenerate_safe_gradient():
    """On a matrix with an exactly degenerate eigenpair, the invariant
    function f(A) = sum(lam^2) has the well-defined gradient 2A; the
    degenerate-safe backward must produce it (finite), matching the
    closed form."""
    from deepchem_tpu.utils.differentiation_utils import (LinearOperator,
                                                          symeig)
    # eigenvalues 1, 1, 3 -> exactly degenerate pair
    rng = np.random.RandomState(0)
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    A = Q @ np.diag([1.0, 1.0, 3.0]) @ Q.T
    A = jnp.asarray(0.5 * (A + A.T))

    def f(mat):
        evals, evecs = symeig(LinearOperator.from_matrix(mat),
                              degen_tol=1e-8)
        return jnp.sum(evals ** 2)

    g = jax.grad(f)(A)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * A),
                               atol=1e-8)
    # eigenvector-dependent invariant: projector onto the degenerate
    # subspace is rotation-invariant; its trace-weighted overlap with a
    # fixed symmetric matrix has a finite, FD-checkable gradient
    M = jnp.asarray(_spd(3, seed=5))

    def h(mat):
        evals, evecs = symeig(LinearOperator.from_matrix(mat),
                              degen_tol=1e-6)
        P = evecs[:, :2] @ evecs[:, :2].T
        return jnp.sum(P * M)

    gh = jax.grad(h)(A)
    assert np.all(np.isfinite(np.asarray(gh)))
    # finite-difference check along a symmetric direction
    D = np.asarray(_spd(3, seed=7))
    D = jnp.asarray(D / np.linalg.norm(D))
    eps = 1e-6
    fd = (h(A + eps * D) - h(A - eps * D)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(gh * D)), float(fd),
                               rtol=1e-3, atol=1e-6)


def test_symeig_distinct_matches_eigh_gradient():
    """Away from degeneracies, degen_tol backward equals the native eigh
    gradient."""
    from deepchem_tpu.utils.differentiation_utils import (LinearOperator,
                                                          symeig)
    A = jnp.asarray(_spd(6, seed=2))

    def f_safe(mat):
        evals, evecs = symeig(LinearOperator.from_matrix(mat),
                              degen_tol=1e-10)
        return jnp.sum(evals ** 3) + jnp.sum(evecs[:, 0] ** 4)

    def f_native(mat):
        evals, evecs = jnp.linalg.eigh(mat)
        return jnp.sum(evals ** 3) + jnp.sum(evecs[:, 0] ** 4)

    g1 = jax.grad(f_safe)(A)
    g2 = jax.grad(f_native)(A)
    # native eigh backward is not symmetrized; compare on the symmetric
    # part, which is what reaches any symmetric upstream input
    g2s = 0.5 * (g2 + g2.T)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2s),
                               atol=1e-8)


class TestAndersonAcceleration:
    def test_dottie_fixed_point(self):
        from deepchem_tpu.utils.differentiation_utils import anderson_acc
        x = anderson_acc(jnp.cos, jnp.zeros(3), maxiter=25)
        np.testing.assert_allclose(np.asarray(x), 0.7390851332, atol=1e-5)

    def test_beats_picard_on_slow_contraction(self):
        """Linear fixed point with spectral radius 0.97: plain Picard
        at 40 steps is still ~3 off; Anderson is at 1e-3."""
        from deepchem_tpu.utils.differentiation_utils import anderson_acc
        rng = np.random.RandomState(0)
        Q = np.linalg.qr(rng.randn(20, 20))[0]
        A = Q @ np.diag(np.linspace(0.1, 0.97, 20)) @ Q.T
        b = rng.randn(20)
        xstar = np.linalg.solve(np.eye(20) - A, b)
        g = lambda x: jnp.asarray(A) @ x + jnp.asarray(b)
        xa = anderson_acc(g, jnp.zeros(20), maxiter=40)
        xp = jnp.zeros(20)
        for _ in range(40):
            xp = g(xp)
        err_a = float(jnp.abs(xa - xstar).max())
        err_p = float(jnp.abs(xp - xstar).max())
        assert err_a < 5e-3
        assert err_p > 1.0

    def test_gradient_flows(self):
        from deepchem_tpu.utils.differentiation_utils import anderson_acc

        def f(s):
            return jnp.sum(anderson_acc(lambda x: jnp.tanh(s * x) + 0.5,
                                        jnp.zeros(2), maxiter=30))

        g = jax.grad(f)(jnp.asarray(0.5))
        h = 1e-3
        fd = (float(f(jnp.asarray(0.5 + h)))
              - float(f(jnp.asarray(0.5 - h)))) / (2 * h)
        assert np.isfinite(float(g))
        assert abs(float(g) - fd) < 5e-3 * max(1.0, abs(fd))


class TestIntegratorsAndMisc:
    """Round-3 breadth: explicit-RK IVP integrators, equilibrium with
    IFT gradients, dense fallbacks, Sylvester solve, power iteration,
    adam/gd (reference integrate/explicit_rk.py, optimize/, solve.py)."""

    def test_rk_orders(self):
        """Error on dy/dt = -y over [0,1] must shrink with the
        method's order when the step halves."""
        from deepchem_tpu.utils import differentiation_utils as du
        f = lambda t, y: -y
        exact = np.exp(-1.0)
        for name, order in (('fwd_euler', 1), ('mid_point', 2),
                            ('rk4', 4), ('rk38', 4)):
            fn = getattr(du, name + '_ivp')
            e1 = abs(float(fn(f, jnp.asarray(1.0),
                              jnp.linspace(0, 1, 11))[-1]) - exact)
            e2 = abs(float(fn(f, jnp.asarray(1.0),
                              jnp.linspace(0, 1, 21))[-1]) - exact)
            ratio = e1 / max(e2, 1e-14)
            assert ratio > 0.7 * 2 ** order, (name, e1, e2, ratio)

    def test_rk4_parameter_gradient(self):
        """d y(T)/dk for dy/dt = -k y equals -T y0 exp(-kT)."""
        from deepchem_tpu.utils import differentiation_utils as du
        ts = jnp.linspace(0, 1, 21)

        def yT(k):
            return du.rk4_ivp(lambda t, y, kk: -kk * y,
                              jnp.asarray(1.0), ts, (k,))[-1]

        g = float(jax.grad(yT)(jnp.asarray(0.7)))
        assert abs(g - (-np.exp(-0.7))) < 1e-6

    def test_equilibrium_ift_gradient(self):
        """x* = cos(a x*): gradient wrt a must equal the implicit-
        function-theorem closed form (df/da)/(1 - df/dx)."""
        from deepchem_tpu.utils import differentiation_utils as du

        def fc(x, a):
            return jnp.cos(a * x)

        x = du.equilibrium(fc, jnp.asarray(0.5),
                           params=(jnp.asarray(1.0),))
        assert abs(float(jnp.cos(x) - x)) < 1e-8
        g = float(jax.grad(lambda a: du.equilibrium(
            fc, jnp.asarray(0.5), params=(a,)).sum())(
                jnp.asarray(1.0)))
        xs = float(x)
        ift = (-xs * np.sin(xs)) / (1 + np.sin(xs))
        assert abs(g - ift) < 1e-8

    def test_dense_fallbacks_and_sylvester(self):
        from deepchem_tpu.utils import differentiation_utils as du
        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.randn(6, 6))
        A = A @ A.T + jnp.eye(6)
        w, V = du.exacteig(A, neig=2)
        np.testing.assert_allclose(
            np.asarray(w), np.linalg.eigvalsh(np.asarray(A))[:2],
            atol=1e-10)
        b = jnp.asarray(rng.randn(6))
        assert float(jnp.abs(A @ du.exactsolve(A, b) - b).max()) < 1e-9
        lam = du.get_largest_eival(A)
        assert abs(float(lam)
                   - np.linalg.eigvalsh(np.asarray(A))[-1]) < 1e-8
        Q = du.ortho(rng.randn(6, 3))
        assert float(jnp.abs(Q.T @ Q - jnp.eye(3)).max()) < 1e-10
        B = jnp.asarray(np.diag([1.0, 2.0, 3.0]))
        E = jnp.asarray(rng.randn(6, 3))
        X = du.solve_ABE(A, B, E)
        assert float(jnp.abs(A @ X - X @ B - E).max()) < 1e-8

    def test_adam_gd_converge(self):
        from deepchem_tpu.utils import differentiation_utils as du
        f = lambda x: jnp.sum((x - 2.0) ** 2)
        assert float(jnp.abs(du.adam(f, jnp.zeros(3), lr=0.1,
                                     maxiter=800) - 2).max()) < 1e-6
        assert float(jnp.abs(du.gd(f, jnp.zeros(3), lr=0.2,
                                   maxiter=300) - 2).max()) < 1e-6


class TestReferenceSurface:
    """The remaining reference differentiation_utils exports (typed
    operator classes, solver aliases, xitorch misc/functionalization
    helpers) behave, not just import."""

    def test_typed_operator_classes(self):
        from deepchem_tpu.utils import differentiation_utils as du
        rng = np.random.RandomState(0)
        Am = rng.randn(4, 4)
        Bm = rng.randn(4, 3)
        A = du.LinearOperator.from_matrix(jnp.asarray(Am))
        B = du.LinearOperator.from_matrix(jnp.asarray(Bm))
        assert isinstance(A, du.MatrixLinearOperator)
        assert isinstance(A + A, du.AddLinearOperator)
        assert isinstance(2.0 * A, du.MulLinearOperator)
        assert isinstance(A @ B, du.MatmulLinearOperator)
        assert isinstance(B.H, du.AdjointLinearOperator)
        assert np.allclose((A + 2.0 * A).fullmatrix(), 3 * Am,
                           atol=1e-12)
        assert np.allclose((A @ B).fullmatrix(), Am @ Bm, atol=1e-12)
        assert np.allclose(B.H.fullmatrix(), Bm.T, atol=1e-12)
        with pytest.raises(ValueError):
            B + A
        with pytest.raises(ValueError):
            B @ B

    def test_matrix_rhs_solvers(self):
        from deepchem_tpu.utils import differentiation_utils as du
        rng = np.random.RandomState(1)
        M = rng.randn(6, 6)
        spd = M @ M.T + 6 * np.eye(6)
        B = rng.randn(6, 2)
        x_ref = np.linalg.solve(spd, B)
        A = du.LinearOperator.from_matrix(jnp.asarray(spd))
        for solver in (du.cg, du.gmres, du.bicgstab, du.wrap_gmres):
            X = solver(A, jnp.asarray(B))
            assert np.allclose(X, x_ref, atol=1e-5), solver.__name__
        # vector RHS path
        x1 = du.cg(A, jnp.asarray(B[:, 0]))
        assert np.allclose(x1, x_ref[:, 0], atol=1e-6)

    def test_broyden2_and_linearmixing(self):
        from deepchem_tpu.utils import differentiation_utils as du

        def make(a):
            return lambda x: jnp.tanh(a * x) - x + 0.3

        root2 = du.broyden2(make(0.5), jnp.zeros(1))
        assert float(jnp.abs(make(0.5)(root2)).max()) < 1e-4
        # f' in (-1, -0.5) here, so the damped iteration contracts
        # for positive alpha (|1 + alpha f'| < 1)
        rootm = du.linearmixing(make(0.5), jnp.zeros(1), alpha=0.8)
        assert float(jnp.abs(make(0.5)(rootm)).max()) < 1e-4
        assert np.allclose(root2, rootm, atol=1e-4)
        # implicit gradient vs finite differences
        g = jax.grad(lambda a: du.broyden2(make(a),
                                           jnp.zeros(1)).sum())(0.5)
        h = 1e-5
        fd = (du.broyden2(make(0.5 + h), jnp.zeros(1)).sum()
              - du.broyden2(make(0.5 - h), jnp.zeros(1)).sum()) / (2 * h)
        assert abs(float(g) - float(fd)) < 1e-4

    def test_lsymeig_usymeig_svd(self):
        from deepchem_tpu.utils import differentiation_utils as du
        rng = np.random.RandomState(2)
        M = rng.randn(5, 5)
        S = jnp.asarray(M + M.T)
        lo, Vlo = du.lsymeig(du.LinearOperator.from_matrix(S), neig=2)
        hi, Vhi = du.usymeig(du.LinearOperator.from_matrix(S), neig=2)
        w = np.linalg.eigvalsh(np.asarray(S))
        assert np.allclose(lo, w[:2], atol=1e-10)
        assert np.allclose(hi, w[-2:], atol=1e-10)
        U, s, Vt = du.svd(du.LinearOperator.from_matrix(
            jnp.asarray(M)))
        assert np.allclose(U * s[None, :] @ Vt, M, atol=1e-8)
        s_ref = np.linalg.svd(M, compute_uv=False)
        assert np.allclose(np.sort(s)[::-1], s_ref, atol=1e-8)
        U2, s2, _ = du.svd(jnp.asarray(M), k=2)
        assert s2.shape == (2,) and np.allclose(s2, s_ref[:2],
                                                atol=1e-8)

    def test_jac_operator(self):
        from deepchem_tpu.utils import differentiation_utils as du

        def f(x):
            return jnp.stack([x[0] * x[1], jnp.sin(x[2]),
                              x.sum()])

        x0 = jnp.asarray([1.0, 2.0, 0.5])
        J = du.jac(f, x0)
        Jm = jax.jacobian(f)(x0)
        assert np.allclose(J.fullmatrix(), Jm, atol=1e-12)
        v = jnp.asarray([0.3, -0.2, 0.1])
        assert np.allclose(J.H.mv(v), Jm.T @ v, atol=1e-12)

    def test_misc_helpers(self):
        from deepchem_tpu.utils import differentiation_utils as du
        A = du.LinearOperator.from_matrix(jnp.eye(2) * 3.0)
        assert np.allclose(du.dot(A, jnp.ones(2)), 3.0)
        assert np.allclose(du.dot(jnp.eye(2), jnp.ones(2)), 1.0)
        sd = du.safedenom(jnp.asarray([1e-20, -1e-20, 2.0]), 1e-10)
        assert float(sd[0]) == 1e-10 and float(sd[1]) == -1e-10 \
            and float(sd[2]) == 2.0
        assert du.normalize_bcast_dims([3, 2], [4, 1, 2]) \
            == [[1, 3, 2], [4, 1, 2]]
        assert du.get_bcasted_dims([3, 1], [1, 5]) == [3, 5]
        a = jnp.zeros((2, 1, 3, 3))
        b = jnp.zeros((4, 3, 3))
        am, bm = du.match_dim(a, b)
        assert am.shape == (2, 4, 3, 3) and bm.shape == (2, 4, 3, 3)
        assert du.get_batchdims(a, 2, b, 2) == [2, 4]
        opt = du.set_default_option({'a': 1, 'b': 2}, {'b': 3})
        assert opt == {'a': 1, 'b': 3}
        d = {'x': 1, 'y': 2, 'z': 3}
        popped = du.get_and_pop_keys(d, ['x', 'z'])
        assert popped == {'x': 1, 'z': 3} and d == {'y': 2}
        assert du.get_method('alg', {'cg': du.cg}, 'cg') is du.cg
        with pytest.raises(RuntimeError):
            du.get_method('alg', {}, 'nope')
        with du.dummy_context_manager():
            pass
        du.assert_runtime(True)
        with pytest.raises(RuntimeError):
            du.assert_runtime(False, 'boom')

        @du.make_sibling(du.cg)
        def child(x):
            return x
        assert child._siblings == (du.cg,)

    def test_editable_module_and_pure_function(self):
        from deepchem_tpu.utils import differentiation_utils as du

        class Quad(du.EditableModule):
            def __init__(self, a, b):
                self.a = a
                self.b = b

            def f(self, x):
                return self.a * x ** 2 + self.b

            def getparamnames(self, methodname, prefix=''):
                assert methodname == 'f'
                return [prefix + 'a', prefix + 'b']

        q = Quad(2.0, 1.0)
        assert q.getparams('f') == [2.0, 1.0]
        q.setparams('f', 3.0, 0.5)
        assert q.a == 3.0 and q.b == 0.5
        pf = du.get_pure_function(q.f)
        assert du.get_pure_function(pf) is pf
        assert pf(2.0) == 3.0 * 4 + 0.5
        assert pf.objparams() == [3.0, 0.5]
        with pf.useobjparams([1.0, 0.0]):
            assert pf(2.0) == 4.0
        assert q.a == 3.0   # restored on exit

    def test_setup_precond_and_linear_problem(self):
        from deepchem_tpu.utils import differentiation_utils as du
        P = du.LinearOperator.from_matrix(jnp.eye(3) * 0.5)
        apply_p = du.setup_precond(P)
        assert np.allclose(apply_p(jnp.ones(3)), 0.5)
        assert np.allclose(du.setup_precond(None)(jnp.ones(3)), 1.0)
        A = du.LinearOperator.from_matrix(jnp.diag(
            jnp.asarray([2.0, 3.0, 4.0])))
        mv, B = du.setup_linear_problem(A, jnp.ones(3), E=jnp.asarray(1.0))
        # (A - E I) x
        assert np.allclose(mv(jnp.ones(3)), jnp.asarray([1.0, 2.0, 3.0]))

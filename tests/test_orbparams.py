"""Orbital parametrizations + direct-minimization SCF
(reference utils/dft_utils/hamilton/orbparams.py + the variational
engines built on it).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepchem_tpu.dft import (DFTSystem, KohnShamSCF, MatExpOrbParams,
                              QROrbParams, scf_direct_minimize)


@pytest.fixture(scope='module', autouse=True)
def x64_mode():
    # variational SCF converges the gradient to ~1e-6; needs f64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)

H2O = (['O', 'H', 'H'],
       np.array([[0.0, 0.0, 0.1173],
                 [0.0, 0.7572, -0.4692],
                 [0.0, -0.7572, -0.4692]]))


class TestOrbParamsContract:
    def test_qr_orthogonality_and_penalty(self):
        params = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        orb, = QROrbParams.params2orb(params)
        assert np.allclose(orb.T @ orb, np.eye(3), atol=1e-6)
        # already-orthogonal params (sign-fixed): zero penalty
        orb2, penalty = QROrbParams.params2orb(orb, with_penalty=0.1)
        assert np.allclose(orb2, orb, atol=1e-6)
        assert float(penalty) < 1e-10
        # penalty is positive for non-orthogonal params
        _, p2 = QROrbParams.params2orb(params * 3.0, with_penalty=0.1)
        assert float(p2) > 1e-4
        # round trip
        params2, coeffs2 = QROrbParams.orb2params(orb)
        orb3, = QROrbParams.params2orb(params2, coeffs2)
        assert np.allclose(orb3, orb, atol=1e-6)

    def test_matexp_orthogonality_and_roundtrip(self):
        coeffs = jnp.eye(4)[:, :2]
        params = jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.4, 0.2])
        orb, = MatExpOrbParams.params2orb(params, coeffs)
        assert np.allclose(orb.T @ orb, np.eye(2), atol=1e-6)
        # zero params is the identity rotation
        orb0, = MatExpOrbParams.params2orb(jnp.zeros(6), coeffs)
        assert np.allclose(orb0, coeffs, atol=1e-12)
        # orb2params inverse: identity params + orb as coeffs
        p2, c2 = MatExpOrbParams.orb2params(orb)
        orb2, = MatExpOrbParams.params2orb(p2, c2)
        assert np.allclose(orb2, orb, atol=1e-12)

    def test_matexp_fewer_params_than_triangle(self):
        # the reference allows nparams < nao*(nao-1)/2 (leading triu
        # entries only)
        coeffs = jnp.eye(4)[:, :3]
        orb, = MatExpOrbParams.params2orb(jnp.asarray([0.3, -0.1]),
                                          coeffs)
        assert np.allclose(orb.T @ orb, np.eye(3), atol=1e-6)


class TestDirectMinimization:
    def test_hf_h2_matches_fixed_point(self):
        sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 0.74]])
        e_fp = float(KohnShamSCF(xc='hf', iterations=60)
                     .run(sys_).energy())
        calc = scf_direct_minimize(sys_, xc='hf')
        assert abs(float(calc.energy()) - e_fp) < 1e-8

    def test_hf_h2o_matches_fixed_point(self):
        sys_ = DFTSystem(*H2O)
        e_fp = float(KohnShamSCF(xc='hf', iterations=80)
                     .run(sys_).energy())
        calc = scf_direct_minimize(sys_, xc='hf', maxiter=400)
        # literature RHF/STO-3G is -74.9629; both paths must agree
        assert abs(float(calc.energy()) - e_fp) < 1e-7
        # density idempotency through S: D S D = 2 D for restricted
        D = np.asarray(calc.D)
        S = np.asarray(sys_.S)
        assert np.allclose(D @ S @ D, 2 * D, atol=1e-6)

    def test_lda_h2o_matches_fixed_point(self):
        sys_ = DFTSystem(*H2O)
        e_fp = float(KohnShamSCF(xc='lda', iterations=80)
                     .run(sys_).energy())
        calc = scf_direct_minimize(sys_, xc='lda', maxiter=400)
        assert abs(float(calc.energy()) - e_fp) < 1e-6

    def test_implicit_gradient_is_hellmann_feynman(self):
        # E(F) = E0 + F*tr(D mu_z) + O(F^2): the implicit-diff gradient
        # of the MINIMIZED energy w.r.t. a field must equal tr(D mu_z)
        # (Hellmann-Feynman), NOT require differentiating the minimizer
        # internals.
        from deepchem_tpu.dft.posthf import dipole_integrals
        sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 0.74]])
        mu = jnp.asarray(dipole_integrals(sys_.basis))[2]

        def e_of_field(F):
            calc = scf_direct_minimize(
                sys_, xc='hf',
                perturbation=lambda D: F * jnp.einsum('ij,ij->', D, mu))
            return calc._e_elec

        g = float(jax.grad(e_of_field)(jnp.asarray(0.01)))
        calc0 = scf_direct_minimize(
            sys_, xc='hf',
            perturbation=lambda D: 0.01 * jnp.einsum('ij,ij->', D, mu))
        hf_val = float(jnp.einsum('ij,ij->', calc0.D, mu))
        assert abs(g - hf_val) < 1e-6

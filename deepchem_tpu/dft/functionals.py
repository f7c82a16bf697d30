"""Exchange-correlation functionals in jax.numpy.

The reference delegates XC evaluation to libxc through the vendored DQC
port (deepchem/utils/dft_utils + models/dft/nnxc.py); here the classic
functionals are implemented directly so neural-XC models run without libxc:
LDA exchange (Dirac), VWN5 correlation, PBE exchange/correlation.
All take the electron density ``rho`` (and reduced gradient where needed)
and return energy density per unit volume.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def lda_exchange(rho):
    """Dirac/Slater exchange: e_x = -3/4 (3/pi)^{1/3} rho^{4/3}."""
    c = -(3.0 / 4.0) * (3.0 / jnp.pi) ** (1.0 / 3.0)
    return c * jnp.power(jnp.maximum(rho, _EPS), 4.0 / 3.0)


def lda_correlation_vwn(rho):
    """VWN5 parameterization of LDA correlation (paramagnetic)."""
    rho = jnp.maximum(rho, _EPS)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    x = jnp.sqrt(rs)
    A, x0, b, c = 0.0310907, -0.10498, 3.72744, 12.9352

    def X(t):
        return t * t + b * t + c
    Q = jnp.sqrt(4 * c - b * b)
    ec = A * (
        jnp.log(x * x / X(x))
        + 2 * b / Q * jnp.arctan(Q / (2 * x + b))
        - b * x0 / X(x0) * (
            jnp.log((x - x0) ** 2 / X(x))
            + 2 * (b + 2 * x0) / Q * jnp.arctan(Q / (2 * x + b))))
    return ec * rho


def lda_xc(rho):
    """Total LDA exchange-correlation energy density."""
    return lda_exchange(rho) + lda_correlation_vwn(rho)


def pbe_exchange(rho, sigma):
    """PBE exchange; sigma = |grad rho|^2."""
    rho = jnp.maximum(rho, _EPS)
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    s2 = sigma / jnp.maximum(4.0 * kf ** 2 * rho ** 2, _EPS)
    kappa, mu = 0.804, 0.2195149727645171
    fx = 1.0 + kappa - kappa / (1.0 + mu * s2 / kappa)
    return lda_exchange(rho) * fx


def pbe_correlation(rho, sigma):
    """PBE correlation (spin-unpolarized)."""
    rho = jnp.maximum(rho, _EPS)
    ec_lda = lda_correlation_vwn(rho) / rho
    beta, gamma = 0.06672455060314922, 0.031090690869654895
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t2 = sigma / jnp.maximum((2.0 * ks * rho) ** 2, _EPS)
    expec = jnp.exp(-ec_lda / gamma)
    A = beta / gamma / jnp.maximum(expec - 1.0, _EPS)
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = gamma * jnp.log(1.0 + beta / gamma * t2 * num / den)
    return (ec_lda + H) * rho


def pbe_xc(rho, sigma):
    return pbe_exchange(rho, sigma) + pbe_correlation(rho, sigma)

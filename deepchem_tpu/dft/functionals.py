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


# -- spin-polarized (unrestricted) functionals ------------------------------
# (reference reaches these through libxc's spin interface; here the
# standard closed forms: exact spin-scaling for exchange, VWN P/F zeta
# interpolation for LDA correlation, phi(zeta)-scaled PBE correlation)

def _vwn_ec(rho, A, x0, b, c):
    """Per-volume VWN correlation energy for one parameter set."""
    rho = jnp.maximum(rho, _EPS)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    x = jnp.sqrt(rs)

    def X(t):
        return t * t + b * t + c
    Q = jnp.sqrt(4 * c - b * b)
    ec = A * (
        jnp.log(x * x / X(x))
        + 2 * b / Q * jnp.arctan(Q / (2 * x + b))
        - b * x0 / X(x0) * (
            jnp.log((x - x0) ** 2 / X(x))
            + 2 * (b + 2 * x0) / Q * jnp.arctan(Q / (2 * x + b))))
    return ec                       # per particle


def _f_zeta(zeta):
    """von Barth-Hedin spin interpolation function."""
    return (jnp.power(1.0 + zeta, 4.0 / 3.0)
            + jnp.power(1.0 - zeta, 4.0 / 3.0) - 2.0) \
        / (2.0 * (2.0 ** (1.0 / 3.0) - 1.0))


def lsda_exchange(rho_a, rho_b):
    """Spin-scaled Dirac exchange: Ex[ra,rb] = (Ex[2ra]+Ex[2rb])/2."""
    return 0.5 * (lda_exchange(2.0 * rho_a) + lda_exchange(2.0 * rho_b))


def lsda_correlation_vwn(rho_a, rho_b):
    """VWN correlation with P/F zeta interpolation."""
    rho = jnp.maximum(rho_a + rho_b, _EPS)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1.0 + 1e-10, 1.0 - 1e-10)
    ec_p = _vwn_ec(rho, 0.0310907, -0.10498, 3.72744, 12.9352)
    ec_f = _vwn_ec(rho, 0.01554535, -0.32500, 7.06042, 18.0578)
    ec = ec_p + (ec_f - ec_p) * _f_zeta(zeta)
    return ec * rho


def lsda_xc(rho_a, rho_b):
    """Spin-polarized LDA (LSDA/SVWN) exchange-correlation density."""
    return lsda_exchange(rho_a, rho_b) \
        + lsda_correlation_vwn(rho_a, rho_b)


def _ec_lsda_per_particle(rho, zeta):
    ec_p = _vwn_ec(rho, 0.0310907, -0.10498, 3.72744, 12.9352)
    ec_f = _vwn_ec(rho, 0.01554535, -0.32500, 7.06042, 18.0578)
    return ec_p + (ec_f - ec_p) * _f_zeta(zeta)


def pbe_correlation_spin(rho_a, rho_b, sigma_tot):
    """Spin-polarized PBE correlation (phi(zeta)-scaled gradient term)."""
    rho = jnp.maximum(rho_a + rho_b, _EPS)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1.0 + 1e-10, 1.0 - 1e-10)
    phi = 0.5 * (jnp.power(1.0 + zeta, 2.0 / 3.0)
                 + jnp.power(1.0 - zeta, 2.0 / 3.0))
    ec_lda = _ec_lsda_per_particle(rho, zeta)
    beta, gamma = 0.06672455060314922, 0.031090690869654895
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t2 = sigma_tot / jnp.maximum((2.0 * phi * ks * rho) ** 2, _EPS)
    g3 = gamma * phi ** 3
    expec = jnp.exp(-ec_lda / g3)
    A = beta / gamma / jnp.maximum(expec - 1.0, _EPS)
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = g3 * jnp.log(1.0 + beta / gamma * t2 * num / den)
    return (ec_lda + H) * rho


def pbe_xc_spin(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb):
    """Spin-polarized PBE: exact spin-scaled exchange + phi-scaled
    correlation on the total-density gradient."""
    ex = 0.5 * (pbe_exchange(2.0 * rho_a, 4.0 * sigma_aa)
                + pbe_exchange(2.0 * rho_b, 4.0 * sigma_bb))
    sigma_tot = sigma_aa + 2.0 * sigma_ab + sigma_bb
    return ex + pbe_correlation_spin(rho_a, rho_b, sigma_tot)


# -- B88 exchange / LYP correlation / hybrid presets ------------------------

def b88_exchange(rho, sigma):
    """Becke 1988 gradient-corrected exchange (closed-shell form; the
    spin version spin-scales exactly like LDA exchange)."""
    rho = jnp.maximum(rho, _EPS)
    # spin-scale: evaluate per spin channel with rho/2, sigma/4
    rs = rho / 2.0
    ss = jnp.maximum(sigma, _EPS) / 4.0
    r43 = jnp.power(rs, 4.0 / 3.0)
    x = jnp.sqrt(ss) / jnp.maximum(r43, _EPS)
    b = 0.0042
    corr = -b * r43 * x * x / (1.0 + 6.0 * b * x * jnp.arcsinh(x))
    return lda_exchange(rho) + 2.0 * corr


def b88_exchange_spin(rho_a, rho_b, sigma_aa, sigma_bb):
    def one(r, s):
        r = jnp.maximum(r, _EPS)
        r43 = jnp.power(r, 4.0 / 3.0)
        x = jnp.sqrt(jnp.maximum(s, _EPS)) / jnp.maximum(r43, _EPS)
        b = 0.0042
        cx = -(3.0 / 2.0) * (3.0 / (4.0 * jnp.pi)) ** (1.0 / 3.0)
        lda = cx * r43
        return lda - b * r43 * x * x / (
            1.0 + 6.0 * b * x * jnp.arcsinh(x))
    return one(rho_a, sigma_aa) + one(rho_b, sigma_bb)


def lyp_correlation_spin(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb):
    """Lee-Yang-Parr correlation, Miehlich et al. density form."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    cf = 0.3 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0)
    rho = jnp.maximum(rho_a + rho_b, _EPS)
    rho_a = jnp.maximum(rho_a, _EPS)
    rho_b = jnp.maximum(rho_b, _EPS)
    rm13 = jnp.power(rho, -1.0 / 3.0)
    denom = 1.0 + d * rm13
    omega = jnp.exp(-c * rm13) / denom * jnp.power(rho, -11.0 / 3.0)
    delta = c * rm13 + d * rm13 / denom
    sig = sigma_aa + 2.0 * sigma_ab + sigma_bb
    term1 = -4.0 * a / denom * rho_a * rho_b / rho
    t = (jnp.power(2.0, 11.0 / 3.0) * cf
         * (jnp.power(rho_a, 8.0 / 3.0) + jnp.power(rho_b, 8.0 / 3.0))
         + (47.0 / 18.0 - 7.0 * delta / 18.0) * sig
         - (5.0 / 2.0 - delta / 18.0) * (sigma_aa + sigma_bb)
         - (delta - 11.0) / 9.0
         * (rho_a * sigma_aa + rho_b * sigma_bb) / rho)
    t2 = (-2.0 / 3.0 * rho * rho * sig
          + (2.0 / 3.0 * rho * rho - rho_a * rho_a) * sigma_bb
          + (2.0 / 3.0 * rho * rho - rho_b * rho_b) * sigma_aa)
    return term1 - a * b * omega * (rho_a * rho_b * t + t2)


def lyp_correlation(rho, sigma):
    """Closed-shell LYP: rho_a = rho_b = rho/2, equal gradients."""
    return lyp_correlation_spin(rho / 2.0, rho / 2.0, sigma / 4.0,
                                sigma / 4.0, sigma / 4.0)


def b3lyp_xc(rho, sigma):
    """B3LYP semilocal part (closed shell): 0.80 LSDA_x + 0.72 dB88_x +
    0.19 VWN_c + 0.81 LYP_c.  The 0.20 exact-exchange fraction is applied
    through the Fock matrix (hf_exchange=0.2)."""
    lda_x = lda_exchange(rho)
    db88 = b88_exchange(rho, sigma) - lda_x
    return 0.80 * lda_x + 0.72 * db88 \
        + 0.19 * lda_correlation_vwn(rho) + 0.81 * lyp_correlation(rho,
                                                                   sigma)


def b3lyp_xc_spin(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb):
    lda_x = lsda_exchange(rho_a, rho_b)
    db88 = b88_exchange_spin(rho_a, rho_b, sigma_aa, sigma_bb) - lda_x
    return 0.80 * lda_x + 0.72 * db88 \
        + 0.19 * lsda_correlation_vwn(rho_a, rho_b) \
        + 0.81 * lyp_correlation_spin(rho_a, rho_b, sigma_aa, sigma_ab,
                                      sigma_bb)


def pbe0_xc(rho, sigma):
    """PBE0 semilocal part: 0.75 PBE_x + PBE_c (0.25 exact exchange goes
    through hf_exchange)."""
    return 0.75 * pbe_exchange(rho, sigma) + pbe_correlation(rho, sigma)


def pbe0_xc_spin(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb):
    ex = 0.5 * (pbe_exchange(2.0 * rho_a, 4.0 * sigma_aa)
                + pbe_exchange(2.0 * rho_b, 4.0 * sigma_bb))
    sigma_tot = sigma_aa + 2.0 * sigma_ab + sigma_bb
    return 0.75 * ex + pbe_correlation_spin(rho_a, rho_b, sigma_tot)


def lsda_xc_spin(rho_a, rho_b):
    return lsda_xc(rho_a, rho_b)

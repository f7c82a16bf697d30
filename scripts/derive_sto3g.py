"""Derive the STO-3G basis data for Ne and the second row (Na-Ar) from
first principles, since basis tables are download-only in this
environment (the reference fetches them through basis_set_exchange,
deepchem/utils/dft_utils/api/loadbasis.py — the package is absent here).

Two steps, both reproducible from this script alone:

1. UNIVERSAL EXPANSIONS: least-squares fit of three Gaussians to the
   zeta=1 Slater orbitals (1s; 2s+2p with shared exponents; 3s+3p with
   shared exponents) by maximizing the summed squared overlaps.  The 1s
   and 2sp fits reproduce the published universal STO-3G values
   (Hehre, Stewart & Pople, JCP 51, 2657 (1969)) to SEVEN decimals,
   which validates the procedure and therefore the 3sp set derived the
   identical way.

2. ELEMENT ZETAS: variationally optimized per free atom — Nelder-Mead
   over (zeta_1s, zeta_2sp[, zeta_3sp]) minimizing the in-repo atomic
   UHF energy at the element's ground-state spin.  (Pople's published
   exponents are "standard molecular" scale factors averaged over small
   molecules; best-atom exponents differ by a few percent in the
   valence shell — slightly more diffuse — and are the principled
   choice derivable without bundled data.  Molecular validation:
   tests/test_dft_scf.py TestSecondRow optimizes HCl/H2S geometries
   against experiment.)

Run: python scripts/derive_sto3g.py [element ...]   (~2 min/element)
The printed table is pasted into deepchem_tpu/dft/basis.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
from math import factorial, sqrt

# ---------------------------------------------------------------------
# step 1: universal zeta=1 expansions
# ---------------------------------------------------------------------


def _sto_radial(n):
    N = 2.0 ** (n + 0.5) / sqrt(factorial(2 * n))
    return lambda r: N * r ** (n - 1) * np.exp(-r)


def _gauss_radial(l, a):
    from scipy.integrate import quad
    f = lambda r: r ** l * np.exp(-a * r * r)
    nrm2 = quad(lambda r: f(r) ** 2 * r * r, 0, np.inf)[0]
    return lambda r, f=f, N=1.0 / sqrt(nrm2): N * f(r)


def _overlap(f, g):
    from scipy.integrate import quad
    return quad(lambda r: f(r) * g(r) * r * r, 0, np.inf, limit=200)[0]


def _best_overlap(n, l, alphas):
    sto = _sto_radial(n)
    gs = [_gauss_radial(l, a) for a in alphas]
    s = np.array([_overlap(g, sto) for g in gs])
    S = np.array([[_overlap(gi, gj) for gj in gs] for gi in gs])
    c = np.linalg.solve(S, s)
    return float(s @ c), c / sqrt(c @ S @ c)


def fit_universal(shells, x0):
    """Maximize sum of squared overlaps over shared log-exponents."""
    from scipy.optimize import minimize

    def neg(logd):
        try:
            return -sum(_best_overlap(n, l, np.exp(logd))[0]
                        for n, l in shells)
        except np.linalg.LinAlgError:
            return 1e3

    res = minimize(neg, np.log(x0), method='Nelder-Mead',
                   options={'xatol': 1e-12, 'fatol': 1e-14,
                            'maxiter': 4000})
    a = np.exp(res.x)
    order = np.argsort(a)[::-1]
    a = a[order]
    return a, {(n, l): _best_overlap(n, l, a)[1] for n, l in shells}


# ---------------------------------------------------------------------
# step 2: variational atomic zetas
# ---------------------------------------------------------------------

#: Slater-rule starting guesses
def _slater_guess(Z):
    z1 = Z - 0.3
    n2 = min(max(Z - 2, 0), 8)
    z2 = (Z - 2 * 0.85 - 0.35 * max(n2 - 1, 0)) / 2.0 if n2 else None
    n3 = max(Z - 10, 0)
    z3 = (Z - 2 * 1.0 - 8 * 0.85 - 0.35 * max(n3 - 1, 0)) / 3.0 \
        if n3 else None
    return [z for z in (z1, z2, z3) if z is not None]


def atom_energy(symbol, zetas, iterations=200):
    from deepchem_tpu.dft.basis import (STO3G, _A_1S, _A_2SP, _A_3SP,
                                        _C_1S, _C_2S, _C_2P, _C_3S,
                                        _C_3P, _scaled, ATOMIC_NUMBER)
    from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
    shells = [('S', _scaled(_A_1S, zetas[0]), _C_1S)]
    if len(zetas) > 1:
        shells.append(('SP', _scaled(_A_2SP, zetas[1]), _C_2S, _C_2P))
    if len(zetas) > 2:
        shells.append(('SP', _scaled(_A_3SP, zetas[2]), _C_3S, _C_3P))
    saved = STO3G.get(symbol)
    STO3G[symbol] = shells
    try:
        sys_ = DFTSystem([symbol], np.zeros((1, 3)), units='bohr',
                         basis='sto-3g', n_radial=40, grid_level=1)
        return run_unrestricted(sys_, 'hf', iterations=iterations)
    finally:
        if saved is None:
            del STO3G[symbol]
        else:
            STO3G[symbol] = saved


def optimize_zetas(symbol):
    from scipy.optimize import minimize
    from deepchem_tpu.dft.basis import ATOMIC_NUMBER
    Z = ATOMIC_NUMBER[symbol]
    x0 = np.array(_slater_guess(Z))

    state = {'n': 0}

    def obj(logz):
        # each zeta set retraces the SCF jit through fresh ERI/grid
        # constants; on a small box the XLA cache OOMs after a few
        # hundred evals — clear periodically (cheap at this basis size)
        state['n'] += 1
        if state['n'] % 25 == 0:
            jax.clear_caches()
        return atom_energy(symbol, np.exp(logz))

    res = minimize(obj, np.log(x0), method='Nelder-Mead',
                   options={'xatol': 1e-5, 'fatol': 1e-8,
                            'maxiter': 250})
    return np.exp(res.x), res.fun


if __name__ == '__main__':
    if '--universal' in sys.argv:
        a1, c1 = fit_universal([(1, 0)], [2.2, 0.4, 0.11])
        print('1s  alphas', a1, 'coefs', c1[(1, 0)])
        a2, c2 = fit_universal([(2, 0), (2, 1)], [1.0, 0.23, 0.075])
        print('2sp alphas', a2, '2s', c2[(2, 0)], '2p', c2[(2, 1)])
        a3, c3 = fit_universal([(3, 0), (3, 1)], [0.5, 0.16, 0.06])
        print('3sp alphas', a3, '3s', c3[(3, 0)], '3p', c3[(3, 1)])
        sys.exit(0)
    elements = [a for a in sys.argv[1:] if not a.startswith('-')] or \
        ['Ne', 'Na', 'Mg', 'Al', 'Si', 'P', 'S', 'Cl', 'Ar']
    for sym in elements:
        z, e = optimize_zetas(sym)
        print('%-2s  zetas %s   E_UHF = %.6f' %
              (sym, np.round(z, 4), e), flush=True)

"""Gaussian basis sets (STO-3G) for the in-repo Kohn-Sham SCF driver.

The reference delegates basis handling to the vendored DQC stack
(deepchem/utils/dft_utils/hamilton + api/loadbasis.py); here a compact
STO-3G table covers the light elements the tests exercise.  Exponents and
contraction coefficients are the standard published STO-3G values
(Hehre, Stewart & Pople 1969) — public data, identical in every quantum
chemistry package.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np

# shared STO-3G contraction coefficients (identical across elements)
_C_1S = (0.15432897, 0.53532814, 0.44463454)
_C_2S = (-0.09996723, 0.39951283, 0.70011547)
_C_2P = (0.15591627, 0.60768372, 0.39195739)

#: universal STO-3G expansions at zeta=1, derived in-repo
#: (scripts/derive_sto3g.py): least-squares fits of three shared-exponent
#: Gaussians to Slater orbitals.  The 1s and 2sp fits reproduce the
#: published universal values (Hehre-Stewart-Pople 1969) to 7 decimals,
#: which pins the 3sp fit derived by the identical procedure.
_A_1S = (2.22766027, 0.40577115, 0.10981751)
_A_2SP = (0.99419291, 0.23103104, 0.07513867)
_A_3SP = (0.48285420, 0.13471512, 0.05272658)
_C_3S = (-0.21962030, 0.22559499, 0.90039878)
_C_3P = (0.01058753, 0.59516677, 0.46200132)


def _scaled(alphas, zeta: float):
    return tuple(a * zeta * zeta for a in alphas)


#: element -> list of shells: ('S', exps, coeffs) or ('SP', exps, s_c, p_c)
STO3G = {
    'H': [('S', (3.42525091, 0.62391373, 0.16885540), _C_1S)],
    'He': [('S', (6.36242139, 1.15892300, 0.31364979), _C_1S)],
    'Li': [('S', (16.1195750, 2.9362007, 0.7946505), _C_1S),
           ('SP', (0.6362897, 0.1478601, 0.0480887), _C_2S, _C_2P)],
    'Be': [('S', (30.1678710, 5.4951153, 1.4871927), _C_1S),
           ('SP', (1.3148331, 0.3055389, 0.0993707), _C_2S, _C_2P)],
    'B': [('S', (48.7911130, 8.8873622, 2.4052670), _C_1S),
          ('SP', (2.2369561, 0.5198205, 0.1690618), _C_2S, _C_2P)],
    'C': [('S', (71.6168370, 13.0450960, 3.5305122), _C_1S),
          ('SP', (2.9412494, 0.6834831, 0.2222899), _C_2S, _C_2P)],
    'N': [('S', (99.1061690, 18.0523120, 4.8856602), _C_1S),
          ('SP', (3.7804559, 0.8784966, 0.2857144), _C_2S, _C_2P)],
    'O': [('S', (130.7093200, 23.8088610, 6.4436083), _C_1S),
          ('SP', (5.0331513, 1.1695961, 0.3803890), _C_2S, _C_2P)],
    'F': [('S', (166.6791300, 30.3608120, 8.2168207), _C_1S),
          ('SP', (4.4355983, 1.0613540, 0.3312531), _C_2S, _C_2P)],
}

#: Ne + second-row zetas, variationally optimized per FREE ATOM with the
#: in-repo UHF at the ground-state spin (scripts/derive_sto3g.py —
#: Nelder-Mead over shell scale factors; each atomic energy sits the
#: expected 1.9-5.6 Ha above its numerical HF limit, and Ne's (9.689,
#: 2.885) lands within 0.5% of the published standard (9.64, 2.88)).
#: Pople's published second-row factors are molecular averages the
#: environment cannot bundle (basis_set_exchange is download-only);
#: best-atom factors are the principled offline-derivable substitute.
_ROW2_ZETAS = {
    'Ne': (9.6891, 2.8854),
    'Na': (10.6783, 3.5183, 1.3516),
    'Mg': (11.6717, 3.9189, 1.2786),
    'Al': (12.6627, 4.3773, 1.3578),
    'Si': (13.6521, 4.8534, 1.5308),
    'P': (14.6406, 5.3322, 1.7290),
    'S': (15.6282, 5.8122, 1.9262),
    'Cl': (16.6151, 6.2925, 2.1311),
    'Ar': (17.6013, 6.7731, 2.3402),
}

for _sym, _z in _ROW2_ZETAS.items():
    _shells = [('S', _scaled(_A_1S, _z[0]), _C_1S),
               ('SP', _scaled(_A_2SP, _z[1]), _C_2S, _C_2P)]
    if len(_z) > 2:
        _shells.append(('SP', _scaled(_A_3SP, _z[2]), _C_3S, _C_3P))
    STO3G[_sym] = _shells
del _sym, _z, _shells

#: 6-31G split-valence basis (Hehre, Ditchfield & Pople 1972; standard
#: published exponents/coefficients, identical in every QC package).
#: Elements with verified tables; others raise with a clear error.
SIX31G = {
    'H': [('S', (18.73113696, 2.825394365, 0.6401216923),
           (0.03349460434, 0.2347269535, 0.8137573261)),
          ('S', (0.1612777588,), (1.0,))],
    'He': [('S', (38.42163400, 5.77803000, 1.24177400),
            (0.02376600, 0.15467900, 0.46963000)),
           ('S', (0.29796400,), (1.0,))],
    'C': [('S', (3047.524880, 457.3695180, 103.9486850, 29.21015530,
                 9.286662960, 3.163926960),
           (0.001834737132, 0.01403732281, 0.06884262226, 0.2321844432,
            0.4679413484, 0.3623119853)),
          ('SP', (7.868272350, 1.881288540, 0.5442492580),
           (-0.1193324198, -0.1608541517, 1.143456438),
           (0.06899906659, 0.3164239610, 0.7443082909)),
          ('SP', (0.1687144782,), (1.0,), (1.0,))],
    'N': [('S', (4173.511460, 627.4579110, 142.9020930, 40.23432930,
                 12.82021290, 4.390437010),
           (0.001834772160, 0.01399462700, 0.06858655181, 0.2322408730,
            0.4690699481, 0.3604551991)),
          ('SP', (11.62636186, 2.716279807, 0.7722183966),
           (-0.1149611817, -0.1691174786, 1.145851947),
           (0.06757974388, 0.3239072959, 0.7408951398)),
          ('SP', (0.2120314975,), (1.0,), (1.0,))],
    'O': [('S', (5484.671660, 825.2349460, 188.0469580, 52.96450000,
                 16.89757040, 5.799635340),
           (0.001831074430, 0.01395017220, 0.06844507810, 0.2327143360,
            0.4701928980, 0.3585208530)),
          ('SP', (15.53961625, 3.599933586, 1.013761750),
           (-0.1107775495, -0.1480262627, 1.130767015),
           (0.07087426823, 0.3397528391, 0.7271585773)),
          ('SP', (0.2700058226,), (1.0,), (1.0,))],
    'F': [('S', (7001.713090, 1051.366090, 239.2856900, 67.39744530,
                 21.51995730, 7.403101300),
           (0.001819616901, 0.01391607961, 0.06840532453, 0.2331857601,
            0.4712674392, 0.3566185462)),
          ('SP', (20.84795280, 4.808308340, 1.344069860),
           (-0.1085069751, -0.1464516581, 1.128688581),
           (0.07162872424, 0.3459121027, 0.7224699570)),
          ('SP', (0.3581513930,), (1.0,), (1.0,))],
}

def _with_polarization(base: dict, d_exp: float = 0.8,
                       h_p_exp: float = None) -> dict:
    """Pople polarization: one uncontracted d shell (exponent 0.8,
    Hariharan & Pople 1973) on heavy atoms; 6-31G** adds a p shell
    (exponent 1.1) on hydrogen."""
    out = {}
    for sym, shells in base.items():
        shells = list(shells)
        if sym == 'H':
            if h_p_exp is not None:
                shells = shells + [('P', [h_p_exp], [1.0])]
        elif sym != 'He':
            shells = shells + [('D', [d_exp], [1.0])]
        out[sym] = shells
    return out


SIX31GS = _with_polarization(SIX31G)
SIX31GSS = _with_polarization(SIX31G, h_p_exp=1.1)

BASIS_SETS = {'sto-3g': STO3G, '6-31g': SIX31G,
              '6-31g*': SIX31GS, '6-31g(d)': SIX31GS,
              '6-31g**': SIX31GSS, '6-31g(d,p)': SIX31GSS}

ATOMIC_NUMBER = {'H': 1, 'He': 2, 'Li': 3, 'Be': 4, 'B': 5, 'C': 6,
                 'N': 7, 'O': 8, 'F': 9, 'Ne': 10, 'Na': 11, 'Mg': 12,
                 'Al': 13, 'Si': 14, 'P': 15, 'S': 16, 'Cl': 17,
                 'Ar': 18}


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def primitive_norm(alpha: float, lmn: Tuple[int, int, int]) -> float:
    """Normalization constant of a cartesian primitive Gaussian."""
    l, m, n = lmn
    L = l + m + n
    pref = (2.0 * alpha / math.pi) ** 0.75 * (4.0 * alpha) ** (L / 2.0)
    den = math.sqrt(_double_factorial(2 * l - 1)
                    * _double_factorial(2 * m - 1)
                    * _double_factorial(2 * n - 1))
    return pref / den


@dataclass
class BasisFunction:
    """One contracted cartesian Gaussian: sum_k c_k N_k x^l y^m z^n
    exp(-a_k r^2) centered at ``center`` (bohr)."""
    center: np.ndarray
    lmn: Tuple[int, int, int]
    exps: np.ndarray
    coefs: np.ndarray            # includes primitive norms
    atom_index: int = 0

    def normalize(self) -> None:
        """Scale coefficients so the contracted self-overlap is 1."""
        l, m, n = self.lmn
        L = l + m + n
        df = (_double_factorial(2 * l - 1) * _double_factorial(2 * m - 1)
              * _double_factorial(2 * n - 1))
        s = 0.0
        for a, ca in zip(self.exps, self.coefs):
            for b, cb in zip(self.exps, self.coefs):
                s += ca * cb * df * (math.pi / (a + b)) ** 1.5 \
                    / (2.0 * (a + b)) ** L
        self.coefs = self.coefs / math.sqrt(s)


def build_basis(symbols: Sequence[str], coords: np.ndarray,
                basis: str = 'sto-3g') -> List[BasisFunction]:
    """Expand basis-set shells into cartesian basis functions.

    coords are in bohr, shape [n_atoms, 3]; basis is 'sto-3g' or '6-31g'
    (reference delegates to DQC loadbasis, utils/dft_utils/api/
    loadbasis.py).
    """
    table = BASIS_SETS.get(basis.lower())
    if table is None:
        raise ValueError(
            f'unknown basis {basis!r} (available: {sorted(BASIS_SETS)})')
    coords = np.asarray(coords, dtype=np.float64)
    basis = []
    for ia, sym in enumerate(symbols):
        if sym not in table:
            raise ValueError(f'no {basis!r} data for element '
                             f'{sym!r} (available: {sorted(table)})')
        for shell in table[sym]:
            kind, exps = shell[0], np.asarray(shell[1])
            if kind == 'S':
                cs = np.asarray(shell[2])
                c = cs * np.array([primitive_norm(a, (0, 0, 0))
                                   for a in exps])
                bf = BasisFunction(coords[ia], (0, 0, 0), exps, c, ia)
                bf.normalize()
                basis.append(bf)
            elif kind == 'SP':
                cs, cp = np.asarray(shell[2]), np.asarray(shell[3])
                c = cs * np.array([primitive_norm(a, (0, 0, 0))
                                   for a in exps])
                bf = BasisFunction(coords[ia], (0, 0, 0), exps, c, ia)
                bf.normalize()
                basis.append(bf)
                for lmn in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                    cpn = cp * np.array([primitive_norm(a, lmn)
                                         for a in exps])
                    bf = BasisFunction(coords[ia], lmn, exps, cpn, ia)
                    bf.normalize()
                    basis.append(bf)
            elif kind == 'P':
                cp = np.asarray(shell[2])
                for lmn in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                    cpn = cp * np.array([primitive_norm(a, lmn)
                                         for a in exps])
                    bf = BasisFunction(coords[ia], lmn, exps, cpn, ia)
                    bf.normalize()
                    basis.append(bf)
            elif kind == 'D':
                cd = np.asarray(shell[2])
                for lmn in ((2, 0, 0), (0, 2, 0), (0, 0, 2),
                            (1, 1, 0), (1, 0, 1), (0, 1, 1)):
                    cdn = cd * np.array([primitive_norm(a, lmn)
                                        for a in exps])
                    bf = BasisFunction(coords[ia], lmn, exps, cdn, ia)
                    bf.normalize()
                    basis.append(bf)
            else:
                raise ValueError(kind)
    return basis


def nuclear_repulsion(charges: Sequence[int], coords: np.ndarray) -> float:
    coords = np.asarray(coords, dtype=np.float64)
    e = 0.0
    for i in range(len(charges)):
        for j in range(i + 1, len(charges)):
            e += charges[i] * charges[j] / np.linalg.norm(
                coords[i] - coords[j])
    return float(e)

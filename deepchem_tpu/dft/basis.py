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

ATOMIC_NUMBER = {'H': 1, 'He': 2, 'Li': 3, 'Be': 4, 'B': 5, 'C': 6,
                 'N': 7, 'O': 8, 'F': 9}


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


def build_basis(symbols: Sequence[str],
                coords: np.ndarray) -> List[BasisFunction]:
    """Expand STO-3G shells into cartesian basis functions.

    coords are in bohr, shape [n_atoms, 3].
    """
    coords = np.asarray(coords, dtype=np.float64)
    basis: List[BasisFunction] = []
    for ia, sym in enumerate(symbols):
        if sym not in STO3G:
            raise ValueError(f'no STO-3G data for element {sym!r} '
                             f'(available: {sorted(STO3G)})')
        for shell in STO3G[sym]:
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

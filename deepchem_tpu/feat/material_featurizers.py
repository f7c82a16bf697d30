"""Materials-science featurizers.

Redesigns of reference deepchem/feat/material_featurizers/:
ElementPropertyFingerprint, SineCoulombMatrix, ElemNetFeaturizer.
The reference delegates to pymatgen/matminer; here composition parsing and
element statistics are self-contained (pymatgen used opportunistically if
importable).  CGCNN/LCNN featurizers require full crystal-structure inputs
and are provided for dict/JSON structures.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np

from deepchem_tpu.chem.mol import PERIODIC_TABLE, ATOMIC_MASS
from deepchem_tpu.feat.base import Featurizer

# compact element property table: Z -> (electronegativity, atomic radius pm,
# row, group, melting K approx). Coverage: common elements; unknown -> NaN.
_ELEM_PROPS: Dict[int, tuple] = {
    1: (2.20, 53, 1, 1, 14), 3: (0.98, 167, 2, 1, 454),
    4: (1.57, 112, 2, 2, 1560), 5: (2.04, 87, 2, 13, 2349),
    6: (2.55, 67, 2, 14, 3800), 7: (3.04, 56, 2, 15, 63),
    8: (3.44, 48, 2, 16, 54), 9: (3.98, 42, 2, 17, 53),
    11: (0.93, 190, 3, 1, 371), 12: (1.31, 145, 3, 2, 923),
    13: (1.61, 118, 3, 13, 933), 14: (1.90, 111, 3, 14, 1687),
    15: (2.19, 98, 3, 15, 317), 16: (2.58, 88, 3, 16, 388),
    17: (3.16, 79, 3, 17, 172), 19: (0.82, 243, 4, 1, 337),
    20: (1.00, 194, 4, 2, 1115), 22: (1.54, 176, 4, 4, 1941),
    23: (1.63, 171, 4, 5, 2183), 24: (1.66, 166, 4, 6, 2180),
    25: (1.55, 161, 4, 7, 1519), 26: (1.83, 156, 4, 8, 1811),
    27: (1.88, 152, 4, 9, 1768), 28: (1.91, 149, 4, 10, 1728),
    29: (1.90, 145, 4, 11, 1358), 30: (1.65, 142, 4, 12, 693),
    31: (1.81, 136, 4, 13, 303), 32: (2.01, 125, 4, 14, 1211),
    33: (2.18, 114, 4, 15, 1090), 34: (2.55, 103, 4, 16, 494),
    35: (2.96, 94, 4, 17, 266), 38: (0.95, 219, 5, 2, 1050),
    40: (1.33, 206, 5, 4, 2128), 42: (2.16, 190, 5, 6, 2896),
    47: (1.93, 165, 5, 11, 1235), 48: (1.69, 161, 5, 12, 594),
    49: (1.78, 156, 5, 13, 430), 50: (1.96, 145, 5, 14, 505),
    51: (2.05, 133, 5, 15, 904), 52: (2.10, 123, 5, 16, 723),
    53: (2.66, 115, 5, 17, 387), 56: (0.89, 253, 6, 2, 1000),
    74: (2.36, 193, 6, 6, 3695), 78: (2.28, 177, 6, 10, 2041),
    79: (2.54, 174, 6, 11, 1337), 80: (2.00, 171, 6, 12, 234),
    82: (2.33, 154, 6, 14, 601), 83: (2.02, 143, 6, 15, 544),
}

_COMP_RE = re.compile(r'([A-Z][a-z]?)(\d*\.?\d*)')


def parse_composition(formula: str) -> Dict[int, float]:
    """'Fe2O3' -> {26: 2, 8: 3} (minimal pymatgen.Composition stand-in)."""
    comp: Dict[int, float] = {}
    for sym, count in _COMP_RE.findall(formula.replace(' ', '')):
        if sym not in PERIODIC_TABLE:
            continue
        z = PERIODIC_TABLE[sym]
        comp[z] = comp.get(z, 0.0) + (float(count) if count else 1.0)
    return comp


class ElementPropertyFingerprint(Featurizer):
    """Statistics of elemental properties over a composition (reference
    material_featurizers/element_property_fingerprint.py)."""

    def __init__(self, data_source: str = 'magpie'):
        self.data_source = data_source

    def _featurize(self, datapoint: str, **kwargs) -> np.ndarray:
        comp = parse_composition(str(datapoint))
        if not comp:
            raise ValueError(f'cannot parse composition {datapoint}')
        total = sum(comp.values())
        fracs = {z: c / total for z, c in comp.items()}
        # property matrix: per element (mass, eneg, radius, row, group, mp)
        rows = []
        weights = []
        for z, f in fracs.items():
            props = _ELEM_PROPS.get(z, (np.nan,) * 5)
            rows.append([ATOMIC_MASS.get(z, 2.0 * z), *props])
            weights.append(f)
        P = np.asarray(rows, dtype=float)
        wt = np.asarray(weights)[:, None]
        stats = []
        for col in range(P.shape[1]):
            v = P[:, col]
            ok = np.isfinite(v)
            if not ok.any():
                stats += [0.0] * 5
                continue
            v, w_ok = v[ok], np.asarray(weights)[ok]
            w_ok = w_ok / w_ok.sum()
            mean = float(np.sum(v * w_ok))
            stats += [v.min(), v.max(), v.max() - v.min(), mean,
                      float(np.sqrt(np.sum(w_ok * (v - mean) ** 2)))]
        return np.asarray(stats, dtype=np.float64)


class ElemNetFeaturizer(Featurizer):
    """86-dim fractional composition vector (reference
    material_featurizers/elemnet_featurizer.py)."""

    MAX_Z = 86

    def get_vector(self, comp) -> Optional[np.ndarray]:
        """Element->fraction dict to an 86-dim fraction vector (reference
        elemnet_featurizer.py:50).  Keys may be element symbols or atomic
        numbers; values are (unnormalized) fractions."""
        from deepchem_tpu.chem.mol import ATOMIC_SYMBOL
        sym_to_z = {v: k for k, v in ATOMIC_SYMBOL.items()}
        total = sum(comp.values()) or 1.0
        v = np.zeros(self.MAX_Z, dtype=np.float32)
        for key, c in comp.items():
            z = key if isinstance(key, int) else sym_to_z.get(str(key), 0)
            if not 1 <= z <= self.MAX_Z:
                return None
            v[z - 1] = c / total
        return v

    def _featurize(self, datapoint: str, **kwargs) -> np.ndarray:
        comp = parse_composition(str(datapoint))
        total = sum(comp.values()) or 1.0
        v = np.zeros(self.MAX_Z, dtype=np.float32)
        for z, c in comp.items():
            if 1 <= z <= self.MAX_Z:
                v[z - 1] = c / total
        return v


class SineCoulombMatrix(Featurizer):
    """Periodic Coulomb-matrix variant for crystals (reference
    material_featurizers/sine_coulomb_matrix.py).

    Input: dict with 'lattice' (3x3), 'frac_coords' (N,3), 'species'
    (list of symbols) — or a pymatgen Structure.
    """

    def __init__(self, max_atoms: int = 100, flatten: bool = True):
        self.max_atoms = max_atoms
        self.flatten = flatten

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        if hasattr(datapoint, 'lattice'):           # pymatgen Structure
            lattice = np.asarray(datapoint.lattice.matrix)
            frac = np.asarray(datapoint.frac_coords)
            zs = np.asarray([s.Z for s in datapoint.species])
        else:
            lattice = np.asarray(datapoint['lattice'], dtype=float)
            frac = np.asarray(datapoint['frac_coords'], dtype=float)
            zs = np.asarray([PERIODIC_TABLE[s]
                             for s in datapoint['species']])
        n = len(zs)
        m = np.zeros((self.max_atoms, self.max_atoms))
        # sine-distance metric (Faber et al. 2015)
        diff = frac[:, None, :] - frac[None, :, :]
        sin2 = np.square(np.sin(np.pi * diff))
        dist = np.sqrt(np.einsum('ijk,kl,ijl->ij', sin2,
                                 lattice @ lattice.T, sin2) + 1e-12)
        with np.errstate(divide='ignore'):
            cm = np.outer(zs, zs) / np.where(dist > 0, dist, np.inf)
        np.fill_diagonal(cm, 0.5 * zs ** 2.4)
        m[:n, :n] = cm
        if self.flatten:
            w, _ = np.linalg.eigh(m)
            return w[::-1].astype(np.float64)
        return m


class PositionFrequencyMatrix(Featurizer):
    """Sequence-set -> position frequency matrix (reference
    feat/position_frequency_matrix_featurizer.py)."""

    def __init__(self, charset=('A', 'C', 'G', 'T', 'N'),
                 max_length: int = 100):
        self.charset = list(charset)
        self.max_length = max_length

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        """datapoint: a list of aligned sequences."""
        seqs = [datapoint] if isinstance(datapoint, str) else list(datapoint)
        out = np.zeros((len(self.charset), self.max_length))
        for seq in seqs:
            for i, c in enumerate(str(seq)[:self.max_length]):
                if c in self.charset:
                    out[self.charset.index(c), i] += 1
        return out


class SparseMatrixOneHotFeaturizer(Featurizer):
    """One-hot sequence featurizer with scipy sparse output (reference
    feat/molecule_featurizers/sparse_matrix_one_hot_featurizer.py)."""

    def __init__(self, charset=None):
        default = ['A', 'C', 'D', 'E', 'F', 'G', 'H', 'I', 'K', 'L', 'M',
                   'N', 'P', 'Q', 'R', 'S', 'T', 'V', 'W', 'Y', 'X', 'Z',
                   'B', 'U', 'O']
        self.charset = list(charset) if charset is not None else default

    def _featurize(self, datapoint: str, **kwargs):
        from scipy.sparse import csr_matrix
        seq = str(datapoint)
        rows = np.arange(len(seq))
        cols = np.array([self.charset.index(c) if c in self.charset
                         else len(self.charset) - 1 for c in seq])
        data = np.ones(len(seq))
        return csr_matrix((data, (rows, cols)),
                          shape=(len(seq), len(self.charset)))

    def untransform(self, matrix) -> str:
        dense = np.asarray(matrix.todense()) \
            if hasattr(matrix, 'todense') else np.asarray(matrix)
        return ''.join(self.charset[int(i)] for i in dense.argmax(axis=1))

"""Periodic-boundary-condition primitives: lattice, lattice-summed AO
evaluation, and periodic one-electron integrals.

TPU-first equivalent of the reference's PBC utility layer
(``deepchem/utils/dft_utils/hamilton/intor/lattice.py:7`` Lattice,
``pbcintor.py:9`` PBCIntOption/get_default_options/get_default_kpts,
``gtoeval.py`` pbc_eval_gto).  The reference delegates the actual
periodic integrals to libcint; here the lattice sums ride the in-repo
McMurchie-Davidson engine directly — a translated Gaussian is just a
Gaussian at a shifted center, so every molecular integral becomes its
periodic counterpart by summing shifted-ket copies until the
Gaussian-overlap tail is below ``precision``.

Gamma-point only for the Bloch phase (the reference's own default,
``get_default_kpts -> zeros``); k-grids accept explicit kpts in
``pbc_eval_gto`` via the standard phase factor.
"""
import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

__all__ = ['Lattice', 'PBCIntOption', 'get_default_options',
           'get_default_kpts', 'pbc_eval_gto', 'pbc_overlap',
           'pbc_kinetic']


class Lattice:
    """Periodicity of a crystal lattice; knows nothing about atoms
    (reference lattice.py:7).

    Examples
    --------
    >>> import numpy as np
    >>> latt = Lattice(np.eye(3))
    >>> latt.lattice_vectors()
    array([[1., 0., 0.],
           [0., 1., 0.],
           [0., 0., 1.]])
    >>> np.round(latt.recip_vectors(), 4)
    array([[6.2832, 0.    , 0.    ],
           [0.    , 6.2832, 0.    ],
           [0.    , 0.    , 6.2832]])
    >>> float(latt.volume())
    1.0
    >>> latt.get_lattice_ls(1.0).shape   # origin + 6 face neighbours
    (7, 3)
    """

    def __init__(self, a):
        a = np.asarray(a, dtype=np.float64)
        if a.shape != (3, 3):
            raise ValueError(f'lattice vectors must be (3, 3), got '
                             f'{a.shape}')
        self.a = a

    def lattice_vectors(self) -> np.ndarray:
        """Row-wise lattice vectors (bohr)."""
        return self.a

    def recip_vectors(self) -> np.ndarray:
        """Row-wise reciprocal vectors: 2 pi inv(a)^T."""
        return 2.0 * np.pi * np.linalg.inv(self.a).T

    def volume(self) -> float:
        """Unit-cell volume |det a|."""
        return float(abs(np.linalg.det(self.a)))

    def _grids_within(self, vecs: np.ndarray,
                      cutoff: float) -> np.ndarray:
        """All integer combinations n @ vecs with |n @ vecs| <= cutoff,
        sorted by norm (origin first), ties broken lexicographically."""
        # bound each integer index by the cutoff over the projection
        # onto the dual direction (safe overestimate)
        inv = np.linalg.inv(vecs)
        nmax = np.ceil(cutoff * np.linalg.norm(inv, axis=0)).astype(int)
        rng = [np.arange(-m, m + 1) for m in nmax]
        grid = np.stack(np.meshgrid(*rng, indexing='ij'),
                        axis=-1).reshape(-1, 3)
        ls = grid @ vecs
        norms = np.linalg.norm(ls, axis=1)
        keep = norms <= cutoff + 1e-12
        ls, norms = ls[keep], norms[keep]
        order = np.lexsort((ls[:, 2], ls[:, 1], ls[:, 0], norms))
        return ls[order]

    def get_lattice_ls(self, rcut: float) -> np.ndarray:
        """Real-space lattice translations within ``rcut`` (bohr)."""
        return self._grids_within(self.a, rcut)

    def get_gvgrids(self, gcut: float) -> Tuple[np.ndarray, np.ndarray]:
        """Reciprocal vectors within ``gcut`` and their quadrature
        weights (= (2 pi)^3 / volume per G point, the Fourier-sum
        measure)."""
        gv = self._grids_within(self.recip_vectors(), gcut)
        w = np.full(len(gv), (2 * np.pi) ** 3 / self.volume())
        return gv, w

    def estimate_rcut(self, min_exp: float,
                      precision: float = 1e-8) -> float:
        """Lattice-sum cutoff for a basis whose most diffuse primitive
        has exponent ``min_exp``: the pair overlap of two such
        Gaussians decays as exp(-min_exp R^2 / 2) (reduced exponent
        a*a/(a+a)), so R = sqrt(-2 ln(precision) / min_exp)."""
        return math.sqrt(2.0 * max(-math.log(precision), 1.0)
                         / min_exp)


@dataclass
class PBCIntOption:
    """Lattice-sum parameters (reference pbcintor.py:9).

    Examples
    --------
    >>> PBCIntOption.get_default()
    PBCIntOption(precision=1e-08, kpt_diff_tol=1e-06)
    """
    precision: float = 1e-8
    kpt_diff_tol: float = 1e-6

    @staticmethod
    def get_default(
            lattsum_opt: Optional[Union['PBCIntOption', Dict]] = None
    ) -> 'PBCIntOption':
        if lattsum_opt is None:
            return PBCIntOption()
        if isinstance(lattsum_opt, dict):
            return PBCIntOption(**lattsum_opt)
        return lattsum_opt


def get_default_options(
        options: Optional[PBCIntOption] = None) -> PBCIntOption:
    """None -> default PBCIntOption (reference pbcintor.py:58)."""
    return PBCIntOption() if options is None else options


def get_default_kpts(kpts: Optional[np.ndarray],
                     dtype=np.float64) -> np.ndarray:
    """None -> the Gamma point (reference pbcintor.py:86)."""
    if kpts is None:
        return np.zeros((1, 3), dtype=dtype)
    kpts = np.asarray(kpts, dtype=dtype)
    if kpts.ndim != 2 or kpts.shape[-1] != 3:
        raise ValueError(f'kpts must be (nk, 3), got {kpts.shape}')
    return kpts


def _basis_rcut(basis, lattice: Lattice, precision: float) -> float:
    """Lattice-sum cutoff: tail distance of the most diffuse primitive
    plus the largest center offset inside the cell."""
    min_exp = min(float(np.min(bf.exps)) for bf in basis)
    span = max(float(np.linalg.norm(bf.center)) for bf in basis)
    return lattice.estimate_rcut(min_exp, precision) + span


def _shifted(basis, shift: np.ndarray):
    """Copies of ``basis`` with every center translated by ``shift``
    (a translated contracted Gaussian is the same contraction at the
    moved center — coefficients and norms are translation-invariant)."""
    from deepchem_tpu.dft.basis import BasisFunction
    return [BasisFunction(bf.center + shift, bf.lmn, bf.exps, bf.coefs,
                          bf.atom_index) for bf in basis]


def pbc_eval_gto(basis, lattice: Lattice, points: np.ndarray,
                 kpts: Optional[np.ndarray] = None,
                 options: Optional[PBCIntOption] = None) -> np.ndarray:
    """Bloch-summed AO values on grid points (reference gtoeval.py
    pbc_eval_gto): phi_k(r) = sum_L e^{ik.L} phi(r - L).

    Returns [nk, G, nao] complex (real when all kpts are Gamma).
    """
    from deepchem_tpu.dft.integrals import ao_values
    opt = get_default_options(options)
    kpts = get_default_kpts(kpts)
    pts = np.asarray(points, dtype=np.float64)
    ls = lattice.get_lattice_ls(_basis_rcut(basis, lattice,
                                            opt.precision))
    out = np.zeros((len(kpts), len(pts), len(basis)),
                   dtype=np.complex128)
    for L in ls:
        phi, _ = ao_values(basis, pts - L[None, :])
        phase = np.exp(1j * kpts @ L)          # [nk]
        out += phase[:, None, None] * phi[None]
    if np.allclose(kpts, 0.0):
        return out.real
    return out


def _pbc_1e(basis, lattice: Lattice, which: str,
            options: Optional[PBCIntOption]) -> np.ndarray:
    """Gamma-point lattice-summed one-electron matrix:
    M_ij = sum_L <phi_i | op | phi_j(. - L)>."""
    from deepchem_tpu.dft import integrals as ints
    opt = get_default_options(options)
    n = len(basis)
    ls = lattice.get_lattice_ls(_basis_rcut(basis, lattice,
                                            opt.precision))
    fn = (ints.overlap_matrix if which == 'overlap'
          else ints.kinetic_matrix)
    out = np.zeros((n, n))
    for L in ls:
        if np.allclose(L, 0.0):
            out += fn(basis)
            continue
        # cross block <bra | ket shifted by L> via the combined basis
        full = fn(list(basis) + _shifted(basis, L))
        out += full[:n, n:]
    return out


def pbc_overlap(basis, lattice: Lattice,
                options: Optional[PBCIntOption] = None) -> np.ndarray:
    """Periodic overlap matrix at the Gamma point."""
    return _pbc_1e(basis, lattice, 'overlap', options)


def pbc_kinetic(basis, lattice: Lattice,
                options: Optional[PBCIntOption] = None) -> np.ndarray:
    """Periodic kinetic-energy matrix at the Gamma point."""
    return _pbc_1e(basis, lattice, 'kinetic', options)

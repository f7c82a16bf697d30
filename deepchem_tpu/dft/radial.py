"""Radial quadratures, grid transformations, and pruned molecular
grids.

TPU-first equivalent of the reference's radial-grid stack
(``deepchem/utils/dft_utils/grid/radial_grid.py`` RadialGrid /
SlicedRadialGrid / get_xw_integration / DE2Transformation /
LogM3Transformation / TreutlerM4Transformation / get_grid_transform,
and ``truncation_rules.py`` NoTrunc / NWChemTrunc).  Grids are built
host-side in numpy once per system (our design keeps quadrature
construction off the device; only the [G]-sized point/weight arrays
ship to HBM), so everything here is plain numpy.

The quadrature schemes and maps are the published ones:
- 'chebyshev': Perez-Jorda & Yang's Gauss-Chebyshev-derived rule for
  plain dx integration on [-1, 1] (Chem. Phys. Lett. 1994).
- 'chebyshev2': Gauss-Chebyshev second kind with the 1/sqrt(1-x^2)
  Jacobian folded in (exact-dx weights pi/(n+1) sin(i pi/(n+1))).
- 'uniform': trapezoid.
- DE2: double-exponential (tanh-sinh family) map to (0, inf).
- LogM3: Mura-Knowles log-3 map r = -ra ln(1 - x~^3)-style variant used
  by dqc, r = ra (1 - ln(1-x)/ln 2).
- TreutlerM4: Treutler-Ahlrichs M4 map (JCP 102, 346 (1995)).
"""
from __future__ import annotations

import math
from abc import ABC, abstractmethod
from typing import Callable, List, Sequence, Tuple, Union

import numpy as np

__all__ = ['get_xw_integration', 'BaseGridTransform', 'DE2Transformation',
           'LogM3Transformation', 'TreutlerM4Transformation',
           'get_grid_transform', 'BaseGrid', 'RadialGrid',
           'SlicedRadialGrid', 'BaseTruncationRules', 'NoTrunc',
           'NWChemTrunc', 'angular_quadrature', 'pruned_molecular_grid']


def get_xw_integration(n: int, scheme: str = 'chebyshev'
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Abscissas/weights integrating plain f(x) dx on [-1, 1].

    Examples
    --------
    >>> x, w = get_xw_integration(128, 'chebyshev')
    >>> abs(float(np.sum(w * x ** 2)) - 2.0 / 3) < 1e-6
    True
    """
    s = scheme.lower()
    i = np.arange(n, 0, -1)
    t = i * math.pi / (n + 1.0)
    if s == 'chebyshev':
        # Perez-Jorda rule: polynomial-corrected abscissas, sin^4 weights
        sin_t, cos_t = np.sin(t), np.cos(t)
        x = (n + 1.0 - 2.0 * i) / (n + 1.0) + 2.0 / math.pi * \
            (1.0 + 2.0 / 3.0 * sin_t * sin_t) * cos_t * sin_t
        w = 16.0 / (3.0 * (n + 1.0)) * sin_t ** 4
        return x, w
    if s == 'chebyshev2':
        return np.cos(t), math.pi / (n + 1.0) * np.sin(t)
    if s == 'uniform':
        x = np.linspace(-1.0, 1.0, n)
        w = np.full(n, x[1] - x[0])
        w[0] *= 0.5
        w[-1] *= 0.5
        return x, w
    raise ValueError(f'unknown grid integrator {scheme!r} '
                     "(available: 'chebyshev', 'chebyshev2', 'uniform')")


class BaseGridTransform(ABC):
    """Map from the integrator coordinate x in [-1, 1] to the radial
    coordinate r in (0, inf) (reference radial_grid.py
    BaseGridTransform)."""

    @abstractmethod
    def x2r(self, x: np.ndarray) -> np.ndarray:
        """r(x)."""

    @abstractmethod
    def get_drdx(self, x: np.ndarray) -> np.ndarray:
        """dr/dx Jacobian."""


class DE2Transformation(BaseGridTransform):
    """Double-exponential map r = exp(alpha u - exp(-u)) with u an
    affine rescale of x chosen so r spans [rmin, rmax].

    Examples
    --------
    >>> t = DE2Transformation()
    >>> r = t.x2r(np.linspace(-1, 1, 50))
    >>> bool((np.diff(r) > 0).all())
    True
    """

    def __init__(self, alpha: float = 1.0, rmin: float = 1e-7,
                 rmax: float = 20.0):
        if not rmin < 1.0:
            raise ValueError('rmin must be < 1')
        self.alpha = alpha
        self.xmin = -np.log(-np.log(rmin))
        self.xmax = np.log(rmax) / alpha

    def _u(self, x):
        return 0.5 * (x + 1.0) * (self.xmax - self.xmin) + self.xmin

    def x2r(self, x: np.ndarray) -> np.ndarray:
        u = self._u(np.asarray(x))
        return np.exp(self.alpha * u - np.exp(-u))

    def get_drdx(self, x: np.ndarray) -> np.ndarray:
        u = self._u(np.asarray(x))
        r = np.exp(self.alpha * u - np.exp(-u))
        return r * (self.alpha + np.exp(-u)) * 0.5 * (self.xmax
                                                      - self.xmin)


class LogM3Transformation(BaseGridTransform):
    """Logarithmic map r = ra (1 - ln(1 - x)/ln 2) (Mura-Knowles
    family).

    Examples
    --------
    >>> t = LogM3Transformation(ra=2.0)
    >>> round(float(t.x2r(np.zeros(1))[0]), 10)
    2.0
    """

    def __init__(self, ra: float = 1.0, eps: float = 1e-15):
        self.ra = ra
        self.eps = eps
        self.ln2 = math.log(2.0 + eps)

    def x2r(self, x: np.ndarray) -> np.ndarray:
        return self.ra * (1.0 - np.log1p(-np.asarray(x) + self.eps)
                          / self.ln2)

    def get_drdx(self, x: np.ndarray) -> np.ndarray:
        return self.ra / self.ln2 / (1.0 - np.asarray(x) + self.eps)


class TreutlerM4Transformation(BaseGridTransform):
    """Treutler-Ahlrichs M4 map
    r = xi/ln2 (1+x)^alpha (ln 2 - ln(1-x)) (JCP 102, 346 (1995)).

    Examples
    --------
    >>> t = TreutlerM4Transformation()
    >>> bool(t.x2r(np.array([-1.0 + 1e-15]))[0] < 1e-10)
    True
    """

    def __init__(self, xi: float = 1.0, alpha: float = 0.6,
                 eps: float = 1e-15):
        self.xi = xi
        self.alpha = alpha
        self.eps = eps
        self.ln2 = math.log(2.0 + eps)

    def x2r(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        return self.xi / self.ln2 * (1.0 + self.eps + x) ** self.alpha \
            * (self.ln2 - np.log1p(-x + self.eps))

    def get_drdx(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        fac = self.xi / self.ln2 * (1.0 + self.eps + x) ** self.alpha
        term1 = fac / (1.0 - x + self.eps)
        term2 = fac * self.alpha / (1.0 + self.eps + x) \
            * (self.ln2 - np.log1p(-x + self.eps))
        return term1 + term2


def get_grid_transform(
        s: Union[str, BaseGridTransform]) -> BaseGridTransform:
    """Resolve a transform by name (reference radial_grid.py
    get_grid_transform)."""
    if isinstance(s, BaseGridTransform):
        return s
    name = s.lower()
    if name == 'logm3':
        return LogM3Transformation()
    if name == 'de2':
        return DE2Transformation()
    if name == 'treutlerm4':
        return TreutlerM4Transformation()
    raise ValueError(f'unknown grid transformation {s!r}')


class BaseGrid(ABC):
    """Integration-grid contract (reference grid/base_grid.py): points
    plus the volume element of each point."""

    @property
    def coord_type(self) -> str:
        return 'cart'

    @abstractmethod
    def get_rgrid(self) -> np.ndarray:
        """Grid coordinates."""

    @abstractmethod
    def get_dvolume(self) -> np.ndarray:
        """Per-point volume element (weights)."""


class RadialGrid(BaseGrid):
    """1-D radial quadrature for integrals of the form
    int_0^inf f(r) 4 pi r^2 dr (reference radial_grid.py RadialGrid).

    Examples
    --------
    >>> g = RadialGrid(100)
    >>> # int 4 pi r^2 exp(-r^2) dr = pi^(3/2)
    >>> val = float(np.sum(g.get_dvolume() *
    ...                    np.exp(-g.get_rgrid()[:, 0] ** 2)))
    >>> abs(val - np.pi ** 1.5) < 1e-6
    True
    >>> g[10:20].get_rgrid().shape
    (10, 1)
    """

    def __init__(self, ngrid: int, grid_integrator: str = 'chebyshev',
                 grid_transform: Union[str, BaseGridTransform] = 'logm3'):
        transform = get_grid_transform(grid_transform)
        x, w = get_xw_integration(ngrid, grid_integrator)
        r = transform.x2r(x)
        self.rgrid = r[:, None]
        self.dvolume = 4.0 * math.pi * r * r * transform.get_drdx(x) * w

    @property
    def coord_type(self) -> str:
        return 'radial'

    def get_rgrid(self) -> np.ndarray:
        return self.rgrid

    def get_dvolume(self) -> np.ndarray:
        return self.dvolume

    def __getitem__(self, key) -> 'RadialGrid':
        if isinstance(key, slice):
            return SlicedRadialGrid(self, key)
        raise KeyError('RadialGrid supports slice indexing only')


class SlicedRadialGrid(RadialGrid):
    """Slice view of a RadialGrid (reference radial_grid.py)."""

    def __init__(self, obj: RadialGrid, key: slice):
        self.rgrid = obj.rgrid[key]
        self.dvolume = obj.dvolume[key]


# ------------------------------------------------------------ pruning

class BaseTruncationRules(ABC):
    """Which radial zones of an atom's grid get which angular precision
    (reference truncation_rules.py)."""

    @abstractmethod
    def to_truncate(self, atz: int) -> bool:
        """Whether this element's grid is pruned at all."""

    @abstractmethod
    def rad_slices(self, atz: int, radgrid: RadialGrid) -> List[slice]:
        """Radial-zone slices, innermost first."""

    @abstractmethod
    def precs(self, atz: int, radgrid: RadialGrid) -> List[int]:
        """Angular exactness degree per zone."""


class NoTrunc(BaseTruncationRules):
    """Full angular grid everywhere."""

    def to_truncate(self, atz: int) -> bool:
        return False

    def rad_slices(self, atz, radgrid):
        raise RuntimeError('NoTrunc never truncates')

    def precs(self, atz, radgrid):
        raise RuntimeError('NoTrunc never truncates')


class NWChemTrunc(BaseTruncationRules):
    """NWChem's 5-zone pruning: zone boundaries at alpha * R_atom with
    the alpha row picked by period, low angular order at the nucleus
    and in the far tail (reference truncation_rules.py NWChemTrunc;
    the alpha table is NWChem's published scheme).

    ``prec`` is the full angular exactness degree; the zone schedule
    steps it down to [5, 7, prec-2, prec, prec-2] (degree units).
    """
    _ALPHAS = np.array([[0.25, 0.5, 1.0, 4.5],     # H, He
                        [0.1667, 0.5, 0.9, 3.5],   # first row
                        [0.1, 0.4, 0.8, 2.5]])     # heavier

    def __init__(self, radii_list: Sequence[float],
                 prec: Union[int, Callable[[int], int]] = 17):
        self.radii_list = list(radii_list)
        self.prec = prec

    def _prec_of(self, atz: int) -> int:
        return self.prec(atz) if callable(self.prec) else self.prec

    def to_truncate(self, atz: int) -> bool:
        return self._prec_of(atz) >= 13

    def _zones(self, atz: int, radgrid: RadialGrid) -> np.ndarray:
        ratom = self.radii_list[atz]
        row = 0 if atz <= 2 else (1 if atz <= 10 else 2)
        bounds = self._ALPHAS[row] * ratom
        r = radgrid.get_rgrid()[:, 0]
        return (r[:, None] > bounds[None, :]).sum(axis=1)   # 0..4

    def rad_slices(self, atz: int, radgrid: RadialGrid) -> List[slice]:
        place = self._zones(atz, radgrid)
        out: List[slice] = []
        idx = 0
        for zone in range(5):
            c = int((place == zone).sum())
            out.append(slice(idx, idx + c))
            idx += c
        return out

    def precs(self, atz: int, radgrid: RadialGrid) -> List[int]:
        p = self._prec_of(atz)
        return [5, 7, max(p - 2, 5), p, max(p - 2, 5)]


def angular_quadrature(prec: int) -> Tuple[np.ndarray, np.ndarray]:
    """Spherical quadrature exact for all spherical harmonics of degree
    <= ``prec``: Gauss-Legendre in cos(theta) (n_theta >= (prec+1)/2)
    x uniform phi (n_phi >= prec+1).  Weights sum to 1.

    More points than a true Lebedev rule of the same degree, but
    arbitrarily refinable and constructed in closed form — the
    trade the SURVEY grid redesign makes everywhere.
    """
    n_theta = (prec + 2) // 2
    n_phi = prec + 1
    x, wx = np.polynomial.legendre.leggauss(n_theta)
    phi = 2.0 * math.pi * np.arange(n_phi) / n_phi
    st = np.sqrt(1.0 - x * x)
    pts = np.stack([np.outer(st, np.cos(phi)),
                    np.outer(st, np.sin(phi)),
                    np.outer(x, np.ones(n_phi))], axis=-1).reshape(-1, 3)
    wts = np.outer(wx, np.full(n_phi, 0.5 / n_phi)).reshape(-1)
    return pts, wts


_ATOMIC_NUMBER = {
    'H': 1, 'He': 2, 'Li': 3, 'Be': 4, 'B': 5, 'C': 6, 'N': 7, 'O': 8,
    'F': 9, 'Ne': 10, 'Na': 11, 'Mg': 12, 'Al': 13, 'Si': 14, 'P': 15,
    'S': 16, 'Cl': 17, 'Ar': 18}

# Bragg-Slater radii (bohr) for the pruning boundaries
_BRAGG = {1: 0.661, 2: 0.661, 3: 2.74, 4: 1.98, 5: 1.60, 6: 1.32,
          7: 1.23, 8: 1.13, 9: 0.94, 10: 0.94, 11: 3.40, 12: 2.83,
          13: 2.36, 14: 2.08, 15: 1.89, 16: 1.89, 17: 1.89, 18: 1.89}


def pruned_molecular_grid(symbols: Sequence[str], coords: np.ndarray,
                          n_radial: int = 50, prec: int = 17,
                          grid_transform: str = 'treutlerm4'
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Becke-stitched molecular grid with NWChem zone pruning: the
    angular order follows the radial zone, cutting grid points ~2-3x
    vs the unpruned grid at matched far-field accuracy.

    Drop-in alternative to ``grid.molecular_grid`` (same return
    contract) exercising the RadialGrid/transform/truncation stack.
    """
    from deepchem_tpu.dft.grid import _becke_weights
    coords = np.asarray(coords, dtype=np.float64)
    zs = [_ATOMIC_NUMBER[s] for s in symbols]
    radii = [0.0] * (max(zs) + 1)
    for z in zs:
        radii[z] = _BRAGG[z]
    trunc = NWChemTrunc(radii, prec)
    all_pts, all_wts, owner = [], [], []
    for ia, (sym, z) in enumerate(zip(symbols, zs)):
        rm = _BRAGG[z]
        radgrid = RadialGrid(n_radial, 'chebyshev',
                             get_grid_transform(grid_transform)
                             if grid_transform != 'treutlerm4'
                             else TreutlerM4Transformation(xi=rm))
        if grid_transform != 'treutlerm4':
            # generic transforms aren't atom-scaled; scale r directly
            radgrid.rgrid = radgrid.rgrid * rm
            radgrid.dvolume = radgrid.dvolume * rm ** 3
        if trunc.to_truncate(z):
            slices = trunc.rad_slices(z, radgrid)
            precs = trunc.precs(z, radgrid)
        else:
            slices = [slice(0, n_radial)]
            precs = [prec]
        for sl, p in zip(slices, precs):
            sub = radgrid[sl]
            if len(sub.dvolume) == 0:
                continue
            ang_pts, ang_wts = angular_quadrature(p)
            r = sub.get_rgrid()[:, 0]
            pts = coords[ia][None, None, :] \
                + r[:, None, None] * ang_pts[None, :, :]
            wts = sub.get_dvolume()[:, None] * ang_wts[None, :]
            all_pts.append(pts.reshape(-1, 3))
            all_wts.append(wts.reshape(-1))
            owner.append(np.full(len(r) * len(ang_pts), ia))
    points = np.concatenate(all_pts)
    weights = np.concatenate(all_wts)
    own = np.concatenate(owner)
    weights = weights * _becke_weights(points, coords, own)
    return points, weights

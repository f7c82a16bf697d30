"""Becke molecular quadrature grid for XC integration.

Atom-centered product grids (Gauss-Chebyshev radial x Lebedev-26 angular)
stitched with Becke's fuzzy-cell partitioning (Becke 1988).  Stands in
for the reference's DQC grid stack (deepchem/utils/dft_utils/grid).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

# Becke radial scale per element (bohr) — roughly half the Bragg radius,
# with Becke's exception that H keeps its full radius
_RADIAL_SCALE = {'H': 1.0, 'He': 0.6, 'Li': 2.7, 'Be': 1.9, 'B': 1.6,
                 'C': 1.3, 'N': 1.2, 'O': 1.1, 'F': 0.9}


def _lebedev26() -> Tuple[np.ndarray, np.ndarray]:
    """Lebedev order-26 spherical grid (octahedron vertices, edge
    midpoints, cube corners); weights sum to 1."""
    pts, wts = [], []
    # 6 vertices
    for ax in range(3):
        for s in (1.0, -1.0):
            p = [0.0, 0.0, 0.0]
            p[ax] = s
            pts.append(p)
            wts.append(1.0 / 21.0)
    # 12 edge midpoints
    a = 1.0 / math.sqrt(2.0)
    for i in range(3):
        for j in range(i + 1, 3):
            for si in (1.0, -1.0):
                for sj in (1.0, -1.0):
                    p = [0.0, 0.0, 0.0]
                    p[i], p[j] = si * a, sj * a
                    pts.append(p)
                    wts.append(4.0 / 105.0)
    # 8 cube corners
    b = 1.0 / math.sqrt(3.0)
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                pts.append([sx * b, sy * b, sz * b])
                wts.append(27.0 / 840.0)
    return np.asarray(pts), np.asarray(wts)


def _product_angular(n_theta: int,
                     n_phi: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre (cos theta) x uniform (phi) spherical product grid;
    weights sum to 1.  More points than Lebedev for the same degree but
    arbitrarily refinable."""
    x, wx = np.polynomial.legendre.leggauss(n_theta)
    phi = 2.0 * math.pi * np.arange(n_phi) / n_phi
    st = np.sqrt(1.0 - x * x)
    pts = np.stack([
        np.outer(st, np.cos(phi)),
        np.outer(st, np.sin(phi)),
        np.outer(x, np.ones(n_phi))], axis=-1).reshape(-1, 3)
    wts = np.outer(wx, np.full(n_phi, 1.0 / n_phi / 2.0)).reshape(-1)
    return pts, wts


def _angular_grid(level: int) -> Tuple[np.ndarray, np.ndarray]:
    if level <= 1:
        return _lebedev26()
    if level == 2:
        return _product_angular(8, 16)
    return _product_angular(12, 24)


def _radial_gc(n: int, rm: float) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Chebyshev (2nd kind) radial grid with the Becke map
    r = rm (1+x)/(1-x); weights include r^2 dr."""
    i = np.arange(1, n + 1)
    x = np.cos(i * math.pi / (n + 1))
    w_cheb = math.pi / (n + 1) * np.sin(i * math.pi / (n + 1)) ** 2
    w_x = w_cheb / np.sqrt(1.0 - x * x)          # plain dx quadrature
    r = rm * (1.0 + x) / (1.0 - x)
    dr_dx = 2.0 * rm / (1.0 - x) ** 2
    w = w_x * dr_dx * r * r
    return r, w


def _becke_weights(points: np.ndarray, coords: np.ndarray,
                   owner: np.ndarray, k: int = 3) -> np.ndarray:
    """Becke fuzzy-cell relative weight of each point's owning atom."""
    natom = len(coords)
    if natom == 1:
        return np.ones(len(points))
    d = np.linalg.norm(points[:, None, :] - coords[None, :, :], axis=-1)
    Rij = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    P = np.ones((len(points), natom))
    for i in range(natom):
        for j in range(natom):
            if i == j:
                continue
            mu = (d[:, i] - d[:, j]) / Rij[i, j]
            f = mu
            for _ in range(k):
                f = 1.5 * f - 0.5 * f ** 3
            P[:, i] *= 0.5 * (1.0 - f)
    tot = P.sum(axis=1)
    return P[np.arange(len(points)), owner] / np.maximum(tot, 1e-30)


def molecular_grid(symbols: Sequence[str], coords: np.ndarray,
                   n_radial: int = 50, level: int = 2
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Build the full molecular quadrature: returns (points [G,3],
    weights [G]) such that sum_g w_g f(r_g) ~ integral f d^3r.

    level 1: Lebedev-26 angular (fast, ~1e-2 on p overlaps); level 2:
    8x16 product grid (~2e-4); level 3: 12x24 (~1e-5).
    """
    coords = np.asarray(coords, dtype=np.float64)
    ang_pts, ang_wts = _angular_grid(level)
    all_pts, all_wts, owner = [], [], []
    for ia, sym in enumerate(symbols):
        rm = _RADIAL_SCALE.get(sym, 1.3)
        r, wr = _radial_gc(n_radial, rm)
        pts = coords[ia][None, None, :] + \
            r[:, None, None] * ang_pts[None, :, :]
        wts = wr[:, None] * (4.0 * math.pi * ang_wts[None, :])
        all_pts.append(pts.reshape(-1, 3))
        all_wts.append(wts.reshape(-1))
        owner.append(np.full(n_radial * len(ang_pts), ia))
    points = np.concatenate(all_pts)
    weights = np.concatenate(all_wts)
    owner = np.concatenate(owner)
    weights = weights * _becke_weights(points, coords, owner)
    return points, weights

"""Radial quadratures, grid transforms, pruned grids (reference
dft_utils/grid/radial_grid.py + truncation_rules.py)."""
import math

import numpy as np
import pytest

from deepchem_tpu.dft.radial import (DE2Transformation,
                                     LogM3Transformation, NoTrunc,
                                     NWChemTrunc, RadialGrid,
                                     SlicedRadialGrid,
                                     TreutlerM4Transformation,
                                     angular_quadrature,
                                     get_grid_transform,
                                     get_xw_integration,
                                     pruned_molecular_grid)

TRANSFORMS = ['logm3', 'de2', 'treutlerm4']
INTEGRATORS = ['chebyshev', 'chebyshev2', 'uniform']


class TestXWIntegration:
    @pytest.mark.parametrize('scheme', INTEGRATORS)
    def test_integrates_smooth_function(self, scheme):
        x, w = get_xw_integration(200, scheme)
        # int_-1^1 e^x dx = e - 1/e
        val = float(np.sum(w * np.exp(x)))
        # chebyshev2/uniform are O(1/n^2) for non-vanishing endpoints
        # (the radial transform absorbs the endpoints in real use);
        # the Perez-Jorda rule's sin^4 weights converge much faster
        tol = 1e-6 if scheme == 'chebyshev' else 5e-4
        assert abs(val - (math.e - 1.0 / math.e)) < tol
        # weights positive, abscissas inside [-1, 1]
        assert (w > 0).all() and (np.abs(x) <= 1.0).all()

    @pytest.mark.parametrize('scheme', INTEGRATORS)
    def test_polynomial_moments(self, scheme):
        x, w = get_xw_integration(100, scheme)
        for k, exact in [(0, 2.0), (1, 0.0), (2, 2.0 / 3),
                         (4, 2.0 / 5)]:
            tol = 1e-5 if scheme == 'chebyshev' else 2e-3
            assert abs(float(np.sum(w * x ** k)) - exact) < tol

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError):
            get_xw_integration(10, 'gauss-laguerre')


class TestTransforms:
    @pytest.mark.parametrize('name', TRANSFORMS)
    def test_monotone_and_positive(self, name):
        t = get_grid_transform(name)
        x = np.linspace(-1 + 1e-10, 1 - 1e-6, 300)
        r = t.x2r(x)
        assert (r > 0).all() and (np.diff(r) > 0).all()

    @pytest.mark.parametrize('name', TRANSFORMS)
    def test_jacobian_matches_finite_difference(self, name):
        t = get_grid_transform(name)
        x = np.linspace(-0.95, 0.95, 50)
        h = 1e-6
        fd = (t.x2r(x + h) - t.x2r(x - h)) / (2 * h)
        assert np.allclose(t.get_drdx(x), fd, rtol=1e-5)

    def test_get_grid_transform_passthrough_and_unknown(self):
        t = TreutlerM4Transformation(xi=2.0)
        assert get_grid_transform(t) is t
        with pytest.raises(ValueError):
            get_grid_transform('mura-knowles-m7')


class TestRadialGrid:
    @pytest.mark.parametrize('transform', TRANSFORMS)
    def test_gaussian_norm(self, transform):
        g = RadialGrid(100, 'chebyshev', transform)
        val = float(np.sum(g.get_dvolume()
                           * np.exp(-g.get_rgrid()[:, 0] ** 2)))
        assert abs(val - math.pi ** 1.5) < 1e-6

    @pytest.mark.parametrize('integrator', ['chebyshev', 'chebyshev2'])
    def test_slater_norm(self, integrator):
        # int 4 pi r^2 e^-2r dr = pi (1s Slater density norm)
        g = RadialGrid(150, integrator, 'treutlerm4')
        val = float(np.sum(g.get_dvolume()
                           * np.exp(-2.0 * g.get_rgrid()[:, 0])))
        assert abs(val - math.pi) < 1e-6

    def test_slicing(self):
        g = RadialGrid(80)
        sub = g[10:30]
        assert isinstance(sub, SlicedRadialGrid)
        assert sub.coord_type == 'radial'
        assert np.allclose(sub.get_rgrid(), g.get_rgrid()[10:30])
        assert np.allclose(sub.get_dvolume(), g.get_dvolume()[10:30])
        with pytest.raises(KeyError):
            g[3]
        # zone slices tile the full grid
        parts = [g[0:20], g[20:50], g[50:80]]
        total = sum(float(p.get_dvolume().sum()) for p in parts)
        assert total == pytest.approx(float(g.get_dvolume().sum()))


def _real_sph(l, m, pts):
    """Real spherical harmonics up to l=4 built from monomials."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    table = {
        (1, 0): z, (1, 1): x, (1, -1): y,
        (2, 0): 1.5 * z * z - 0.5, (2, 1): x * z, (2, -1): y * z,
        (2, 2): x * x - y * y, (2, -2): x * y,
        (3, 0): 2.5 * z ** 3 - 1.5 * z,
        (4, 0): (35 * z ** 4 - 30 * z ** 2 + 3) / 8.0,
    }
    return table[(l, m)]


class TestAngularQuadrature:
    @pytest.mark.parametrize('prec', [5, 7, 13, 17])
    def test_harmonics_integrate_to_zero(self, prec):
        pts, wts = angular_quadrature(prec)
        assert wts.sum() == pytest.approx(1.0)
        assert np.allclose(np.linalg.norm(pts, axis=1), 1.0)
        for (l, m) in [(1, 0), (1, 1), (2, 0), (2, 2), (3, 0), (4, 0)]:
            assert abs(float(np.sum(wts * _real_sph(l, m, pts)))) < 1e-12

    def test_degree_exactness(self):
        # z^p integrates to 1/(p+1) for even p over the unit sphere
        # (normalized measure); exact up to the requested degree
        pts, wts = angular_quadrature(17)
        for p in range(0, 18, 2):
            exact = 1.0 / (p + 1)
            val = float(np.sum(wts * pts[:, 2] ** p))
            assert abs(val - exact) < 1e-13


class TestTruncationRules:
    def test_notrunc(self):
        nt = NoTrunc()
        assert not nt.to_truncate(8)
        with pytest.raises(RuntimeError):
            nt.rad_slices(8, RadialGrid(10))

    def test_nwchem_zones_partition(self):
        radii = [0.0] * 9
        radii[1], radii[8] = 0.661, 1.13
        tr = NWChemTrunc(radii, prec=17)
        assert tr.to_truncate(8) and not NWChemTrunc(radii, 9
                                                     ).to_truncate(8)
        g = RadialGrid(60, 'chebyshev', 'treutlerm4')
        slices = tr.rad_slices(8, g)
        assert len(slices) == 5
        # the slices tile [0, 60) in order
        idx = 0
        for sl in slices:
            assert sl.start == idx
            idx = sl.stop
        assert idx == 60
        precs = tr.precs(8, g)
        assert precs == [5, 7, 15, 17, 15]


class TestPrunedMolecularGrid:
    def test_density_normalization(self):
        # sum of unit-norm Gaussians at each atom integrates to n_atoms
        coords = np.array([[0.0, 0, 0], [0, 0, 1.4]])
        pts, wts = pruned_molecular_grid(['H', 'H'], coords,
                                         n_radial=60, prec=17)
        rho = np.zeros(len(pts))
        for c in coords:
            d2 = ((pts - c) ** 2).sum(axis=1)
            rho += (1.0 / math.pi) ** 1.5 * np.exp(-d2)
        assert abs(float(np.sum(wts * rho)) - 2.0) < 1e-4

    def test_scf_energy_matches_product_grid(self):
        import jax
        jax.config.update('jax_enable_x64', True)
        try:
            from deepchem_tpu.dft import DFTSystem, KohnShamSCF
            geom = (['O', 'H', 'H'],
                    [[0, 0, 0.1173], [0, 0.7572, -0.4692],
                     [0, -0.7572, -0.4692]])
            ks = KohnShamSCF(xc='lda', iterations=60)
            e_full = float(ks.run(DFTSystem(*geom)).energy())
            sys_p = DFTSystem(*geom, grid_scheme='pruned')
            e_pruned = float(ks.run(sys_p).energy())
            # pruning saves points without moving the energy
            assert abs(e_pruned - e_full) < 2e-4
            full_pts = len(DFTSystem(*geom).grid_points)
            assert len(sys_p.grid_points) < full_pts
        finally:
            jax.config.update('jax_enable_x64', False)

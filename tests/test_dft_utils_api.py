"""Name-parity + behavior pins for deepchem_tpu.utils.dft_utils
(the reference's utils/dft_utils 89-export surface)."""
import ast
import pathlib

import numpy as np
import pytest

import deepchem_tpu.utils.dft_utils as du

REF_INIT = pathlib.Path(
    '/root/reference/deepchem/utils/dft_utils/__init__.py')


def reference_exports():
    names = []
    for node in ast.walk(ast.parse(REF_INIT.read_text())):
        if isinstance(node, ast.ImportFrom):
            names += [a.name for a in node.names]
    return sorted(set(names))


def test_every_reference_export_exists():
    missing = [n for n in reference_exports() if not hasattr(du, n)]
    assert not missing, f'dft_utils missing: {missing}'


def test_gated_names_raise_informatively():
    with pytest.raises(ImportError, match='native'):
        du.LibcintWrapper()
    with pytest.raises(ImportError, match='native'):
        du.get_libxc('lda_x')


class TestDataStructs:
    def test_spinparam(self):
        sp = du.SpinParam(u=np.ones(3), d=2 * np.ones(3))
        assert np.allclose(du.SpinParam.sum(sp), 3.0)
        assert du.SpinParam.sum(5.0) == 5.0
        red = du.SpinParam.reduce(sp, lambda a, b: a * b)
        assert np.allclose(red, 2.0)
        mapped = du.SpinParam.apply_fcn(lambda x, y: x + y, sp, sp)
        assert np.allclose(mapped.u, 2.0) and np.allclose(mapped.d, 4.0)
        assert 'SpinParam' in repr(sp)

    def test_valgrad_algebra(self):
        a = du.ValGrad(np.ones(4), grad=np.full((3, 4), 2.0))
        c = (a + a) * 3.0
        assert np.allclose(c.value, 6.0) and np.allclose(c.grad, 12.0)
        assert c.lapl is None and c.kin is None

    def test_is_z_float(self):
        assert du.is_z_float(6.5) and not du.is_z_float(6)


class TestBasisApi:
    def test_loadbasis_shells(self):
        shells = du.loadbasis('8:sto-3g')
        assert [s.angmom for s in shells] == [0, 0, 1]
        assert all(len(s.alphas) == 3 for s in shells)
        with pytest.raises(ValueError):
            du.loadbasis('8:def2-qzvpp')

    def test_atomcgtobasis(self):
        b = du.AtomCGTOBasis(atomz=8, bases=du.loadbasis('8:sto-3g'),
                             pos=(0.0, 0.0, 0.0))
        assert b.atomz == 8 and len(b.bases) == 3


class TestIntegralAdapters:
    def setup_method(self):
        from deepchem_tpu.dft.basis import build_basis
        self.basis = build_basis(['H', 'H'],
                                 np.array([[0, 0, 0], [0, 0, 1.4]]))

    def test_one_electron_names(self):
        S = du.overlap(self.basis)
        assert S.shape == (2, 2) and S[0, 0] == pytest.approx(1.0)
        assert np.allclose(du.int1e('ovlp', self.basis), S)
        T = du.kinetic(self.basis)
        assert np.allclose(du.int1e('kin', self.basis), T)
        V = du.nuclattr(self.basis, [1, 1],
                        np.array([[0, 0, 0], [0, 0, 1.4]]))
        assert V[0, 0] < 0
        mu = du.int1e('r0', self.basis)
        assert mu.shape == (3, 2, 2)
        with pytest.raises(ValueError):
            du.int1e('spnucsp', self.basis)

    def test_elrep_symmetry(self):
        eri = du.elrep(self.basis)
        assert eri.shape == (2, 2, 2, 2)
        assert np.allclose(eri, eri.transpose(1, 0, 2, 3))
        assert np.allclose(eri, eri.transpose(2, 3, 0, 1))
        assert du.int2e is du.elrep

    def test_df_2c3c(self):
        from deepchem_tpu.dft.df import even_tempered_aux
        aux = even_tempered_aux(self.basis)
        V = du.coul2c(aux)
        assert V.shape == (len(aux), len(aux))
        assert np.allclose(V, V.T) and (np.diag(V) > 0).all()
        B = du.coul3c(self.basis, aux)
        assert B.shape == (2, 2, len(aux))


class TestGtoEval:
    def setup_method(self):
        from deepchem_tpu.dft.basis import build_basis
        self.basis = build_basis(['O'], np.zeros((1, 3)))
        self.pts = np.array([[0.3, -0.2, 0.5], [1.0, 0.5, -0.7]])

    def test_eval_gto_layout(self):
        phi = du.eval_gto(self.basis, self.pts)
        assert phi.shape == (len(self.basis), 2)
        g = du.eval_gradgto(self.basis, self.pts)
        assert g.shape == (3, len(self.basis), 2)
        assert np.allclose(du.gto_evaluator(self.basis, '', self.pts),
                           phi)
        assert du.evl is du.gto_evaluator

    def test_laplacian_matches_finite_difference(self):
        h = 1e-4
        lap = du.eval_laplgto(self.basis, self.pts)
        fd = np.zeros_like(lap)
        for d in range(3):
            e = np.zeros(3)
            e[d] = h
            fd += (du.eval_gto(self.basis, self.pts + e)
                   - 2 * du.eval_gto(self.basis, self.pts)
                   + du.eval_gto(self.basis, self.pts - e)) / h ** 2
        assert np.allclose(lap, fd, rtol=1e-4, atol=1e-6)

    def test_pbc_eval_isolated_limit(self):
        latt = du.Lattice(np.eye(3) * 40.0)
        g = du.pbc_eval_gradgto(self.basis, latt, self.pts)
        assert np.allclose(g[0], du.eval_gradgto(self.basis, self.pts),
                           atol=1e-12)
        lap = du.pbc_eval_laplgto(self.basis, latt, self.pts)
        assert np.allclose(lap[0], du.eval_laplgto(self.basis,
                                                   self.pts),
                           atol=1e-12)
        assert np.allclose(du.pbc_evl(self.basis, latt, 'lapl',
                                      self.pts), lap)


class TestXCAlgebra:
    def test_get_xc_and_composition(self):
        rho = np.array([0.5, 1.0, 2.0])
        lda_x = du.get_xc('lda_x')
        vwn = du.get_xc('lda_c_vwn')
        combo = lda_x + vwn
        svwn = du.get_xc('svwn')
        assert np.allclose(combo(rho), svwn(rho), atol=1e-12)
        half = lda_x * 0.5
        assert np.allclose(half(rho), 0.5 * lda_x(rho))
        scaled = 0.5 * lda_x
        assert np.allclose(scaled(rho), half(rho))
        with pytest.raises(ValueError):
            du.get_xc('m06-2x')

    def test_uniform_gas_value(self):
        # e_x(rho=1) = -(3/4)(3/pi)^(1/3)  (f32 under the test config)
        val = float(du.get_xc('lda_x')(np.array([1.0]))[0])
        assert val == pytest.approx(-0.75 * (3 / np.pi) ** (1 / 3),
                                    abs=1e-6)


class TestGrids:
    def test_beckegrid_integrates_density(self):
        g = du.BeckeGrid(['H', 'H'], np.array([[0., 0, 0], [0, 0, 1.4]]),
                         n_radial=50, level=2)
        pts, w = g.get_rgrid(), g.get_dvolume()
        rho = np.zeros(len(pts))
        for c in ([0, 0, 0], [0, 0, 1.4]):
            d2 = ((pts - np.asarray(c)) ** 2).sum(axis=1)
            rho += np.pi ** -1.5 * np.exp(-d2)
        assert abs(float((w * rho).sum()) - 2.0) < 1e-4

    def test_lebedevgrid_and_truncated(self):
        rad = du.RadialGrid(60, 'chebyshev', 'treutlerm4')
        g = du.LebedevGrid(rad, prec=13)
        # integrates 4 pi r^2 exp(-r^2) over all space = pi^1.5
        r2 = (g.get_rgrid() ** 2).sum(axis=1)
        val = float((g.get_dvolume() * np.exp(-r2)).sum())
        assert abs(val - np.pi ** 1.5) < 1e-6
        tg = du.TruncatedLebedevGrid([rad[0:20], rad[20:60]], [7, 13])
        r2t = (tg.get_rgrid() ** 2).sum(axis=1)
        valt = float((tg.get_dvolume() * np.exp(-r2t)).sum())
        assert abs(valt - np.pi ** 1.5) < 1e-5
        pts, wts = du.LebedevLoader(13)
        assert wts.sum() == pytest.approx(1.0)

    def test_get_grid_factory(self):
        g = du.get_grid(['H'], np.zeros((1, 3)), grid=1)
        assert isinstance(g, du.BeckeGrid)
        g2 = du.get_predefined_grid(['H'], np.zeros((1, 3)), 'sg2')
        assert len(g2.get_dvolume()) > 0

    def test_pbc_beckegrid_folds_into_cell(self):
        latt = du.Lattice(np.eye(3) * 5.0)
        g = du.PBCBeckeGrid(['H'], np.array([[4.9, 0.1, 2.5]]), latt,
                            n_radial=20, level=1)
        pts = g.get_rgrid()
        frac = pts @ np.linalg.inv(latt.lattice_vectors())
        assert (frac >= -1e-12).all() and (frac < 1 + 1e-12).all()

    def test_dasgupta_trunc(self):
        tr = du.DasguptaTrunc(75)
        assert tr.to_truncate(8) and not tr.to_truncate(20)
        rad = du.RadialGrid(75)
        slices = tr.rad_slices(8, rad)
        assert slices[0].start == 0 and slices[-1].stop == 75
        assert len(tr.precs(8, rad)) == len(slices)


class TestEngines:
    def test_mol_and_hamilton(self):
        m = du.Mol('H 0 0 0; H 0 0 1.4', basis='sto-3g')
        assert m.get_nuclei_energy() == pytest.approx(1 / 1.4)
        assert m.atomzs == [1, 1]
        h = du.HamiltonCGTO(m)
        assert np.allclose(h.get_overlap(), m.system.S)
        C = np.linalg.cholesky(np.eye(2))
        D = h.ao_orb2dm(C, np.array([2.0, 0.0]))
        assert D[0, 0] == pytest.approx(2.0)

    def test_hf_ks_qccalc(self):
        import jax
        jax.config.update('jax_enable_x64', True)
        try:
            m = du.Mol('H 0 0 0; H 0 0 1.4')
            qc = du.HF(m).run()
            assert abs(float(qc.energy()) - -1.11671) < 1e-4
            dm = np.asarray(qc.aodm())
            S = np.asarray(m.system.S)
            assert float(np.trace(dm @ S)) == pytest.approx(2.0,
                                                            abs=1e-8)
            e_lda = float(du.KS(m, xc='lda').run().energy())
            assert e_lda < 0 and abs(e_lda - float(qc.energy())) > 1e-3
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_qccalc_requires_run(self):
        m = du.Mol('H 0 0 0; H 0 0 1.4')
        with pytest.raises(AssertionError):
            du.HF(m).energy()

    def test_orthogonalizer(self):
        S = np.array([[1.0, 0.3, 0.1], [0.3, 1.0, 0.2],
                      [0.1, 0.2, 1.0]])
        X = du.OrbitalOrthogonalizer(S).convert_ortho()
        assert np.allclose(X.T @ S @ X, np.eye(3), atol=1e-12)
        # near-singular overlap drops a dimension
        S2 = np.ones((2, 2)) + 1e-9 * np.eye(2)
        orth = du.OrbitalOrthogonalizer(S2, threshold=1e-6)
        assert orth.nao_out() == 1

    def test_dfmol_j_matrix(self):
        m = du.Mol('H 0 0 0; H 0 0 1.4')
        df = du.DFMol(m, du.DensityFitInfo('coulomb', None)).build()
        D = np.eye(2) * 0.5
        J_ref = np.einsum('ijkl,kl->ij', m.system.eri, D)
        assert np.abs(df.get_j(D) - J_ref).max() < 1e-2

    def test_config(self):
        assert du.config.THRESHOLD_MEMORY > 0

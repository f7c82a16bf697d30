"""Kohn-Sham SCF driver tests (reference models/dft/tests/test_hamilton.py
and utils/test/test_dftutils.py exercise the DQC path; here the in-repo
McMurchie-Davidson + Becke-grid + lax.scan SCF is validated against
literature STO-3G energies)."""
import numpy as np
import jax.numpy as jnp
import pytest

import jax

from deepchem_tpu.dft import (DFTSystem, KohnShamSCF, XCNNSCF, NNLDA,
                              molecular_grid)


@pytest.fixture(scope='module', autouse=True)
def x64_mode():
    # SCF on heavier atoms needs f64 conditioning; restore f32 after
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='module')
def h2():
    return DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]], units='bohr',
                     n_radial=40, grid_level=2)


def test_grid_normalization():
    pts, w = molecular_grid(['H'], np.zeros((1, 3)), n_radial=40, level=1)
    a = 0.8
    f = (2 * a / np.pi) ** 1.5 * np.exp(
        -2 * a * np.einsum('ga,ga->g', pts, pts))
    assert abs(float((w * f).sum()) - 1.0) < 1e-6


def test_h2_hartree_fock(h2):
    calc = KohnShamSCF(xc='hf', iterations=40).run(h2)
    # literature RHF/STO-3G at R=1.4 bohr
    assert abs(float(calc.energy()) - (-1.11671)) < 1e-4


def test_scf_overrides_low_matmul_precision(h2):
    """The SCF must pin true-f32 contractions regardless of the ambient
    matmul precision.  TPU runs f32 matmuls at bf16 MXU precision by
    default, which converged H2/STO-3G Hartree-Fock 8.8 mHa high
    (-1.10789 vs -1.11671) before scf.f32_matmuls scoped the precision
    to the quantum-chemistry entry points.  XLA:CPU computes f32
    regardless, so the energy alone cannot fail here — the load-bearing
    assertion is on the LOWERED IR: every dot in the decorated SCF body
    must carry HIGHEST precision even under an ambient bf16 default."""
    import re
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.dft.scf import f32_matmuls

    with jax.default_matmul_precision('bfloat16'):
        calc = KohnShamSCF(xc='hf', iterations=40).run(h2)
        e = float(calc.energy())
    assert abs(e - (-1.11671)) < 1e-4, e

    @f32_matmuls
    def body(a, b):
        return jnp.einsum('ij,jk->ik', a, b)

    a = jnp.ones((4, 4), jnp.float32)
    with jax.default_matmul_precision('bfloat16'):
        guarded = jax.jit(body).lower(a, a).as_text()
        ambient = jax.jit(
            lambda x, y: jnp.einsum('ij,jk->ik', x, y)).lower(a, a).as_text()
    dots = re.findall(r'precision = \[(\w+), (\w+)\]', guarded)
    assert dots and all(p == ('HIGHEST', 'HIGHEST') for p in dots), guarded
    assert 'HIGHEST' not in ambient  # the ambient default really is low


def test_h2_lda(h2):
    calc = KohnShamSCF(xc='lda', iterations=40).run(h2)
    e = float(calc.energy())
    # SVWN/STO-3G (grid-converged value -1.1212)
    assert abs(e - (-1.1212)) < 5e-3
    # density integrates to the electron count
    n_elec = float((np.asarray(h2.grid_weights)
                    * np.asarray(calc.density())).sum())
    assert abs(n_elec - 2.0) < 1e-3


def test_water_hartree_fock():
    ang = np.pi / 180 * 104.52
    r = 0.9572
    coords = np.array([[0, 0, 0], [r, 0, 0],
                       [r * np.cos(ang), r * np.sin(ang), 0]])
    sys = DFTSystem(['O', 'H', 'H'], coords, units='angstrom',
                    n_radial=30, grid_level=1)
    calc = KohnShamSCF(xc='hf', iterations=60).run(sys)
    # literature RHF/STO-3G -74.9629 Ha
    assert abs(float(calc.energy()) - (-74.9629)) < 1e-3


def test_nnxc_scf_gradient(h2):
    nn = NNLDA(hidden=(8,))
    params = nn.init(jax.random.PRNGKey(0), np.ones(4))
    scf = XCNNSCF(nn, params, iterations=15)
    efn = scf.energy_fn(h2)
    e, g = jax.value_and_grad(efn)(params)
    assert np.isfinite(float(e))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_unrestricted_h_atom():
    from deepchem_tpu.dft import DFTSystem, run_unrestricted
    h = DFTSystem(['H'], np.zeros((1, 3)), units='bohr', n_radial=40,
                  grid_level=1)
    # UHF/STO-3G hydrogen atom: -0.46658 Ha
    assert abs(run_unrestricted(h, 'hf') - (-0.46658)) < 1e-4


def test_dft_yaml_loader_atomization(tmp_path):
    from deepchem_tpu.data import DFTYamlLoader
    yml = tmp_path / 'entries.yaml'
    yml.write_text(
        "- e_type: 'ae'\n"
        "  true_val: '0.1835'\n"
        "  systems: [{'moldesc': 'H 0 0 0; H 0 0 1.4'}]\n")
    ds = DFTYamlLoader(n_radial=30, grid_level=1).create_dataset(str(yml))
    assert len(ds) == 1
    entry = ds.X[0]
    # HF atomization of H2: E(H2) - 2 E(H) = 0.1835 Ha
    assert abs(entry.compute('hf', iterations=40) - 0.1835) < 1e-3


class TestRound2DFT:
    """6-31G basis family, spin-polarized XC, hybrid functionals
    (VERDICT r1 item 6; reference utils/dft_utils libxc + loadbasis)."""

    def test_631g_rhf_literature_values(self):
        import jax
        jax.config.update('jax_enable_x64', True)
        try:
            from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
            s = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                          units='bohr', basis='6-31g')
            e = float(KohnShamSCF(xc='hf', iterations=60).run(s).energy())
            # literature RHF/6-31G H2 @ 1.4 bohr
            assert abs(e - (-1.12674)) < 2e-4, e
            import math
            r = 0.9572 * 1.8897261
            a = math.radians(104.52 / 2)
            coords = [[0, 0, 0],
                      [r * math.sin(a), 0, r * math.cos(a)],
                      [-r * math.sin(a), 0, r * math.cos(a)]]
            w = DFTSystem(['O', 'H', 'H'], coords, units='bohr',
                          basis='6-31g')
            ew = float(KohnShamSCF(xc='hf',
                                   iterations=80).run(w).energy())
            # literature RHF/6-31G H2O @ experimental geometry: -75.9840
            assert abs(ew - (-75.9840)) < 2e-3, ew
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_spin_polarized_lsda_h_atom(self):
        import jax
        import numpy as np
        jax.config.update('jax_enable_x64', True)
        try:
            from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
            h = DFTSystem(['H'], np.zeros((1, 3)), units='bohr',
                          basis='6-31g')
            e = run_unrestricted(h, 'lda', iterations=100)
            # literature SVWN H atom ~ -0.478 (basis-limited -0.476)
            assert abs(e - (-0.476)) < 5e-3, e
            e_pbe = run_unrestricted(h, 'pbe', iterations=100)
            assert abs(e_pbe - (-0.4974)) < 5e-3, e_pbe
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_hybrid_functionals(self):
        import jax
        jax.config.update('jax_enable_x64', True)
        try:
            from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
            s = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                          units='bohr', basis='6-31g')
            eb = float(KohnShamSCF(xc='b3lyp',
                                   iterations=80).run(s).energy())
            # grid-converged in-repo value (stable -1.16873 from
            # n_radial=50 to 160); cross-checked via atomization:
            # 2 E(H, UB3LYP/6-31G = -0.49687) - E(H2) = 109.8 kcal/mol,
            # the textbook H2 D_e.  (The previous -1.179 pin matched a
            # tail-contaminated quadrature — unscreened ~1e8-weight
            # far-grid points; see _RHO_SCREEN.)
            assert abs(eb - (-1.16873)) < 5e-4, eb
            ep = float(KohnShamSCF(xc='pbe0',
                                   iterations=80).run(s).energy())
            assert abs(ep - (-1.164)) < 5e-3, ep
        finally:
            jax.config.update('jax_enable_x64', False)


# -- round 3: meta-GGA (SCAN), entry types, training through the SCF -------

class TestScanFunctional:
    def test_uniform_gas_limits(self):
        """SCAN -> LDA exchange / PW92 correlation at s=0, alpha=1."""
        from deepchem_tpu.dft.functionals import (
            scan_exchange, scan_correlation, lda_exchange,
            _pw92_ec_unpol)
        rho = jnp.asarray([0.1, 0.5, 2.0])
        tau_unif = 0.3 * (3 * np.pi ** 2) ** (2 / 3) * rho ** (5 / 3)
        sig = jnp.zeros(3) + 1e-30
        ex = scan_exchange(rho, sig, tau_unif)
        assert float(jnp.abs(ex / lda_exchange(rho) - 1).max()) < 1e-5
        rs = (3 / (4 * np.pi * rho)) ** (1 / 3)
        ec = scan_correlation(rho, sig, tau_unif)
        assert float(jnp.abs(
            ec / (rho * _pw92_ec_unpol(rs)) - 1).max()) < 1e-5

    def test_spin_unpolarized_consistency(self):
        from deepchem_tpu.dft.functionals import (scan_exchange,
                                                  scan_correlation,
                                                  scan_xc_spin)
        rho = jnp.asarray([0.2, 1.0])
        sig = jnp.asarray([0.05, 0.4])
        tau = jnp.asarray([0.3, 2.0])
        e_cs = scan_exchange(rho, sig, tau) + scan_correlation(rho, sig,
                                                               tau)
        e_sp = scan_xc_spin(rho / 2, rho / 2, sig / 4, sig / 4, sig / 4,
                            tau / 2, tau / 2)
        assert float(jnp.abs(e_sp / e_cs - 1).max()) < 1e-5

    def test_h2_scan_binding_order(self):
        """H2 total energies: SCAN binds more than PBE more than LDA in
        this basis (and all land near the literature ballpark)."""
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        h2 = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                       units='bohr', n_radial=30)
        es = {xc: float(KohnShamSCF(xc, iterations=60).run(h2).energy())
              for xc in ('lda', 'pbe', 'scan')}
        assert es['scan'] < es['pbe'] < es['lda']
        assert -1.25 < es['scan'] < -1.05

    def test_scan_open_shell_h_atom(self):
        from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
        h = DFTSystem(['H'], np.zeros((1, 3)), units='bohr',
                      n_radial=30)
        e = run_unrestricted(h, 'scan')
        assert -0.52 < e < -0.43          # exact -0.5; STO-3G basis


class TestEntryTypes:
    def test_ae_reference_formula(self):
        """Explicit-system 'ae' uses sum(n_i E_i) - 2 E_0 (reference
        _EntryIE.get_val); LDA overbinds LiH as expected."""
        from deepchem_tpu.dft.scf import DFTEntry
        ae = DFTEntry('ae', 0.0919, [
            {'moldesc': 'Li 1.5070 0 0; H -1.5070 0 0'},
            {'moldesc': 'Li 0 0 0', 'spin': 1},
            {'moldesc': 'H 0 0 0', 'spin': 1}],
            n_radial=20, grid_level=0)
        v = ae.compute('lda', iterations=50)
        assert 0.05 < v < 0.25

    def test_ie_entry(self):
        from deepchem_tpu.dft.scf import DFTEntry
        ie = DFTEntry('ie', 0.534, [
            {'moldesc': 'N 0 0 0', 'spin': 3},
            {'moldesc': 'N 0 0 0', 'charge': 1, 'spin': 2}],
            n_radial=20, grid_level=0)
        v = ie.compute('lda', iterations=60)
        assert 0.3 < v < 0.7              # true 0.534 (NIST)

    def test_dm_and_dens_entries(self):
        from deepchem_tpu.dft.scf import DFTEntry
        dm = DFTEntry('dm', np.zeros((2, 2)),
                      [{'moldesc': 'H 0 0 0; H 0 0 1.4'}], n_radial=16)
        D = dm.compute('lda', iterations=40)
        S = dm.get_systems()[0].S
        assert abs(float(np.einsum('ij,ij->', D, S)) - 2.0) < 1e-3
        dn = DFTEntry('dens', np.zeros(4),
                      [{'moldesc': 'H 0 0 0; H 0 0 1.4'}], n_radial=16)
        rho = dn.compute('lda', iterations=40)
        w = dn.get_systems()[0].grid_weights
        assert abs(float((rho * w).sum()) - 2.0) < 0.05

    def test_yaml_loader_reference_format(self, tmp_path):
        """The reference's test_dftxcdata.yaml record format (spin,
        charge, basis keys) loads into DFTEntry objects."""
        from deepchem_tpu.data.loaders import DFTYamlLoader
        y = tmp_path / 'e.yaml'
        y.write_text(
            "- e_type: 'ae'\n"
            "  true_val: '0.09194410469'\n"
            "  systems: [{'moldesc': 'Li 1.5070 0 0; H -1.5070 0 0'},\n"
            "    {'moldesc': 'Li 0 0 0', 'spin': 1},\n"
            "    {'moldesc': 'H 0 0 0', 'spin': 1}]\n"
            "- e_type: 'ie'\n"
            "  true_val: '0.53411947056'\n"
            "  systems: [{'moldesc': 'N 0 0 0', 'spin': 3},\n"
            "    {'moldesc': 'N 0 0 0', 'charge': 1, 'spin': 2}]\n")
        ds = DFTYamlLoader(n_radial=16, grid_level=0).create_dataset(
            str(y))
        assert len(ds) == 2
        assert ds.X[0].e_type == 'ae' and ds.X[0].spins == [0, 1, 1]
        assert ds.X[1].system_descs[1]['charge'] == 1


class TestFitEntries:
    def test_trains_through_scf_mixed_types(self):
        """XCModel.fit_entries: gradient flows through every SCF
        iteration for ae (open-shell atoms!) + total-energy entries."""
        from deepchem_tpu.dft.scf import DFTEntry
        from deepchem_tpu.dft.xcmodel import XCModel
        ae = DFTEntry('ae', 0.0919, [
            {'moldesc': 'Li 1.5070 0 0; H -1.5070 0 0'},
            {'moldesc': 'Li 0 0 0', 'spin': 1},
            {'moldesc': 'H 0 0 0', 'spin': 1}],
            n_radial=12, grid_level=0)
        e = DFTEntry('e', -1.17,
                     [{'moldesc': 'H 0 0 0; H 0 0 1.4'}],
                     n_radial=12, grid_level=0)
        m = XCModel('lda_x')
        losses = m.fit_entries([ae, e], nb_epoch=25, iterations=12,
                               learning_rate=1e-3)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        preds = m.predict_entries([ae, e])
        assert np.isfinite(preds[0]) and np.isfinite(preds[1])

    def test_trains_on_density_profile(self):
        """'dens' entries: fit the functional to reproduce a target
        density profile (reference DensityProfile supervision).  LiH,
        not H2: the minimal-basis H2 density is fixed by symmetry
        (independent of the functional), so with DIIS convergence the
        H2 loss starts at the floor and nothing can train."""
        from deepchem_tpu.dft.scf import DFTEntry, DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.xcmodel import XCModel
        sys0 = DFTSystem(['Li', 'H'], [[0, 0, 0], [0, 0, 3.014]],
                         units='bohr', n_radial=12, grid_level=0)
        target = np.asarray(
            KohnShamSCF('lda', iterations=40).run(sys0).density())
        dn = DFTEntry('dens', target,
                      [{'moldesc': 'Li 0 0 0; H 0 0 3.014'}],
                      n_radial=12, grid_level=0)
        m = XCModel('lda_x')
        losses = m.fit_entries([dn], nb_epoch=20, iterations=12,
                               learning_rate=3e-3)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestPolarizedBases:
    """d/p polarization shells (6-31G*/6-31G**): the McMurchie-Davidson
    integrals are general in angular momentum, so the check is against
    LITERATURE Hartree-Fock energies for H2O at the standard geometry
    (Szabo-Ostlund-class values)."""

    GEOM = (['O', 'H', 'H'],
            [[0, 0, 0.1173], [0, 0.7572, -0.4692],
             [0, -0.7572, -0.4692]])

    @pytest.mark.parametrize('basis,nao,e_lit', [
        ('sto-3g', 7, -74.9630),
        ('6-31g', 13, -75.9840),
        ('6-31g*', 19, -76.0107),
        ('6-31g**', 25, -76.0236),
    ])
    def test_h2o_hf_literature(self, basis, nao, e_lit):
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        jax.config.update('jax_enable_x64', True)
        try:
            s = DFTSystem(*self.GEOM, units='angstrom', n_radial=40,
                          grid_level=1, basis=basis)
            assert s.S.shape[0] == nao
            E = float(KohnShamSCF('hf', iterations=80).run(s).energy())
            assert abs(E - e_lit) < 2e-3, f'{basis}: {E} vs {e_lit}'
        finally:
            jax.config.update('jax_enable_x64', False)


class TestNativeIntor:
    """The C++ McMurchie-Davidson engine (native/intor.cpp) must agree
    with the pure-Python integrals (dft/integrals.py) to machine
    precision — the Python path stays as the correctness oracle."""

    def _python_path(self):
        import deepchem_tpu.native as nat
        return (nat._intor_lib, nat._intor_tried)

    def _force_python(self):
        import deepchem_tpu.native as nat
        nat._intor_lib, nat._intor_tried = None, True

    def _restore(self, saved):
        import deepchem_tpu.native as nat
        nat._intor_lib, nat._intor_tried = saved

    def test_native_matches_python_sp_shells(self):
        from deepchem_tpu.dft import integrals as I
        from deepchem_tpu.dft.basis import build_basis
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('no native toolchain')
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.015]])
        basis = build_basis(['Li', 'H'], coords, basis='sto-3g')
        native = (I.overlap_matrix(basis), I.kinetic_matrix(basis),
                  I.nuclear_matrix(basis, [3, 1], coords),
                  I.eri_tensor(basis))
        saved = self._python_path()
        self._force_python()
        try:
            python = (I.overlap_matrix(basis), I.kinetic_matrix(basis),
                      I.nuclear_matrix(basis, [3, 1], coords),
                      I.eri_tensor(basis))
        finally:
            self._restore(saved)
        for a, b in zip(native, python):
            np.testing.assert_allclose(a, b, atol=1e-12)

    def test_native_matches_python_d_shells(self):
        """Hand-built basis with s/p/d functions on two centers covers
        every angular-momentum branch of the C++ recursions."""
        from deepchem_tpu.dft import integrals as I
        from deepchem_tpu.dft.basis import BasisFunction, primitive_norm
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('no native toolchain')
        A = np.array([0.0, 0.0, 0.0])
        B = np.array([0.3, -0.4, 1.1])
        basis = []
        for center, lmn, exps in [
                (A, (0, 0, 0), (1.3, 0.4)),
                (A, (2, 0, 0), (0.9,)),
                (A, (1, 1, 0), (0.9,)),
                (B, (1, 0, 0), (0.7, 0.2)),
                (B, (0, 1, 1), (0.5,))]:
            exps = np.asarray(exps)
            coefs = np.array([primitive_norm(a, lmn) for a in exps])
            bf = BasisFunction(center, lmn, exps, coefs)
            bf.normalize()
            basis.append(bf)
        charges, coords = [2, 1], np.stack([A, B])
        native = (I.overlap_matrix(basis), I.kinetic_matrix(basis),
                  I.nuclear_matrix(basis, charges, coords),
                  I.eri_tensor(basis))
        pts = np.random.RandomState(0).randn(20, 3)
        nphi, ndphi = I.ao_values(basis, pts)
        saved = self._python_path()
        self._force_python()
        try:
            python = (I.overlap_matrix(basis), I.kinetic_matrix(basis),
                      I.nuclear_matrix(basis, charges, coords),
                      I.eri_tensor(basis))
            pphi, pdphi = I.ao_values(basis, pts)
        finally:
            self._restore(saved)
        for a, b in zip(native, python):
            np.testing.assert_allclose(a, b, atol=1e-12)
        np.testing.assert_allclose(nphi, pphi, atol=1e-12)
        np.testing.assert_allclose(ndphi, pdphi, atol=1e-12)

    def test_boys_large_x_branch(self):
        """Distant centers push the Boys function into the asymptotic
        branch; energies must stay consistent with the Python oracle."""
        from deepchem_tpu.dft import integrals as I
        from deepchem_tpu.dft.basis import build_basis
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('no native toolchain')
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 14.0]])
        basis = build_basis(['H', 'H'], coords, basis='sto-3g')
        native = I.nuclear_matrix(basis, [1, 1], coords), \
            I.eri_tensor(basis)
        saved = self._python_path()
        self._force_python()
        try:
            python = I.nuclear_matrix(basis, [1, 1], coords), \
                I.eri_tensor(basis)
        finally:
            self._restore(saved)
        for a, b in zip(native, python):
            np.testing.assert_allclose(a, b, atol=1e-12)


class TestAnalyticGradients:
    """Analytic nuclear gradients (dft/gradients.py + native
    intor_grad_rhf): HF is quadrature-free and must match central finite
    differences to integral precision; DFT functionals carry the
    documented Becke-weight-derivative neglect (~1e-4 Ha/bohr)."""

    def _fd(self, symbols, coords, xc, basis, a, x, h=1e-4, iters=80):
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        vals = []
        for s in (h, -h):
            c = np.array(coords, dtype=np.float64)
            c[a, x] += s
            sys_ = DFTSystem(symbols, c, units='bohr', basis=basis,
                             n_radial=40, grid_level=1)
            vals.append(float(KohnShamSCF(xc, iterations=iters)
                              .run(sys_).energy()))
        return (vals[0] - vals[1]) / (2 * h)

    def _requires_native(self):
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('analytic gradients need the native engine')

    @pytest.mark.parametrize('xc,tol', [('hf', 1e-7), ('lda', 1e-7),
                                        ('pbe', 1e-7), ('scan', 1e-7),
                                        ('blyp', 1e-7)])
    def test_h2_gradient_vs_fd(self, xc, tol):
        self._requires_native()
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.gradients import scf_gradient
        jax.config.update('jax_enable_x64', True)
        try:
            coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.5]])
            sys_ = DFTSystem(['H', 'H'], coords, units='bohr',
                             basis='sto-3g', n_radial=40, grid_level=1)
            _, g = scf_gradient(sys_, xc=xc, iterations=80)
            fd = self._fd(['H', 'H'], coords, xc, 'sto-3g', 1, 2)
            assert abs(g[1, 2] - fd) < tol, (g[1, 2], fd)
            # translational invariance: forces sum to ~0
            assert np.abs(g.sum(axis=0)).max() < 1e-7
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_p_shell_gradient_vs_fd(self):
        """LiH exercises p-shell derivative integrals (l+1 = d in the
        shifted bra)."""
        self._requires_native()
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.gradients import scf_gradient
        jax.config.update('jax_enable_x64', True)
        try:
            coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.8]])
            sys_ = DFTSystem(['Li', 'H'], coords, units='bohr',
                             basis='sto-3g', n_radial=40, grid_level=1)
            _, g = scf_gradient(sys_, xc='hf', iterations=80)
            fd = self._fd(['Li', 'H'], coords, 'hf', 'sto-3g', 1, 2)
            assert abs(g[1, 2] - fd) < 1e-6, (g[1, 2], fd)
        finally:
            jax.config.update('jax_enable_x64', False)

    @pytest.mark.parametrize('xc', ['lda', 'pbe', 'blyp', 'b3lyp',
                                    'scan'])
    def test_restricted_unrestricted_consistency(self, xc):
        """On a closed shell, the unrestricted SCF with spin=0 must
        reproduce the restricted energy EXACTLY (same functional, same
        density screen, same per-spin clamp floors).  Regression for
        two tail bugs that silently poisoned atomization energies
        (molecules run restricted, free atoms unrestricted): unscreened
        ~1e8-weight far-tail grid points amplifying clamp-floor
        functional noise, and b88_exchange clamping sigma BEFORE the
        spin split (a 4x larger floor than the spin form)."""
        from deepchem_tpu.dft.scf import (DFTSystem, KohnShamSCF,
                                          run_unrestricted)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.5]],
                             units='bohr', basis='sto-3g',
                             n_radial=40, grid_level=1)
            ER = float(KohnShamSCF(xc, iterations=200).run(sys_)
                       .energy())
            EU = run_unrestricted(sys_, xc=xc, spin=0, iterations=200)
            assert abs(ER - EU) < 1e-9, (xc, ER, EU)
        finally:
            jax.config.update('jax_enable_x64', False)

    def _fd_unrestricted(self, symbols, coords, xc, basis, a, x, spin,
                         h=1e-3, iters=120):
        from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
        vals = []
        for s in (h, -h):
            c = np.array(coords, dtype=np.float64)
            c[a, x] += s
            sys_ = DFTSystem(symbols, c, units='bohr', basis=basis,
                             n_radial=40, grid_level=1)
            vals.append(float(run_unrestricted(sys_, xc=xc, spin=spin,
                                               iterations=iters)))
        return (vals[0] - vals[1]) / (2 * h)

    @pytest.mark.parametrize('xc', ['hf', 'lda', 'pbe', 'b3lyp'])
    def test_nh2_radical_gradient_vs_fd(self, xc):
        """Open-shell (doublet NH2) analytic gradient: spin-resolved
        exchange contraction (intor_grad_uhf) + spin-density XC
        coordinate term.  NH2 is the probe (not OH) because its hole
        sits in a non-degenerate b1 orbital — a linear radical's
        degenerate pi hole lets the SCF hop branches (px vs py) under
        the finite-difference displacement, whose energies differ by
        the angular grid's rotational anisotropy (~4e-5 Ha)."""
        self._requires_native()
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.gradients import scf_gradient_unrestricted
        jax.config.update('jax_enable_x64', True)
        try:
            coords = np.array([[0.0, 0.0, 0.0], [0.0, 1.5, 1.1],
                               [0.0, -1.5, 1.1]])
            sys_ = DFTSystem(['N', 'H', 'H'], coords, units='bohr',
                             basis='sto-3g', n_radial=40, grid_level=1)
            _, g = scf_gradient_unrestricted(sys_, xc=xc, spin=1,
                                             iterations=120)
            fd = self._fd_unrestricted(['N', 'H', 'H'], coords, xc,
                                       'sto-3g', 1, 1, 1, h=2e-4)
            assert abs(g[1, 1] - fd) < 1e-7, (xc, g[1, 1], fd)
            assert np.abs(g.sum(axis=0)).max() < 1e-7
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2_geometry_optimization_textbook(self):
        """HF/STO-3G H2 equilibrium bond: 1.346 bohr (Szabo-Ostlund)."""
        self._requires_native()
        from deepchem_tpu.dft.gradients import optimize_geometry
        jax.config.update('jax_enable_x64', True)
        try:
            e, c, n = optimize_geometry(
                ['H', 'H'], [[0, 0, 0], [0, 0, 0.9]], xc='hf',
                basis='sto-3g', n_radial=40, grid_level=1)
            r = np.linalg.norm(c[1] - c[0])
            assert abs(r - 1.346) < 3e-3, r
            assert e < -1.1174
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2o_geometry_optimization_textbook(self):
        """HF/STO-3G H2O: r(OH) = 0.989 A, HOH angle = 100.0 deg."""
        self._requires_native()
        from deepchem_tpu.dft.gradients import optimize_geometry
        jax.config.update('jax_enable_x64', True)
        try:
            e, c, n = optimize_geometry(
                ['O', 'H', 'H'],
                [[0, 0, 0.15], [0, 0.8, -0.5], [0, -0.8, -0.5]],
                xc='hf', basis='sto-3g', n_radial=40, grid_level=1)
            r1 = np.linalg.norm(c[1] - c[0]) * 0.52917721
            r2 = np.linalg.norm(c[2] - c[0]) * 0.52917721
            cosA = np.dot(c[1] - c[0], c[2] - c[0]) / (
                np.linalg.norm(c[1] - c[0]) * np.linalg.norm(c[2] - c[0]))
            angle = np.degrees(np.arccos(cosA))
            assert abs(r1 - 0.989) < 5e-3 and abs(r2 - 0.989) < 5e-3
            assert abs(angle - 100.0) < 0.5
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_ao_hessian_native_matches_numpy(self):
        from deepchem_tpu.dft.basis import build_basis
        from deepchem_tpu.dft.gradients import ao_hessian
        from deepchem_tpu.native import get_intor_lib
        import deepchem_tpu.native as nat
        if get_intor_lib() is None:
            pytest.skip('no native toolchain')
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.8]])
        basis = build_basis(['O', 'H'], coords, basis='sto-3g')
        pts = np.random.RandomState(1).randn(15, 3)
        native = ao_hessian(basis, pts)
        saved = nat._intor_lib, nat._intor_tried
        nat._intor_lib, nat._intor_tried = None, True
        try:
            python = ao_hessian(basis, pts)
        finally:
            nat._intor_lib, nat._intor_tried = saved
        np.testing.assert_allclose(native, python, atol=1e-12)

    def test_ao_hessian_is_fd_of_gradient(self):
        """Hessian columns = finite differences of ao_values gradients."""
        from deepchem_tpu.dft import integrals as I
        from deepchem_tpu.dft.basis import build_basis
        from deepchem_tpu.dft.gradients import ao_hessian, _HESS_IDX
        coords = np.array([[0.0, 0.0, 0.0]])
        basis = build_basis(['C'], coords, basis='sto-3g')
        pts = np.array([[0.3, -0.2, 0.5]])
        h = 1e-5
        H = ao_hessian(basis, pts)[0]
        for x in range(3):
            pp, pm = pts.copy(), pts.copy()
            pp[0, x] += h
            pm[0, x] -= h
            _, dp = I.ao_values(basis, pp)
            _, dm = I.ao_values(basis, pm)
            fd = (dp[0] - dm[0]) / (2 * h)        # [3, nbf]
            for y in range(3):
                np.testing.assert_allclose(
                    H[_HESS_IDX[(x, y)]], fd[y], atol=1e-6)


class TestPostHF:
    """MP2 / 2-electron FCI / electric properties (dft/posthf.py),
    validated against closed forms, the exact 2e FCI oracle, and
    independent finite-field routes."""

    def _h2(self):
        from deepchem_tpu.dft.scf import DFTSystem
        return DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                         units='bohr', n_radial=12, grid_level=0)

    def test_mp2_closed_form_h2(self):
        """Minimal-basis H2 has ONE double excitation: E2 = K^2 /
        (2 (e_g - e_u)) with K = (gu|gu) — MP2 must equal it exactly."""
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.posthf import mp2_energy, _mo_coeffs
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2()
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            _, corr = mp2_energy(sys_, calc)
            C, mo_e = _mo_coeffs(sys_, calc)
            eri_mo = np.einsum('pi,qa,rj,sb,pqrs->iajb', C, C, C, C,
                               sys_.eri, optimize=True)
            K = eri_mo[0, 1, 0, 1]
            closed = K * K / (2.0 * (mo_e[0] - mo_e[1]))
            assert abs(corr - closed) < 1e-12
            assert corr < 0
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_fci_h2_literature_and_bounds(self):
        """H2/STO-3G FCI at R = 1.4 bohr is the Szabo-Ostlund textbook
        value -1.13728 Ha; FCI lower-bounds MP2 which lower-bounds HF."""
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.posthf import mp2_energy, fci_2e_energy
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2()
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            e_hf = float(calc.energy())
            e_mp2, _ = mp2_energy(sys_, calc)
            e_fci = fci_2e_energy(sys_, calc)
            assert abs(e_fci - (-1.137276)) < 2e-5
            assert e_hf > e_mp2 > e_fci - 1e-12
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2o_dipole_two_routes(self):
        """Dipole via Tr(D mu) must equal -dE/dF (finite field), and the
        magnitude must sit at the known HF/STO-3G value ~1.71-1.73 D."""
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.posthf import (dipole_moment,
                                             energy_in_field)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(
                ['O', 'H', 'H'],
                [[0, 0, 0.1173], [0, 0.7572, -0.4692],
                 [0, -0.7572, -0.4692]], units='angstrom',
                n_radial=12, grid_level=0)
            mu = dipole_moment(sys_, xc='hf', iterations=100)
            h = 2e-3
            ep = energy_in_field(sys_, [0, 0, h], iterations=120)
            em = energy_in_field(sys_, [0, 0, -h], iterations=120)
            mu_ff = -(ep - em) / (2 * h)
            assert abs(mu[2] - mu_ff) < 1e-4
            debye = abs(mu[2]) * 2.5417464
            assert 1.65 < debye < 1.80
            # symmetry: x/y components vanish
            assert abs(mu[0]) < 1e-8 and abs(mu[1]) < 1e-8
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_mulliken_charges(self):
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.posthf import mulliken_charges
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(
                ['O', 'H', 'H'],
                [[0, 0, 0.1173], [0, 0.7572, -0.4692],
                 [0, -0.7572, -0.4692]], units='angstrom',
                n_radial=12, grid_level=0)
            q = mulliken_charges(sys_, xc='hf', iterations=100)
            assert abs(q.sum()) < 1e-10          # neutral molecule
            assert q[0] < -0.2                   # O pulls density
            assert q[1] > 0 and q[2] > 0
            np.testing.assert_allclose(q[1], q[2], atol=1e-8)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2_polarizability(self):
        """Symmetry structure: alpha diagonal in the bond frame with
        alpha_zz > alpha_xx = alpha_yy > 0 (H2 along z).  STO-3G has no
        p functions so its perpendicular response is exactly zero — the
        test runs in 6-31G** where the H p shells make it physical."""
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.posthf import polarizability
        jax.config.update('jax_enable_x64', True)
        try:
            a0 = polarizability(self._h2(), xc='hf')
            assert a0[2, 2] > 0 and abs(a0[0, 0]) < 1e-8  # minimal basis
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                             units='bohr', basis='6-31g**',
                             n_radial=12, grid_level=0)
            a = polarizability(sys_, xc='hf')
            assert a[2, 2] > a[0, 0] > 0
            np.testing.assert_allclose(a[0, 0], a[1, 1], atol=1e-6)
            off = a - np.diag(np.diag(a))
            assert np.abs(off).max() < 1e-6
        finally:
            jax.config.update('jax_enable_x64', False)


class TestDIIS:
    """Pulay DIIS inside the lax.scan (static ring buffer, stop-grad
    coefficient solve): convergence acceleration without changing the
    fixed point, restricted and unrestricted."""

    def test_restricted_acceleration(self):
        from deepchem_tpu.dft.scf import DFTSystem, scf_loop
        jax.config.update('jax_enable_x64', True)
        try:
            s = DFTSystem(['O', 'H', 'H'],
                          [[0, 0, 0.1173], [0, 0.7572, -0.4692],
                           [0, -0.7572, -0.4692]], units='angstrom',
                          n_radial=12, grid_level=0)
            args = (jnp.asarray(s.T + s.V), jnp.asarray(s.S_invsqrt),
                    jnp.asarray(s.eri), s.n_elec // 2)
            kw = dict(hf_exchange=1.0, phi=jnp.asarray(s.phi),
                      dphi=jnp.asarray(s.dphi),
                      weights=jnp.asarray(s.grid_weights))
            e15, _, _ = scf_loop(*args, iterations=15, diis=True, **kw)
            e_ref, _, _ = scf_loop(*args, iterations=120, diis=False,
                                   **kw)
            e15_mix, _, _ = scf_loop(*args, iterations=15, diis=False,
                                     **kw)
            assert abs(float(e15) - float(e_ref)) < 1e-7
            assert abs(float(e15_mix) - float(e_ref)) > 1e-5
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_unrestricted_acceleration(self):
        from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
        jax.config.update('jax_enable_x64', True)
        try:
            s = DFTSystem(['N'], np.zeros((1, 3)), units='bohr',
                          n_radial=12, grid_level=0)
            e30 = run_unrestricted(s, 'lda', iterations=30)
            e200 = run_unrestricted(s, 'lda', iterations=200,
                                    mixing=0.3)
            assert abs(e30 - e200) < 1e-7
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_diis_differentiable_f32(self):
        """Gradient of the converged energy w.r.t. a functional scale
        parameter stays finite through DIIS in default f32 (the
        round-3 NaN regression this guards: solve backward on the
        near-singular converged B matrix)."""
        from deepchem_tpu.dft.scf import DFTSystem, scf_loop
        from deepchem_tpu.dft.functionals import lda_xc
        s = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                      units='bohr', n_radial=12, grid_level=0)

        def energy(scale):
            E, _, _ = scf_loop(
                jnp.asarray(s.T + s.V), jnp.asarray(s.S_invsqrt),
                jnp.asarray(s.eri), 1,
                exc_fn=lambda rho: scale * lda_xc(rho),
                phi=jnp.asarray(s.phi), dphi=jnp.asarray(s.dphi),
                weights=jnp.asarray(s.grid_weights), iterations=15)
            return E

        g = jax.grad(energy)(jnp.asarray(1.0, jnp.float32))
        assert np.isfinite(float(g))
        # FD cross-check (f32 -> loose)
        h = 1e-2
        fd = (float(energy(jnp.asarray(1.0 + h)))
              - float(energy(jnp.asarray(1.0 - h)))) / (2 * h)
        assert abs(float(g) - fd) < 5e-3 * max(1.0, abs(fd))


class TestFrequencies:
    """Harmonic vibrational analysis: seminumerical Hessian from the
    analytic gradients, cross-validated against an independent 1D
    energy second difference and the classic HF/STO-3G literature
    frequencies."""

    def test_h2_frequency_two_routes(self):
        from deepchem_tpu.dft.gradients import (optimize_geometry,
                                                harmonic_frequencies)
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('needs native engine')
        jax.config.update('jax_enable_x64', True)
        try:
            e, c, _ = optimize_geometry(
                ['H', 'H'], [[0, 0, 0], [0, 0, 0.75]], xc='hf',
                basis='sto-3g', tol=1e-6, n_radial=20, grid_level=0)
            f, V = harmonic_frequencies(['H', 'H'], c, xc='hf',
                                        basis='sto-3g', n_radial=20,
                                        grid_level=0)
            # 5 near-zero trans/rot residuals + one real stretch
            assert np.abs(f[:5]).max() < 50.0
            # independent route: 1D FD of E(r) with the reduced mass
            r0 = np.linalg.norm(c[1] - c[0])
            h = 1e-3

            def E(r):
                s = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, r]],
                              units='bohr', n_radial=20, grid_level=0)
                return float(KohnShamSCF('hf', iterations=80)
                             .run(s).energy())

            k = (E(r0 + h) - 2 * E(r0) + E(r0 - h)) / h ** 2
            mu = 1.00782503 / 2
            f1d = np.sqrt(k / mu) * 5140.4871
            assert abs(f[-1] - f1d) < 2.0, (f[-1], f1d)
            # classic HF/STO-3G H2 harmonic stretch ~5481 cm^-1
            assert abs(f[-1] - 5481.0) < 25.0
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2o_frequencies_literature(self):
        """HF/STO-3G H2O harmonic frequencies: bend ~2170, symmetric
        stretch ~4140, asymmetric stretch ~4391 cm^-1 (classic Pople
        values); 6 trans/rot residuals near zero."""
        from deepchem_tpu.dft.gradients import (optimize_geometry,
                                                harmonic_frequencies)
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('needs native engine')
        jax.config.update('jax_enable_x64', True)
        try:
            e, c, _ = optimize_geometry(
                ['O', 'H', 'H'],
                [[0, 0, 0.15], [0, 0.8, -0.5], [0, -0.8, -0.5]],
                xc='hf', basis='sto-3g', tol=3e-5, n_radial=40,
                grid_level=1)
            f, V = harmonic_frequencies(['O', 'H', 'H'], c, xc='hf',
                                        basis='sto-3g', n_radial=40,
                                        grid_level=1)
            assert np.abs(f[:6]).max() < 60.0
            vib = f[6:]
            assert abs(vib[0] - 2170.0) < 30.0
            assert abs(vib[1] - 4140.0) < 40.0
            assert abs(vib[2] - 4391.0) < 40.0
        finally:
            jax.config.update('jax_enable_x64', False)


class TestDensityFitting:
    """RI-J density fitting (dft/df.py + native 3c/2c integrals):
    reference utils/dft_utils/df parity, O(n^2 m) memory instead of
    O(n^4)."""

    def _needs_native(self):
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('needs native engine')

    def test_3c_2c_vs_python_zero_exponent_oracle(self):
        """(ij|P) and (P|Q) equal the Python _eri_prim evaluated with a
        zero-exponent dummy fourth function."""
        self._needs_native()
        from deepchem_tpu.dft.basis import BasisFunction, primitive_norm
        from deepchem_tpu.dft.df import ri_tensors
        from deepchem_tpu.dft.integrals import _eri_prim
        A = np.array([0., 0., 0.])
        B = np.array([0., 0., 4.0])
        C = np.array([2.5, 0., 2.0])

        def bf(center, lmn, exps):
            exps = np.asarray(exps, float)
            c = np.array([primitive_norm(a, lmn) for a in exps])
            b = BasisFunction(center, lmn, exps, c)
            b.normalize()
            return b

        basis = [bf(A, (0, 0, 0), (1.2, 0.3)), bf(A, (1, 0, 0), (0.8,)),
                 bf(B, (0, 0, 1), (0.6,))]
        aux = [bf(C, (0, 0, 0), (0.9,)), bf(C, (2, 0, 0), (0.7,)),
               bf(A, (1, 1, 1), (1.1,))]
        B3, V2 = ri_tensors(basis, aux)

        def eri3(bi, bj, bp):
            val = 0.0
            for a, ca in zip(bi.exps, bi.coefs):
                for b, cb in zip(bj.exps, bj.coefs):
                    for c, cc in zip(bp.exps, bp.coefs):
                        val += ca * cb * cc * _eri_prim(
                            a, bi.lmn, bi.center, b, bj.lmn, bj.center,
                            c, bp.lmn, bp.center, 0.0, (0, 0, 0),
                            bp.center)
            return val

        for i in range(3):
            for j in range(3):
                for p in range(3):
                    assert abs(eri3(basis[i], basis[j], aux[p])
                               - B3[i, j, p]) < 1e-12

    def test_ri_scf_matches_exact(self):
        """Full RI-J SCF close to the exact-ERI SCF on H2O (PBE).
        Measured: 0.14 kcal/mol in 6-31G, 0.001 in 6-31G** (the
        polarized orbital basis widens the auto-generated aux ladders);
        benzene PBE/6-31G measures 0.33 kcal/mol at 30 MB vs the 152 MB
        exact tensor."""
        self._needs_native()
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        jax.config.update('jax_enable_x64', True)
        try:
            geom = (['O', 'H', 'H'],
                    [[0, 0, 0.1173], [0, 0.7572, -0.4692],
                     [0, -0.7572, -0.4692]])
            s = DFTSystem(*geom, units='angstrom', basis='6-31g',
                          n_radial=20, grid_level=0)
            e_ex = float(KohnShamSCF('pbe', iterations=40)
                         .run(s).energy())
            s_ri = DFTSystem(*geom, units='angstrom', basis='6-31g',
                             n_radial=20, grid_level=0,
                             density_fit=True)
            assert s_ri.eri.ndim == 3          # whitened factors
            e_ri = float(KohnShamSCF('pbe', iterations=40)
                         .run(s_ri).energy())
            assert abs(e_ex - e_ri) * 627.5 < 0.25, \
                (e_ex, e_ri, (e_ex - e_ri) * 627.5)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_hybrid_with_ri_raises(self):
        self._needs_native()
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        s = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                      units='bohr', n_radial=12, grid_level=0,
                      density_fit=True)
        with pytest.raises(ValueError, match='RI-J'):
            KohnShamSCF('hf', iterations=10).run(s)

    def test_j_energy_error_second_order(self):
        """Coulomb-metric fitting: the J-energy error must be tiny and
        NEGATIVE-semidefinite-ish (fitted self-repulsion <= exact)."""
        self._needs_native()
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.df import ri_fit, ri_j, exact_j
        s = DFTSystem(['Li', 'H'], [[0, 0, 0], [0, 0, 3.015]],
                      units='bohr', n_radial=12, grid_level=0)
        calc = KohnShamSCF('lda', iterations=40).run(s)
        D = np.asarray(calc.D, dtype=np.float64)
        Bw, aux = ri_fit(s.basis)
        dE = 0.5 * float(np.sum(D * (exact_j(s.eri, D) - ri_j(Bw, D))))
        assert dE >= -1e-10          # variational from below
        assert dE < 1e-4


class TestTDA:
    """CIS / TDA-TDDFT excited states (dft/tddft.py): the XC kernel is
    an autodiff Hessian-vector product of the quadrature Exc — pinned
    against exact closed forms and an independently hand-coded LDA
    kernel."""

    def _h2(self):
        from deepchem_tpu.dft.scf import DFTSystem
        return DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                         units='bohr', basis='sto-3g', n_radial=20,
                         grid_level=0)

    def test_cis_closed_forms_h2(self):
        """Minimal-basis H2 has one occupied and one virtual orbital:
        singlet w = de + 2(ia|ia) - (ii|aa), triplet w = de - (ii|aa)
        exactly."""
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.tddft import (cis_excitations,
                                            _ks_mo_coeffs)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2()
            rs = cis_excitations(sys_, nstates=1)
            rt = cis_excitations(sys_, nstates=1, triplet=True)
            solver = KohnShamSCF('hf', iterations=100)
            calc = solver.run(sys_)
            C, mo_e = _ks_mo_coeffs(sys_, solver, np.asarray(calc.D))
            moeri = np.einsum('pqrs,pi,qj,rk,sl->ijkl', sys_.eri,
                              C, C, C, C)
            de = mo_e[1] - mo_e[0]
            w_s = de + 2 * moeri[0, 1, 0, 1] - moeri[0, 0, 1, 1]
            w_t = de - moeri[0, 0, 1, 1]
            assert abs(rs.energies[0] - w_s) < 1e-12
            assert abs(rt.energies[0] - w_t) < 1e-12
            # the sigma_u <- sigma_g transition is dipole-allowed
            assert rs.oscillator_strengths[0] > 0.5
            assert rt.oscillator_strengths[0] == 0.0
            assert rt.energies[0] < rs.energies[0]
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_autodiff_kernel_equals_hand_lda_fxc(self):
        """The HVP kernel must equal the textbook LDA f_xc quadrature
        kernel (f = d2(rho e_xc)/drho2) contracted with the transition
        density — written out independently here."""
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.tddft import (tda_excitations,
                                            _ks_mo_coeffs)
        from deepchem_tpu.dft.functionals import lda_xc
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2()
            res = tda_excitations(sys_, xc='lda', nstates=1)
            solver = KohnShamSCF('lda', iterations=200)
            calc = solver.run(sys_)
            D = np.asarray(calc.D)
            C, moe = _ks_mo_coeffs(sys_, solver, D)
            phi, wts = sys_.phi, sys_.grid_weights
            rho = np.einsum('ij,gi,gj->g', D, phi, phi)
            f2 = jax.vmap(jax.grad(jax.grad(lambda r: lda_xc(r))))(
                jnp.asarray(rho))
            f2 = np.where(rho > 1e-10, np.asarray(f2), 0.0)
            pia = (np.einsum('gm,m->g', phi, C[:, 0])
                   * np.einsum('gm,m->g', phi, C[:, 1]))
            kxc = 2.0 * np.sum(wts * f2 * pia * pia)
            w_hand = (moe[1] - moe[0] + kxc
                      + 2 * np.einsum('pqrs,p,q,r,s->', sys_.eri,
                                      C[:, 0], C[:, 1], C[:, 0],
                                      C[:, 1]))
            assert abs(res.energies[0] - w_hand) < 1e-12
        finally:
            jax.config.update('jax_enable_x64', False)

    @pytest.mark.parametrize('xc', ['pbe', 'b3lyp'])
    def test_triplet_below_singlet(self, xc):
        """Hund-rule ordering holds for every kernel (exchange
        integrals are positive)."""
        from deepchem_tpu.dft.tddft import tda_excitations
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2()
            s = tda_excitations(sys_, xc=xc, nstates=1)
            t = tda_excitations(sys_, xc=xc, nstates=1, triplet=True)
            assert t.energies[0] < s.energies[0]
            assert t.energies[0] > 0.1        # bound, not collapsed
        finally:
            jax.config.update('jax_enable_x64', False)


class TestSecondRow:
    """Ne + Na-Ar STO-3G built from in-repo derived data
    (scripts/derive_sto3g.py): universal 3-Gaussian fits that reproduce
    the published 1s/2sp sets to 7 decimals, and variational best-atom
    scale factors.  Validated variationally (atomic energies above the
    numerical HF limits by the canonical STO-3G margin) and molecularly
    (HCl/H2S geometries near the standard-basis results)."""

    def test_atomic_energies_variational_and_pinned(self):
        from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
        # (element, derived E_UHF, numerical HF limit)
        cases = [('Ne', -126.606919, -128.547),
                 ('S', -393.203753, -397.505),
                 ('Cl', -454.581935, -459.482)]
        for sym, e_pin, e_limit in cases:
            sys_ = DFTSystem([sym], np.zeros((1, 3)), units='bohr',
                             basis='sto-3g', n_radial=40, grid_level=1)
            e = run_unrestricted(sys_, 'hf', iterations=200)
            assert abs(e - e_pin) < 1e-4, (sym, e)
            assert e > e_limit                    # variational bound
            assert e < e_limit + 6.0              # sane STO-3G margin

    def test_hcl_geometry_optimization(self):
        from deepchem_tpu.native import get_intor_lib
        if get_intor_lib() is None:
            pytest.skip('needs the native engine')
        from deepchem_tpu.dft.gradients import optimize_geometry
        e, c, n = optimize_geometry(['Cl', 'H'], [[0, 0, 0],
                                                  [0, 0, 1.3]],
                                    xc='hf', basis='sto-3g',
                                    n_radial=50, grid_level=1)
        r = np.linalg.norm(c[1] - c[0]) * 0.52917721
        # standard-basis STO-3G gives 1.313 A (exp 1.275); best-atom
        # valence exponents land a hair shorter
        assert abs(r - 1.304) < 2e-2, r
        assert e < -455.17

    def test_p_block_spin_defaults(self):
        """run_unrestricted auto-selects the Hund ground-state spin for
        second-row atoms (P quartet, S triplet, ...)."""
        from deepchem_tpu.dft.scf import _ATOM_SPIN
        assert [_ATOM_SPIN[z] for z in range(10, 19)] == \
            [0, 1, 0, 1, 2, 3, 2, 1, 0]


class TestRangeSeparated:
    """Range-separated hybrids: erf-attenuated ERIs in the native
    engine (F_m -> s^{m+1/2} F_m(sT), one alpha substitution in the
    Hermite R recursion) + LC-LSDA (short-range LDA exchange via the
    closed-form attenuation factor, 100% long-range exact exchange)."""

    def test_erf_eri_native_vs_oracle_and_limits(self):
        from deepchem_tpu.dft.basis import build_basis
        from deepchem_tpu.dft import integrals as I
        from deepchem_tpu.dft.integrals import _eri_prim
        import deepchem_tpu.native as nat
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.8]])
        basis = build_basis(['O', 'H'], coords, basis='6-31g*')
        omega = 0.33
        native = I.eri_tensor(basis, omega=omega)
        if nat.get_intor_lib() is not None:
            # spot-pin the native values against the Python MD oracle
            # (s/p/d shells)
            def contracted(i, j, k, l):
                b = [basis[x] for x in (i, j, k, l)]
                v = 0.0
                for a, ca in zip(b[0].exps, b[0].coefs):
                    for bb, cb in zip(b[1].exps, b[1].coefs):
                        for c, cc in zip(b[2].exps, b[2].coefs):
                            for d, cd in zip(b[3].exps, b[3].coefs):
                                v += ca * cb * cc * cd * _eri_prim(
                                    a, b[0].lmn, b[0].center, bb,
                                    b[1].lmn, b[1].center, c, b[2].lmn,
                                    b[2].center, d, b[3].lmn,
                                    b[3].center, omega)
                return v
            for t in ((0, 0, 0, 0), (2, 3, 4, 5), (10, 11, 12, 13),
                      (16, 16, 16, 16), (7, 8, 9, 10)):
                assert abs(contracted(*t) - native[t]) < 1e-12
        # omega -> inf recovers the full 1/r12 kernel
        full = I.eri_tensor(basis)
        assert np.abs(I.eri_tensor(basis, omega=1e6) - full).max() \
            < 1e-9
        # omega -> 0: (ab|cd) -> (2 omega/sqrt(pi)) S_ab S_cd exactly
        bs = build_basis(['H', 'H'], coords, basis='sto-3g')
        S = I.overlap_matrix(bs)
        w0 = 1e-5
        pred = (2 * w0 / np.sqrt(np.pi)) * np.einsum('ij,kl->ijkl',
                                                     S, S)
        small = I.eri_tensor(bs, omega=w0)
        assert np.abs(small - pred).max() / pred.max() < 1e-8
        # the short-range remainder is a positive-definite kernel
        sr = I.eri_tensor(bs) - I.eri_tensor(bs, omega=0.4)
        assert (np.einsum('iijj->ij', sr) > 0).all()

    def test_sr_factor_limits(self):
        from deepchem_tpu.dft.functionals import _sr_factor
        jax.config.update('jax_enable_x64', True)
        try:
            a = jnp.asarray([1e-8, 0.1, 1.0, 49.0, 51.0, 1e4])
            F = np.asarray(_sr_factor(a))
            assert abs(F[0] - 1.0) < 1e-6          # full LDA at a=0
            assert np.all(np.diff(F) < 0)          # monotone decreasing
            assert abs(F[-1] - 1.0 / (36 * 1e8)) / F[-1] < 1e-3
            # exact/asymptotic branches agree at the switch point
            assert abs(F[3] - 1.0 / (36 * 49.0 ** 2)) / F[3] < 1e-2
            # the f32 path (TPU XCModel training) stays sane: its early
            # asymptotic switch (a > 2.5) avoids the f32 cancellation
            F32 = np.asarray(_sr_factor(jnp.asarray(
                [0.1, 1.0, 2.4, 2.6, 10.0], dtype=jnp.float32)))
            assert np.all(np.diff(F32) < 0)
            assert abs(F32[-1] - 1.0 / 3600.0) / F32[-1] < 1e-2
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_lc_lda_interpolates_lda_to_hfvwn(self):
        """omega -> 0 must give pure LDA (SR factor -> 1, LR kernel ->
        0); omega -> inf must give HF exchange + full VWN correlation;
        the physical omega sits between, and restricted equals
        unrestricted on a closed shell."""
        from deepchem_tpu.dft.scf import (DFTSystem, KohnShamSCF,
                                          run_unrestricted)
        from deepchem_tpu.dft.functionals import (lc_lda_xc,
                                                  lda_correlation_vwn)
        jax.config.update('jax_enable_x64', True)
        try:
            def lc(omega):
                s = KohnShamSCF('lc-lda', iterations=200)
                closed, spin = lc_lda_xc(omega)
                s.exc_fn, s.exc_fn_spin, s.omega = closed, spin, omega
                return s
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.5]],
                             units='bohr', basis='sto-3g',
                             n_radial=40, grid_level=1)
            E_lda = float(KohnShamSCF('lda', iterations=200)
                          .run(sys_).energy())
            hfc = KohnShamSCF('hf', iterations=200)
            hfc.exc_fn = lda_correlation_vwn
            hfc.use_sigma = False
            E_hfvwn = float(hfc.run(sys_).energy())
            E0 = float(lc(1e-4).run(sys_).energy())
            Einf = float(lc(1e4).run(sys_).energy())
            Emid = float(lc(0.40).run(sys_).energy())
            assert abs(E0 - E_lda) < 1e-5, (E0, E_lda)
            assert abs(Einf - E_hfvwn) < 1e-9, (Einf, E_hfvwn)
            lo, hi = sorted((E_lda, E_hfvwn))
            assert lo <= Emid <= hi
            EU = run_unrestricted(sys_, 'lc-lda', spin=0,
                                  iterations=200)
            ER = float(KohnShamSCF('lc-lda', iterations=200)
                       .run(sys_).energy())
            assert abs(ER - EU) < 1e-9
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_rs_gradient_guard(self):
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.gradients import scf_gradient
        sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                         units='bohr', basis='sto-3g', n_radial=20,
                         grid_level=0)
        with pytest.raises(NotImplementedError):
            scf_gradient(sys_, xc='lc-lda')

    def test_rs_tda_limits(self):
        """Range-separated TDA: the exact-exchange kernel block rides
        the LONG-RANGE (ij|ab) integrals.  omega -> 0 must reproduce
        TDA-LDA; omega -> inf must reproduce the (HF exchange + VWN)
        TDA exactly."""
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.tddft import tda_excitations
        from deepchem_tpu.dft.functionals import (lc_lda_xc,
                                                  lda_correlation_vwn)
        jax.config.update('jax_enable_x64', True)
        try:
            def lc(omega):
                s = KohnShamSCF('lc-lda', iterations=200)
                closed, spin = lc_lda_xc(omega)
                s.exc_fn, s.exc_fn_spin, s.omega = closed, spin, omega
                return s
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                             units='bohr', basis='sto-3g', n_radial=20,
                             grid_level=0)
            r0 = tda_excitations(sys_, solver=lc(1e-5), nstates=1)
            rl = tda_excitations(sys_, xc='lda', nstates=1)
            assert abs(r0.energies[0] - rl.energies[0]) < 1e-6
            rinf = tda_excitations(sys_, solver=lc(1e4), nstates=1)
            hfc = KohnShamSCF('hf', iterations=200)
            hfc.exc_fn = lda_correlation_vwn
            hfc.use_sigma = False
            rref = tda_excitations(sys_, solver=hfc, nstates=1)
            assert abs(rinf.energies[0] - rref.energies[0]) < 1e-10
        finally:
            jax.config.update('jax_enable_x64', False)


class TestCoupledCluster:
    """Determinant FCI + CCSD + CCSD(T) (dft/cc.py): the validation
    chain is self-contained — bitstring second quantization vs the
    independent closed-form 2e FCI, the CCSD 2-electron exactness
    theorem, MP2 as CCSD's first iteration, and the (T) correction's
    required behaviors."""

    def _h2(self, basis='sto-3g'):
        from deepchem_tpu.dft.scf import DFTSystem
        return DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                         units='bohr', basis=basis, n_radial=12,
                         grid_level=0)

    def test_general_fci_equals_2e_closed_form(self):
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.posthf import fci_2e_energy
        from deepchem_tpu.dft.cc import fci_energy
        jax.config.update('jax_enable_x64', True)
        try:
            for basis in ('sto-3g', '6-31g'):
                sys_ = self._h2(basis)
                calc = KohnShamSCF('hf', iterations=100).run(sys_)
                assert abs(fci_energy(sys_, calc)
                           - fci_2e_energy(sys_, calc)) < 1e-12
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_ccsd_exact_for_two_electrons(self):
        """CCSD contains all excitations a 2-electron system has, so
        it must equal FCI — in ANY basis; and (T) must vanish."""
        from deepchem_tpu.dft.scf import KohnShamSCF
        from deepchem_tpu.dft.cc import (fci_energy, ccsd_energy,
                                         ccsd_t_energy)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = self._h2('6-31g')
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            efci = fci_energy(sys_, calc)
            ecc, _ = ccsd_energy(sys_, calc)
            assert abs(ecc - efci) < 1e-9
            _, _, e_t = ccsd_t_energy(sys_, calc)
            assert abs(e_t) < 1e-12
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_lih_correlation_ladder(self):
        """4-electron LiH: HF > MP2 > CCSD > CCSD(T) >= FCI, with CCSD
        within 2e-5 of FCI and (T) shrinking the residual."""
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.posthf import mp2_energy
        from deepchem_tpu.dft.cc import (fci_energy, ccsd_energy,
                                         ccsd_t_energy)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['Li', 'H'], [[0, 0, 0], [0, 0, 3.0]],
                             units='bohr', n_radial=12, grid_level=0)
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            ehf = float(calc.energy())
            emp2, _ = mp2_energy(sys_, calc)
            eccsd, _ = ccsd_energy(sys_, calc)
            et, _, e_t = ccsd_t_energy(sys_, calc)
            efci = fci_energy(sys_, calc)
            assert ehf > emp2 > eccsd > efci - 1e-12
            assert abs(eccsd - efci) < 2e-5
            assert abs(et - efci) < abs(eccsd - efci)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2o_ccsd_vs_fci(self):
        """10-electron water, 441-determinant FCI space: CCSD must
        recover > 99.5% of the exact correlation energy and (T) must
        close over half of the remainder."""
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.cc import (fci_energy, ccsd_energy,
                                         ccsd_t_energy)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(
                ['O', 'H', 'H'],
                [[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692],
                 [0.0, -0.7572, -0.4692]],
                basis='sto-3g', n_radial=12, grid_level=0)
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            ehf = float(calc.energy())
            eccsd, corr = ccsd_energy(sys_, calc)
            et, _, e_t = ccsd_t_energy(sys_, calc)
            efci = fci_energy(sys_, calc)
            exact_corr = efci - ehf
            assert corr / exact_corr > 0.995
            assert abs(et - efci) < 0.55 * abs(eccsd - efci)
        finally:
            jax.config.update('jax_enable_x64', False)


class TestUHFStability:
    def test_nh2_uhf_not_trapped(self):
        """Multi-seed UHF regression: from the default symmetry-broken
        seed alone, NH2/STO-3G converges aufbau-self-consistently to an
        EXCITED SCF solution at -54.7425 — 81 mHa above a plain same-
        spatial-orbital determinant (exposed by the determinant-FCI
        oracle: the implied 'correlation' was 2.5x water's, impossible
        for a 98.6%-single-reference state).  The stable wrapper's
        Fock-aufbau re-seeding must find the real solution."""
        from deepchem_tpu.dft.scf import DFTSystem, run_unrestricted
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['N', 'H', 'H'],
                             [[0, 0, 0], [0, 1.5, 1.1], [0, -1.5, 1.1]],
                             units='bohr', basis='sto-3g', n_radial=12,
                             grid_level=0)
            e = run_unrestricted(sys_, 'hf', spin=1, iterations=200)
            assert e < -54.82, e        # trapped branch sits at -54.74
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_nh2_uccsd_near_fci(self):
        """With the stable UHF reference, NH2 UCCSD(T) sits within
        5e-5 Ha of the exact 735-determinant FCI."""
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.cc import (fci_energy, uccsd_energy,
                                         uccsd_t_energy, ump2_energy)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['N', 'H', 'H'],
                             [[0, 0, 0], [0, 1.5, 1.1], [0, -1.5, 1.1]],
                             units='bohr', basis='sto-3g', n_radial=12,
                             grid_level=0)
            efci = fci_energy(sys_, spin=1)
            eum, _ = ump2_energy(sys_, spin=1)
            euc, _ = uccsd_energy(sys_, spin=1)
            eut, _, _ = uccsd_t_energy(sys_, spin=1)
            assert eum > euc > efci - 1e-12
            assert abs(euc - efci) < 2e-4
            assert abs(eut - efci) < 5e-5
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_closed_shell_u_equals_r_correlation(self):
        """UMP2/UCCSD with spin=0 equal the restricted MP2/CCSD exactly
        on a closed shell."""
        from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
        from deepchem_tpu.dft.posthf import mp2_energy
        from deepchem_tpu.dft.cc import (ccsd_energy, ump2_energy,
                                         uccsd_energy)
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                             units='bohr', basis='6-31g', n_radial=12,
                             grid_level=0)
            calc = KohnShamSCF('hf', iterations=100).run(sys_)
            em, _ = mp2_energy(sys_, calc)
            eum, _ = ump2_energy(sys_, spin=0)
            ec, _ = ccsd_energy(sys_, calc)
            euc, _ = uccsd_energy(sys_, spin=0)
            assert abs(em - eum) < 1e-10
            assert abs(ec - euc) < 1e-10
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_h2_triplet_uccsd_equals_fci(self):
        """2 electrons in the Sz=1 sector: UCCSD must equal FCI."""
        from deepchem_tpu.dft.scf import DFTSystem
        from deepchem_tpu.dft.cc import fci_energy, uccsd_energy
        jax.config.update('jax_enable_x64', True)
        try:
            sys_ = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]],
                             units='bohr', basis='6-31g', n_radial=12,
                             grid_level=0)
            et, _ = uccsd_energy(sys_, spin=2)
            assert abs(et - fci_energy(sys_, spin=2)) < 1e-9
        finally:
            jax.config.update('jax_enable_x64', False)

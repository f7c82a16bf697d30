"""Periodic-boundary primitives (reference dft_utils lattice.py /
pbcintor.py / pbc gtoeval)."""
import numpy as np
import pytest

from deepchem_tpu.dft.basis import build_basis
from deepchem_tpu.dft.integrals import (ao_values, kinetic_matrix,
                                        overlap_matrix)
from deepchem_tpu.dft.pbc import (Lattice, PBCIntOption,
                                  get_default_kpts,
                                  get_default_options, pbc_eval_gto,
                                  pbc_kinetic, pbc_overlap)


class TestLattice:
    def test_cubic_invariants(self):
        latt = Lattice(np.eye(3))
        assert np.allclose(latt.lattice_vectors(), np.eye(3))
        assert np.allclose(latt.recip_vectors(), 2 * np.pi * np.eye(3))
        assert latt.volume() == pytest.approx(1.0)
        ls = latt.get_lattice_ls(1.0)
        # origin + 6 face neighbours, origin first (sorted by norm)
        assert ls.shape == (7, 3)
        assert np.allclose(ls[0], 0.0)
        assert np.allclose(np.linalg.norm(ls[1:], axis=1), 1.0)

    def test_recip_duality(self):
        rng = np.random.RandomState(0)
        a = np.eye(3) * 3.0 + rng.rand(3, 3) * 0.3
        latt = Lattice(a)
        # a_i . b_j = 2 pi delta_ij
        assert np.allclose(a @ latt.recip_vectors().T,
                           2 * np.pi * np.eye(3), atol=1e-12)
        assert latt.volume() == pytest.approx(abs(np.linalg.det(a)))

    def test_gvgrids_weights(self):
        latt = Lattice(np.eye(3) * 2.0)
        gv, w = latt.get_gvgrids(2 * np.pi)   # recip spacing is pi
        assert len(gv) == len(w) and len(gv) > 1
        assert np.allclose(w, (2 * np.pi) ** 3 / 8.0)
        assert (np.linalg.norm(gv, axis=1) <= 2 * np.pi + 1e-9).all()

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            Lattice(np.eye(2))


def test_pbc_options_and_kpts():
    assert get_default_options() == PBCIntOption()
    assert PBCIntOption.get_default({'precision': 1e-6}).precision \
        == 1e-6
    k = get_default_kpts(None)
    assert k.shape == (1, 3) and (k == 0).all()
    with pytest.raises(ValueError):
        get_default_kpts(np.zeros(3))


class TestPeriodicIntegrals:
    def test_isolated_limit(self):
        # a molecule in a huge cell: every periodic quantity must
        # reduce to its molecular value (images beyond the Gaussian
        # tail contribute nothing)
        basis = build_basis(['H', 'H'],
                            np.array([[0, 0, 0], [0, 0, 1.4]]))
        latt = Lattice(np.eye(3) * 40.0)
        assert np.allclose(pbc_overlap(basis, latt),
                           overlap_matrix(basis), atol=1e-12)
        assert np.allclose(pbc_kinetic(basis, latt),
                           kinetic_matrix(basis), atol=1e-12)
        pts = np.array([[0.3, -0.2, 0.7], [1.0, 1.0, 1.0]])
        phi, _ = ao_values(basis, pts)
        phi_pbc = pbc_eval_gto(basis, latt, pts)
        assert phi_pbc.shape == (1, 2, len(basis))
        assert np.allclose(phi_pbc[0], phi, atol=1e-12)

    def test_h_chain_images_enter(self):
        # 1D H chain, spacing 2 bohr: the Gamma overlap picks up left
        # and right neighbour images — check against an explicit
        # two-image sum with the molecular engine
        from deepchem_tpu.dft.pbc import _shifted
        basis = build_basis(['H'], np.zeros((1, 3)))
        a = np.diag([2.0, 30.0, 30.0])
        S = pbc_overlap(basis, Lattice(a))
        n = len(basis)
        # independent oracle: brute-force image sum far past any cutoff
        manual = overlap_matrix(basis).astype(float)
        for m in range(1, 26):
            for sgn in (1.0, -1.0):
                shift = np.array([2.0 * m * sgn, 0.0, 0.0])
                full = overlap_matrix(list(basis)
                                      + _shifted(basis, shift))
                manual += full[:n, n:]
        assert np.allclose(S, manual, atol=3e-8)   # precision=1e-8 sum
        # images genuinely contribute (periodic != molecular)
        assert abs(S[0, 0] - overlap_matrix(basis)[0, 0]) > 1e-3

    def test_translational_invariance(self):
        # shifting every center by a lattice vector changes nothing
        basis1 = build_basis(['H', 'H'],
                             np.array([[0, 0, 0], [0, 0, 1.4]]))
        basis2 = build_basis(['H', 'H'],
                             np.array([[3.0, 0, 0], [3.0, 0, 1.4]]))
        latt = Lattice(np.diag([3.0, 20.0, 20.0]))
        assert np.allclose(pbc_overlap(basis1, latt),
                           pbc_overlap(basis2, latt), atol=1e-10)

    def test_bloch_phase_periodicity(self):
        # phi_k(r + a) = e^{ik.a} phi_k(r) for any k (Bloch theorem)
        basis = build_basis(['H'], np.zeros((1, 3)))
        latt = Lattice(np.diag([2.0, 25.0, 25.0]))
        k = np.array([[0.3, 0.0, 0.0]])
        pts = np.array([[0.1, 0.2, -0.3]])
        a1 = np.array([2.0, 0.0, 0.0])
        f0 = pbc_eval_gto(basis, latt, pts, kpts=k)
        f1 = pbc_eval_gto(basis, latt, pts + a1, kpts=k)
        phase = np.exp(1j * (k @ a1))[0]
        assert np.allclose(f1, phase * f0, atol=1e-8)

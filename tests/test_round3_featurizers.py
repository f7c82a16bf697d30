"""Round-3 featurizer/utility gap closure: Gasteiger PEOE charges, the
noncovalent grid featurizers (reference grid_featurizers.py), neighbor
-list featurizers, AtomicConformation, BindingPocketFeaturizer,
DMPNNFeaturizer, HF vocabulary builder, and the newly-flattened utils.
"""

import numpy as np
import pytest

from deepchem_tpu.chem.smiles import mol_from_smiles

PDB_1JLD = '/root/reference/deepchem/dock/tests/1jld_protein.pdb'


def _with_conformer(smiles, offset=(0.0, 0.0, 0.0)):
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    mol = mol_from_smiles(smiles)
    mol.conformer = [tuple(x) for x in
                     np.asarray(embed_molecule_3d(mol))
                     + np.asarray(offset)]
    return mol


class TestGasteiger:
    def test_methane_matches_published_peoe(self):
        # Gasteiger & Marsili 1980 / RDKit: CH4 C = -0.0776, H = +0.0194
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        qh, qimp = compute_gasteiger_charges(mol_from_smiles('C'))
        assert qh[0] == pytest.approx(-0.0776, abs=2e-4)
        assert qimp[0] / 4 == pytest.approx(0.0194, abs=1e-4)

    def test_charge_conservation_and_symmetry(self):
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        for smi, total in [('CC(=O)O', 0.0), ('C[NH3+]', 1.0),
                           ('CC(=O)[O-]', -1.0), ('c1ccccc1', 0.0)]:
            qh, qimp = compute_gasteiger_charges(mol_from_smiles(smi))
            assert qh.sum() + qimp.sum() == pytest.approx(total, abs=1e-9)
        # benzene: all six carbons equivalent
        qh, _ = compute_gasteiger_charges(mol_from_smiles('c1ccccc1'))
        assert np.ptp(qh) < 1e-12

    def test_electronegativity_ordering(self):
        # O pulls more charge than N pulls more than C
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        qo, _ = compute_gasteiger_charges(mol_from_smiles('CO'))
        qn, _ = compute_gasteiger_charges(mol_from_smiles('CN'))
        assert qo[1] < qn[1] < 0


class TestGridFeaturizers:
    def setup_method(self, m):
        self.lig = _with_conformer('c1ccccc1C[NH3+]')
        self.prot = _with_conformer('c1ccccc1CC(=O)[O-]', (3.5, 0, 0))
        self.dp = (self.lig, self.prot)

    def test_charge_voxelizer_conserves_net_charge(self):
        from deepchem_tpu.feat import ChargeVoxelizer
        f = ChargeVoxelizer()._featurize(self.dp)
        assert f.shape == (16, 16, 16, 1)
        assert np.abs(f).sum() > 1.0            # deposits real charge
        assert f.sum() == pytest.approx(0.0, abs=0.01)   # +1 + -1

    def test_salt_bridge_voxelizer(self):
        from deepchem_tpu.feat import SaltBridgeVoxelizer
        f = SaltBridgeVoxelizer()._featurize(self.dp)
        assert f.shape == (16, 16, 16, 1)
        # ammonium vs carboxylate at 3.5 A must register, double-counted
        assert f.sum() >= 2

    def test_cation_pi_controlled_geometry(self):
        from deepchem_tpu.feat import CationPiVoxelizer
        benz = _with_conformer('c1ccccc1')
        ring = np.asarray(benz.conformer)
        center = ring.mean(0)
        _, _, vh = np.linalg.svd(ring - center)
        am = mol_from_smiles('[NH4+]')
        am.conformer = [tuple(center + 4.0 * vh[2])]
        f = CationPiVoxelizer()._featurize((am, benz))
        assert f.sum() == 1.0
        # rotate the cation into the ring plane: angle criterion kills it
        am.conformer = [tuple(center + 4.0 * vh[0])]
        f = CationPiVoxelizer()._featurize((am, benz))
        assert f.sum() == 0.0

    def test_pi_stack_parallel_rings(self):
        from deepchem_tpu.feat import PiStackVoxelizer
        b1 = _with_conformer('c1ccccc1')
        ring = np.asarray(b1.conformer)
        _, _, vh = np.linalg.svd(ring - ring.mean(0))
        b2 = mol_from_smiles('c1ccccc1')
        b2.conformer = [tuple(x) for x in ring + 3.6 * vh[2]]
        f = PiStackVoxelizer()._featurize((b1, b2))
        assert f.shape[-1] == 2
        assert f[..., 0].sum() > 0               # parallel channel fires
        assert f[..., 1].sum() == 0              # T-channel does not

    def test_hbond_counter_and_voxelizer(self):
        from deepchem_tpu.feat import (HydrogenBondCounter,
                                       HydrogenBondVoxelizer)
        counts = HydrogenBondCounter()._featurize(self.dp)
        assert counts.shape == (3,)
        vox = HydrogenBondVoxelizer()._featurize(self.dp)
        assert vox.shape == (16, 16, 16, 3)
        # each counted bond deposits at both endpoints (when in box)
        assert vox.sum() <= 2 * counts.sum()
        assert vox.reshape(-1, 3).sum(0)[counts > 0].sum() > 0


class TestNeighborLists:
    def test_single_molecule(self):
        from deepchem_tpu.feat import NeighborListAtomicCoordinates
        mol = _with_conformer('CCO')
        bohr, nl = NeighborListAtomicCoordinates(
            neighbor_cutoff=2.0)._featurize(mol)
        assert bohr.shape == (3, 3)
        # bonded chain: middle atom sees both ends
        assert set(nl[1]) == {0, 2}
        # bohr conversion
        ang = np.asarray(mol.conformer)
        assert np.allclose(bohr * 0.52917721092, ang, atol=1e-9)

    def test_complex_and_truncation(self):
        from deepchem_tpu.feat import NeighborListComplexAtomicCoordinates
        lig = _with_conformer('CCO')
        prot = _with_conformer('CCC', (2.0, 0, 0))
        coords, nl = NeighborListComplexAtomicCoordinates(
            neighbor_cutoff=3.0, max_num_neighbors=2)._featurize(
                (lig, prot))
        assert coords.shape == (6, 3)
        assert all(len(v) <= 2 for v in nl.values())

    def test_periodic_minimum_image(self):
        from deepchem_tpu.feat.complex_featurizers import \
            compute_neighbor_list_dict
        coords = np.array([[0.1, 0, 0], [9.9, 0, 0]])
        nl = compute_neighbor_list_dict(coords, 1.0, None,
                                        [10.0, 10.0, 10.0])
        assert nl == {0: [1], 1: [0]}
        assert compute_neighbor_list_dict(coords, 1.0, None) \
            == {0: [], 1: []}

    def test_validation(self):
        from deepchem_tpu.feat import NeighborListAtomicCoordinates
        with pytest.raises(ValueError):
            NeighborListAtomicCoordinates(neighbor_cutoff=-1)
        with pytest.raises(ValueError):
            NeighborListAtomicCoordinates(max_num_neighbors=0)


class TestAtomicConformation:
    def test_smiles_path(self):
        from deepchem_tpu.feat import AtomicConformationFeaturizer
        c = AtomicConformationFeaturizer().featurize(['CCO'])[0]
        assert c.num_atoms == 3
        assert list(c.atomic_number) == [6, 6, 8]
        assert c.positions.shape == (3, 3)
        assert c.partial_charge.sum() == pytest.approx(0.0, abs=1e-9)
        with pytest.raises(ValueError):
            c.get_property('nonexistent')

    def test_pdb_path(self):
        from deepchem_tpu.feat import AtomicConformationFeaturizer
        c = AtomicConformationFeaturizer().featurize([PDB_1JLD])[0]
        assert c.num_atoms == 3080
        assert (c.atomic_number == 16).sum() == 4      # 4 cysteine S


def test_binding_pocket_featurizer():
    from deepchem_tpu.feat import BindingPocketFeaturizer
    from deepchem_tpu.dock.binding_pocket import ConvexHullPocketFinder
    pockets = ConvexHullPocketFinder().find_pockets(PDB_1JLD)
    f = BindingPocketFeaturizer().featurize(PDB_1JLD, pockets)
    assert f.shape == (len(pockets), 24)
    assert f.sum() > 0


def test_dmpnn_featurizer_reference_shapes():
    # exact shapes from the reference's class doctest
    from deepchem_tpu.feat import DMPNNFeaturizer
    out = DMPNNFeaturizer().featurize(['C1=CC=CN=C1', 'C1CCC1'])
    g = out[0]
    assert g.num_nodes == 6
    assert g.node_features.shape == (6, 133)
    assert g.edge_features.shape == (12, 14)
    # adjacent (u->v, v->u) pairs — the DMPNN reverse-edge layout
    ei = g.edge_index
    assert np.all(ei[0, 0::2] == ei[1, 1::2])
    g2 = DMPNNFeaturizer(
        features_generators=['morgan']).featurize(['CCO'])[0]
    assert g2.global_features.shape == (2048,)


def test_hf_vocabulary_builder_roundtrip(tmp_path):
    from tokenizers import models, trainers
    from deepchem_tpu.feat import HuggingFaceVocabularyBuilder
    corpus = tmp_path / 'c.txt'
    corpus.write_text('CCO CCN c1ccccc1\nCC(=O)O CCO\n')
    vb = HuggingFaceVocabularyBuilder(
        models.BPE(unk_token='[UNK]'),
        trainers.BpeTrainer(vocab_size=30, special_tokens=['[UNK]']))
    vb.build([str(corpus)])
    f = tmp_path / 'v.json'
    vb.save(str(f))
    tok = HuggingFaceVocabularyBuilder.load(str(f))
    assert tok.vocab_size == 30
    assert len(tok.encode('CCO')) > 0


class TestNewUtils:
    def test_misc(self):
        from deepchem_tpu.utils import (indent, shape2str, Uniquifier,
                                        get_option, chunkify,
                                        gaussian_integral,
                                        get_floor_and_ceil)
        assert indent('a\nb', 2) == '  a\n  b'
        assert shape2str((1, 2)) == '(1, 2)'
        a, b = object(), object()
        u = Uniquifier([a, b, a])
        assert len(u.get_unique_objs()) == 2
        assert u.map_unique_objs([1, 2]) == [1, 2, 1]
        assert get_option('m', 'x', {'x': 5}) == 5
        with pytest.raises(ValueError):
            get_option('m', 'y', {'x': 5})
        chunks = list(chunkify(np.zeros((6, 2)), 0, 4))
        assert [c[0].shape[0] for c in chunks] == [2, 2, 2]
        # int_0^inf exp(-x^2) dx = sqrt(pi)/2
        assert float(gaussian_integral(0, 1.0)) == pytest.approx(
            np.sqrt(np.pi) / 2)
        # int_0^inf x exp(-x^2) dx = 1/2
        assert float(gaussian_integral(1, 1.0)) == pytest.approx(0.5)
        assert get_floor_and_ceil(2.5) == (2, 3)

    def test_attribute_utils(self):
        from deepchem_tpu.utils import get_attr, set_attr, del_attr

        class C:
            pass

        c = C()
        c.a = {'x': [10, 20]}
        assert get_attr(c, "a['x'][1]") == 20
        set_attr(c, "a['x'][0]", 99)
        assert c.a['x'][0] == 99
        set_attr(c, 'b', 7)
        assert c.b == 7
        del_attr(c, 'b')
        assert not hasattr(c, 'b')

    def test_tensor_separator_and_segments(self):
        import jax.numpy as jnp
        from deepchem_tpu.utils import (TensorNonTensorSeparator,
                                        unsorted_segment_sum,
                                        unsorted_segment_max, tallqr)
        params = [jnp.ones(3), 4.0, np.arange(2.0)]
        sep = TensorNonTensorSeparator(params)
        assert sep.ntensors() == 2 and sep.nnontensors() == 1
        rec = sep.reconstruct_params(sep.get_tensor_params())
        assert rec[1] == 4.0 and np.allclose(rec[0], 1.0)
        s = unsorted_segment_sum(np.array([1., 2., 3.]),
                                 np.array([0, 1, 0]), 2)
        assert np.allclose(s, [4., 2.])
        m = unsorted_segment_max(np.array([1., 2., 3.]),
                                 np.array([0, 1, 0]), 2)
        assert np.allclose(m, [3., 2.])
        V = np.random.RandomState(0).randn(8, 3)
        Q, R = tallqr(jnp.asarray(V))
        assert np.allclose(np.asarray(Q).T @ np.asarray(Q), np.eye(3),
                           atol=1e-5)
        assert np.allclose(np.asarray(Q) @ np.asarray(R), V, atol=1e-5)

    def test_safe_cdist(self):
        import jax
        import jax.numpy as jnp
        from deepchem_tpu.utils import safe_cdist
        a = jnp.array([[0., 0.], [1., 0.]])
        d = safe_cdist(a, a)
        assert d.shape == (2, 2)
        assert float(d[0, 1]) == pytest.approx(1.0)
        # gradient at coincident points is finite with add_diag_eps
        g = jax.grad(lambda x: safe_cdist(x, x,
                                          add_diag_eps=True).sum())(a)
        assert np.all(np.isfinite(np.asarray(g)))
        dinf = safe_cdist(a, a, diag_inf=True)
        assert np.isinf(np.asarray(dinf)).sum() == 2

    def test_coordinate_box_ops(self):
        from deepchem_tpu.utils import (CoordinateBox, intersection,
                                        union, intersect_interval,
                                        get_face_boxes)
        b1 = CoordinateBox((0, 2), (0, 2), (0, 2))
        b2 = CoordinateBox((1, 3), (1, 3), (1, 3))
        bi = intersection(b1, b2)
        assert bi.x_range == (1, 2)
        bu = union(b1, b2)
        assert bu.x_range == (0, 3)
        assert intersect_interval((0, 1), (5, 6)) == (0, 0)
        pts = np.random.RandomState(0).randn(20, 3)
        boxes = get_face_boxes(pts, pad=1.0)
        assert len(boxes) > 0
        assert all(isinstance(b, CoordinateBox) for b in boxes)

    def test_docking_utils_files(self, tmp_path):
        from deepchem_tpu.utils import (write_vina_conf, write_gnina_conf,
                                        read_gnina_log,
                                        load_docked_ligands)
        conf = tmp_path / 'conf.txt'
        write_vina_conf('p.pdbqt', 'l.pdbqt', np.zeros(3),
                        np.full(3, 20.0), str(conf), exhaustiveness=8)
        txt = conf.read_text()
        assert 'receptor = p.pdbqt' in txt and 'exhaustiveness = 8' in txt
        write_gnina_conf('p.pdb', 'l.sdf', str(conf), cnn_scoring='none')
        assert 'cnn_scoring = none' in conf.read_text()
        log = tmp_path / 'gnina.log'
        log.write_text('mode |  affinity  | CNNscore | CNNaffinity\n'
                       '-----+------------+----------+------------\n'
                       '   1       -7.5       0.70        5.1\n'
                       '   2       -6.0       0.50        4.2\n')
        scores = read_gnina_log(str(log))
        assert scores.shape == (2, 3)
        assert scores[0, 0] == -7.5
        out = tmp_path / 'poses.pdbqt'
        out.write_text(
            'MODEL 1\nREMARK VINA RESULT:    -9.1  0.000  0.000\n'
            'ATOM      1  C   LIG A   1       0.000   0.000   0.000\n'
            'ENDMDL\nMODEL 2\n'
            'REMARK VINA RESULT:    -8.2  1.100  2.100\n'
            'ATOM      1  N   LIG A   1       1.000   0.000   0.000\n'
            'ENDMDL\n')
        mols, scores = load_docked_ligands(str(out))
        assert len(mols) == 2 and scores == [-9.1, -8.2]
        assert mols[1][1] == ['N']

    def test_prepare_inputs(self):
        from deepchem_tpu.utils import prepare_inputs
        (coords, elements), lig = prepare_inputs(PDB_1JLD, 'CCO')
        assert len(coords) == len(elements) > 1000
        assert np.asarray(lig.conformer).shape == (3, 3)
        with pytest.raises(NotImplementedError):
            prepare_inputs(PDB_1JLD, 'CCO', add_hydrogens=True)

    def test_fragment_subset_merge(self):
        from deepchem_tpu.utils import (get_mol_subset,
                                        merge_molecular_fragments,
                                        MolecularFragment, AtomShim)
        mol = mol_from_smiles('CCO')
        coords = np.arange(9.0).reshape(3, 3)
        sub = get_mol_subset(coords, mol, [0, 2])
        assert sub.GetNumAtoms() == 2
        assert [a.GetAtomicNum() for a in sub.GetAtoms()] == [6, 8]
        frag = MolecularFragment(
            [AtomShim(7, 0.0, np.zeros(3))], np.zeros((1, 3)))
        merged = merge_molecular_fragments([sub, frag])
        assert merged.GetNumAtoms() == 3
        assert merge_molecular_fragments([]) is None

    def test_feature_one_hots(self):
        from deepchem_tpu.utils import (
            get_atom_formal_charge_one_hot,
            get_atom_hydrogen_bonding_one_hot,
            get_bond_graph_distance_one_hot,
            construct_hydrogen_bonding_info)
        mol = mol_from_smiles('CC(=O)[O-]')
        oh = get_atom_formal_charge_one_hot(mol.atoms[3])
        assert oh[list((-2, -1, 0, 1, 2)).index(-1)] == 1.0
        hb = construct_hydrogen_bonding_info(mol)
        v = get_atom_hydrogen_bonding_one_hot(mol.atoms[2], hb)
        assert v[1] == 1.0                       # carbonyl O accepts
        # trivial 3-atom chain: bonded atoms at graph distance 1
        dist = np.array([[0, 1, 2, 2], [1, 0, 1, 1],
                         [2, 1, 0, 2], [2, 1, 2, 0]])
        b = mol.bonds[0]
        onehot = get_bond_graph_distance_one_hot(b, dist)
        assert onehot[0] == 1.0

    def test_aggregate_additions(self):
        import jax.numpy as jnp
        from deepchem_tpu.utils import (aggregate_sum, aggregate_var,
                                        aggregate_moment)
        msgs = jnp.array([[1.], [3.], [5.]])
        edst = jnp.array([0, 0, 1])
        emask = jnp.ones(3)
        s = aggregate_sum(msgs, edst, 2, emask)
        assert np.allclose(s, [[4.], [5.]])
        v = aggregate_var(msgs, edst, 2, emask)
        assert np.allclose(v, [[1.], [0.]])      # var of {1,3} = 1
        m3 = aggregate_moment(msgs, edst, 2, emask, moment=3)
        assert np.asarray(m3).shape == (2, 1)

    def test_universal_named_temporary_file(self):
        import os
        from deepchem_tpu.utils import UniversalNamedTemporaryFile
        with UniversalNamedTemporaryFile('w') as f:
            f.write('hello')
            name = f.name
            f.flush()
            assert open(name).read() == 'hello'
        assert not os.path.exists(name)

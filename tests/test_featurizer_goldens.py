"""Per-featurizer golden shape/value tests over known molecules
(VERDICT r2 item 6: featurizers previously covered only indirectly
through model tests).  Mirrors the reference's feat/tests style: small
SMILES lists, assert exact shapes and hand-checkable values."""

import numpy as np
import pytest

import deepchem_tpu.feat as feat

ETHANOL = 'CCO'
BENZENE = 'c1ccccc1'
ASPIRIN = 'CC(=O)OC1=CC=CC=C1C(=O)O'


def test_circular_fingerprint_shapes_and_determinism():
    f = feat.CircularFingerprint(size=2048)
    X = f.featurize([ETHANOL, BENZENE, ASPIRIN])
    assert X.shape == (3, 2048)
    assert set(np.unique(X)) <= {0.0, 1.0}
    X2 = feat.CircularFingerprint(size=2048).featurize([ETHANOL])
    np.testing.assert_array_equal(X[0], X2[0])
    # counts variant
    Xc = feat.CircularFingerprint(size=512,
                                  is_counts_based=True).featurize(
        [ASPIRIN])
    assert Xc.max() >= 2            # repeated environments counted


def test_circular_fingerprint_radius_sensitivity():
    f0 = feat.CircularFingerprint(size=1024, radius=1)
    f2 = feat.CircularFingerprint(size=1024, radius=3)
    a = f0.featurize([ASPIRIN])[0]
    b = f2.featurize([ASPIRIN])[0]
    assert b.sum() > a.sum()        # more environments at higher radius


def test_maccs_keys_shape():
    X = feat.MACCSKeysFingerprint().featurize([ETHANOL, ASPIRIN])
    assert X.shape == (2, 167)
    assert X[1].sum() > X[0].sum()  # aspirin sets more keys


def test_pubchem_fingerprint_shape():
    X = feat.PubChemFingerprint().featurize([ASPIRIN])
    assert X.shape == (1, 881)


def test_rdkit_descriptors_values():
    f = feat.RDKitDescriptors()
    X = f.featurize([ETHANOL])
    names = f.descriptors
    assert X.shape == (1, len(names))
    d = dict(zip(names, X[0]))
    assert abs(d['MolWt'] - 46.07) < 0.1
    assert d['NumHDonors'] == 1 and d['NumHAcceptors'] == 1
    assert d['NumRings'] == 0


def test_convmol_featurizer_golden():
    X = feat.ConvMolFeaturizer().featurize([ETHANOL])
    g = X[0]
    assert g.node_features.shape == (3, 75)
    assert g.edge_index.shape == (2, 4)      # 2 bonds, both directions
    # carbon one-hot at position 0, oxygen at 2 (GRAPH_CONV_SYMBOLS)
    assert g.node_features[0, 0] == 1.0
    assert g.node_features[2, 2] == 1.0
    # degrees: C(1), C(2), O(1) -> one-hot at 44+deg
    assert g.node_features[0, 45] == 1.0
    assert g.node_features[1, 46] == 1.0


def test_molgraphconv_featurizer_golden():
    f = feat.MolGraphConvFeaturizer(use_edges=True)
    g = f.featurize([ASPIRIN])[0]
    assert g.node_features.shape[1] == 30
    assert g.edge_features.shape == (g.edge_index.shape[1], 11)
    assert g.num_nodes == 13


def test_weave_featurizer_golden():
    g = feat.WeaveFeaturizer().featurize([ETHANOL])[0]
    assert g.node_features.shape == (3, 75)
    assert g.pair_features.shape[0] == 9     # 3x3 pairs
    assert g.pair_features.shape[1] == 14


def _mol_3d(smiles):
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.utils.conformers import ConformerGenerator
    mol = mol_from_smiles(smiles)
    return ConformerGenerator(max_conformers=1).generate_conformers(mol)


def test_coulomb_matrix_values():
    f = feat.CoulombMatrix(max_atoms=30, remove_hydrogens=True)
    X = f.featurize([_mol_3d(ETHANOL)])
    cm = X[0] if X[0].ndim == 2 else X[0][0]
    # diagonal 0.5 * z^2.4: C=6 -> 36.86, O=8 -> 73.52 present
    diags = np.sort(np.diagonal(cm))[::-1]
    assert abs(diags[0] - 0.5 * 8 ** 2.4) < 0.1
    assert abs(diags[1] - 0.5 * 6 ** 2.4) < 0.1


def test_coulomb_matrix_eig_sorted():
    X = feat.CoulombMatrixEig(max_atoms=30).featurize(
        [_mol_3d(ETHANOL), _mol_3d(ASPIRIN)])
    assert X.shape == (2, 30)
    assert np.all(np.diff(X[0]) <= 1e-6)     # descending eigenvalues


def test_onehot_featurizer_roundtrip():
    f = feat.OneHotFeaturizer()
    X = f.featurize([ETHANOL])
    assert X.shape[0] == 1
    assert f.untransform(X[0]) == ETHANOL


def test_smiles_to_seq_and_image():
    c2i = feat.create_char_to_idx([ETHANOL, ASPIRIN, BENZENE])
    seq = feat.SmilesToSeq(c2i).featurize([ASPIRIN])
    assert seq.shape[0] == 1 and seq.ndim == 2
    img = feat.SmilesToImage(img_size=80).featurize([ASPIRIN])
    assert img.shape == (1, 80, 80, 1)
    assert img[0].max() > 0


def test_atomic_coordinates_requires_conformer():
    f = feat.AtomicCoordinates()
    X = f.featurize([ETHANOL])               # conformer embedded
    assert X[0].shape == (3, 3) or X[0].size == 0


def test_element_property_fingerprint():
    X = feat.ElementPropertyFingerprint().featurize(['Fe2O3'])
    assert X.shape[0] == 1 and X.shape[1] > 10
    assert np.isfinite(X).all()


def test_elemnet_featurizer_fractions():
    X = feat.ElemNetFeaturizer().featurize(['Fe2O3'])
    v = X[0]
    assert abs(v.sum() - 1.0) < 1e-6          # composition fractions


def test_sine_coulomb_matrix():
    struct = {'lattice': np.eye(3) * 4.0,
              'frac_coords': np.array([[0.0, 0.0, 0.0],
                                       [0.5, 0.5, 0.5]]),
              'species': ['Na', 'Cl']}
    X = feat.SineCoulombMatrix(max_atoms=4).featurize([struct])
    assert X[0].shape in ((4,), (4, 4))
    assert np.isfinite(np.asarray(X[0], dtype=float)).all()


def test_position_frequency_matrix():
    seqs = [['ACGT', 'ACGG', 'ACTT']]
    X = feat.PositionFrequencyMatrix(max_length=4).featurize(seqs)
    assert X[0].shape == (5, 4)               # charset x positions
    assert X[0][0, 0] == 3                    # 'A' at position 0 thrice


def test_one_hot_unknown_char_handling():
    f = feat.OneHotFeaturizer(charset=['C', 'O', '('])
    X = f.featurize(['CCO'])
    assert X.shape[0] == 1


def test_dummy_and_raw():
    assert feat.DummyFeaturizer().featurize(['x', 'y']).tolist() == \
        ['x', 'y']
    mols = feat.RawFeaturizer().featurize([ETHANOL])
    assert mols[0].num_atoms == 3
    smis = feat.RawFeaturizer(smiles=True).featurize([ETHANOL])
    assert isinstance(smis[0], str)


def test_snap_featurizer():
    g = feat.SNAPFeaturizer().featurize([ASPIRIN])[0]
    assert g.node_features.shape[1] == 2      # atom type + chirality


def test_pagtn_featurizer():
    g = feat.PagtnMolGraphFeaturizer().featurize([BENZENE])[0]
    assert g.node_features.shape[0] == 6
    assert g.edge_index.shape[1] > 6          # includes distant pairs


def test_bp_symmetry_function_input():
    f = feat.BPSymmetryFunctionInput(max_atoms=10)
    X = f.featurize([ETHANOL])
    assert X[0].shape == (10, 4)              # (z, x, y, z-coord)


# -- MACCS / PubChem bit-vector pins (VERDICT r2 item 10) ------------------
# These PIN the in-repo key implementations' exact on-bits for three
# molecules so the DOCUMENTED divergence from RDKit/CACTVS bit positions
# is a tested fact, not folklore: the in-repo keys are structurally
# meaningful (ring/aromatic/donor patterns fire consistently) but are
# NOT bit-position-compatible with RDKit's MACCS or CACTVS PubChem
# output.  (The reference's own MACCS test checks only the (167,)
# shape, feat/tests/test_maccs_keys_finerprint.py:25.)

MACCS_PINS = {
    ETHANOL: [57, 60, 92, 95],
    BENZENE: [24, 27, 35, 129, 157, 158, 159],
    ASPIRIN: [24, 27, 35, 57, 58, 59, 60, 62, 63, 64, 65, 66, 71, 92,
              103, 109, 114, 121, 127, 129, 132, 139, 142, 143, 147,
              151, 157, 158, 159],
}

PUBCHEM_PINS = {
    ETHANOL: [0, 9, 18, 133, 134, 136, 160, 181, 221, 300, 349, 352,
              444, 767, 791],
    BENZENE: [0, 9, 10, 78, 80, 133, 134, 176, 179, 201, 228, 459,
              706, 758],
}


def test_maccs_bit_pins():
    f = feat.MACCSKeysFingerprint()
    for smi, bits in MACCS_PINS.items():
        on = np.nonzero(f.featurize([smi])[0])[0].tolist()
        assert on == bits, f'{smi}: {on} != pinned {bits}'
    # structural containment: every benzene key fires in aspirin
    assert set(MACCS_PINS[BENZENE]) <= set(MACCS_PINS[ASPIRIN])


def test_pubchem_bit_pins():
    f = feat.PubChemFingerprint()
    for smi, bits in PUBCHEM_PINS.items():
        on = np.nonzero(f.featurize([smi])[0])[0].tolist()
        assert on == bits, f'{smi}: {on} != pinned {bits}'

"""SMARTS engine + structural-key fingerprint tests (the reference
delegates these to RDKit; cases below are standard RDKit-verified
match/count facts)."""
import numpy as np
import pytest

from deepchem_tpu.chem import (count_substructures, find_substructures,
                               has_substructure, mol_from_smiles,
                               smarts_pattern, SmartsParseError)


CASES = [
    # (molecule, smarts, matches?)
    ('CCO', '[OH]', True),
    ('CCOC', '[OH]', False),
    ('CC(=O)O', '[CX3](=O)[OX2H1]', True),       # carboxylic acid
    ('CC(=O)OC', '[CX3](=O)[OX2H1]', False),     # ester is not an acid
    ('CC(=O)OC', '[CX3](=O)[OX2][#6]', True),
    ('c1ccccc1', 'c1ccccc1', True),
    ('C1CCCCC1', 'c1ccccc1', False),
    ('c1ccccc1', 'C1CCCCC1', False),
    ('CCN', '[NX3;H2]', True),
    ('CN(C)C', '[NX3;H2]', False),
    ('CC(=O)N', '[NX3][CX3](=[OX1])', True),
    ('c1ccncc1', '[nX2]', True),
    ('CC#N', 'C#N', True),
    ('CC=C', 'C#N', False),
    ('[NH4+]', '[N+]', True),
    ('CC[O-]', '[O-]', True),
    ('CCO', '[O-]', False),
    ('C1CC1', '[r3]', True),
    ('C1CCC1', '[r3]', False),
    ('CC(N)C(=O)O', '[NX3;H2].[CX3](=O)[OX2H1]', True),  # two components
    ('CCCl', '[Cl]', True),
    ('c1ccc2ccccc2c1', '[cR2]', True),           # naphthalene fusion atoms
    ('c1ccccc1', '[cR2]', False),
    ('C=CC=C', 'C=CC=C', True),
    ('CCCC', 'C=C', False),
]


@pytest.mark.parametrize('smi,sma,want', CASES)
def test_match(smi, sma, want):
    assert has_substructure(mol_from_smiles(smi), sma) == want


def test_counts():
    assert count_substructures(mol_from_smiles('OCC(O)CO'), '[OH]') == 3
    assert count_substructures(mol_from_smiles('C1CCCCC1'), '[R]') == 6
    assert count_substructures(mol_from_smiles('C1CC1'), '[r3]') == 3
    # benzene has 6 CH aromatic atoms
    assert count_substructures(mol_from_smiles('c1ccccc1'), '[cH]') == 6


def test_find_substructures_indices():
    mol = mol_from_smiles('CC(=O)O')
    hits = find_substructures(mol, 'C=O')
    assert len(hits) == 1
    c, o = hits[0]
    assert mol.atoms[c].atomic_num == 6 and mol.atoms[o].atomic_num == 8


def test_parse_error():
    with pytest.raises(SmartsParseError):
        smarts_pattern('C(((')


def test_maccs_and_pubchem_fingerprints():
    from deepchem_tpu.feat import (MACCSKeysFingerprint,
                                   PubChemFingerprint)
    smiles = ['CCO', 'CC(=O)Oc1ccccc1C(=O)O', 'c1ccccc1', 'C1CCCCC1']
    maccs = MACCSKeysFingerprint().featurize(smiles)
    pub = PubChemFingerprint().featurize(smiles)
    assert maccs.shape == (4, 167) and pub.shape == (4, 881)
    # aspirin strictly richer than ethanol
    assert maccs[1].sum() > maccs[0].sum()
    # aromatic vs aliphatic ring must differ
    assert not np.allclose(maccs[2], maccs[3])
    assert not np.allclose(pub[2], pub[3])


def test_gated_featurizers_raise():
    # both former gates are native now: MordredDescriptors
    # (tests/test_mordred_native.py) and Mol2VecFingerprint
    # (tests/test_mol2vec.py) construct and run without external
    # packages.
    from deepchem_tpu.feat import Mol2VecFingerprint, MordredDescriptors
    assert MordredDescriptors is not None
    assert Mol2VecFingerprint is not None


def test_complex_featurizers():
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    from deepchem_tpu.feat import (ContactCircularFingerprint,
                                   SplifFingerprint, SplifVoxelizer)
    lig = mol_from_smiles('CCO')
    lig.conformer = [tuple(x) for x in np.asarray(embed_molecule_3d(lig))]
    prot = mol_from_smiles('CC(=O)NC')
    pc = np.asarray(embed_molecule_3d(prot)) + np.array([2.5, 0, 0])
    prot.conformer = [tuple(x) for x in pc]
    f = ContactCircularFingerprint(size=6)._featurize((lig, prot))
    assert f.shape == (128,) and f.sum() > 0
    s = SplifFingerprint(size=6)._featurize((lig, prot))
    assert s.shape == (192,) and s.sum() > 0
    v = SplifVoxelizer(size=4, box_width=16)._featurize((lig, prot))
    assert v.shape == (16, 16, 16, 48) and v.sum() == s.sum()
    # no contacts when fragments far apart
    far = mol_from_smiles('CC(=O)NC')
    far.conformer = [tuple(x) for x in pc + 100.0]
    f2 = ContactCircularFingerprint(size=6)._featurize((lig, far))
    assert f2.sum() == 0


def test_tpsa_matches_rdkit_values():
    from deepchem_tpu.chem import tpsa
    # anchors verified against RDKit's Ertl implementation
    for smi, want in [('CCO', 20.23), ('c1ccccc1', 0.0),
                      ('c1ccncc1', 12.89), ('Nc1ccccc1', 26.02),
                      ('CC(=O)Oc1ccccc1C(=O)O', 63.60),
                      ('CC(=O)N', 43.09), ('CC#N', 23.79),
                      ('CC(=O)O', 37.30)]:
        assert abs(tpsa(mol_from_smiles(smi)) - want) < 0.01, smi


def test_connectivity_indices():
    from deepchem_tpu.chem import chi0, chi1, kappa1, kappa2, \
        num_valence_electrons
    m = mol_from_smiles('CCO')
    assert abs(chi0(m) - 2.7071) < 1e-3
    assert abs(chi1(m) - 1.4142) < 1e-3
    assert num_valence_electrons(m) == 20
    iso = mol_from_smiles('CC(C)C')
    assert abs(kappa1(iso) - 4.0) < 1e-6
    assert abs(kappa2(iso) - 4.0 / 3.0) < 1e-3


def test_rdkit_descriptors_extended():
    from deepchem_tpu.feat import RDKitDescriptors
    feat = RDKitDescriptors()
    out = feat.featurize(['CCO', 'c1ccccc1'])
    assert out.shape == (2, len(feat.descriptors))
    ti = feat.descriptors.index('TPSA')
    assert abs(out[0, ti] - 20.23) < 0.01
    assert abs(out[1, ti]) < 0.01


def test_conformer_and_equivariant_featurizers():
    from deepchem_tpu.feat import (RDKitConformerFeaturizer,
                                   EquivariantGraphFeaturizer)
    g = RDKitConformerFeaturizer().featurize(['CCO'])[0]
    assert g.node_features.shape == (3, 30)
    assert g.node_pos_features.shape == (3, 3)
    g = EquivariantGraphFeaturizer(fully_connected=True).featurize(
        ['CCO'])[0]
    assert g.edge_index.shape == (2, 6)      # complete digraph on 3
    assert g.edge_features.shape == (6, 3)   # displacement vectors
    assert g.edge_weights.shape == (6, 5)    # 4 bins + overflow one-hot
    # displacements are antisymmetric for reversed edges
    ei = g.edge_index
    for k in range(ei.shape[1]):
        rev = np.nonzero((ei[0] == ei[1][k]) & (ei[1] == ei[0][k]))[0]
        assert np.allclose(g.edge_features[k], -g.edge_features[rev[0]],
                           atol=1e-6)


def test_rdkit_grid_featurizer():
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    from deepchem_tpu.feat import RdkitGridFeaturizer
    lig = mol_from_smiles('CCO')
    lig.conformer = [tuple(x) for x in np.asarray(embed_molecule_3d(lig))]
    prot = mol_from_smiles('CC(=O)NC')
    prot.conformer = [tuple(x) for x in
                      np.asarray(embed_molecule_3d(prot))
                      + np.array([2.0, 0, 0])]
    g = RdkitGridFeaturizer(feature_types='voxel_combined', ecfp_power=3,
                            splif_power=3)._featurize((lig, prot))
    assert g.shape == (16, 16, 16, 69)   # + 26 sybyl channels
    assert g.sum() != 0


def test_sybyl_atom_typing():
    from deepchem_tpu.feat.complex_featurizers import compute_all_sybyl
    cases = [('CC(=O)[O-]', {1: 'C.2', 2: 'O.co2', 3: 'O.co2'}),
             ('c1ccccc1', {0: 'C.ar'}),
             ('CC(=O)NC', {3: 'N.am'}),
             ('CS(=O)(=O)C', {1: 'S.O2'}),
             ('C#N', {0: 'C.1', 1: 'N.1'}),
             ('C[NH3+]', {1: 'N.4'})]
    for smi, want in cases:
        got = compute_all_sybyl(mol_from_smiles(smi))
        for k, v in want.items():
            assert got[k] == v, (smi, k, got[k], v)

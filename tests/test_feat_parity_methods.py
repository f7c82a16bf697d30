"""Reference featurizer/tokenizer methods added by the round-4 method-level
parity audit (reference one_hot_featurizer.py:152,168; smiles_to_seq.py:97,
106,116; coulomb_matrices.py:197; conformer_featurizer.py:121,157;
elemnet_featurizer.py:50; deepvariant_featurizer.py:747;
deepvariant_pileup_featurizer.py:47; smiles_tokenizer.py:106,147,164,178,189;
vocabulary_builders/vocabulary_builder.py:38; mat_featurizer.py helpers)."""

import numpy as np
import pytest

from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.feat import (OneHotFeaturizer, SmilesToSeq,
                               create_char_to_idx, CoulombMatrix,
                               RDKitConformerFeaturizer, ElemNetFeaturizer,
                               PileupFeaturizer, RealignerFeaturizer,
                               SmilesTokenizer, VocabularyBuilder)
from deepchem_tpu.models import MATFeaturizer


def test_one_hot_pad_helpers():
    f = OneHotFeaturizer(max_length=10)
    assert f.pad_smile('CCO') == 'CCO'.ljust(10)
    assert len(f.pad_string('C' * 20)) == 10
    assert OneHotFeaturizer(max_length=None).pad_string('CC') == 'CC'


def test_smiles_to_seq_roundtrip_helpers():
    v = create_char_to_idx(['CCO', 'c1ccccc1'])
    sts = SmilesToSeq(v, max_len=20, pad_len=2)
    seq = sts._featurize('CCO')
    assert sts.smiles_from_seq(list(seq)) == 'CCO'
    assert list(sts.to_seq(['C', 'C', 'O'])) == [v['C'], v['C'], v['O']]
    # unknown characters map to <unk>
    assert sts.to_seq(['Z'])[0] == v['<unk>']


def test_coulomb_interatomic_distances():
    xyz = np.array([[0., 0, 0], [0, 0, 1.5], [0, 2, 0]])
    d = CoulombMatrix.get_interatomic_distances(xyz)
    assert d.shape == (3, 3)
    assert abs(d[0, 1] - 1.5) < 1e-9 and d[1, 0] == d[0, 1]
    # Molecule with a conformer works too
    mol = mol_from_smiles('CC')
    mol.conformer = xyz[:2]
    assert CoulombMatrix.get_interatomic_distances(mol).shape == (2, 2)


def test_conformer_ogb_feature_vectors():
    cf = RDKitConformerFeaturizer()
    m = mol_from_smiles('C/C=C/Cl')
    af = cf.atom_to_feature_vector(m.atoms[0])
    assert len(af) == 9
    assert af[0] == 5              # carbon: atomic_num index (Z=6 -> 5)
    assert af[4] == 3              # CH3: three hydrogens
    bf = cf.bond_to_feature_vector(list(m.bonds)[1])
    assert len(bf) == 3
    assert bf[0] == 1              # double bond
    assert bf[1] == 4              # STEREOTRANS
    aromatic = mol_from_smiles('c1ccccc1')
    assert cf.bond_to_feature_vector(list(aromatic.bonds)[0])[0] == 3
    assert cf.atom_to_feature_vector(aromatic.atoms[0])[7] == 1  # aromatic


def test_elemnet_get_vector():
    en = ElemNetFeaturizer()
    v = en.get_vector({'Fe': 2.0, 'O': 3.0})
    assert abs(v[25] - 0.4) < 1e-6 and abs(v[7] - 0.6) < 1e-6
    assert abs(v.sum() - 1.0) < 1e-6
    # atomic-number keys accepted; out-of-range element -> None
    assert np.allclose(en.get_vector({26: 2.0, 8: 3.0}), v)
    assert en.get_vector({'Pu': 1.0}) is None


def test_decode_one_hot():
    oh = [np.eye(5)[i] for i in [0, 1, 3, 2]]
    assert PileupFeaturizer().decode_one_hot(oh) == 'ACGT'
    assert RealignerFeaturizer().decode_one_hot(oh) == 'ACGT'
    assert PileupFeaturizer().decode_one_hot(oh, ['T', 'G', 'A', 'C',
                                                  'N']) == 'TGCA'


def test_tokenizer_special_token_helpers():
    tok = SmilesTokenizer.from_corpus(['CCO', 'c1ccccc1'])
    ids = tok.convert_tokens_to_ids(tok.tokenize('CCO'))
    wrapped = tok.add_special_tokens_ids_single_sequence(ids)
    assert wrapped[0] == tok.cls_token_id
    assert wrapped[-1] == tok.sep_token_id
    toks = tok.add_special_tokens_single_sequence(['C', 'C', 'O'])
    assert toks[0] == '[CLS]' and toks[-1] == '[SEP]'
    pair = tok.add_special_tokens_ids_sequence_pair(ids, ids)
    assert pair.count(tok.sep_token_id) == 2
    assert pair[0] == tok.cls_token_id
    assert tok.convert_tokens_to_string(['C', '##C']) == 'CC'
    assert tok.vocab_list.index('[CLS]') == tok.cls_token_id


def test_vocabulary_builder_extend_hook():
    with pytest.raises(NotImplementedError):
        VocabularyBuilder().extend(None)


def test_mat_featurizer_helpers():
    mf = MATFeaturizer()
    mol = mol_from_smiles('CCO')
    nm = mf.construct_node_features_matrix(mol)
    assert nm.shape[0] == 3
    assert np.allclose(nm[0], mf.atom_features(mol.atoms[0]))
    assert mf.construct_mol('CCO').num_atoms == 3
    enc = mf._featurize('CCO')     # construct_mol resolves strings
    assert enc.node_features.shape[0] == 4   # dummy node prepended

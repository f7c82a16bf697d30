"""Tokenizers, crystal/conformer/MolGAN/polymer featurizers, and logging
hooks (reference deepchem/feat/tests/test_smiles_tokenizer.py,
test_cgcnn_featurizer.py, test_molgan_featurizer.py,
test_polymer_wd_featurizer.py equivalents)."""
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# SMILES tokenizers
# ---------------------------------------------------------------------------

def test_basic_smiles_tokenizer_splits_multichar_atoms():
    from deepchem_tpu.feat.tokenizers import BasicSmilesTokenizer
    tok = BasicSmilesTokenizer()
    assert tok.tokenize('CCO') == ['C', 'C', 'O']
    assert tok.tokenize('ClCBr') == ['Cl', 'C', 'Br']
    assert tok.tokenize('c1ccccc1') == ['c', '1', 'c', 'c', 'c', 'c',
                                        'c', '1']
    assert tok.tokenize('C[NH3+]') == ['C', '[NH3+]']
    assert tok.tokenize('C%12CC%12') == ['C', '%12', 'C', 'C', '%12']


def test_smiles_tokenizer_roundtrip_and_vocab(tmp_path):
    from deepchem_tpu.feat.tokenizers import SmilesTokenizer
    corpus = ['CCO', 'c1ccccc1Cl', 'CC(=O)O']
    tok = SmilesTokenizer.from_corpus(corpus)
    # every corpus string decodes back exactly
    for s in corpus:
        ids = tok.encode(s, add_special_tokens=True)
        assert ids[0] == tok.vocab['[CLS]']
        assert ids[-1] == tok.vocab['[SEP]']
        assert tok.decode(ids) == s
    # unknown atoms hit [UNK]
    ids = tok.convert_tokens_to_ids(['Br'])
    assert ids == [tok.vocab['[UNK]']]
    # padding to max_length
    padded = tok.encode('CCO', max_length=10)
    assert len(padded) == 10
    assert padded[-1] == tok.vocab['[PAD]']
    # save / reload round-trips the vocab
    path = tok.save_vocabulary(str(tmp_path))
    tok2 = SmilesTokenizer(vocab_file=path)
    assert tok2.vocab == tok.vocab
    assert tok2.vocab_size == tok.vocab_size


def test_rxn_featurizer_separates_sides():
    from deepchem_tpu.feat.tokenizers import RxnFeaturizer

    class FakeTok:
        def __call__(self, text, **kw):
            return {'text': [ord(c) for c in text][:8]}

    feat = RxnFeaturizer(FakeTok(), sep_reagent=True)
    out = feat._featurize('CCO>O>CCBr')
    assert ''.join(chr(c) for c in out['source_text']) == 'CCO>O'
    assert ''.join(chr(c) for c in out['target_text']) == 'CCBr'
    mixed = RxnFeaturizer(FakeTok(), sep_reagent=False)
    out2 = mixed._featurize('CCO>O>CCBr')
    assert ''.join(chr(c) for c in out2['source_text']) == 'CCO.O>'


# ---------------------------------------------------------------------------
# crystal featurizers
# ---------------------------------------------------------------------------

def _rock_salt():
    """2-atom NaCl-like cubic cell."""
    return {'lattice': (4.0 * np.eye(3)).tolist(),
            'frac_coords': [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]],
            'species': ['Na', 'Cl']}


def test_periodic_neighbors_counts_images():
    from deepchem_tpu.feat.crystal_featurizers import periodic_neighbors
    lattice = 4.0 * np.eye(3)
    frac = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    src, dst, d = periodic_neighbors(lattice, frac, radius=3.6,
                                     max_neighbors=12)
    # body-center distance = sqrt(3)*2 = 3.464; each atom sees 8 images
    # of the other
    np.testing.assert_allclose(np.unique(np.round(d, 3)), [3.464])
    assert (dst == 0).sum() == 8 and (dst == 1).sum() == 8


def test_cgcnn_featurizer_structure_graph():
    from deepchem_tpu.feat.crystal_featurizers import CGCNNFeaturizer
    feat = CGCNNFeaturizer(radius=4.0, max_neighbors=8)
    (g,) = feat.featurize([_rock_salt()])
    assert g.node_features.shape == (2, 92)
    # one-hot at z-1: Na=11, Cl=17
    assert g.node_features[0, 10] == 1.0
    assert g.node_features[1, 16] == 1.0
    assert g.edge_index.shape[0] == 2
    assert g.edge_features.shape[0] == g.edge_index.shape[1]
    # gaussian edge features peak at the true distance bucket
    d_true = np.sqrt(3) * 2
    centers = feat.centers
    peak = np.argmax(g.edge_features[0])
    assert abs(centers[peak] - d_true) < feat.step


def test_lcnn_featurizer_occupancy_one_hot():
    from deepchem_tpu.feat.crystal_featurizers import LCNNFeaturizer
    struct = _rock_salt()
    struct['occupancy'] = [0, 2]
    (g,) = LCNNFeaturizer(cutoff=4.0).featurize([struct])
    np.testing.assert_array_equal(g.node_features,
                                  [[1, 0, 0], [0, 0, 1]])


# ---------------------------------------------------------------------------
# conformer featurizers
# ---------------------------------------------------------------------------

def test_conformer_featurizer_positions():
    from deepchem_tpu.feat.conformer_featurizers import \
        RDKitConformerFeaturizer
    (g,) = RDKitConformerFeaturizer().featurize(['CCO'])
    assert g.node_pos_features.shape == (3, 3)
    # embedded conformer has nonzero bond lengths in a sane range
    d01 = np.linalg.norm(g.node_pos_features[0] - g.node_pos_features[1])
    assert 1.0 < d01 < 2.0
    assert g.node_features.shape[0] == 3


def test_equivariant_featurizer_edges_and_rotation():
    from deepchem_tpu.feat.conformer_featurizers import \
        EquivariantGraphFeaturizer
    feat = EquivariantGraphFeaturizer()
    (g,) = feat.featurize(['CCO'])
    # 2 bonds -> 4 directed edges; displacement vectors match positions
    assert g.edge_index.shape == (2, 4)
    src, dst = g.edge_index
    np.testing.assert_allclose(
        g.edge_features,
        g.node_pos_features[dst] - g.node_pos_features[src], atol=1e-6)
    # edge weights are one-hot distance bins
    assert np.all(g.edge_weights.sum(axis=1) == 1.0)
    fully = EquivariantGraphFeaturizer(fully_connected=True)
    (g2,) = fully.featurize(['CCO'])
    assert g2.edge_index.shape == (2, 6)        # 3*2 ordered pairs


# ---------------------------------------------------------------------------
# MolGAN featurizer round trip
# ---------------------------------------------------------------------------

def test_molgan_featurize_defeaturize_roundtrip():
    from deepchem_tpu.feat.molgan_featurizer import MolGanFeaturizer
    from deepchem_tpu.chem import mol_to_smiles
    feat = MolGanFeaturizer(max_atom_count=9)
    smiles = ['CCO', 'CC(=O)N', 'C=CC#N']
    graphs = feat.featurize(smiles)
    for s, g in zip(smiles, graphs):
        assert g.adjacency_matrix.shape == (9, 9, 5)
        assert g.node_features.shape == (9, 5)
        (mol,) = feat.defeaturize(g)
        assert mol is not None
        assert mol_to_smiles(mol) is not None
        assert mol.num_atoms == sum(1 for c in s if c.isalpha()
                                    and c not in 'H')
    # all-empty graph defeaturizes to None
    import numpy as _np
    from deepchem_tpu.feat.molgan_featurizer import GraphMatrix
    empty = GraphMatrix(_np.eye(5)[_np.zeros((9, 9), int)],
                        _np.eye(5)[_np.zeros(9, int)])
    (m,) = feat.defeaturize(empty)
    assert m is None


# ---------------------------------------------------------------------------
# polymer weighted-directed featurizer
# ---------------------------------------------------------------------------

def test_polymer_wdg_featurizer():
    from deepchem_tpu.feat.polymer_featurizers import PolyWDGFeaturizer
    # two single-atom monomers with attachment points 1 and 2,
    # 50/50 composition, one symmetric rule, Xn = 100
    datapoint = '[1*]C.[2*]O|0.5|0.5|<1-2:0.5:0.5~100'
    (g,) = PolyWDGFeaturizer().featurize([datapoint])
    assert g.node_features.shape == (2, 75)
    np.testing.assert_allclose(g.node_weights, [0.5, 0.5])
    # one rule -> 2 directed inter-monomer edges (no intra bonds between
    # heavy atoms here: each monomer's only bond touches the wildcard)
    assert g.edge_index.shape == (2, 2)
    np.testing.assert_allclose(g.edge_weights, [0.5, 0.5])
    np.testing.assert_allclose(g.degree_of_poly, 3.0)   # 1 + log10(100)


def test_polymer_validator_rejects_malformed():
    from deepchem_tpu.utils.poly_wd_graph_utils import \
        PolyWDGStringValidator
    v = PolyWDGStringValidator()
    with pytest.raises(Exception):
        v.validate('[1*]C.[2*]O|0.5|<1-2:0.5:0.5')   # missing fraction


# ---------------------------------------------------------------------------
# logging hooks
# ---------------------------------------------------------------------------

def test_wandblogger_records_locally():
    from deepchem_tpu.models.wandblogger import WandbLogger
    lg = WandbLogger(name='t', mode='offline')
    lg.log_data({'loss': 1.5}, step=1)
    lg.log_values({'roc_auc': 0.9}, step=2, group='valid')
    assert lg.run_history[0] == {'loss': 1.5, 'step': 1}
    assert lg.run_history[1] == {'valid/roc_auc': 0.9, 'step': 2}
    lg.finish()
    assert not lg.initialized


def test_tensorboard_logger_history(tmp_path):
    from deepchem_tpu.models.wandblogger import TensorboardLogger
    lg = TensorboardLogger(str(tmp_path))
    lg.log_scalar('loss', 0.5, 1)
    lg.log_scalar('loss', 0.25, 2)
    lg.close()
    assert lg.history == [('loss', 0.5, 1), ('loss', 0.25, 2)]
    if lg._writer is not None:       # event files written when available
        assert any(os.listdir(str(tmp_path)))

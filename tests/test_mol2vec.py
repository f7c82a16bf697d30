"""Native mol2vec (reference feat/molecule_featurizers/
mol2vec_fingerprint.py, previously an ImportError gate): Morgan
identifier sentences, SGNS training, and the Mol2VecFingerprint
featurizer on an in-memory model."""

import numpy as np
import pytest

from deepchem_tpu.chem.smiles import mol_from_smiles
from deepchem_tpu.chem.mol2vec import (Mol2VecModel, UNK,
                                       mol_to_sentence, sentences2vec,
                                       train_mol2vec)

ALCOHOLS = ['CCO', 'CCCO', 'CCCCO', 'CC(C)O', 'OCC(O)CO', 'CCC(O)C',
            'OCCO', 'CCCCCO']
AROMATICS = ['c1ccccc1', 'Cc1ccccc1', 'c1ccncc1', 'c1ccc2ccccc2c1',
             'Clc1ccccc1', 'c1ccccc1O', 'CCc1ccccc1',
             'c1ccc(cc1)c1ccccc1']


def _tiny_model(seed=0, dim=32):
    corpus = (ALCOHOLS + AROMATICS) * 30
    sents = [mol_to_sentence(mol_from_smiles(s), 1) for s in corpus]
    return train_mol2vec(sents, vector_size=dim, window=6, min_count=2,
                         epochs=5, seed=seed)


def test_sentence_structure():
    mol = mol_from_smiles('CCO')
    s = mol_to_sentence(mol, radius=1)
    # radius+1 identifiers per atom, interleaved per atom
    assert len(s) == mol.num_atoms * 2
    # radius-0 ids of the two CH3/CH2 carbons differ (degree differs)
    s0 = mol_to_sentence(mol, radius=0)
    assert len(s0) == mol.num_atoms
    # identical environments share identifiers across molecules
    s_butanol = mol_to_sentence(mol_from_smiles('CCCCO'), radius=0)
    assert s0[-1] in s_butanol   # the hydroxyl oxygen


def test_training_learns_chemistry():
    model = _tiny_model()
    assert np.isfinite(model.vectors).all()

    def vec(smi):
        v = sentences2vec([mol_to_sentence(mol_from_smiles(smi), 1)],
                          model)[0]
        return v / (np.linalg.norm(v) + 1e-9)
    sim = lambda a, b: float(vec(a) @ vec(b))       # noqa: E731
    assert sim('CCO', 'CCCO') > sim('CCO', 'c1ccccc1')
    assert sim('Cc1ccccc1', 'c1ccccc1') > sim('Cc1ccccc1', 'CCO')


def test_training_deterministic():
    m1 = _tiny_model(seed=3)
    m2 = _tiny_model(seed=3)
    np.testing.assert_array_equal(m1.vectors, m2.vectors)


def test_save_load_roundtrip(tmp_path):
    model = _tiny_model()
    p = str(tmp_path / 'm2v.npz')
    model.save(p)
    loaded = Mol2VecModel.load(p)
    assert loaded.vocab == model.vocab
    np.testing.assert_allclose(loaded.vectors, model.vectors)


def test_unseen_maps_to_unk():
    model = _tiny_model()
    assert UNK in model.vocab
    # an identifier never seen in the corpus
    v = sentences2vec([['99999999999']], model, unseen=UNK)[0]
    np.testing.assert_allclose(v, model.vectors[model.vocab[UNK]])
    # unseen=None drops unknown words instead
    v2 = sentences2vec([['99999999999']], model, unseen=None)[0]
    np.testing.assert_allclose(v2, 0.0)


def test_featurizer_with_inline_model(tmp_path):
    from deepchem_tpu.feat import Mol2VecFingerprint
    model = _tiny_model(dim=16)
    f = Mol2VecFingerprint(model=model)
    out = f.featurize(['CCO', 'c1ccccc1', 'CC(=O)O'])
    assert out.shape == (3, 16)
    assert np.isfinite(out).all()
    assert not np.allclose(out[0], out[1])
    # the sum-of-identifier-vectors contract
    s = mol_to_sentence(mol_from_smiles('CCO'), 1)
    np.testing.assert_allclose(out[0], sentences2vec([s], model)[0],
                               atol=1e-6)
    # load path
    p = str(tmp_path / 'corpus.npz')
    model.save(p)
    f2 = Mol2VecFingerprint(pretrain_model_path=p)
    np.testing.assert_allclose(f2.featurize(['CCO'])[0], out[0],
                               atol=1e-6)

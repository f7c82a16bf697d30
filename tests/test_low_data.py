"""One-shot / low-data learning tests (the reference's low-data harness,
molnet/run_benchmark_low_data.py, is dead TF1 code; these exercise the
working re-build: AttnLSTM/IterRefLSTM embeddings + episode trainer)."""
import numpy as np
import pytest

import jax

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import MolGraphConvFeaturizer
from deepchem_tpu.metrics import roc_auc_score
from deepchem_tpu.models import (AttnLSTMEmbedding, IterRefLSTMEmbedding,
                                 SupportGraphClassifier)

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C', 'c1ccco1', 'C1CC1',
          'CCCCO', 'CCCN', 'c1ccc(O)cc1', 'CC(C)O', 'CCCCC', 'C1CCOC1',
          'c1cncnc1', 'CCCCCC']


@pytest.fixture(scope='module')
def fewshot_ds():
    np.random.seed(0)
    X = MolGraphConvFeaturizer().featurize(SMILES)
    has_ring = np.array(['1' in s for s in SMILES], float)
    has_o = np.array(['O' in s or 'o' in s for s in SMILES], float)
    y = np.stack([has_ring, has_o], 1)
    return NumpyDataset(X, y, np.ones_like(y))


def test_attn_lstm_embedding_shapes():
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    xp = np.random.RandomState(1).randn(6, 8).astype(np.float32)
    mod = AttnLSTMEmbedding(n_feat=8, max_depth=2)
    params = mod.init(jax.random.PRNGKey(0), x, xp)
    xq, xs = mod.apply(params, x, xp)
    assert xq.shape == (4, 8) and xs.shape == (6, 8)
    # support side is untouched by AttnLSTM
    assert np.allclose(np.asarray(xs), xp)


def test_iter_ref_lstm_embedding_shapes():
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    xp = np.random.RandomState(1).randn(6, 8).astype(np.float32)
    mod = IterRefLSTMEmbedding(n_feat=8, max_depth=2)
    params = mod.init(jax.random.PRNGKey(0), x, xp)
    xq, xs = mod.apply(params, x, xp)
    assert xq.shape == (4, 8) and xs.shape == (6, 8)
    # IterRef modifies BOTH sides
    assert not np.allclose(np.asarray(xs), xp)


def test_siamese_one_shot_learns(fewshot_ds):
    np.random.seed(0)
    model = SupportGraphClassifier(model='siamese', n_pos=2, n_neg=4,
                                   n_test=8, n_feat=32, layer_sizes=(32,),
                                   learning_rate=3e-3)
    model.fit(fewshot_ds, nb_epochs=1, n_episodes_per_epoch=60,
              log_every=0)
    means, _ = model.evaluate(fewshot_ds, roc_auc_score, n_trials=6)
    # ring-membership task (task 0) is separable with tiny supports
    assert means[0] > 0.9


def test_attn_one_shot_runs(fewshot_ds):
    np.random.seed(1)
    model = SupportGraphClassifier(model='attn', n_pos=2, n_neg=4,
                                   n_test=8, n_feat=32, layer_sizes=(32,))
    model.fit(fewshot_ds, nb_epochs=1, n_episodes_per_epoch=20,
              log_every=0)
    task_ds_preds = model.predict_on_support(
        NumpyDataset(fewshot_ds.X[:6],
                     fewshot_ds.y[:6, 0].reshape(-1)),
        NumpyDataset(fewshot_ds.X, fewshot_ds.y[:, 0]))
    assert task_ds_preds.shape == (20,)
    assert np.all((task_ds_preds >= 0) & (task_ds_preds <= 1))

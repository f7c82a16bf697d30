"""Few-shot support sampling, SeqToSeq sequence plumbing, and
ValidationCallback behaviors (reference deepchem/data/tests/
test_supports.py, models/tests/test_seqtoseq.py, callbacks usage)."""
import io

import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset


def _multitask_ds(n=60, n_tasks=3, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, 4)
    y = rng.randint(0, 2, (n, n_tasks)).astype(float)
    w = rng.randint(0, 2, (n, n_tasks)).astype(float)
    return NumpyDataset(X, y, w, np.arange(n))


def test_remove_dead_examples():
    from deepchem_tpu.data.supports import remove_dead_examples
    ds = _multitask_ds()
    w = np.asarray(ds.w).copy()
    w[:10] = 0.0
    ds = NumpyDataset(ds.X, ds.y, w, ds.ids)
    alive = remove_dead_examples(ds)
    assert len(alive) == (np.any(w != 0, axis=1)).sum()
    assert np.all(np.any(np.asarray(alive.w) != 0, axis=1))


def test_get_task_dataset_filters_unlabeled():
    from deepchem_tpu.data.supports import get_task_dataset
    ds = _multitask_ds()
    t1 = get_task_dataset(ds, 1)
    w = np.asarray(ds.w)
    assert len(t1) == int((w[:, 1] != 0).sum())
    # labels come from the selected task column
    keep = np.nonzero(w[:, 1] != 0)[0]
    np.testing.assert_allclose(np.asarray(t1.y).ravel(),
                               np.asarray(ds.y)[keep, 1])


def test_get_task_support_composition():
    from deepchem_tpu.data.supports import get_task_support
    np.random.seed(0)
    ds = _multitask_ds(n=100)
    supports = get_task_support(ds, n_episodes=4, n_pos=3, n_neg=5,
                                task=0)
    assert len(supports) == 4
    for s in supports:
        y = np.asarray(s.y).ravel()
        assert (y != 0).sum() == 3
        assert (y == 0).sum() == 5


def test_support_and_episode_generators():
    from deepchem_tpu.data.supports import (SupportGenerator,
                                            EpisodeGenerator)
    np.random.seed(1)
    ds = _multitask_ds(n=120)
    items = list(SupportGenerator(ds, n_pos=2, n_neg=2, n_trials=7))
    assert len(items) == 7
    for task, support in items:
        assert 0 <= task < 3
        assert len(support) == 4
    eps = list(EpisodeGenerator(ds, n_pos=2, n_neg=2, n_test=6,
                                n_episodes_per_task=2))
    assert len(eps) == 6                     # 3 tasks x 2 episodes
    # each task appears exactly twice
    tasks = sorted(t for t, _, _ in eps)
    assert tasks == [0, 0, 1, 1, 2, 2]
    for _, support, batch in eps:
        assert len(batch) == 6


# ---------------------------------------------------------------------------
# SeqToSeq plumbing (beyond the pretrain-suite overfit test)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def s2s():
    from deepchem_tpu.models import SeqToSeq
    return SeqToSeq(input_tokens=list('ABC'), output_tokens=list('XY'),
                    max_output_length=4, encoder_layers=1,
                    decoder_layers=1, embedding_dimension=16,
                    batch_size=4, learning_rate=0.01)


def test_seqtoseq_encoding_reverses_and_pads(s2s):
    enc = s2s._encode_input('AB', 5)
    # reverse_input=True: B A then pad token (=3)
    np.testing.assert_array_equal(enc, [1, 0, 3, 3, 3])
    out = s2s._encode_output('XYX')
    np.testing.assert_array_equal(out, [0, 1, 0, 2])


def test_seqtoseq_batches_pad_short_final_chunk(s2s):
    pairs = [('AB', 'XY'), ('CA', 'YX'), ('B', 'X')]
    batches = list(s2s._sequence_batches(pairs, 4))
    assert len(batches) == 1
    (X,), (Y,), (w,) = batches[0]
    assert X.shape == (4, 2)        # padded to batch_size by recycling
    assert Y.shape == (4, 4)
    np.testing.assert_array_equal(X[3], X[0])


def test_seqtoseq_train_and_predict_shapes(s2s):
    """Trained briefly on a constant mapping, predictions are token
    lists over the output alphabet."""
    pairs = [('AB', 'XY'), ('BA', 'XY'), ('CC', 'XY'), ('AC', 'XY')]
    for _ in range(100):
        loss = s2s.fit_sequences(pairs, checkpoint_interval=0)
    assert loss < 0.5
    preds = s2s.predict_from_sequences(['AB', 'CA'])
    assert len(preds) == 2
    for p in preds:
        assert all(t in ('X', 'Y') for t in p)
    # the constant target should be learned
    assert preds[0][:2] == ['X', 'Y']


def test_seqtoseq_embeddings(s2s):
    emb = s2s.predict_embeddings(['AB', 'BA']) \
        if hasattr(s2s, 'predict_embeddings') else None
    if emb is not None:
        assert np.asarray(emb).shape == (2, 16)


# ---------------------------------------------------------------------------
# ValidationCallback
# ---------------------------------------------------------------------------

def test_validation_callback_logs_and_saves_best(tmp_path):
    from deepchem_tpu.models import MultitaskRegressor
    from deepchem_tpu.models.callbacks import ValidationCallback
    from deepchem_tpu.metrics import Metric, mean_squared_error
    rng = np.random.RandomState(0)
    X = rng.randn(40, 5).astype(np.float32)
    y = X[:, :1]
    train, valid = NumpyDataset(X[:30], y[:30]), NumpyDataset(X[30:],
                                                              y[30:])
    model = MultitaskRegressor(n_tasks=1, n_features=5, layer_sizes=[8],
                               dropouts=0.0, batch_size=10,
                               learning_rate=0.01,
                               model_dir=str(tmp_path / 'm'))
    buf = io.StringIO()
    cb = ValidationCallback(valid, interval=3,
                            metrics=[Metric(mean_squared_error)],
                            output_file=buf,
                            save_dir=str(tmp_path / 'best'))
    model.fit(train, nb_epoch=20, callbacks=[cb])
    out = buf.getvalue()
    assert 'validation' in out and 'mean_squared_error' in out
    assert cb.get_best_score() is not None
    # best checkpoint was written
    import os
    assert os.path.isdir(str(tmp_path / 'best'))
    assert any(os.scandir(str(tmp_path / 'best')))
    # save_on_minimum=False negates the tracked score
    cb2 = ValidationCallback(valid, interval=1000, metrics=[],
                             save_on_minimum=False)
    cb2._best_score = -0.9
    assert cb2.get_best_score() == pytest.approx(0.9)

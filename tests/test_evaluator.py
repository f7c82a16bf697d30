"""Evaluator/GeneratorEvaluator and Metric-class behaviors not covered by
the shape-canonicalization suite (reference deepchem/utils/evaluate.py:142
and metrics/metric.py:422 behaviors: csv/stats output, transformer undo,
nan-task skipping, custom task averagers, sample weights)."""
import csv
import os

import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.metrics import (Metric, roc_auc_score, accuracy_score,
                                  mean_squared_error)


@pytest.fixture(scope='module')
def fitted_classifier():
    from deepchem_tpu.models import MultitaskClassifier
    rng = np.random.RandomState(0)
    X = rng.rand(60, 8).astype(np.float32)
    y = (X[:, 0] > 0.5).astype(float)[:, None]
    ds = NumpyDataset(X, y, ids=np.array([f'mol{i}' for i in range(60)]))
    model = MultitaskClassifier(n_tasks=1, n_features=8, layer_sizes=[16],
                                dropouts=0.0, batch_size=20)
    model.fit(ds, nb_epoch=30)
    return model, ds


def test_evaluator_outputs_csv_and_stats(fitted_classifier, tmp_path):
    from deepchem_tpu.utils.evaluate import Evaluator
    model, ds = fitted_classifier
    ev = Evaluator(model, ds)
    csv_out = str(tmp_path / 'preds.csv')
    stats_out = str(tmp_path / 'stats.txt')
    scores = ev.compute_model_performance(
        [Metric(roc_auc_score, np.mean)], csv_out=csv_out,
        stats_out=stats_out)
    assert scores['roc_auc_score'] > 0.7
    with open(csv_out) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == 'Compound'
    assert len(rows) == 61 and rows[1][0] == 'mol0'
    assert os.path.getsize(stats_out) > 0
    assert 'roc_auc_score' in open(stats_out).read()


def test_evaluator_per_task_and_callable_metric(fitted_classifier):
    from deepchem_tpu.utils.evaluate import Evaluator
    model, ds = fitted_classifier
    ev = Evaluator(model, ds)
    overall, per_task = ev.compute_model_performance(
        Metric(roc_auc_score, np.mean), per_task_metrics=True)
    assert overall['roc_auc_score'] == per_task['roc_auc_score'][0]
    # a bare sklearn callable is wrapped into a Metric automatically
    scores = ev.compute_model_performance(roc_auc_score)
    assert scores['roc_auc_score'] > 0.7
    with pytest.raises(ValueError):
        ev.compute_model_performance(['not-a-metric'])


def test_evaluator_undoes_y_transformers(tmp_path):
    """Scores must be computed in the untransformed label space."""
    from deepchem_tpu.models import MultitaskRegressor
    from deepchem_tpu.trans import NormalizationTransformer
    from deepchem_tpu.utils.evaluate import Evaluator
    rng = np.random.RandomState(1)
    X = rng.randn(50, 6).astype(np.float32)
    y = (X[:, :1] * 100.0 + 500.0).astype(np.float32)   # large scale
    ds = NumpyDataset(X, y)
    t = NormalizationTransformer(transform_y=True, dataset=ds)
    ds_t = t.transform(ds)
    model = MultitaskRegressor(n_tasks=1, n_features=6, layer_sizes=[16],
                               dropouts=0.0, batch_size=25,
                               learning_rate=0.01)
    model.fit(ds_t, nb_epoch=100)
    ev = Evaluator(model, ds_t, [t])
    scores = ev.compute_model_performance(
        [Metric(mean_squared_error, np.mean)])
    # the evaluator's score must equal MSE computed by hand in the RAW
    # label space (predict with undo + raw y)
    y_pred_raw = np.squeeze(model.predict(ds_t, [t]))
    manual = float(np.mean((np.squeeze(y) - y_pred_raw) ** 2))
    np.testing.assert_allclose(scores['mean_squared_error'], manual,
                               rtol=1e-5)


def test_generator_evaluator(fitted_classifier):
    from deepchem_tpu.utils.evaluate import GeneratorEvaluator
    model, ds = fitted_classifier

    def gen():
        for (Xb, yb, wb, _) in ds.iterbatches(batch_size=20,
                                              deterministic=True):
            yield ([Xb], [yb], [wb])

    ev = GeneratorEvaluator(model, gen(), labels=['y'])
    scores = ev.compute_model_performance(
        [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.7


def test_relative_difference():
    from deepchem_tpu.utils.evaluate import relative_difference
    a = np.array([1.0, 2.0])
    b = np.array([1.1, 1.9])
    np.testing.assert_allclose(relative_difference(a, b),
                               [0.05, 0.05], rtol=1e-6)
    np.testing.assert_allclose(relative_difference(a, a), 0.0)


# ---------------------------------------------------------------------------
# Metric-class behaviors
# ---------------------------------------------------------------------------

def test_metric_nan_task_skipped_in_average():
    """A sparse task with only one observed class contributes nan, and
    the average is over the valid tasks only (MUV-style folds)."""
    y = np.zeros((20, 2))
    y[:, 0] = np.arange(20) % 2
    y[:, 1] = 1.0                      # degenerate: one class only
    p = np.zeros((20, 2))
    p[:, 0] = y[:, 0] * 0.8 + 0.1
    p[:, 1] = 0.5
    m = Metric(roc_auc_score, np.mean)
    overall, per_task = m.compute_metric(y, p, n_tasks=2,
                                         per_task_metrics=True)
    assert np.isnan(per_task[1])
    np.testing.assert_allclose(overall, per_task[0])


def test_metric_all_tasks_nan_gives_nan():
    y = np.ones((10, 2))
    p = np.full((10, 2), 0.5)
    m = Metric(roc_auc_score, np.mean)
    assert np.isnan(m.compute_metric(y, p, n_tasks=2))


def test_metric_custom_task_averager():
    y = np.zeros((40, 2))
    y[::2, 0] = 1
    y[::4, 1] = 1
    rng = np.random.RandomState(0)
    p = np.clip(y * 0.5 + rng.rand(40, 2) * 0.5, 0, 1)
    mean_m = Metric(roc_auc_score, np.mean)
    min_m = Metric(roc_auc_score, np.min)
    _, per_task = mean_m.compute_metric(y, p, n_tasks=2,
                                        per_task_metrics=True)
    assert min_m.compute_metric(y, p, n_tasks=2) == min(per_task)


def test_metric_mode_inference_and_error():
    assert Metric(roc_auc_score).mode == 'classification'
    assert Metric(mean_squared_error).mode == 'regression'

    def mystery_fn(y, p):
        return 0.0
    with pytest.raises(ValueError):
        Metric(mystery_fn)
    assert Metric(mystery_fn, mode='regression').mode == 'regression'


def test_metric_use_sample_weights():
    """With sample weights, mislabeled points with weight 0.01 barely
    move accuracy; with uniform weights they do."""
    y = np.arange(20) % 2
    p = y.copy()
    p[:6] = 1 - p[:6]                 # 6 wrong
    w = np.ones(20)
    w[:6] = 0.01
    m = Metric(accuracy_score, np.mean)
    plain = m.compute_metric(y, p, n_tasks=1)
    weighted = m.compute_metric(y, p, np.ones((20, 1)) * w[:, None],
                                n_tasks=1, use_sample_weights=True)
    assert plain == pytest.approx(0.7)
    assert weighted > 0.95


def test_evaluate_on_device_matches_evaluate(fitted_classifier):
    """evaluate_on_device routes through predict_on_device (one scanned
    dispatch) and must score identically to the per-batch evaluate path."""
    model, ds = fitted_classifier
    metric = Metric(roc_auc_score, np.mean)
    host = model.evaluate(ds, [metric])
    dev = model.evaluate_on_device(ds, [metric])
    assert dev['roc_auc_score'] == pytest.approx(
        host['roc_auc_score'], abs=1e-6)


def test_evaluate_on_device_graph_model_with_transformers(tmp_path):
    """Graph-model variant with an undo-transform in the loop: the
    device path must apply the same untransform chain as evaluate."""
    from deepchem_tpu.feat import ConvMolFeaturizer
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.trans import NormalizationTransformer
    from deepchem_tpu.metrics import mean_absolute_error
    smiles = ['CCO', 'CCC', 'CCCC', 'CCN', 'CCCO', 'c1ccccc1',
              'CC(C)O', 'CCCCC', 'CCOC', 'CC=O', 'CCCN', 'c1ccncc1']
    X = ConvMolFeaturizer().featurize(smiles)
    rng = np.random.RandomState(0)
    y = rng.rand(len(smiles), 1) * 10 + 5
    ds = NumpyDataset(X, y)
    trans = NormalizationTransformer(transform_y=True, dataset=ds)
    ds_t = trans.transform(ds)
    model = GraphConvModel(n_tasks=1, mode='regression', batch_size=4,
                           graph_conv_layers=[16], dense_layer_size=16)
    model.fit(ds_t, nb_epoch=2)
    metric = Metric(mean_absolute_error, np.mean)
    host = model.evaluate(ds_t, [metric], [trans])
    dev = model.evaluate_on_device(ds_t, [metric], [trans])
    assert dev['mean_absolute_error'] == pytest.approx(
        host['mean_absolute_error'], rel=1e-4)


def test_predict_on_device_chunked_matches_predict(fitted_classifier):
    """S > 32 batches exercises the fixed-chunk scan (pad + trim): the
    chunked device path must agree with per-batch predict exactly."""
    model, _ = fitted_classifier
    rng = np.random.RandomState(1)
    X = rng.rand(700, 8).astype(np.float32)       # 35 batches of 20
    big = NumpyDataset(X, np.zeros((700, 1)))
    host = model.predict(big)
    dev = model.predict_on_device(big)
    assert dev.shape == host.shape
    np.testing.assert_allclose(np.asarray(dev), np.asarray(host),
                               rtol=1e-5, atol=1e-6)

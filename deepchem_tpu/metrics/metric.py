"""Metric computation with shape canonicalization.

Redesign of reference deepchem/metrics/metric.py (1597 LoC): the
normalize_weight_shape / normalize_labels_shape / normalize_prediction_shape
corner cases (reference metric.py:41-370) are where silent score drift comes
from (SURVEY.md section 7 'hard parts'), so they are reproduced carefully.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)


def to_one_hot(y: np.ndarray, n_classes: int = 2) -> np.ndarray:
    """(N,) or (N,1) labels -> (N, n_classes) one-hot (reference
    metric.py:371).

    Examples
    --------
    >>> import numpy as np
    >>> to_one_hot(np.array([0, 1, 1]))
    array([[1., 0.],
           [0., 1.],
           [0., 1.]])
    """
    y = np.asarray(y)
    if y.ndim == 2 and y.shape[1] == 1:
        y = y[:, 0]
    if y.ndim != 1:
        raise ValueError('y must be 1-D or (N,1)')
    n = len(y)
    out = np.zeros((n, n_classes))
    out[np.arange(n), np.round(y).astype(int)] = 1
    return out


def from_one_hot(y: np.ndarray, axis: int = 1) -> np.ndarray:
    """(reference metric.py:400)"""
    return np.argmax(y, axis=axis)


def normalize_weight_shape(w: Optional[np.ndarray], n_samples: int,
                           n_tasks: int) -> np.ndarray:
    """-> (n_samples, n_tasks) weight array (reference metric.py:41)."""
    if w is None:
        return np.ones((n_samples, n_tasks))
    w = np.asarray(w)
    if w.ndim == 0:
        return np.full((n_samples, n_tasks), float(w))
    if w.ndim == 1:
        if len(w) != n_samples:
            raise ValueError('1-D w must have length n_samples')
        return np.tile(w[:, None], (1, n_tasks))
    if w.ndim == 2:
        if w.shape == (n_samples, 1):
            return np.tile(w, (1, n_tasks))
        if w.shape == (n_samples, n_tasks):
            return w
        raise ValueError(f'bad w shape {w.shape}')
    raise ValueError('w must be of dimension 0..2')


def normalize_labels_shape(y: np.ndarray, mode: Optional[str] = None,
                           n_tasks: Optional[int] = None,
                           n_classes: Optional[int] = None) -> np.ndarray:
    """-> (n_samples, n_tasks) for regression or
    (n_samples, n_tasks, n_classes) for classification (reference
    metric.py:104)."""
    y = np.asarray(y)
    if n_tasks is None:
        n_tasks = 1
    if mode not in ('classification', 'regression'):
        raise ValueError('mode must be classification or regression')
    if n_classes is None:
        n_classes = 2
    if y.ndim == 1:
        y = y[:, None]
    if y.ndim == 2:
        if n_tasks == 1 and y.shape[1] > 1:
            # could be (n_samples, n_classes) probabilities for one task
            if mode == 'classification' and y.shape[1] == n_classes:
                y = y[:, None, :]
            else:
                raise ValueError(f'bad y shape {y.shape}')
        elif y.shape[1] == n_tasks:
            pass
        else:
            raise ValueError(f'bad y shape {y.shape} for n_tasks={n_tasks}')
    if mode == 'classification':
        if y.ndim == 2:
            # class indices -> one hot
            out = np.zeros((y.shape[0], y.shape[1], n_classes))
            for t in range(y.shape[1]):
                out[:, t, :] = to_one_hot(y[:, t], n_classes)
            y = out
        elif y.ndim != 3:
            raise ValueError('classification y must be <=3-D')
    else:
        if y.ndim == 3 and y.shape[2] == 1:
            y = y[:, :, 0]
        elif y.ndim != 2:
            raise ValueError('regression y must be 2-D')
    return y


def normalize_prediction_shape(y: np.ndarray, mode: Optional[str] = None,
                               n_tasks: Optional[int] = None,
                               n_classes: Optional[int] = None
                               ) -> np.ndarray:
    """Like normalize_labels_shape but keeps probabilities for
    classification (reference metric.py:182)."""
    y = np.asarray(y)
    if n_tasks is None:
        n_tasks = 1
    if n_classes is None:
        n_classes = 2
    if mode == 'classification':
        if y.ndim == 1:
            # class indices
            return to_one_hot(y, n_classes)[:, None, :]
        if y.ndim == 2:
            if n_tasks == 1:
                if y.shape[1] == n_classes:
                    return y[:, None, :]
                if y.shape[1] == 1:
                    return np.stack([1 - y[:, 0], y[:, 0]], axis=1)[:, None, :]
                raise ValueError(f'bad prediction shape {y.shape}')
            if y.shape[1] == n_tasks:
                # class indices or probabilities of positive class
                if np.issubdtype(y.dtype, np.integer) or \
                        np.all(np.isin(np.unique(np.round(y) - y), [0.0])):
                    out = np.zeros((y.shape[0], n_tasks, n_classes))
                    for t in range(n_tasks):
                        out[:, t, :] = to_one_hot(y[:, t], n_classes)
                    return out
                if n_classes == 2:
                    out = np.zeros((y.shape[0], n_tasks, 2))
                    out[:, :, 1] = y
                    out[:, :, 0] = 1 - y
                    return out
                raise ValueError(f'bad prediction shape {y.shape}')
            raise ValueError(f'bad prediction shape {y.shape}')
        if y.ndim == 3:
            return y
        raise ValueError('classification predictions must be <=3-D')
    elif mode == 'regression':
        if y.ndim == 1:
            return y[:, None]
        if y.ndim == 2:
            return y
        if y.ndim == 3 and y.shape[2] == 1:
            return y[:, :, 0]
        raise ValueError('regression predictions must be <=2-D')
    raise ValueError('mode must be classification or regression')


def handle_classification_mode(
        y: np.ndarray, classification_handling_mode: Optional[str],
        threshold_value: Optional[float] = None) -> np.ndarray:
    """Convert (N, T, C) probabilities per classification_handling_mode
    (reference metric.py:298): None -> keep probabilities;
    'threshold' -> class indices; 'threshold-one-hot' -> one hot."""
    if classification_handling_mode is None:
        return y
    if y.ndim != 3:
        raise ValueError('expected (N, T, C) probabilities')
    N, T, C = y.shape
    if classification_handling_mode == 'threshold':
        out = np.zeros((N, T))
        for t in range(T):
            out[:, t] = threshold_predictions(y[:, t, :], threshold_value)
        return out
    if classification_handling_mode == 'threshold-one-hot':
        out = np.zeros_like(y)
        for t in range(T):
            idx = threshold_predictions(y[:, t, :], threshold_value)
            out[:, t, :] = to_one_hot(idx, C)
        return out
    raise ValueError(f'bad classification_handling_mode '
                     f'{classification_handling_mode}')


def threshold_predictions(y: np.ndarray,
                          threshold: Optional[float] = None) -> np.ndarray:
    """(N, C) probabilities -> (N,) class indices (reference
    metrics/__init__ threshold_predictions)."""
    y = np.asarray(y)
    if threshold is not None and y.shape[1] == 2:
        return (y[:, 1] >= threshold).astype(int)
    return np.argmax(y, axis=1)


# -- mode auto-detection tables (reference metric.py:516-540) --------------
_CLASSIFICATION_FN_NAMES = {
    'roc_auc_score', 'accuracy_score', 'balanced_accuracy_score',
    'f1_score', 'recall_score', 'precision_score', 'matthews_corrcoef',
    'cohen_kappa_score', 'prc_auc_score', 'jaccard_score', 'bedroc_score',
    'jaccard_index', 'pixel_error', 'kappa_score',
}
_REGRESSION_FN_NAMES = {
    'mean_squared_error', 'mean_absolute_error', 'r2_score', 'rms_score',
    'mae_score', 'pearson_r2_score', 'median_absolute_error',
    'pearsonr', 'concordance_index', 'rmse', 'mean_squared_log_error',
}
# metrics computed on thresholded class labels rather than probabilities
_THRESHOLD_METRICS = {
    'accuracy_score', 'balanced_accuracy_score', 'f1_score', 'recall_score',
    'precision_score', 'matthews_corrcoef', 'cohen_kappa_score',
    'jaccard_score', 'jaccard_index', 'pixel_error', 'kappa_score',
}


class Metric:
    """Wraps a scoring function with shape canonicalization and a per-task
    averaging loop (reference metric.py:422)."""

    def __init__(self, metric: Callable, task_averager: Optional[Callable] = None,
                 name: Optional[str] = None, threshold: Optional[float] = None,
                 mode: Optional[str] = None, n_tasks: Optional[int] = None,
                 classification_handling_mode: Optional[str] = None,
                 threshold_value: Optional[float] = None):
        self.metric = metric
        self.task_averager = task_averager or np.mean
        self.name = name or getattr(metric, '__name__', 'unknown_metric')
        self.n_tasks = n_tasks
        fn_name = getattr(metric, '__name__', '')
        if mode is None:
            if fn_name in _CLASSIFICATION_FN_NAMES:
                mode = 'classification'
            elif fn_name in _REGRESSION_FN_NAMES:
                mode = 'regression'
            else:
                raise ValueError(
                    f'cannot infer mode for metric {fn_name}; pass mode=')
        self.mode = mode
        if classification_handling_mode is None \
                and mode == 'classification' \
                and fn_name in _THRESHOLD_METRICS:
            classification_handling_mode = 'threshold'
        self.classification_handling_mode = classification_handling_mode
        self.threshold_value = threshold_value

    def compute_metric(self, y_true: np.ndarray, y_pred: np.ndarray,
                       w: Optional[np.ndarray] = None,
                       n_tasks: Optional[int] = None,
                       n_classes: int = 2,
                       per_task_metrics: bool = False,
                       use_sample_weights: bool = False,
                       **kwargs) -> Union[float, tuple]:
        """(reference metric.py:568)"""
        y_true = np.asarray(y_true)
        if n_tasks is None:
            if self.n_tasks is not None:
                n_tasks = self.n_tasks
            elif y_true.ndim > 1:
                n_tasks = y_true.shape[1]
                if self.mode == 'classification' and y_true.ndim == 2 \
                        and n_tasks == n_classes and n_tasks > 1:
                    pass  # ambiguous; trust shape[1]
            else:
                n_tasks = 1
        y_true = normalize_labels_shape(y_true, self.mode, n_tasks,
                                        n_classes)
        y_pred = normalize_prediction_shape(np.asarray(y_pred), self.mode,
                                            n_tasks, n_classes)
        if self.mode == 'classification':
            n_classes = y_pred.shape[-1]
        n_samples = y_true.shape[0]
        w = normalize_weight_shape(w, n_samples, n_tasks)
        computed_metrics = []
        for t in range(n_tasks):
            yt = y_true[:, t]
            yp = y_pred[:, t]
            wt = w[:, t]
            try:
                task_val = self.compute_singletask_metric(
                    yt, yp, wt, n_samples=n_samples,
                    use_sample_weights=use_sample_weights, **kwargs)
            except Exception as e:
                # e.g. a fold where a sparse task has only one class
                # (MUV); skip the task like the reference's evaluator
                logger.warning('error computing %s for task %d: %s',
                               self.name, t, e)
                task_val = np.nan
            computed_metrics.append(task_val)
        logger.debug('computed_metrics: %s', computed_metrics)
        if n_tasks == 1:
            overall = computed_metrics[0]
        else:
            valid = [v for v in computed_metrics if not np.isnan(v)]
            overall = (self.task_averager(valid) if valid
                       else float('nan'))
        if per_task_metrics:
            return overall, computed_metrics
        return overall

    def compute_singletask_metric(self, y_true, y_pred, w=None,
                                  n_samples=None,
                                  use_sample_weights: bool = False,
                                  **kwargs) -> float:
        """(reference metric.py:667)"""
        y_true = np.asarray(y_true)
        y_pred = np.asarray(y_pred)
        if w is not None:
            w = np.asarray(w)
            keep = w != 0
            if keep.ndim > 1:
                keep = keep.any(axis=tuple(range(1, keep.ndim)))
            y_true = y_true[keep]
            y_pred = y_pred[keep]
            w = w[keep]
        if self.mode == 'classification':
            y_pred = handle_classification_mode(
                y_pred[:, None, :], self.classification_handling_mode,
                self.threshold_value)[:, 0]
            # labels are one-hot -> indices for sklearn-style metrics
            y_true_idx = from_one_hot(y_true) if y_true.ndim == 2 else y_true
            fn_name = getattr(self.metric, '__name__', '')
            if self.classification_handling_mode in ('threshold',):
                y_in = y_pred if y_pred.ndim == 1 else from_one_hot(y_pred)
                args = (y_true_idx, y_in)
            elif fn_name in ('roc_auc_score', 'prc_auc_score',
                             'bedroc_score'):
                # probability-of-positive for binary
                if y_pred.ndim == 2 and y_pred.shape[1] == 2:
                    args = (y_true_idx, y_pred[:, 1])
                else:
                    args = (y_true, y_pred)
            else:
                args = (y_true, y_pred)
        else:
            args = (y_true, y_pred)
        if use_sample_weights and w is not None:
            return float(self.metric(*args, sample_weight=w, **kwargs))
        return float(self.metric(*args, **kwargs))

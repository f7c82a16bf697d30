"""Extra scoring functions beyond sklearn (reference
deepchem/metrics/score_function.py:25-186)."""

from __future__ import annotations

import numpy as np

from sklearn.metrics import (                      # noqa: F401 re-exports
    accuracy_score, balanced_accuracy_score, auc, f1_score,
    jaccard_score, matthews_corrcoef, precision_recall_curve,
    precision_score, recall_score, roc_auc_score, roc_curve,
    top_k_accuracy_score,
    cohen_kappa_score, mean_absolute_error, mean_squared_error,
    median_absolute_error, r2_score)


def pearson_r2_score(y: np.ndarray, y_pred: np.ndarray) -> float:
    """Squared Pearson correlation (reference score_function.py:25)."""
    y = np.asarray(y, dtype=float).reshape(-1)
    y_pred = np.asarray(y_pred, dtype=float).reshape(-1)
    if y.std() == 0 or y_pred.std() == 0:
        return 0.0
    return float(np.corrcoef(y, y_pred)[0, 1] ** 2)


def pearsonr(y: np.ndarray, y_pred: np.ndarray) -> float:
    y = np.asarray(y, dtype=float).reshape(-1)
    y_pred = np.asarray(y_pred, dtype=float).reshape(-1)
    if y.std() == 0 or y_pred.std() == 0:
        return 0.0
    return float(np.corrcoef(y, y_pred)[0, 1])


def jaccard_index(y: np.ndarray, y_pred: np.ndarray) -> float:
    """(deprecated alias of jaccard_score, reference :66)"""
    return float(jaccard_score(y, y_pred))


def pixel_error(y: np.ndarray, y_pred: np.ndarray) -> float:
    """1 - f1 (reference score_function.py:84)."""
    return 1.0 - float(f1_score(np.asarray(y).ravel(),
                                np.asarray(y_pred).ravel()))


def prc_auc_score(y: np.ndarray, y_pred: np.ndarray) -> float:
    """Area under precision-recall curve (reference :103)."""
    precision, recall, _ = precision_recall_curve(y, y_pred)
    return float(auc(recall, precision))


def rms_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """RMSD (reference :118)."""
    return float(np.sqrt(mean_squared_error(y_true, y_pred)))


def mae_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """(reference :131)"""
    return float(mean_absolute_error(y_true, y_pred))


def kappa_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(cohen_kappa_score(y_true, y_pred))


def bedroc_score(y_true: np.ndarray, y_pred: np.ndarray,
                 alpha: float = 20.0) -> float:
    """BEDROC early-recognition score (reference :144; Truchon & Bayly
    2007)."""
    y_true = np.asarray(y_true)
    if y_true.ndim == 2:
        y_true = y_true[:, 1] if y_true.shape[1] == 2 else y_true.ravel()
    scores = np.asarray(y_pred, dtype=float)
    if scores.ndim == 2:
        scores = scores[:, 1] if scores.shape[1] == 2 else scores.ravel()
    N = len(y_true)
    n = int(np.sum(y_true))
    if n == 0 or n == N:
        return 0.0
    order = np.argsort(-scores, kind='stable')
    ranks = np.nonzero(y_true[order])[0] + 1       # 1-indexed ranks
    ra = n / N
    s = np.sum(np.exp(-alpha * ranks / N))
    rie = s / (n / N * (1 - np.exp(-alpha)) /
               (np.exp(alpha / N) - 1))
    bedroc = (rie * ra * np.sinh(alpha / 2) /
              (np.cosh(alpha / 2) - np.cosh(alpha / 2 - alpha * ra))
              + 1 / (1 - np.exp(alpha * (1 - ra))))
    return float(bedroc)


def concordance_index(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """C-index over all comparable pairs (reference :160)."""
    y_true = np.asarray(y_true, dtype=float).ravel()
    y_pred = np.asarray(y_pred, dtype=float).ravel()
    order = np.argsort(y_true, kind='stable')
    y_true, y_pred = y_true[order], y_pred[order]
    total = 0.0
    matches = 0.0
    n = len(y_true)
    for i in range(n):
        gt = y_true[i + 1:] > y_true[i]
        total += gt.sum()
        matches += (y_pred[i + 1:][gt] > y_pred[i]).sum()
        matches += 0.5 * (y_pred[i + 1:][gt] == y_pred[i]).sum()
    return float(matches / total) if total > 0 else 0.0


def rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return rms_score(y_true, y_pred)

"""Abstract Model: the fit/predict/evaluate contract.

Redesign of reference deepchem/models/models.py:22 — directory management and
the evaluation delegation to Evaluator (models.py:162).
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
from typing import Any, List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)


class Model:
    """Abstract base for all models (reference models/models.py:22)."""

    def __init__(self, model=None, model_dir: Optional[str] = None,
                 **kwargs) -> None:
        if model_dir is not None:
            os.makedirs(model_dir, exist_ok=True)
            self.model_dir_is_temp = False
        else:
            model_dir = tempfile.mkdtemp()
            self.model_dir_is_temp = True
        self.model_dir = model_dir
        self.model = model
        self.model_class = model.__class__ if model is not None else None

    def __del__(self):
        try:
            if getattr(self, 'model_dir_is_temp', False):
                shutil.rmtree(self.model_dir, ignore_errors=True)
        except Exception:
            pass

    def fit_on_batch(self, X, y, w):
        raise NotImplementedError

    def predict_on_batch(self, X, **kwargs):
        raise NotImplementedError

    def reload(self) -> None:
        raise NotImplementedError

    @staticmethod
    def get_model_filename(model_dir: str) -> str:
        return os.path.join(model_dir, 'model.joblib')

    @staticmethod
    def get_params_filename(model_dir: str) -> str:
        return os.path.join(model_dir, 'model_params.joblib')

    def save(self) -> None:
        raise NotImplementedError

    def fit(self, dataset, nb_epoch: int = 10, **kwargs):
        raise NotImplementedError

    def predict(self, dataset, transformers: Sequence = ()) -> np.ndarray:
        """Batch predictions with transforms undone (reference
        models.py:119)."""
        y_preds = []
        for X_b, _, _, _ in dataset.iterbatches(deterministic=True):
            y_preds.append(self.predict_on_batch(X_b))
        y_pred = np.concatenate(y_preds)
        from deepchem_tpu.trans import undo_transforms
        return undo_transforms(y_pred, transformers)

    def evaluate(self, dataset, metrics: Union[Any, Sequence],
                 transformers: Sequence = (),
                 per_task_metrics: bool = False,
                 use_sample_weights: bool = False,
                 n_classes: int = 2):
        """Delegates to Evaluator (reference models.py:162)."""
        from deepchem_tpu.utils.evaluate import Evaluator
        evaluator = Evaluator(self, dataset, transformers)
        return evaluator.compute_model_performance(
            metrics, per_task_metrics=per_task_metrics,
            use_sample_weights=use_sample_weights, n_classes=n_classes)

    def get_task_type(self) -> str:
        raise NotImplementedError

    def get_num_tasks(self) -> int:
        raise NotImplementedError

"""SklearnModel wrapper (reference deepchem/models/sklearn_models/
sklearn_model.py:20): joblib-pickled sklearn estimators behind the Model
API."""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.base import Model
from deepchem_tpu.utils.data_utils import load_from_disk, save_to_disk

logger = logging.getLogger(__name__)


class SklearnModel(Model):
    """Wrap any sklearn estimator."""

    def __init__(self, model, model_dir: Optional[str] = None,
                 use_weights: bool = True, **kwargs):
        super().__init__(model, model_dir, **kwargs)
        self.use_weights = use_weights

    def fit(self, dataset: Dataset, **kwargs) -> None:
        X = np.asarray(dataset.X, dtype=float)
        y = np.squeeze(dataset.y)
        w = np.squeeze(dataset.w)
        try:
            if self.use_weights and w is not None and np.ndim(w) == 1:
                self.model.fit(X, y, sample_weight=w)
            else:
                self.model.fit(X, y)
        except TypeError:
            self.model.fit(X, y)

    def predict_on_batch(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        if hasattr(self.model, 'predict_proba'):
            out = self.model.predict_proba(X)
            if isinstance(out, list):        # multitask
                out = np.stack(out, axis=1)
            return out
        return self.model.predict(X)

    def predict(self, dataset: Dataset,
                transformers: Sequence = ()) -> np.ndarray:
        from deepchem_tpu.trans import undo_transforms
        preds = self.predict_on_batch(dataset.X)
        return undo_transforms(preds, transformers)

    def save(self) -> None:
        save_to_disk(self.model, self.get_model_filename(self.model_dir))

    def reload(self) -> None:
        self.model = load_from_disk(self.get_model_filename(self.model_dir))

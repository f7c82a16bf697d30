"""GBDTModel: gradient-boosted trees with early stopping (reference
deepchem/models/gbdt_models/gbdt_model.py:21).  Works with any
sklearn-API booster (XGBoost/LightGBM when installed, sklearn
GradientBoosting otherwise)."""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.sklearn_models import SklearnModel

logger = logging.getLogger(__name__)


class GBDTModel(SklearnModel):
    """Gradient-boosted decision trees behind the Model API."""

    def __init__(self, model, model_dir: Optional[str] = None,
                 early_stopping_rounds: int = 50,
                 eval_metric=None, **kwargs):
        super().__init__(model, model_dir, **kwargs)
        self.early_stopping_rounds = early_stopping_rounds
        self.eval_metric = eval_metric

    def fit(self, dataset: Dataset, **kwargs) -> None:
        X = np.asarray(dataset.X, dtype=float)
        y = np.squeeze(dataset.y)
        # hold out 20% for early stopping like the reference
        n = len(X)
        cut = max(1, int(0.8 * n))
        try:
            self.model.fit(
                X[:cut], y[:cut],
                eval_set=[(X[cut:], y[cut:])],
                early_stopping_rounds=self.early_stopping_rounds)
        except TypeError:
            self.model.fit(X, y)

    def fit_with_eval(self, train: Dataset, valid: Dataset) -> None:
        X, y = np.asarray(train.X, dtype=float), np.squeeze(train.y)
        Xv, yv = np.asarray(valid.X, dtype=float), np.squeeze(valid.y)
        try:
            self.model.fit(X, y, eval_set=[(Xv, yv)],
                           early_stopping_rounds=self.early_stopping_rounds)
        except TypeError:
            self.model.fit(X, y)

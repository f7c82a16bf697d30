"""SingletaskToMultitask: train one singletask model per task (reference
deepchem/models/multitask.py:15)."""

from __future__ import annotations

import logging
import os
from typing import Callable, List, Sequence

import numpy as np

from deepchem_tpu.data import Dataset, NumpyDataset
from deepchem_tpu.models.base import Model

logger = logging.getLogger(__name__)


class SingletaskToMultitask(Model):
    """Run an independent singletask model per task.

    ``model_builder(task) -> Model``; rows with w=0 for a task are dropped
    from that task's training set (matching reference behavior).
    """

    def __init__(self, tasks: Sequence, model_builder: Callable,
                 model_dir=None, **kwargs):
        super().__init__(model=None, model_dir=model_dir, **kwargs)
        self.tasks = list(tasks)
        self.models: List[Model] = [model_builder(t) for t in self.tasks]

    def fit(self, dataset: Dataset, **kwargs) -> None:
        X = np.asarray(dataset.X, dtype=float)
        y = dataset.y
        w = dataset.w
        for t, model in enumerate(self.models):
            keep = w[:, t] != 0
            sub = NumpyDataset(X[keep], y[keep, t], w[keep, t])
            logger.info('fitting task %s on %d samples', self.tasks[t],
                        keep.sum())
            model.fit(sub, **kwargs)

    def predict_on_batch(self, X) -> np.ndarray:
        preds = []
        for model in self.models:
            p = model.predict_on_batch(X)
            preds.append(np.asarray(p))
        # classification probas -> (n, tasks, classes);
        # regression -> (n, tasks)
        if preds[0].ndim == 2 and preds[0].shape[1] > 1:
            return np.stack(preds, axis=1)
        return np.stack([p.reshape(len(p)) for p in preds], axis=1)

    def predict(self, dataset: Dataset, transformers=()) -> np.ndarray:
        from deepchem_tpu.trans import undo_transforms
        out = self.predict_on_batch(np.asarray(dataset.X, dtype=float))
        return undo_transforms(out, transformers)

    def save(self) -> None:
        for t, model in enumerate(self.models):
            model.save()

    def reload(self) -> None:
        for model in self.models:
            model.reload()

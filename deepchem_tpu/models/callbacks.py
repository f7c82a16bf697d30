"""Training callbacks (reference deepchem/models/callbacks.py:7)."""

from __future__ import annotations

import logging
import sys
from typing import Callable, Optional, Sequence

logger = logging.getLogger(__name__)


class ValidationCallback:
    """Periodic validation, best-checkpoint save, early-stop interval
    (reference callbacks.py:7)."""

    def __init__(self, dataset, interval: int, metrics: Sequence,
                 output_file=sys.stdout,
                 save_dir: Optional[str] = None,
                 save_metric: int = 0,
                 save_on_minimum: bool = True,
                 transformers: Sequence = ()):
        self.dataset = dataset
        self.interval = interval
        self.metrics = metrics
        self.output_file = output_file
        self.save_dir = save_dir
        self.save_metric = save_metric
        self.save_on_minimum = save_on_minimum
        self.transformers = transformers
        self._best_score: Optional[float] = None

    def __call__(self, model, step: int) -> None:
        if step % self.interval != 0:
            return
        scores = model.evaluate(self.dataset, self.metrics,
                                self.transformers)
        message = f'Step {step} validation:'
        for key in scores:
            message += f' {key}={scores[key]:g}'
        if self.output_file is not None:
            print(message, file=self.output_file)
        if model.tensorboard_logger is not None:
            for key in scores:
                model.tensorboard_logger.log_scalar(
                    f'valid/{key}', scores[key], step)
        if self.save_dir is not None:
            metric_name = list(scores.keys())[self.save_metric]
            score = scores[metric_name]
            if not self.save_on_minimum:
                score = -score
            if self._best_score is None or score < self._best_score:
                model.save_checkpoint(model_dir=self.save_dir)
                self._best_score = score

    def get_best_score(self) -> Optional[float]:
        if self._best_score is None:
            return None
        return -self._best_score if not self.save_on_minimum \
            else self._best_score

"""Evaluator: predict -> undo transforms -> per-metric scores.

Redesign of reference deepchem/utils/evaluate.py:142 (Evaluator) and :335
(GeneratorEvaluator).
"""

from __future__ import annotations

import csv
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from deepchem_tpu.metrics import Metric

logger = logging.getLogger(__name__)


def relative_difference(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(reference evaluate.py:21)"""
    return np.abs(x - y) / np.abs(max(np.max(np.abs(x)),
                                      np.max(np.abs(y)), 1e-12))


def _process_metric_input(metrics) -> List[Metric]:
    """Accept Metric, callable, or lists thereof (reference
    evaluate.py:40)."""
    if not isinstance(metrics, (list, tuple)):
        metrics = [metrics]
    out = []
    for m in metrics:
        if isinstance(m, Metric):
            out.append(m)
        elif callable(m):
            out.append(Metric(m))
        else:
            raise ValueError(f'not a metric: {m}')
    return out


class Evaluator:
    """Model performance on a dataset (reference evaluate.py:142)."""

    def __init__(self, model, dataset, transformers: Sequence = (),
                 use_device_path: bool = False):
        self.model = model
        self.dataset = dataset
        self.output_transformers = [
            t for t in transformers if t.transform_y]
        # when set, prediction goes through model.predict_on_device —
        # one scanned dispatch instead of a tunnel round trip per batch
        # (measured on the MUV scale run: per-batch dispatch latency,
        # not compute, dominated evaluation wall-clock)
        self.use_device_path = (use_device_path and
                                hasattr(model, 'predict_on_device'))

    def output_statistics(self, scores: Dict, stats_out: str) -> None:
        with open(stats_out, 'w') as f:
            f.write(str(scores) + '\n')

    def output_predictions(self, y_preds: np.ndarray, csv_out: str) -> None:
        mol_ids = self.dataset.ids
        n_tasks = len(self.dataset.get_task_names())
        y_preds = np.asarray(y_preds)
        if y_preds.ndim == 3:
            # classification (N, tasks, classes): write the probability
            # of the positive/last class per task
            y_preds = y_preds[:, :, -1]
        y_preds = np.reshape(y_preds, (len(y_preds), n_tasks))
        with open(csv_out, 'w') as f:
            writer = csv.writer(f)
            writer.writerow(['Compound'] +
                            list(self.dataset.get_task_names()))
            for mol_id, y_pred in zip(mol_ids, y_preds):
                writer.writerow([mol_id] + list(y_pred))

    def compute_model_performance(
            self, metrics, csv_out: Optional[str] = None,
            stats_out: Optional[str] = None,
            per_task_metrics: bool = False,
            use_sample_weights: bool = False,
            n_classes: int = 2) -> Union[Dict, Tuple[Dict, Dict]]:
        """(reference evaluate.py:246)"""
        metrics = _process_metric_input(metrics)
        y = self.dataset.y
        w = self.dataset.w
        if self.use_device_path:
            y_pred = self.model.predict_on_device(
                self.dataset, self.output_transformers)
        else:
            y_pred = self.model.predict(self.dataset,
                                        self.output_transformers)
        if csv_out is not None:
            self.output_predictions(y_pred, csv_out)
        # labels must be untransformed the same way
        from deepchem_tpu.trans import undo_transforms
        y = undo_transforms(y, self.output_transformers)
        n_tasks = y.shape[1] if y.ndim > 1 else 1
        multitask_scores = {}
        all_task_scores = {}
        for metric in metrics:
            results = metric.compute_metric(
                y, y_pred, w, per_task_metrics=per_task_metrics,
                n_tasks=n_tasks, n_classes=n_classes,
                use_sample_weights=use_sample_weights)
            if per_task_metrics:
                multitask_scores[metric.name] = results[0]
                all_task_scores[metric.name] = results[1]
            else:
                multitask_scores[metric.name] = results
        if stats_out is not None:
            self.output_statistics(multitask_scores, stats_out)
        if per_task_metrics:
            return multitask_scores, all_task_scores
        return multitask_scores


class GeneratorEvaluator:
    """Evaluate over a generator (reference evaluate.py:335)."""

    def __init__(self, model, generator, transformers: Sequence = (),
                 labels: Optional[Sequence] = None,
                 weights: Optional[Sequence] = None):
        self.model = model
        self.generator = generator
        self.output_transformers = [
            t for t in transformers if t.transform_y]
        self.label_keys = labels
        self.weights = weights

    def compute_model_performance(self, metrics,
                                  per_task_metrics: bool = False):
        metrics = _process_metric_input(metrics)
        y_labels, w_all, batches = [], [], []
        for batch in self.generator:
            inputs, labels, weights = batch
            batches.append((inputs, None, None, None))
            y_labels.append(labels[0] if isinstance(labels, (list, tuple))
                            else labels)
            if weights:
                w_all.append(weights[0]
                             if isinstance(weights, (list, tuple))
                             else weights)

        def gen():
            for inputs, _, _, _ in batches:
                yield (inputs, [], [])
        y_pred = self.model.predict_on_generator(gen())
        y = np.concatenate(y_labels, axis=0)
        from deepchem_tpu.trans import undo_transforms
        y = undo_transforms(y, self.output_transformers)
        y_pred = undo_transforms(y_pred, self.output_transformers)
        y_pred = y_pred[:len(y)]
        w = np.concatenate(w_all, axis=0) if w_all else None
        n_tasks = y.shape[1] if y.ndim > 1 else 1
        multitask_scores = {}
        all_task_scores = {}
        for metric in metrics:
            results = metric.compute_metric(
                y, y_pred, w, per_task_metrics=per_task_metrics,
                n_tasks=n_tasks)
            if per_task_metrics:
                multitask_scores[metric.name] = results[0]
                all_task_scores[metric.name] = results[1]
            else:
                multitask_scores[metric.name] = results
        if per_task_metrics:
            return multitask_scores, all_task_scores
        return multitask_scores


def output_statistics(scores: Dict, stats_out: str) -> None:
    """Write a computed-stats dict to a file (reference
    evaluate.py:20 module-level function)."""
    with open(stats_out, 'w') as f:
        f.write(str(scores))


def output_predictions(dataset, y_preds: np.ndarray,
                       csv_out: str) -> None:
    """Write per-id predictions to CSV (reference evaluate.py:37
    module-level function)."""
    import csv
    data_ids = dataset.ids
    n_tasks = len(dataset.get_task_names())
    y_preds = np.reshape(y_preds, (len(y_preds), n_tasks))
    with open(csv_out, 'w', newline='') as f:
        writer = csv.writer(f)
        writer.writerow(['ID'] + list(dataset.get_task_names()))
        for mol_id, y_pred in zip(data_ids, y_preds):
            writer.writerow([mol_id] + list(y_pred))

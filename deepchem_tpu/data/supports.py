"""Episode/support sampling for low-data learning (reference
deepchem/data/supports.py:246 EpisodeGenerator, :324 SupportGenerator,
:12 remove_dead_examples)."""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from deepchem_tpu.data.datasets import Dataset, NumpyDataset


def remove_dead_examples(dataset: Dataset) -> NumpyDataset:
    """Drop datapoints whose weights are all zero (reference
    supports.py:12)."""
    w = np.asarray(dataset.w)
    alive = np.nonzero(np.any(w != 0, axis=tuple(range(1, w.ndim))))[0]
    return NumpyDataset(dataset.X[alive], dataset.y[alive], w[alive],
                        dataset.ids[alive])


def get_task_dataset(dataset: Dataset, task: int) -> NumpyDataset:
    """Restrict to one task's labeled rows (reference supports.py
    get_task_dataset)."""
    w = np.asarray(dataset.w)
    keep = np.nonzero(w[:, task] != 0)[0]
    return NumpyDataset(dataset.X[keep], dataset.y[keep, task],
                        w[keep, task], dataset.ids[keep])


def get_single_task_test(dataset: Dataset, batch_size: int, task: int,
                         replace: bool = True):
    """Sample a test batch for one task (reference supports.py)."""
    task_ds = get_task_dataset(dataset, task)
    n = len(task_ds)
    idx = np.random.choice(n, size=min(batch_size, n), replace=replace)
    return NumpyDataset(task_ds.X[idx], task_ds.y[idx], task_ds.w[idx],
                        task_ds.ids[idx])


def get_task_support(dataset: Dataset, n_episodes: int, n_pos: int,
                     n_neg: int, task: int):
    """Sample support sets (reference supports.py get_task_support)."""
    task_ds = get_task_dataset(dataset, task)
    y = np.asarray(task_ds.y).reshape(len(task_ds))
    pos_idx = np.nonzero(y != 0)[0]
    neg_idx = np.nonzero(y == 0)[0]
    supports = []
    for _ in range(n_episodes):
        pos = np.random.choice(pos_idx, size=min(n_pos, len(pos_idx)),
                               replace=len(pos_idx) < n_pos)
        neg = np.random.choice(neg_idx, size=min(n_neg, len(neg_idx)),
                               replace=len(neg_idx) < n_neg)
        idx = np.concatenate([pos, neg])
        supports.append(NumpyDataset(task_ds.X[idx], y[idx],
                                     np.ones(len(idx)),
                                     task_ds.ids[idx]))
    return supports


class SupportGenerator:
    """Iterate (task, support) pairs (reference supports.py:324)."""

    def __init__(self, dataset: Dataset, n_pos: int, n_neg: int,
                 n_trials: int):
        self.dataset = dataset
        self.n_pos = n_pos
        self.n_neg = n_neg
        self.n_trials = n_trials
        self.n_tasks = (dataset.y.shape[1]
                        if dataset.y.ndim > 1 else 1)
        self._trial = 0

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[int, NumpyDataset]:
        if self._trial >= self.n_trials:
            raise StopIteration
        self._trial += 1
        task = np.random.randint(self.n_tasks)
        support = get_task_support(self.dataset, 1, self.n_pos,
                                   self.n_neg, task)[0]
        return task, support

    def next(self):
        """Py2-style alias kept by the reference (supports.py:298)."""
        return self.__next__()


class EpisodeGenerator:
    """Iterate (task, support, batch) episodes (reference
    supports.py:246)."""

    def __init__(self, dataset: Dataset, n_pos: int, n_neg: int,
                 n_test: int, n_episodes_per_task: int):
        self.dataset = dataset
        self.n_pos = n_pos
        self.n_neg = n_neg
        self.n_test = n_test
        self.n_tasks = (dataset.y.shape[1]
                        if dataset.y.ndim > 1 else 1)
        self.n_episodes_per_task = n_episodes_per_task
        self.task_order = list(np.random.permutation(self.n_tasks)) * \
            n_episodes_per_task
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._pos >= len(self.task_order):
            raise StopIteration
        task = int(self.task_order[self._pos])
        self._pos += 1
        support = get_task_support(self.dataset, 1, self.n_pos,
                                   self.n_neg, task)[0]
        batch = get_single_task_test(self.dataset, self.n_test, task)
        return task, support, batch

    def next(self):
        """Py2-style alias kept by the reference (supports.py:362)."""
        return self.__next__()

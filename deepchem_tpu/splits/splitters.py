"""Dataset splitters.

Redesign of reference deepchem/splits/splitters.py (2.6k LoC).  Splitting is
pure-numpy index selection -> ``Dataset.select`` (SURVEY.md section 2.3); the
chemistry-aware splitters use the in-repo chem core.  The scaffold splitter
reproduces the reference's sort-by-set-size-then-insertion determinism
(reference splitters.py:1574), which benchmark scores depend on.
"""

from __future__ import annotations

import logging
import tempfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from deepchem_tpu.data import Dataset, DiskDataset

logger = logging.getLogger(__name__)


class Splitter:
    """Abstract splitter (reference splitters.py:31)."""

    def split(self, dataset: Dataset, frac_train: float = 0.8,
              frac_valid: float = 0.1, frac_test: float = 0.1,
              seed: Optional[int] = None, log_every_n: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        raise NotImplementedError

    def train_valid_test_split(self, dataset: Dataset,
                               train_dir: Optional[str] = None,
                               valid_dir: Optional[str] = None,
                               test_dir: Optional[str] = None,
                               frac_train: float = 0.8,
                               frac_valid: float = 0.1,
                               frac_test: float = 0.1,
                               seed: Optional[int] = None,
                               log_every_n: int = 1000,
                               **kwargs) -> Tuple[Dataset, Dataset, Dataset]:
        """(reference splitters.py:107)"""
        train_idx, valid_idx, test_idx = self.split(
            dataset, frac_train=frac_train, frac_valid=frac_valid,
            frac_test=frac_test, seed=seed, log_every_n=log_every_n)
        train = dataset.select(train_idx, train_dir)
        valid = dataset.select(valid_idx, valid_dir)
        test = dataset.select(test_idx, test_dir)
        return train, valid, test

    def train_test_split(self, dataset: Dataset,
                         train_dir: Optional[str] = None,
                         test_dir: Optional[str] = None,
                         frac_train: float = 0.8,
                         seed: Optional[int] = None,
                         **kwargs) -> Tuple[Dataset, Dataset]:
        """(reference splitters.py:226)"""
        train, _, test = self.train_valid_test_split(
            dataset, train_dir=train_dir, test_dir=test_dir,
            frac_train=frac_train, frac_valid=0.0,
            frac_test=1 - frac_train, seed=seed)
        return train, test

    def k_fold_split(self, dataset: Dataset, k: int,
                     directories: Optional[Sequence[str]] = None,
                     seed: Optional[int] = None,
                     **kwargs) -> List[Tuple[Dataset, Dataset]]:
        """(train, cv) pairs (reference splitters.py:45)."""
        logger.info('Computing K-fold split')
        if directories is None:
            directories = [None] * 2 * k
        cv_datasets: List[Dataset] = []
        train_ds_base = None
        train_datasets: List = []
        # rem_dataset is the remaining part of the dataset
        rem_dataset: Optional[Dataset] = dataset
        for fold in range(k):
            frac_fold = 1.0 / (k - fold)
            fold_inds, rem_inds, _ = self.split(
                rem_dataset, frac_train=frac_fold,
                frac_valid=1 - frac_fold, frac_test=0, seed=seed)
            cv_dataset = rem_dataset.select(fold_inds,
                                            directories[2 * fold])
            cv_datasets.append(cv_dataset)
            rem_dataset = rem_dataset.select(rem_inds)
        out = []
        for fold in range(k):
            train_parts = [cv_datasets[i] for i in range(k) if i != fold]
            first = train_parts[0]
            if isinstance(first, DiskDataset):
                train = DiskDataset.merge(train_parts,
                                    merge_dir=directories[2 * fold + 1])
            else:
                from deepchem_tpu.data import NumpyDataset
                train = NumpyDataset.merge(train_parts)
            out.append((train, cv_datasets[fold]))
        return out

    def __repr__(self):
        return type(self).__name__


def _validate_fracs(frac_train, frac_valid, frac_test):
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0,
                                   decimal=5)


class RandomSplitter(Splitter):
    """(reference splitters.py:328)

    Examples
    --------
    >>> import numpy as np
    >>> from deepchem_tpu.data import NumpyDataset
    >>> from deepchem_tpu.splits import RandomSplitter
    >>> ds = NumpyDataset(np.arange(20).reshape(-1, 1))
    >>> tr, va, te = RandomSplitter().train_valid_test_split(
    ...     ds, seed=0)
    >>> len(tr), len(va), len(te)
    (16, 2, 2)
    """

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        if seed is not None:
            np.random.seed(seed)
        n = len(dataset)
        perm = np.random.permutation(n)
        train_cut = int(frac_train * n)
        valid_cut = int((frac_train + frac_valid) * n)
        return (perm[:train_cut], perm[train_cut:valid_cut],
                perm[valid_cut:])


class IndexSplitter(Splitter):
    """First/middle/last contiguous blocks (reference splitters.py:783)."""

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        n = len(dataset)
        idx = np.arange(n)
        train_cut = int(frac_train * n)
        valid_cut = int((frac_train + frac_valid) * n)
        return idx[:train_cut], idx[train_cut:valid_cut], idx[valid_cut:]


class SpecifiedSplitter(Splitter):
    """User-given index lists (reference splitters.py:851)."""

    def __init__(self, valid_indices: Optional[Sequence[int]] = None,
                 test_indices: Optional[Sequence[int]] = None):
        # `x or []` chokes on numpy arrays (ambiguous truth value)
        self.valid_indices = [] if valid_indices is None \
            else [int(i) for i in valid_indices]
        self.test_indices = [] if test_indices is None \
            else [int(i) for i in test_indices]

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        n = len(dataset)
        valid = set(self.valid_indices)
        test = set(self.test_indices)
        train = [i for i in range(n) if i not in valid and i not in test]
        return (np.array(train), np.array(sorted(valid), dtype=np.int64),
                np.array(sorted(test), dtype=np.int64))


class RandomGroupSplitter(Splitter):
    """Keep listed groups intact (reference splitters.py:391)."""

    def __init__(self, groups: Sequence[Any]):
        self.groups = list(groups)

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        if seed is not None:
            np.random.seed(seed)
        group_dict: Dict[Any, List[int]] = {}
        for i, g in enumerate(self.groups):
            group_dict.setdefault(g, []).append(i)
        group_ids = list(group_dict.keys())
        perm = np.random.permutation(len(group_ids))
        n = len(dataset)
        train_cut = frac_train * n
        valid_cut = (frac_train + frac_valid) * n
        train, valid, test = [], [], []
        count = 0
        for gi in perm:
            members = group_dict[group_ids[gi]]
            if count < train_cut:
                train += members
            elif count < valid_cut:
                valid += members
            else:
                test += members
            count += len(members)
        return np.array(train), np.array(valid), np.array(test)


class RandomStratifiedSplitter(Splitter):
    """Stratify so each split gets its share of per-task actives (reference
    splitters.py:503)."""

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        if seed is not None:
            np.random.seed(seed)
        y, w = dataset.y, dataset.w
        if y.ndim == 1:
            y, w = y[:, None], w[:, None]
        n, n_tasks = y.shape
        remaining = set(range(n))
        train, valid, test = [], [], []
        # per task, split its actives proportionally
        for t in range(n_tasks):
            actives = [i for i in range(n)
                       if i in remaining and w[i, t] != 0 and y[i, t] != 0]
            np.random.shuffle(actives)
            c1 = int(frac_train * len(actives))
            c2 = int((frac_train + frac_valid) * len(actives))
            train += actives[:c1]
            valid += actives[c1:c2]
            test += actives[c2:]
            remaining -= set(actives)
        rest = list(remaining)
        np.random.shuffle(rest)
        c1 = int(frac_train * len(rest))
        c2 = int((frac_train + frac_valid) * len(rest))
        train += rest[:c1]
        valid += rest[c1:c2]
        test += rest[c2:]
        return np.array(train), np.array(valid), np.array(test)


class SingletaskStratifiedSplitter(Splitter):
    """Sort-by-y stratification for regression (reference
    splitters.py:636)."""

    def __init__(self, task_number: int = 0):
        self.task_number = task_number

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        if seed is not None:
            np.random.seed(seed)
        y = dataset.y
        yt = y[:, self.task_number] if y.ndim > 1 else y
        sortidx = np.argsort(yt)
        split_cd = 10
        train_cutoff = int(np.round(frac_train * split_cd))
        valid_cutoff = int(np.round(frac_valid * split_cd)) + train_cutoff
        train, valid, test = [], [], []
        while sortidx.shape[0] >= split_cd:
            sortidx_split, sortidx = np.split(sortidx, [split_cd])
            shuffled = np.random.permutation(range(split_cd))
            train += list(sortidx_split[shuffled[:train_cutoff]])
            valid += list(sortidx_split[shuffled[train_cutoff:valid_cutoff]])
            test += list(sortidx_split[shuffled[valid_cutoff:]])
        # leftover rows go to train
        train += list(sortidx)
        return np.array(train), np.array(valid), np.array(test)


class MolecularWeightSplitter(Splitter):
    """Sort by MW (reference splitters.py:951)."""

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        from deepchem_tpu.chem import mol_from_smiles
        mws = []
        for smi in dataset.ids:
            mol = mol_from_smiles(str(smi))
            mws.append(mol.molecular_weight() if mol is not None else 0.0)
        order = np.argsort(np.asarray(mws), kind='stable')
        n = len(dataset)
        train_cut = int(frac_train * n)
        valid_cut = int((frac_train + frac_valid) * n)
        return (order[:train_cut], order[train_cut:valid_cut],
                order[valid_cut:])


def generate_scaffold(smiles: str, include_chirality: bool = False) -> str:
    """Bemis-Murcko scaffold string (reference splitters.py:1276)."""
    from deepchem_tpu.chem import scaffold_smiles
    s = scaffold_smiles(smiles, include_chirality)
    return s if s is not None else ''


class ScaffoldSplitter(Splitter):
    """Group by Bemis-Murcko scaffold; fill train with largest scaffold sets
    first (reference splitters.py:1481; determinism per :1574 —
    sets sorted by (size desc, first-index asc))."""

    def generate_scaffolds(self, dataset: Dataset,
                           log_every_n: int = 1000) -> List[List[int]]:
        scaffolds: Dict[str, List[int]] = {}
        for ind, smiles in enumerate(dataset.ids):
            scaffold = generate_scaffold(str(smiles))
            scaffolds.setdefault(scaffold, []).append(ind)
        scaffold_sets = [
            sorted(v) for _, v in sorted(
                scaffolds.items(),
                key=lambda kv: (len(kv[1]), kv[1][0]), reverse=True)]
        return scaffold_sets

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=1000):
        _validate_fracs(frac_train, frac_valid, frac_test)
        scaffold_sets = self.generate_scaffolds(dataset)
        train_cutoff = frac_train * len(dataset)
        valid_cutoff = (frac_train + frac_valid) * len(dataset)
        train, valid, test = [], [], []
        for group in scaffold_sets:
            if len(train) + len(group) > train_cutoff:
                if len(train) + len(valid) + len(group) > valid_cutoff:
                    test += group
                else:
                    valid += group
            else:
                train += group
        return np.array(train), np.array(valid), np.array(test)


class FingerprintSplitter(Splitter):
    """Greedy Tanimoto-dissimilarity partition (reference
    splitters.py:1322)."""

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        from deepchem_tpu.chem import mol_from_smiles, morgan_fingerprint
        fps = []
        for smi in dataset.ids:
            mol = mol_from_smiles(str(smi))
            fps.append(morgan_fingerprint(mol, 2, 1024) if mol is not None
                       else np.zeros(1024, dtype=np.uint8))
        fps_arr = np.asarray(fps, dtype=bool)
        n = len(fps_arr)
        train_size = int(frac_train * n)
        valid_size = int(frac_valid * n)
        test_size = n - train_size - valid_size
        # start test set from the molecule least similar to the rest
        sims = _pairwise_tanimoto_rowmeans(fps_arr)
        remaining = list(np.argsort(sims))   # ascending mean similarity
        test_inds = remaining[:test_size]
        valid_inds = remaining[test_size:test_size + valid_size]
        train_inds = remaining[test_size + valid_size:]
        return (np.array(train_inds), np.array(valid_inds),
                np.array(test_inds))


def _tanimoto_block(blk: np.ndarray, fps: np.ndarray,
                    counts: np.ndarray, s: int) -> np.ndarray:
    """Tanimoto similarities of a row block vs all rows via float32 GEMM
    (BLAS beats the native popcount kernel when BLAS is available;
    deepchem_tpu.native.tanimoto_matrix_native is the bit-packed
    alternative for BLAS-free / memory-constrained hosts)."""
    f = blk.astype(np.float32)
    inter = f @ fps.astype(np.float32).T
    union = counts[s:s + len(blk), None] + counts[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _pairwise_tanimoto_rowmeans(fps: np.ndarray) -> np.ndarray:
    """Mean Tanimoto similarity of each row to all others, blockwise."""
    n = len(fps)
    counts = fps.astype(np.float32).sum(axis=1)
    sums = np.zeros(n, dtype=np.float64)
    B = 512
    for s in range(0, n, B):
        sims = _tanimoto_block(fps[s:s + B], fps, counts, s)
        sums[s:s + B] = sims.sum(axis=1)
    return sums / max(n - 1, 1)


class ButinaSplitter(Splitter):
    """Butina clustering split (reference splitters.py:1154)."""

    def __init__(self, cutoff: float = 0.6):
        self.cutoff = cutoff

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        from deepchem_tpu.chem import mol_from_smiles, morgan_fingerprint
        fps = []
        for smi in dataset.ids:
            mol = mol_from_smiles(str(smi))
            fps.append(morgan_fingerprint(mol, 2, 1024)
                       if mol is not None else np.zeros(1024, np.uint8))
        clusters = butina_cluster(np.asarray(fps, dtype=bool),
                                  1.0 - self.cutoff)
        # largest clusters into train, then valid, then test
        train_cutoff = frac_train * len(dataset)
        valid_cutoff = (frac_train + frac_valid) * len(dataset)
        train, valid, test = [], [], []
        for group in clusters:
            if len(train) + len(group) <= train_cutoff:
                train += list(group)
            elif len(train) + len(valid) + len(group) <= valid_cutoff \
                    or not test:
                valid += list(group)
            else:
                test += list(group)
        if frac_test == 0 and test:
            valid += test
            test = []
        return np.array(train), np.array(valid), np.array(test)


def butina_cluster(fps: np.ndarray, sim_cutoff: float) -> List[List[int]]:
    """Butina 1999 sphere-exclusion clustering over binary fingerprints.

    ``sim_cutoff`` is the minimum similarity to join a cluster.
    """
    n = len(fps)
    counts = fps.astype(np.float32).sum(axis=1)
    # neighbor lists
    neighbors: List[set] = []
    B = 512
    for s in range(0, n, B):
        sims = _tanimoto_block(fps[s:s + B], fps, counts, s)
        for r in range(sims.shape[0]):
            neighbors.append(set(np.nonzero(sims[r] >= sim_cutoff)[0]))
    order = np.argsort([-len(nb) for nb in neighbors], kind='stable')
    assigned = np.zeros(n, dtype=bool)
    clusters: List[List[int]] = []
    for c in order:
        if assigned[c]:
            continue
        members = [i for i in neighbors[c] if not assigned[i]]
        if c not in members:
            members.append(int(c))
        for m in members:
            assigned[m] = True
        clusters.append(sorted(members))
    clusters.sort(key=len, reverse=True)
    return clusters


class MaxMinSplitter(Splitter):
    """MaxMin diversity pick for the test set (reference
    splitters.py:1037)."""

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        if seed is None:
            seed = 0
        rng = np.random.RandomState(seed)
        from deepchem_tpu.chem import mol_from_smiles, morgan_fingerprint
        fps = []
        for smi in dataset.ids:
            mol = mol_from_smiles(str(smi))
            fps.append(morgan_fingerprint(mol, 2, 1024)
                       if mol is not None else np.zeros(1024, np.uint8))
        f = np.asarray(fps, dtype=np.float32)
        counts = f.sum(axis=1)
        n = len(f)
        num_test = n - int(frac_train * n) - int(frac_valid * n)
        num_valid = int(frac_valid * n)
        # when nothing is requested outside train, pick NOTHING: the
        # seed pick used to land in valid even at frac_valid=frac_test=0,
        # silently dropping one sample from every k-fold train set
        # (caught by tests/test_splitter_properties.py)
        picked: List[int] = []
        if num_test + num_valid > 0:
            picked.append(int(rng.randint(n)))
            min_dist = _tanimoto_dist_to(f, counts, picked[0])
            while len(picked) < num_test + num_valid:
                nxt = int(np.argmax(min_dist))
                picked.append(nxt)
                min_dist = np.minimum(min_dist,
                                      _tanimoto_dist_to(f, counts, nxt))
        picked_set = set(picked)
        test = picked[:num_test]
        valid = picked[num_test:]
        train = [i for i in range(n) if i not in picked_set]
        return np.array(train), np.array(valid), np.array(test)


def _tanimoto_dist_to(f: np.ndarray, counts: np.ndarray,
                      i: int) -> np.ndarray:
    inter = f @ f[i]
    union = counts + counts[i] - inter
    sim = np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)
    return 1.0 - sim


class TaskSplitter(Splitter):
    """Split along the task axis for meta-learning (reference
    splits/task_splitter.py)."""

    def train_valid_test_split(self, dataset, frac_train=0.8,
                               frac_valid=0.1, frac_test=0.1, **kwargs):
        from deepchem_tpu.data import NumpyDataset
        y, w = dataset.y, dataset.w
        n_tasks = y.shape[1]
        n_train = int(np.round(frac_train * n_tasks))
        n_valid = int(np.round(frac_valid * n_tasks))
        X, ids = dataset.X, dataset.ids
        train = NumpyDataset(X, y[:, :n_train], w[:, :n_train], ids)
        valid = NumpyDataset(X, y[:, n_train:n_train + n_valid],
                             w[:, n_train:n_train + n_valid], ids)
        test = NumpyDataset(X, y[:, n_train + n_valid:],
                            w[:, n_train + n_valid:], ids)
        return train, valid, test

    def k_fold_split(self, dataset, k: int, **kwargs):
        from deepchem_tpu.data import NumpyDataset
        y, w = dataset.y, dataset.w
        n_tasks = y.shape[1]
        X, ids = dataset.X, dataset.ids
        fold_size = n_tasks // k
        folds = []
        for i in range(k):
            s = i * fold_size
            e = n_tasks if i == k - 1 else (i + 1) * fold_size
            folds.append(NumpyDataset(X, y[:, s:e], w[:, s:e], ids))
        return folds


def merge_fold_datasets(fold_datasets):
    """Merge TaskSplitter fold datasets back together along the task
    axis (reference splits/task_splitter.py merge_fold_datasets:9).
    Assumes all folds share X and ids in the same order."""
    from deepchem_tpu.data import NumpyDataset
    if not len(fold_datasets):
        return None
    X = fold_datasets[0].X
    ids = fold_datasets[0].ids
    y = np.concatenate([f.y for f in fold_datasets], axis=1)
    w = np.concatenate([f.w for f in fold_datasets], axis=1)
    return NumpyDataset(X, y, w, ids)


class TimeSplitter(Splitter):
    """Order-preserving split on a user-provided time ordering (reference
    splits/splitters.py:1623 TimeSplitterPDBbind generalized: pass
    ``time_values`` aligned with the dataset; earliest goes to train)."""

    def __init__(self, time_values: Optional[Sequence] = None):
        self.time_values = time_values

    def split(self, dataset, frac_train=0.8, frac_valid=0.1, frac_test=0.1,
              seed=None, log_every_n=None):
        _validate_fracs(frac_train, frac_valid, frac_test)
        n = len(dataset)
        if self.time_values is not None:
            order = np.argsort(np.asarray(self.time_values),
                               kind='stable')
        else:
            order = np.arange(n)
        train_cut = int(frac_train * n)
        valid_cut = int((frac_train + frac_valid) * n)
        return (order[:train_cut], order[train_cut:valid_cut],
                order[valid_cut:])


TimeSplitterPDBbind = TimeSplitter

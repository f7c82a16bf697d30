"""Dataset transformers.

Redesign of reference deepchem/trans/transformers.py (4.3k LoC).  Contract
preserved: ``transform_array(X,y,w,ids)``, ``untransform(z)``,
``transform(dataset)`` mapping shard-wise (reference transformers.py:56), and
``undo_transforms`` applied at prediction time.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from deepchem_tpu.data import Dataset, NumpyDataset, DiskDataset

logger = logging.getLogger(__name__)


def undo_transforms(y: np.ndarray,
                    transformers: Sequence['Transformer']) -> np.ndarray:
    """Undo transforms in reverse order (reference transformers.py:40)."""
    for transformer in reversed(list(transformers)):
        if transformer.transform_y:
            y = transformer.untransform(y)
    return y


def undo_grad_transforms(grad, tasks, transformers):
    for transformer in reversed(list(transformers)):
        if transformer.transform_y:
            grad = transformer.untransform_grad(grad, tasks)
    return grad


class Transformer:
    """Abstract transformer (reference transformers.py:56)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 transform_w: bool = False, transform_ids: bool = False,
                 dataset: Optional[Dataset] = None):
        self.transform_X = transform_X
        self.transform_y = transform_y
        self.transform_w = transform_w
        self.transform_ids = transform_ids
        if not (transform_X or transform_y or transform_w or transform_ids):
            raise ValueError('Transformer must transform at least one array')

    def transform_array(self, X, y, w, ids) -> Tuple:
        raise NotImplementedError

    def untransform(self, z):
        raise NotImplementedError('Cannot untransform')

    def transform(self, dataset: Dataset, parallel: bool = False,
                  out_dir: Optional[str] = None, **kwargs) -> Dataset:
        return dataset.transform(self, out_dir=out_dir, **kwargs) \
            if isinstance(dataset, DiskDataset) \
            else dataset.transform(self, **kwargs)

    def transform_on_array(self, X, y, w, ids):
        return self.transform_array(X, y, w, ids)

    def __repr__(self):
        return type(self).__name__


class MinMaxTransformer(Transformer):
    """Scale to [0,1] (reference transformers.py:272)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 dataset: Optional[Dataset] = None):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         dataset=dataset)
        if dataset is None:
            raise ValueError('dataset required')
        if transform_X:
            X = dataset.X
            self.X_min = np.min(X, axis=0)
            self.X_max = np.max(X, axis=0)
        if transform_y:
            y = dataset.y
            self.y_min = np.min(y, axis=0)
            self.y_max = np.max(y, axis=0)

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            denom = np.where(self.X_max > self.X_min,
                             self.X_max - self.X_min, 1)
            X = (X - self.X_min) / denom
        if self.transform_y:
            denom = np.where(self.y_max > self.y_min,
                             self.y_max - self.y_min, 1)
            y = (y - self.y_min) / denom
        return X, y, w, ids

    def untransform(self, z):
        if self.transform_y:
            return z * (self.y_max - self.y_min) + self.y_min
        return z * (self.X_max - self.X_min) + self.X_min


class NormalizationTransformer(Transformer):
    """Z-score normalization (reference transformers.py:426).

    Examples
    --------
    >>> import numpy as np
    >>> from deepchem_tpu.data import NumpyDataset
    >>> from deepchem_tpu.trans import NormalizationTransformer
    >>> ds = NumpyDataset(np.ones((10, 2)),
    ...                   np.arange(10, dtype=float).reshape(-1, 1))
    >>> t = NormalizationTransformer(transform_y=True, dataset=ds)
    >>> tds = t.transform(ds)
    >>> bool(abs(tds.y.mean()) < 1e-8)
    True
    >>> bool(np.allclose(t.untransform(tds.y), ds.y))
    True
    """

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 transform_w: bool = False,
                 dataset: Optional[Dataset] = None,
                 transform_gradients: bool = False,
                 move_mean: bool = True):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         transform_w=transform_w, dataset=dataset)
        if dataset is None:
            raise ValueError('dataset required')
        self.move_mean = move_mean
        self.transform_gradients = transform_gradients
        if transform_X:
            # request only X stats: y may be absent, and computing stats
            # over object-dtype X (e.g. GraphData) must be avoided when
            # only y is transformed
            X_means, X_stds = dataset.get_statistics(True, False)
            self.X_means = X_means
            self.X_stds = np.where(np.asarray(X_stds) != 0, X_stds, 1.0)
        if transform_y:
            y_means, y_stds = dataset.get_statistics(False, True)
            self.y_means = y_means
            self.y_stds = np.where(np.asarray(y_stds) != 0, y_stds, 1.0)

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            if self.move_mean:
                X = (X - self.X_means) / self.X_stds
            else:
                X = X / self.X_stds
        if self.transform_y:
            if self.move_mean:
                y = (y - self.y_means) / self.y_stds
            else:
                y = y / self.y_stds
        return X, y, w, ids

    def untransform(self, z):
        if self.transform_y:
            if self.move_mean:
                return z * self.y_stds + self.y_means
            return z * self.y_stds
        if self.move_mean:
            return z * self.X_stds + self.X_means
        return z * self.X_stds

    def untransform_grad(self, grad, tasks):
        if self.transform_y:
            return grad * self.y_stds
        return grad


class ClippingTransformer(Transformer):
    """Clip to +-max (reference transformers.py:613)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 dataset: Optional[Dataset] = None,
                 x_max: float = 5.0, y_max: float = 500.0):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         dataset=dataset)
        self.x_max = x_max
        self.y_max = y_max

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            X = np.clip(X, -self.x_max, self.x_max)
        if self.transform_y:
            y = np.clip(y, -self.y_max, self.y_max)
        return X, y, w, ids


class LogTransformer(Transformer):
    """log(x+1) transform (reference transformers.py:711)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 features: Optional[Sequence[int]] = None,
                 tasks: Optional[Sequence] = None,
                 dataset: Optional[Dataset] = None):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         dataset=dataset)
        self.features = features
        self.tasks = tasks
        if dataset is not None and tasks is not None \
                and not isinstance(tasks[0], (int, np.integer)):
            names = list(dataset.get_task_names())
            self.tasks = [names.index(t) for t in tasks]

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            X = np.asarray(X, dtype=float).copy()
            if self.features is None:
                X = np.log1p(X)
            else:
                X[:, self.features] = np.log1p(X[:, self.features])
        if self.transform_y:
            y = np.asarray(y, dtype=float).copy()
            if self.tasks is None:
                y = np.log1p(y)
            else:
                y[:, self.tasks] = np.log1p(y[:, self.tasks])
        return X, y, w, ids

    def untransform(self, z):
        z = np.asarray(z, dtype=float)
        if self.transform_y:
            if self.tasks is None:
                return np.expm1(z)
            out = z.copy()
            out[:, self.tasks] = np.expm1(z[:, self.tasks])
            return out
        if self.features is None:
            return np.expm1(z)
        out = z.copy()
        out[:, self.features] = np.expm1(z[:, self.features])
        return out


class BalancingTransformer(Transformer):
    """Reweight so each class contributes equally per task (reference
    transformers.py:870)."""

    def __init__(self, dataset: Dataset):
        super().__init__(transform_w=True, dataset=dataset)
        y = dataset.y
        w = dataset.w
        if y.ndim == 1:
            y, w = y[:, None], w[:, None]
        # verify classification labels
        y_int = np.round(y).astype(int)
        classes = np.unique(y_int[np.asarray(w) != 0]) \
            if np.asarray(w).size else np.unique(y_int)
        self.classes = classes
        n_tasks = y.shape[1]
        weights = []
        for t in range(n_tasks):
            task_w = np.asarray(w)[:, t]
            task_y = y_int[:, t]
            cw = {}
            valid = task_w != 0
            total = valid.sum()
            for c in classes:
                cnt = np.logical_and(task_y == c, valid).sum()
                cw[int(c)] = (total / (len(classes) * cnt)) if cnt else 1.0
            weights.append(cw)
        self.weights = weights

    def transform_array(self, X, y, w, ids):
        w_out = np.asarray(w, dtype=float).copy()
        y2 = y[:, None] if np.asarray(y).ndim == 1 else y
        w2 = w_out[:, None] if w_out.ndim == 1 else w_out
        y_int = np.round(np.asarray(y2)).astype(int)
        for t in range(y2.shape[1]):
            for c, cw in self.weights[t].items():
                mask = np.logical_and(y_int[:, t] == c, w2[:, t] != 0)
                w2[mask, t] = w2[mask, t] * cw
        return X, y, w2.reshape(np.asarray(w).shape), ids


class DuplicateBalancingTransformer(Transformer):
    """Physically duplicate minority-class rows (reference
    trans/duplicate.py:10)."""

    def __init__(self, dataset: Dataset):
        super().__init__(transform_X=True, transform_y=True,
                         transform_w=True, transform_ids=True,
                         dataset=dataset)
        y = np.round(dataset.y).astype(int)
        w = dataset.w
        if y.shape[1] != 1:
            raise ValueError('only singletask supported')
        classes, counts = np.unique(y[w != 0], return_counts=True)
        m = counts.max()
        self.duplication = {int(c): int(np.round(m / cnt))
                            for c, cnt in zip(classes, counts)}

    def transform_array(self, X, y, w, ids):
        y_int = np.round(np.asarray(y)).astype(int).reshape(len(y))
        idx = []
        for i in range(len(y)):
            reps = self.duplication.get(int(y_int[i]), 1) \
                if np.asarray(w).reshape(len(w))[i] != 0 else 1
            idx += [i] * reps
        idx = np.asarray(idx)
        return (np.asarray(X)[idx], np.asarray(y)[idx],
                np.asarray(w)[idx], np.asarray(ids)[idx])


class CDFTransformer(Transformer):
    """Histogram-CDF gaussianization (reference transformers.py:1118)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 dataset: Optional[Dataset] = None, bins: int = 2):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         dataset=dataset)
        self.bins = bins
        if transform_y:
            self.y = dataset.y
            # fixed TRAINING-distribution quantile table for untransform
            # (the reference stores self.y at construction,
            # transformers.py:1118); per-call capture would leak the last
            # transformed split's quantiles into untransform (ADVICE.md r1)
            self._y_orig_sorted = np.sort(
                np.asarray(dataset.y, dtype=float), axis=0)

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            X = _cdf_values(np.asarray(X, dtype=float), self.bins)
        if self.transform_y:
            y = _cdf_values(np.asarray(y, dtype=float), self.bins)
        return X, y, w, ids

    def untransform(self, z):
        # map ranks back to original value quantiles
        out = np.zeros_like(z, dtype=float)
        ys = self._y_orig_sorted
        n = len(ys)
        ranks = np.clip((np.asarray(z) * n).astype(int), 0, n - 1)
        for t in range(z.shape[1] if z.ndim > 1 else 1):
            col = ranks[:, t] if z.ndim > 1 else ranks
            vals = ys[:, t] if ys.ndim > 1 else ys
            if z.ndim > 1:
                out[:, t] = vals[col]
            else:
                out = vals[col]
        return out


def _cdf_values(arr: np.ndarray, bins: int) -> np.ndarray:
    out = np.zeros_like(arr, dtype=float)
    flat2d = arr if arr.ndim > 1 else arr[:, None]
    res = np.zeros_like(flat2d, dtype=float)
    n = flat2d.shape[0]
    for t in range(flat2d.shape[1]):
        order = np.argsort(flat2d[:, t], kind='stable')
        ranks = np.empty(n)
        ranks[order] = np.arange(n)
        res[:, t] = ranks / n
    return res if arr.ndim > 1 else res[:, 0]


class PowerTransformer(Transformer):
    """Append powers of features (reference transformers.py:1273)."""

    def __init__(self, transform_X: bool = False, transform_y: bool = False,
                 dataset: Optional[Dataset] = None,
                 powers: Sequence[int] = (1,)):
        super().__init__(transform_X=transform_X, transform_y=transform_y,
                         dataset=dataset)
        self.powers = list(powers)

    def transform_array(self, X, y, w, ids):
        if self.transform_X:
            X = np.concatenate([np.power(np.asarray(X, dtype=float), p)
                                for p in self.powers], axis=1)
        if self.transform_y:
            y = np.concatenate([np.power(np.asarray(y, dtype=float), p)
                                for p in self.powers], axis=1)
        return X, y, w, ids

    def untransform(self, z):
        # first block is power 1
        n_orig = z.shape[1] // len(self.powers)
        return z[:, :n_orig]


class FlatteningTransformer(Transformer):
    """Flatten ragged per-sample features, repeating y/w (reference
    transformers.py:1021)."""

    def __init__(self, dataset: Optional[Dataset] = None):
        super().__init__(transform_X=True, transform_y=True,
                         transform_w=True, transform_ids=True,
                         dataset=dataset)

    def transform_array(self, X, y, w, ids):
        lens = [len(np.atleast_1d(x)) for x in X]
        X_out = np.concatenate([np.atleast_1d(x) for x in X])
        y_out = np.repeat(y, lens, axis=0) if y is not None else None
        w_out = np.repeat(w, lens, axis=0) if w is not None else None
        ids_out = np.repeat(ids, lens, axis=0)
        return X_out, y_out, w_out, ids_out


class FeaturizationTransformer(Transformer):
    """Featurize raw inputs inside the transformer pipeline (reference
    transformers.py:2262)."""

    def __init__(self, dataset: Optional[Dataset] = None, featurizer=None):
        super().__init__(transform_X=True, dataset=dataset)
        if featurizer is None:
            raise ValueError('featurizer required')
        self.featurizer = featurizer

    def transform_array(self, X, y, w, ids):
        X = self.featurizer.featurize(list(X))
        return X, y, w, ids


class ImageTransformer(Transformer):
    """Resize images (reference transformers.py:1945)."""

    def __init__(self, size: Tuple[int, int],
                 dataset: Optional[Dataset] = None):
        super().__init__(transform_X=True, dataset=dataset)
        self.size = size

    def transform_array(self, X, y, w, ids):
        from PIL import Image
        imgs = [np.asarray(Image.fromarray(np.asarray(x)).resize(self.size))
                for x in X]
        return np.stack(imgs), y, w, ids


class CoulombFitTransformer(Transformer):
    """Random-sorted, binarized, normalized Coulomb matrices (reference
    transformers.py:1398)."""

    def __init__(self, dataset: Dataset, random_seed: int = 0):
        super().__init__(transform_X=True, dataset=dataset)
        self.rng = np.random.RandomState(random_seed)
        X = np.asarray(dataset.X, dtype=float)
        if X.ndim == 3:
            X = X.reshape(len(X), -1)
        self.step = 1.0
        self.noise = 1.0
        Xb = self._expand(X)
        self.mean = Xb.mean(axis=0)
        self.std = Xb.std(axis=0)
        self.std = np.where(self.std != 0, self.std, 1.0)

    def _expand(self, X: np.ndarray) -> np.ndarray:
        """Binarize: tanh steps over thresholds (reference 'realize')."""
        out = []
        for t in np.arange(-1, 2, self.step):
            out.append(np.tanh((X - t) / self.step))
        return np.concatenate(out, axis=1)

    def realize(self, X: np.ndarray) -> np.ndarray:
        # random row-norm permutation like CoulombMatrix.randomize
        X = np.asarray(X, dtype=float)
        if X.ndim == 3:
            n = X.shape[1]
            out = []
            for m in X:
                row_norms = np.linalg.norm(m, axis=1)
                e = self.rng.normal(size=n) * self.noise
                p = np.argsort(-(row_norms + e))
                out.append(m[p][:, p].reshape(-1))
            return np.stack(out)
        return X

    def normalize(self, X: np.ndarray) -> np.ndarray:
        return (X - self.mean) / self.std

    def expand(self, X: np.ndarray) -> np.ndarray:
        """Binarize features with tanh steps (reference
        transformers.py:1480)."""
        return self._expand(np.asarray(X, dtype=float))

    def X_transform(self, X: np.ndarray) -> np.ndarray:
        """Full Coulomb-fit pipeline: realize -> expand -> normalize
        (reference transformers.py:1502)."""
        return self.normalize(self._expand(self.realize(X)))

    def transform_array(self, X, y, w, ids):
        return self.X_transform(X), y, w, ids


class IRVTransformer(Transformer):
    """K-nearest-fingerprint features for IRV models (reference
    transformers.py:1555)."""

    def __init__(self, K: int, n_tasks: int, dataset: Dataset):
        super().__init__(transform_X=True, dataset=dataset)
        self.K = K
        self.n_tasks = n_tasks
        self.X_ref = np.asarray(dataset.X, dtype=np.float32)
        self.y_ref = np.asarray(dataset.y)
        self.w_ref = np.asarray(dataset.w)

    @staticmethod
    def matrix_mul(X1: np.ndarray, X2: np.ndarray,
                   shard_size: int = 5000) -> np.ndarray:
        """X1 @ X2 computed in row shards of X1 to bound peak memory
        (reference transformers.py:1698)."""
        X1 = np.asarray(X1, dtype=np.float32)
        X2 = np.asarray(X2, dtype=np.float32)
        out = [X1[i:i + shard_size] @ X2
               for i in range(0, len(X1), shard_size)]
        return np.concatenate(out) if out else X1 @ X2

    def _similarity(self, X: np.ndarray) -> np.ndarray:
        """Tanimoto similarity of X against the fitted reference set."""
        X = np.asarray(X, dtype=np.float32)
        ref = self.X_ref
        counts_ref = ref.sum(axis=1)
        counts = X.sum(axis=1)
        inter = self.matrix_mul(X, ref.T)
        union = counts[:, None] + counts_ref[None, :] - inter
        return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)

    def realize(self, similarity: np.ndarray, y: np.ndarray,
                w: np.ndarray) -> np.ndarray:
        """IRV features from a precomputed similarity matrix against a
        labeled reference set (reference transformers.py:1609): per task,
        the K most-similar valid neighbors' similarities + labels.
        Exact self-matches (similarity == 1) are skipped."""
        similarity = np.asarray(similarity)
        y = np.asarray(y)
        w = np.asarray(w)
        n = len(similarity)
        feats = np.zeros((n, self.n_tasks * 2 * self.K), dtype=np.float32)
        for t in range(self.n_tasks):
            valid = w[:, t] != 0
            s = similarity.copy()
            s[:, ~valid] = -1
            order = np.argsort(-s, axis=1)[:, :self.K + 1]
            for i in range(n):
                picks = [j for j in order[i]
                         if not np.isclose(s[i, j], 1.0)][:self.K]
                picks += [order[i][0]] * (self.K - len(picks))
                base = t * 2 * self.K
                feats[i, base:base + self.K] = similarity[i, picks]
                feats[i, base + self.K:base + 2 * self.K] = y[picks, t]
        return feats

    def X_transform(self, X_target: np.ndarray) -> np.ndarray:
        """IRV features for new samples against the fitted reference set
        (reference transformers.py:1666)."""
        return self.realize(self._similarity(X_target),
                            self.y_ref, self.w_ref)

    def transform_array(self, X, y, w, ids):
        X = np.asarray(X, dtype=np.float32)
        ref = self.X_ref
        counts_ref = ref.sum(axis=1)
        counts = X.sum(axis=1)
        inter = self.matrix_mul(X, ref.T)
        union = counts[:, None] + counts_ref[None, :] - inter
        sim = np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)
        n = len(X)
        feats = np.zeros((n, self.n_tasks * 2 * self.K), dtype=np.float32)
        same = np.isclose(sim, 1.0) & (counts[:, None] == counts_ref[None, :])
        for t in range(self.n_tasks):
            valid = self.w_ref[:, t] != 0
            s = sim.copy()
            s[:, ~valid] = -1
            # exclude self-matches when transforming the training set
            order = np.argsort(-s, axis=1)[:, :self.K + 1]
            for i in range(n):
                picks = [j for j in order[i] if not same[i, j]][:self.K]
                picks += [order[i][0]] * (self.K - len(picks))
                base = t * 2 * self.K
                feats[i, base:base + self.K] = sim[i, picks]
                feats[i, base + self.K:base + 2 * self.K] = \
                    self.y_ref[picks, t]
        return feats, y, w, ids

    def transform(self, dataset, **kwargs):
        newx, newy, neww, newids = self.transform_array(
            dataset.X, dataset.y, dataset.w, dataset.ids)
        return NumpyDataset(newx, newy, neww, newids)


class RxnSplitTransformer(Transformer):
    """Split reaction SMILES into source/target (reference
    transformers.py:2559)."""

    def __init__(self, sep_reagent: bool = True,
                 dataset: Optional[Dataset] = None):
        super().__init__(transform_X=True, dataset=dataset)
        self.sep_reagent = sep_reagent

    def transform_array(self, X, y, w, ids):
        out = []
        for rxn in X:
            s = str(rxn)
            parts = s.split('>')
            reactant, reagent, product = (parts + ['', '', ''])[:3]
            if self.sep_reagent:
                source = f'{reactant}>{reagent}'
            else:
                joined = reactant if not reagent \
                    else f'{reactant}.{reagent}'
                source = f'{joined}>'
            out.append([source, product])
        return np.asarray(out), y, w, ids


class DataTransforms:
    """Image augmentations (reference transformers.py:2328)."""

    def __init__(self, Image: np.ndarray):
        self.Image = np.asarray(Image)

    def scale(self, h: int, w: int) -> np.ndarray:
        from PIL import Image as PILImage
        return np.asarray(
            PILImage.fromarray(self.Image).resize((w, h)))

    def center_crop(self, x_crop: int, y_crop: int) -> np.ndarray:
        """Crop an (y_crop, x_crop) region around the image center
        (reference transformers.py:2412)."""
        y, x = self.Image.shape[0], self.Image.shape[1]
        x_start = x // 2 - (x_crop // 2)
        y_start = y // 2 - (y_crop // 2)
        return self.Image[y_start:y_start + y_crop,
                          x_start:x_start + x_crop]

    def flip(self, direction: str = 'lr') -> np.ndarray:
        if direction == 'lr':
            return np.fliplr(self.Image)
        if direction == 'ud':
            return np.flipud(self.Image)
        raise ValueError('direction must be "lr" or "ud"')

    def rotate(self, angle: float = 0) -> np.ndarray:
        k = int(angle // 90) % 4
        return np.rot90(self.Image, k)

    def crop(self, left: int, top: int, x_crop_size: int,
             y_crop_size: int) -> np.ndarray:
        return self.Image[top:top + y_crop_size, left:left + x_crop_size]

    def convert2gray(self) -> np.ndarray:
        return np.dot(self.Image[..., :3],
                      [0.2989, 0.5870, 0.1140])

    def shift(self, width: int, height: int, mode='constant') -> np.ndarray:
        out = np.zeros_like(self.Image)
        h, w = self.Image.shape[:2]
        ws, hs = int(width), int(height)
        out[max(0, hs):min(h, h + hs), max(0, ws):min(w, w + ws)] = \
            self.Image[max(0, -hs):min(h, h - hs),
                       max(0, -ws):min(w, w - ws)]
        return out

    def gaussian_blur(self, sigma: float = 1.0) -> np.ndarray:
        from scipy.ndimage import gaussian_filter
        return gaussian_filter(self.Image, sigma)

    def salt_pepper_noise(self, prob: float = 0.05,
                          salt: float = 255, pepper: float = 0):
        rng = np.random.RandomState(0)
        out = self.Image.copy()
        mask = rng.rand(*self.Image.shape[:2])
        out[mask < prob / 2] = pepper
        out[mask > 1 - prob / 2] = salt
        return out

    def gaussian_noise(self, mean: float = 0, std: float = 25.5):
        rng = np.random.RandomState(0)
        return self.Image + rng.normal(mean, std, self.Image.shape)

    def median_filter(self, size: int):
        from scipy.ndimage import median_filter
        return median_filter(self.Image, size)

"""Tests for splitters, transformers, and metrics."""
import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset, DiskDataset
from deepchem_tpu.splits import (RandomSplitter, IndexSplitter,
                                 SpecifiedSplitter, ScaffoldSplitter,
                                 ButinaSplitter, FingerprintSplitter,
                                 RandomStratifiedSplitter,
                                 SingletaskStratifiedSplitter,
                                 MaxMinSplitter, TaskSplitter,
                                 RandomGroupSplitter, generate_scaffold)
from deepchem_tpu.trans import (NormalizationTransformer, MinMaxTransformer,
                                BalancingTransformer, LogTransformer,
                                ClippingTransformer, CDFTransformer,
                                undo_transforms)
from deepchem_tpu.metrics import (Metric, roc_auc_score, accuracy_score,
                                  mean_squared_error, pearson_r2_score,
                                  rms_score, prc_auc_score, to_one_hot,
                                  bedroc_score, concordance_index)

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'c1ccccc1C', 'c1ccccc1CC',
          'CC(=O)O', 'CCN', 'c1ccncc1', 'C1CCCCC1', 'C1CCCCC1C']


def _mol_dataset(n_tasks=1):
    n = len(SMILES)
    X = np.random.rand(n, 4)
    y = np.random.randint(0, 2, (n, n_tasks)).astype(float)
    return NumpyDataset(X, y, ids=np.array(SMILES, dtype=object))


def test_random_splitter_fractions():
    ds = NumpyDataset(np.random.rand(100, 3), np.random.rand(100))
    tr, va, te = RandomSplitter().split(ds, 0.8, 0.1, 0.1, seed=0)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100


def test_index_splitter_deterministic():
    ds = NumpyDataset(np.random.rand(10, 2), np.arange(10))
    tr, va, te = IndexSplitter().split(ds)
    assert list(tr) == list(range(8))
    assert list(va) == [8]
    assert list(te) == [9]


def test_specified_splitter():
    ds = NumpyDataset(np.random.rand(10, 2), np.arange(10))
    tr, va, te = SpecifiedSplitter([1, 2], [3]).split(ds)
    assert 1 not in tr and 3 in te and 2 in va


def test_specified_splitter_numpy_indices():
    # `x or []` raised on numpy arrays (ambiguous truth value) — pinned
    ds = NumpyDataset(np.random.rand(10, 2), np.arange(10))
    tr, va, te = SpecifiedSplitter(np.array([1, 2]), np.array([3])).split(ds)
    assert sorted(va) == [1, 2] and list(te) == [3]
    tr2, va2, te2 = SpecifiedSplitter(test_indices=np.array([0])).split(ds)
    assert list(te2) == [0] and len(va2) == 0 and len(tr2) == 9


def test_scaffold_splitter_groups_same_scaffold():
    ds = _mol_dataset()
    splitter = ScaffoldSplitter()
    tr, va, te = splitter.split(ds, 0.6, 0.2, 0.2)
    # all benzene-scaffold molecules land in the same subset
    benzene_idx = {2, 3, 4}
    for subset in (tr, va, te):
        s = set(subset)
        assert benzene_idx <= s or not (benzene_idx & s)
    # determinism
    tr2, va2, te2 = splitter.split(ds, 0.6, 0.2, 0.2)
    assert list(tr) == list(tr2)


def test_generate_scaffold():
    assert generate_scaffold('CCO') == ''
    assert generate_scaffold('CCc1ccccc1') == generate_scaffold('c1ccccc1C')


def test_butina_splitter():
    ds = _mol_dataset()
    tr, va, te = ButinaSplitter(cutoff=0.4).split(ds, 0.7, 0.15, 0.15)
    assert len(set(tr) | set(va) | set(te)) == len(SMILES)


def test_fingerprint_splitter():
    ds = _mol_dataset()
    tr, va, te = FingerprintSplitter().split(ds, 0.8, 0.1, 0.1)
    assert len(tr) + len(va) + len(te) == len(SMILES)


def test_maxmin_splitter():
    ds = _mol_dataset()
    tr, va, te = MaxMinSplitter().split(ds, 0.6, 0.2, 0.2, seed=1)
    assert len(set(tr) | set(va) | set(te)) == len(SMILES)


def test_stratified_splitter():
    n = 200
    y = np.zeros((n, 2))
    y[:20, 0] = 1        # rare actives in task 0
    y[100:110, 1] = 1
    ds = NumpyDataset(np.random.rand(n, 3), y)
    tr, va, te = RandomStratifiedSplitter().split(ds, 0.8, 0.1, 0.1, seed=0)
    y_tr = ds.y[tr]
    assert y_tr[:, 0].sum() >= 10     # train got ~80% of 20 actives


def test_singletask_stratified():
    ds = NumpyDataset(np.random.rand(100, 3), np.random.rand(100))
    tr, va, te = SingletaskStratifiedSplitter().split(ds, 0.8, 0.1, 0.1,
                                                      seed=0)
    assert len(set(tr) | set(va) | set(te)) == 100


def test_group_splitter():
    groups = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    ds = NumpyDataset(np.random.rand(10, 2), np.arange(10))
    tr, va, te = RandomGroupSplitter(groups).split(ds, 0.6, 0.2, 0.2,
                                                   seed=0)
    for g in range(5):
        members = {i for i in range(10) if groups[i] == g}
        for subset in (tr, va, te):
            s = set(subset.tolist())
            assert members <= s or not (members & s)


def test_task_splitter():
    ds = NumpyDataset(np.random.rand(10, 3), np.random.rand(10, 10))
    tr, va, te = TaskSplitter().train_valid_test_split(ds, 0.8, 0.1, 0.1)
    assert tr.y.shape[1] == 8 and va.y.shape[1] == 1 and te.y.shape[1] == 1


def test_k_fold_split():
    ds = DiskDataset.from_numpy(np.random.rand(20, 3), np.arange(20))
    folds = RandomSplitter().k_fold_split(ds, 4)
    assert len(folds) == 4
    for train, cv in folds:
        assert len(train) + len(cv) == 20


# -- transformers ----------------------------------------------------------
def test_normalization_transformer():
    ds = NumpyDataset(np.random.rand(50, 3) * 10,
                      np.random.rand(50, 2) * 5 + 2)
    t = NormalizationTransformer(transform_y=True, dataset=ds)
    ds2 = t.transform(ds)
    assert abs(ds2.y.mean()) < 1e-6
    assert np.allclose(ds2.y.std(0), 1.0, atol=1e-6)
    back = undo_transforms(ds2.y, [t])
    assert np.allclose(back, ds.y, atol=1e-6)


def test_normalization_on_disk_dataset(tmp_path):
    ds = DiskDataset.from_numpy(np.random.rand(30, 3),
                                np.random.rand(30, 1) * 9,
                                data_dir=str(tmp_path / 'n'))
    t = NormalizationTransformer(transform_y=True, dataset=ds)
    ds2 = t.transform(ds)
    assert isinstance(ds2, DiskDataset)
    assert abs(ds2.y.mean()) < 1e-6


def test_minmax_transformer():
    ds = NumpyDataset(np.random.rand(20, 3), np.random.rand(20, 1) * 7 - 3)
    t = MinMaxTransformer(transform_y=True, dataset=ds)
    ds2 = t.transform(ds)
    assert ds2.y.min() >= 0 and ds2.y.max() <= 1
    assert np.allclose(undo_transforms(ds2.y, [t]), ds.y, atol=1e-6)


def test_balancing_transformer():
    y = np.concatenate([np.ones(90), np.zeros(10)])[:, None]
    ds = NumpyDataset(np.random.rand(100, 2), y)
    t = BalancingTransformer(ds)
    ds2 = t.transform(ds)
    w = ds2.w
    # total weight per class should be equal
    assert abs(w[y == 1].sum() - w[y == 0].sum()) < 1e-6


def test_log_clipping_cdf():
    ds = NumpyDataset(np.random.rand(20, 3) * 100,
                      np.random.rand(20, 1) * 100)
    dl = LogTransformer(transform_y=True).transform(ds)
    assert np.allclose(undo_transforms(dl.y, [
        LogTransformer(transform_y=True)]), ds.y, atol=1e-5)
    dc = ClippingTransformer(transform_X=True, x_max=2.0).transform(ds)
    assert dc.X.max() <= 2.0
    cdf = CDFTransformer(transform_y=True, dataset=ds)
    dy = cdf.transform(ds)
    assert dy.y.min() >= 0 and dy.y.max() <= 1


# -- metrics ---------------------------------------------------------------
def test_metric_roc_auc_multitask():
    n = 100
    y = np.random.randint(0, 2, (n, 3)).astype(float)
    # good predictions: probability near label
    probs = np.clip(y + np.random.randn(n, 3) * 0.2, 0, 1)
    m = Metric(roc_auc_score, np.mean)
    score = m.compute_metric(y, probs, n_tasks=3)
    assert score > 0.9


def test_metric_roc_auc_with_one_hot_probs():
    n = 80
    y = np.random.randint(0, 2, (n, 2)).astype(float)
    probs = np.zeros((n, 2, 2))
    p1 = np.clip(y + np.random.randn(n, 2) * 0.1, 0.01, 0.99)
    probs[:, :, 1] = p1
    probs[:, :, 0] = 1 - p1
    score = Metric(roc_auc_score).compute_metric(y, probs, n_tasks=2)
    assert score > 0.95


def test_metric_accuracy_thresholds():
    y = np.array([0, 1, 1, 0, 1])
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.7],
                      [0.8, 0.2], [0.1, 0.9]])
    score = Metric(accuracy_score).compute_metric(y, probs, n_tasks=1)
    assert score == 1.0


def test_metric_regression():
    y = np.random.rand(50, 2)
    m = Metric(mean_squared_error)
    assert m.compute_metric(y, y, n_tasks=2) < 1e-12
    r2 = Metric(pearson_r2_score)
    assert r2.compute_metric(y, y + np.random.randn(50, 2) * 0.01,
                             n_tasks=2) > 0.99


def test_metric_weights_exclude_rows():
    y = np.array([[0.], [1.], [1.], [0.]])
    pred = np.array([[0.1], [0.9], [0.2], [0.8]])   # wrong on rows 2,3
    w = np.array([[1.], [1.], [0.], [0.]])          # but they have w=0
    score = Metric(roc_auc_score).compute_metric(y, pred, w, n_tasks=1)
    assert score == 1.0


def test_per_task_metrics():
    y = np.random.randint(0, 2, (60, 2)).astype(float)
    probs = np.clip(y + np.random.randn(60, 2) * 0.1, 0, 1)
    overall, per_task = Metric(roc_auc_score).compute_metric(
        y, probs, n_tasks=2, per_task_metrics=True)
    assert len(per_task) == 2
    assert abs(overall - np.mean(per_task)) < 1e-9


def test_misc_scores():
    y = np.array([1, 0, 1, 1, 0, 0, 1, 0])
    s = np.array([0.9, 0.1, 0.8, 0.7, 0.3, 0.2, 0.6, 0.4])
    assert prc_auc_score(y, s) > 0.9
    assert bedroc_score(y, s) > 0.5
    assert concordance_index(np.arange(8), np.arange(8)) == 1.0
    assert rms_score(y, y) == 0.0
    assert to_one_hot(np.array([0, 1, 1]), 2).shape == (3, 2)


def test_metric_skips_single_class_tasks():
    """Sparse multitask data (MUV) can leave a split with one-class
    tasks; the mean must skip them instead of going nan."""
    rng = np.random.RandomState(0)
    y = np.stack([rng.randint(0, 2, 50), np.zeros(50, int),
                  rng.randint(0, 2, 50)], axis=1)
    p = rng.rand(50, 3)
    m = Metric(roc_auc_score, np.mean, mode='classification')
    overall, per = m.compute_metric(y, p, per_task_metrics=True)
    assert not np.isnan(overall)
    assert np.isnan(per[1]) and not np.isnan(per[0])

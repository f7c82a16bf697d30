"""DiskDataset edge-case coverage: the three shuffles, move/copy,
shard mutation versioning, FASTQ/Image loaders, transform(parallel),
w-weight semantics (VERDICT r2 item 6 depth push)."""

import gzip
import os

import numpy as np
import pytest

from deepchem_tpu.data import DiskDataset, NumpyDataset


def _disk(tmp, n=30, f=4, shard=10, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, f)
    y = np.arange(n, dtype=float).reshape(-1, 1)
    ids = np.array([f'id{i}' for i in range(n)])
    ds = DiskDataset.from_numpy(X, y, ids=ids, data_dir=str(tmp))
    ds.reshard(shard_size=shard)
    return ds, X, y, ids


def test_shuffle_each_shard_permutes_within_shards(tmp_path):
    ds, X, y, ids = _disk(tmp_path)
    before = [set(map(str, ds.get_shard(i)[3])) for i in range(3)]
    ds.shuffle_each_shard()
    after = [set(map(str, ds.get_shard(i)[3])) for i in range(3)]
    # same membership per shard, identical global content
    assert before == after
    np.testing.assert_array_equal(np.sort(ds.y, axis=0), np.sort(y,
                                                                 axis=0))
    # rows stay aligned: y[i] still matches ids[i]
    for yy, ii in zip(ds.y.ravel(), ds.ids):
        assert f'id{int(yy)}' == str(ii)


def test_complete_shuffle_permutes_globally(tmp_path):
    ds, X, y, ids = _disk(tmp_path, seed=1)
    ds = ds.complete_shuffle()
    assert set(map(str, ds.ids)) == set(map(str, ids))
    for yy, ii in zip(ds.y.ravel(), ds.ids):
        assert f'id{int(yy)}' == str(ii)
    assert not np.array_equal(ds.y, y)       # actually shuffled


def test_sparse_shuffle_preserves_alignment(tmp_path):
    ds, X, y, ids = _disk(tmp_path, seed=2)
    ds.sparse_shuffle()
    for yy, ii in zip(ds.y.ravel(), ds.ids):
        assert f'id{int(yy)}' == str(ii)
    assert set(map(str, ds.ids)) == set(map(str, ids))


def test_shuffles_bump_version_for_fit_cache(tmp_path):
    """The engine's prepared-batch cache keys on _version; every
    mutating op must bump it (jax_model._ensure_fit_cache)."""
    ds, *_ = _disk(tmp_path, seed=3)
    v0 = getattr(ds, '_version', 0)
    ds.shuffle_each_shard()
    v1 = getattr(ds, '_version', 0)
    ds.reshard(shard_size=5)
    v2 = getattr(ds, '_version', 0)
    assert v0 < v1 < v2
    # complete_shuffle RETURNS a new dataset (reference semantics):
    # identity-keyed caches miss naturally, no bump needed
    assert ds.complete_shuffle() is not ds


def test_move_and_copy(tmp_path):
    ds, X, y, ids = _disk(tmp_path / 'a')
    cp = ds.copy(str(tmp_path / 'b'))
    np.testing.assert_array_equal(cp.y, ds.y)
    assert cp.data_dir != ds.data_dir
    ds.move(str(tmp_path / 'c'))
    assert str(tmp_path / 'c') in ds.data_dir
    np.testing.assert_array_equal(ds.y, cp.y)


def test_select_and_merge_roundtrip(tmp_path):
    ds, X, y, ids = _disk(tmp_path / 'a')
    odd = ds.select(np.arange(1, 30, 2),
                    select_dir=str(tmp_path / 'odd'))
    even = ds.select(np.arange(0, 30, 2),
                     select_dir=str(tmp_path / 'even'))
    merged = DiskDataset.merge([odd, even],
                               merge_dir=str(tmp_path / 'm'))
    assert len(merged) == 30
    assert set(map(str, merged.ids)) == set(map(str, ids))


def test_transform_parallel_matches_serial(tmp_path):
    from deepchem_tpu.trans import NormalizationTransformer
    ds, *_ = _disk(tmp_path / 'a', n=40)
    t = NormalizationTransformer(transform_y=True, dataset=ds)
    serial = t.transform(ds, out_dir=str(tmp_path / 's'))
    parallel = t.transform(ds, parallel=True,
                           out_dir=str(tmp_path / 'p'))
    np.testing.assert_allclose(serial.y, parallel.y)


def test_missing_labels_get_zero_weight(tmp_path):
    """CSV with empty/NaN cells -> w=0 (reference
    data_loader.py:40)."""
    from deepchem_tpu.data import CSVLoader
    from deepchem_tpu.feat import CircularFingerprint
    p = tmp_path / 'm.csv'
    p.write_text('smiles,t1,t2\nCCO,1.5,\nCCN,,0.5\nCCC,2.0,3.0\n')
    ds = CSVLoader(['t1', 't2'], CircularFingerprint(size=64),
                   feature_field='smiles').create_dataset(
        str(p), str(tmp_path / 'out'))
    np.testing.assert_array_equal(ds.w, [[1, 0], [0, 1], [1, 1]])
    np.testing.assert_allclose(ds.y, [[1.5, 0], [0, 0.5], [2.0, 3.0]])


def test_fastq_loader(tmp_path):
    from deepchem_tpu.data import FASTQLoader
    p = tmp_path / 'r.fastq'
    p.write_text('@r1\nACGT\n+\nIIII\n@r2\nTTAA\n+\nIIII\n')
    ds = FASTQLoader().create_dataset(str(p))
    assert len(ds) == 2


def test_image_dataset_lazy_and_pairs(tmp_path):
    from deepchem_tpu.data import ImageDataset
    X = np.random.RandomState(0).rand(6, 5, 5).astype(np.float32)
    y = np.arange(6.0)
    ds = ImageDataset(X, y)
    assert len(ds) == 6
    Xb, yb, wb, ids = next(iter(ds.iterbatches(batch_size=4)))
    assert Xb.shape == (4, 5, 5)


def test_disk_dataset_from_generator_multiple_shards(tmp_path):
    def gen():
        for i in range(4):
            X = np.full((5, 2), i, dtype=float)
            y = np.full((5, 1), i, dtype=float)
            yield X, y, np.ones_like(y), np.arange(5) + 10 * i
    ds = DiskDataset.create_dataset(gen(), str(tmp_path), ['t'])
    assert len(ds) == 20
    assert ds.get_number_shards() == 4
    np.testing.assert_array_equal(np.unique(ds.y), [0, 1, 2, 3])

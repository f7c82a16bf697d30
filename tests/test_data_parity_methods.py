"""Reference Dataset/DiskDataset methods added by the round-4 method-level
parity audit (reference data/datasets.py:700 to_csv, :1289 load_metadata,
:1359 write_data_to_disk, :1429 save_to_disk, :1570 get_data_shape,
:2047 subset, :2197 shuffle_shards, :2272-2333 shard accessors/add_shard,
:2614 memory_cache_size, :2714 label means/stds; data/supports.py:298,362
py2-style next)."""

import random

import numpy as np
import pandas as pd
import pytest

from deepchem_tpu.data import DiskDataset, NumpyDataset
from deepchem_tpu.data.supports import SupportGenerator, EpisodeGenerator


@pytest.fixture
def two_shard_ds(tmp_path):
    rng = np.random.RandomState(7)
    X = rng.rand(10, 4)
    y = rng.rand(10, 2)
    ds = DiskDataset.create_dataset(
        [(X[:5], y[:5], None, np.arange(5)),
         (X[5:], y[5:], None, np.arange(5, 10))],
        data_dir=str(tmp_path / 'ds'), tasks=['a', 'b'])
    return ds, X, y


def test_shard_accessors_and_shapes(two_shard_ds):
    ds, X, y = two_shard_ds
    assert ds.get_data_shape() == (4,)
    assert np.allclose(ds.get_shard_y(1), y[5:])
    assert len(ds.get_shard_ids(0)) == 5
    assert np.allclose(ds.get_shard_w(0), 1.0)


def test_load_metadata_and_label_stats(two_shard_ds):
    ds, X, y = two_shard_ds
    tasks, md = ds.load_metadata()
    assert tasks == ['a', 'b']
    assert list(md['rows']) == [5, 5]
    assert md['file'].iloc[0].endswith('.joblib')
    assert np.allclose(ds.get_label_means().iloc[0], y[:5].mean(0))
    assert np.allclose(ds.get_label_stds().iloc[1], y[5:].std(0))


def test_to_csv_roundtrip(two_shard_ds, tmp_path):
    ds, X, y = two_shard_ds
    out = str(tmp_path / 'out.csv')
    ds.to_csv(out)
    df = pd.read_csv(out)
    assert len(df) == 10
    # tasks come back as y columns in to_dataframe naming
    assert df.shape[1] >= X.shape[1]


def test_add_shard_and_subset(two_shard_ds):
    ds, X, y = two_shard_ds
    ds.add_shard(X[:3], y[:3])
    assert ds.get_number_shards() == 3
    assert len(ds) == 13
    sub = ds.subset([0, 2])
    assert len(sub) == 8
    assert np.allclose(sub.X[:5], X[:5])
    # persisted: a fresh handle sees the added shard
    assert len(DiskDataset(ds.data_dir)) == 13


def test_shuffle_shards_preserves_rows(two_shard_ds):
    ds, X, y = two_shard_ds
    ds.add_shard(X[:3], y[:3])
    before = sorted(map(str, ds.ids))
    random.seed(0)
    ds.shuffle_shards()
    assert sorted(map(str, ds.ids)) == before
    # shuffled order is persisted in the manifest
    assert sorted(map(str, DiskDataset(ds.data_dir).ids)) == before


def test_set_shard_on_file_keyed_entry(two_shard_ds):
    ds, X, y = two_shard_ds
    random.seed(1)
    ds.shuffle_shards()          # gives every entry an explicit file name
    Xs, ys, ws, ids = ds.get_shard(0)
    ds.set_shard(0, Xs * 2, ys, ws, ids)
    assert np.allclose(ds.get_shard(0)[0], Xs * 2)
    assert np.allclose(DiskDataset(ds.data_dir).get_shard(0)[0], Xs * 2)


def test_memory_cache_size_byte_budget(two_shard_ds):
    ds, X, y = two_shard_ds
    ds.memory_cache_size = 0
    ds.get_shard(0)
    assert ds._cache_used == 0 and not ds._cache
    ds.memory_cache_size = 10**9
    ds.get_shard(0)
    ds.get_shard(1)
    assert len(ds._cache) == 2 and ds._cache_used > 0
    # shrinking the budget evicts immediately
    ds.memory_cache_size = 1
    assert not ds._cache and ds._cache_used == 0


def test_support_generators_next_alias():
    rng = np.random.RandomState(0)
    ds = NumpyDataset(rng.rand(40, 3),
                      rng.randint(0, 2, size=(40, 2)).astype(float))
    sg = SupportGenerator(ds, n_pos=2, n_neg=2, n_trials=2)
    task, support = sg.next()
    assert 0 <= task < 2 and len(support) == 4
    eg = EpisodeGenerator(ds, n_pos=2, n_neg=2, n_test=4,
                          n_episodes_per_task=1)
    task, support, batch = eg.next()
    assert len(support) == 4 and len(batch) == 4

"""Executable store (utils/exec_store.py) + predict input tiers.

The store is validated in single-device subprocesses (the suite's own
2-device CPU mesh disables it by design: sharded lowerings embed a
device assignment).  The predict-input tier logic (fit-cache reuse /
predict-data cache / fresh collection) is validated in-process by
numeric equality against the streaming predict path.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import sys, time, logging
logging.basicConfig(level=logging.INFO, stream=sys.stderr)
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.models import MultitaskClassifier
rng = np.random.RandomState(0)
X = rng.randn(100, 8).astype('float32')
y = (X[:, :2].sum(1, keepdims=True) > 0).astype('float32')
ds = NumpyDataset(X, np.concatenate([y, 1 - y], 1))
m = MultitaskClassifier(n_tasks=2, n_features=8, layer_sizes=[8],
                        batch_size=20, seed=0)
losses = m.fit_on_device(ds, nb_epoch=2)
p = m.predict_on_device(ds)
print('LOSS', float(np.sum(losses)))
print('PSUM', float(np.asarray(p).sum()))
"""


def _run_driver(store_dir):
    env = dict(os.environ)
    env['DEEPCHEM_EXEC_STORE'] = str(store_dir)
    # single CPU device so the store engages (parent test env forces 2)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    env['JAX_PLATFORMS'] = 'cpu'
    r = subprocess.run([sys.executable, '-c',
                        _DRIVER.format(repo=REPO)],
                       capture_output=True, text=True, timeout=600,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = dict(line.split() for line in r.stdout.splitlines()
               if line.startswith(('LOSS', 'PSUM')))
    return float(out['LOSS']), float(out['PSUM']), r.stderr


@pytest.mark.slow
def test_store_round_trip_across_processes(tmp_path):
    """Second process deserializes the first's executables (HIT in the
    log) and reproduces its numbers exactly."""
    store = tmp_path / 'exec_store'
    loss1, psum1, err1 = _run_driver(store)
    entries = [f for f in os.listdir(store) if f.endswith('.jaxexe')]
    assert len(entries) >= 2   # probe + at least fit_scan
    assert 'exec store MISS fit_scan' in err1
    loss2, psum2, err2 = _run_driver(store)
    assert 'exec store HIT fit_scan' in err2
    assert loss2 == loss1 and psum2 == psum1


def _tiny_graph_dataset(n=60):
    from deepchem_tpu.feat import ConvMolFeaturizer
    from deepchem_tpu.data import NumpyDataset
    smiles = ['CCO', 'c1ccccc1', 'CC(=O)O', 'CCN', 'CCCC', 'C1CCCCC1',
              'CCOC', 'CC(C)C', 'c1ccncc1', 'CCS'] * (n // 10)
    X = ConvMolFeaturizer().featurize(smiles)
    y = np.array([[float(len(s) % 2)] for s in smiles], dtype='float32')
    return NumpyDataset(X, y, ids=np.array(smiles))


def test_predict_tiers_agree_with_streaming_predict():
    """All three input tiers of predict_on_device (resident fit-cache
    reuse, predict-data cache, fresh collection) must equal the
    per-batch predict() path."""
    from deepchem_tpu.models import GraphConvModel
    ds = _tiny_graph_dataset()
    other = _tiny_graph_dataset(30)
    m = GraphConvModel(n_tasks=1, batch_size=16, mode='classification',
                       seed=0)
    m.fit_on_device(ds, nb_epoch=1)
    ref = np.asarray(m.predict(ds))

    # tier 1: dataset is the fit cache's dataset (resident)
    fc = m._fit_data_cache
    assert fc is not None and fc['dataset'] is ds
    p1 = np.asarray(m.predict_on_device(ds))
    np.testing.assert_allclose(p1, ref, rtol=2e-4, atol=2e-5)

    # tier 3 (fresh collection) then tier 2 (cached) for another dataset
    p3 = np.asarray(m.predict_on_device(other))
    assert id(other) in m._predict_data_cache
    host_cached = m._predict_data_cache[id(other)]['host']
    p2 = np.asarray(m.predict_on_device(other))
    assert m._predict_data_cache[id(other)]['host'] is host_cached
    np.testing.assert_allclose(p2, p3, rtol=1e-6)
    ref_other = np.asarray(m.predict(other))
    np.testing.assert_allclose(p3, ref_other, rtol=2e-4, atol=2e-5)


def test_predict_cache_invalidated_on_dataset_version_bump():
    """Mutating a dataset (version bump) must drop both caches."""
    from deepchem_tpu.models import MultitaskClassifier
    from deepchem_tpu.data import NumpyDataset
    rng = np.random.RandomState(0)
    X = rng.randn(40, 8).astype('float32')
    y = rng.randint(0, 2, (40, 1)).astype('float32')
    ds = NumpyDataset(X, y)
    m = MultitaskClassifier(n_tasks=1, n_features=8, layer_sizes=[8],
                            batch_size=10, seed=0)
    m.fit_on_device(ds, nb_epoch=1)
    m.predict_on_device(ds)
    ds._version = getattr(ds, '_version', 0) + 1
    host, dev, S = m._predict_input_arrays(ds)
    # stale fit cache must NOT be served after the bump
    assert dev is None
    assert S > 0

"""Pin: standard ``fit()`` stays on the device-resident scan path
(VERDICT r3 item 4 — the r2 regression was fit() silently falling back to
the per-step fit_generator loop, a 60x throughput collapse that the bench
only caught a round later).  These tests make the path structural: a
scan-eligible call MUST route through ``_run_scan_segment``, and the
fallback must only trigger for calls that genuinely need per-step host
control."""

import numpy as np

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.models import MultitaskClassifier


def _dataset(n=64, f=8, tasks=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, f).astype(np.float32)
    y = (rng.rand(n, tasks) > 0.5).astype(np.float32)
    return NumpyDataset(X, y)


def _model(**kw):
    return MultitaskClassifier(n_tasks=2, n_features=8,
                               layer_sizes=[16], batch_size=16, **kw)


def test_standard_fit_routes_through_scan(monkeypatch):
    model = _model()
    ds = _dataset()
    calls = []
    orig = model._run_scan_segment

    def spy(cache, order, step0, rng):
        calls.append(len(order))
        return orig(cache, order, step0, rng)

    monkeypatch.setattr(model, '_run_scan_segment', spy)
    model.fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert sum(calls) == 2 * (64 // 16), \
        'fit() did not run every step through the scan path'


def test_fit_generator_not_used_for_standard_fit(monkeypatch):
    model = _model()
    ds = _dataset()

    def boom(*a, **kw):
        raise AssertionError('standard fit() fell back to fit_generator')

    monkeypatch.setattr(model, 'fit_generator', boom)
    loss = model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(loss)


def test_custom_loss_takes_generator_path(monkeypatch):
    """The fallback still exists for calls that need it."""
    model = _model()
    ds = _dataset()
    used = []
    orig = model.fit_generator

    def spy(*a, **kw):
        used.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(model, 'fit_generator', spy)

    def custom_loss(outputs, labels, weights):
        import jax.numpy as jnp
        return jnp.mean((outputs[0] - labels[0]) ** 2)

    model.fit(ds, nb_epoch=1, checkpoint_interval=0, loss=custom_loss)
    assert used, 'custom-loss fit() should use the per-step path'


def test_fit_and_fit_on_device_share_prepared_cache():
    """Both entry points reuse one prepared-batch cache — a second
    fit() after fit_on_device must not rebuild it."""
    model = _model()
    ds = _dataset()
    model.fit_on_device(ds, nb_epoch=1)
    cache1 = model._ensure_fit_cache(ds)
    model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    cache2 = model._ensure_fit_cache(ds)
    assert cache1 is cache2, 'prepared-batch cache rebuilt between paths'


def test_fit_loss_matches_between_paths():
    """Same seed-stream discipline: both paths optimize; final losses are
    finite and in the same regime (not a 60x-collapse canary but a cheap
    sanity check that the scan path actually trains)."""
    ds = _dataset(n=128)
    m1 = _model()
    losses1: list = []
    m1.fit(ds, nb_epoch=5, checkpoint_interval=0, all_losses=losses1)
    m2 = _model()
    losses2: list = []
    m2.fit_on_device(ds, nb_epoch=5, all_losses=losses2)
    assert losses1 and losses2
    assert losses1[-1] < losses1[0] * 1.5
    assert np.isfinite(losses1[-1]) and np.isfinite(losses2[-1])

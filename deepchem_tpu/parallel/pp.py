"""Pipeline parallelism: GPipe-style microbatch pipeline via shard_map.

The reference has no pipeline parallelism (SURVEY.md section 2.7 — its
only multi-device path is Lightning DDP/FSDP).  On TPU the idiomatic
construction is not a send/recv runtime but a *collective program*:
every stage runs the same SPMD code under ``shard_map`` over a
'stage' mesh axis, activations hop stage-to-stage with ONE
``lax.ppermute`` per tick (a neighbor copy that rides the ICI ring),
and the whole schedule — fill, steady state, drain — is a single
``lax.scan`` with static shapes.  Because ppermute is differentiable
(its transpose is the reverse permutation), the BACKWARD pipeline
needs no code: ``jax.grad`` through the forward scan replays the
schedule in reverse automatically.

Schedule (classic GPipe, M microbatches over S stages, M + S - 1
ticks): at tick t, stage s processes microbatch t - s.  Stage 0
injects microbatch t; the last stage collects its output into slot
t - (S - 1).  Bubble fraction is (S - 1) / (M + S - 1) — choose
M >= 4 * S in production.

Composes with data parallelism: put 'stage' on a 2-D
('data', 'stage') mesh and shard the batch on 'data' — every
data-parallel row runs its own pipeline; XLA inserts the gradient
all-reduce over 'data' exactly as in the pure-DP engine.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def get_pipeline_mesh(n_stages: int, devices=None,
                      data_parallel: int = 1) -> Mesh:
    """('data', 'stage') mesh; 'stage' minor so neighbor hops are one
    ICI link apart."""
    devices = list(jax.devices()) if devices is None else list(devices)
    need = n_stages * data_parallel
    if len(devices) < need:
        raise ValueError(f'need {need} devices, have {len(devices)}')
    arr = np.array(devices[:need]).reshape(data_parallel, n_stages)
    return Mesh(arr, ('data', 'stage'))


def stack_stage_params(stage_params: Sequence):
    """[params_stage0, params_stage1, ...] -> one pytree whose leaves
    gain a leading stage dim (shard it with PartitionSpec('stage'))."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_params)


def shard_pipeline_params(stacked, mesh: Mesh):
    """Place stage-stacked params so each stage holds only its slice."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(('stage',) + (None,) * (x.ndim - 1))))),
        stacked)


def pipeline_apply(stage_fn: Callable, stacked_params, x: jnp.ndarray,
                   mesh: Mesh, n_microbatches: int):
    """Run ``x`` through the S-stage pipeline.

    stage_fn(params_for_one_stage, h) -> h', shape-preserving on the
    activation (the pipeline hop is a same-shape neighbor copy).
    ``stacked_params``: pytree with leading stage dim S (see
    stack_stage_params).  ``x``: [B, ...] with B % n_microbatches == 0.
    Batch rows may additionally be sharded over a 'data' mesh axis.

    Returns f(x) == stage_{S-1}(...stage_0(x)) exactly — the schedule
    changes the order of work, not the math (pinned vs the sequential
    oracle in tests/test_pipeline_parallel.py).

    Examples
    --------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> from deepchem_tpu.parallel.pp import (get_pipeline_mesh,
    ...     pipeline_apply, stack_stage_params)
    >>> S = min(2, len(jax.devices()))
    >>> stages = [{'w': jnp.eye(4) * (i + 2.0)} for i in range(S)]
    >>> stage_fn = lambda p, h: h @ p['w']
    >>> mesh = get_pipeline_mesh(S, devices=jax.devices()[:S])
    >>> x = jnp.ones((4, 4))
    >>> out = pipeline_apply(stage_fn, stack_stage_params(stages), x,
    ...                      mesh, n_microbatches=2)
    >>> want = x
    >>> for p in stages: want = stage_fn(p, want)
    >>> bool(jnp.allclose(out, want))
    True
    """
    S = mesh.shape['stage']
    M = n_microbatches
    B = x.shape[0]
    if B % M:
        raise ValueError(f'batch {B} not divisible by microbatches {M}')
    if 'data' in mesh.axis_names and (B // M) % mesh.shape['data']:
        raise ValueError(
            f'per-microbatch batch {B // M} not divisible by data-parallel '
            f"axis size {mesh.shape['data']}")
    mb = x.reshape(M, B // M, *x.shape[1:])

    data_axes = ('data',) if 'data' in mesh.axis_names else ()
    mb_spec = P(None, *data_axes)       # microbatch dim replicated,
                                        # batch rows sharded over 'data'
    pspec = jax.tree.map(
        lambda v: P(*(('stage',) + (None,) * (v.ndim - 1))), stacked_params)

    @partial(shard_map, mesh=mesh,
             in_specs=(pspec, mb_spec), out_specs=mb_spec,
             check_vma=False)
    def run(params_blk, mb):
        params_me = jax.tree.map(lambda p: p[0], params_blk)
        stage = jax.lax.axis_index('stage')
        state = jnp.zeros_like(mb[0])
        out = jnp.zeros_like(mb)

        def tick(carry, t):
            state, out = carry
            inject = mb[jnp.clip(t, 0, M - 1)]
            h = jnp.where(stage == 0, inject, state)
            y = stage_fn(params_me, h)
            # last stage banks its finished microbatch
            idx = t - (S - 1)
            banked = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(idx, 0, M - 1), 0)
            take = jnp.logical_and(
                jnp.logical_and(idx >= 0, idx < M), stage == S - 1)
            out = jnp.where(take, banked, out)
            # one neighbor hop on the stage ring
            state = jax.lax.ppermute(
                y, 'stage', [(i, (i + 1) % S) for i in range(S)])
            return (state, out), None

        (state, out), _ = jax.lax.scan(
            tick, (state, out), jnp.arange(M + S - 1))
        # replicate the last stage's collection to every stage so the
        # out_spec (replicated over 'stage') holds
        out = jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), 'stage')
        return out

    out = run(stacked_params, mb)
    return out.reshape(B, *x.shape[1:])


def pipeline_loss_fn(stage_fn: Callable, loss_fn: Callable, mesh: Mesh,
                     n_microbatches: int) -> Callable:
    """(stacked_params, x, y) -> scalar loss through the pipeline.
    jax.grad of this replays the schedule backward (ppermute
    transposes to the reverse ring) — no explicit backward pipeline."""
    def f(stacked_params, x, y):
        pred = pipeline_apply(stage_fn, stacked_params, x, mesh,
                              n_microbatches)
        return loss_fn(pred, y)
    return f

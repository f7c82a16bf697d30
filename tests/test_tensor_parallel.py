"""Tensor-parallel sharding of the native MLM encoder on a CPU mesh.

Validates the Megatron-style rules in parallel/tp.py: parameters are
REALLY sharded (local shard shapes are fractional), the TP forward/
backward equals the single-device computation, and a 2-D
('data', 'model') mesh composes TP with batch sharding.  Runs on the
2-device virtual CPU mesh (conftest); real-chip layouts are identical
by GSPMD construction.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepchem_tpu.models.bert_encoder import BertEncoderMLM, mlm_loss
from deepchem_tpu.parallel.tp import (BERT_TP_RULES, get_mesh_2d,
                                      local_shard_shapes, param_specs,
                                      shard_batch, shard_params, spec_for)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason='needs >= 2 devices')

VOCAB, HIDDEN, HEADS, LAYERS, SEQ, BATCH = 64, 32, 4, 2, 16, 4


def _tiny_encoder_and_batch():
    enc = BertEncoderMLM(vocab_size=VOCAB, hidden=HIDDEN, layers=LAYERS,
                         heads=HEADS, intermediate=4 * HIDDEN,
                         max_positions=SEQ + 2)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, VOCAB, (BATCH, SEQ)), jnp.int32)
    labels = jnp.asarray(rng.randint(4, VOCAB, (BATCH, SEQ)), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    return enc, params, ids, labels


def test_spec_rules_classify_kernels():
    from jax.sharding import PartitionSpec as P
    assert spec_for('params/layer_0/qkv/kernel') == P(None, 'model')
    assert spec_for('params/layer_7/mlp_in/kernel') == P(None, 'model')
    assert spec_for('params/layer_0/out/kernel') == P('model', None)
    assert spec_for('params/layer_3/mlp_out/kernel') == P('model', None)
    assert spec_for('params/tok_emb/embedding') == P()
    assert spec_for('params/layer_0/ln_att/scale') == P()


def test_tp_forward_and_grads_match_single_device():
    enc, params, ids, labels = _tiny_encoder_and_batch()

    def loss_fn(p):
        return mlm_loss(enc.apply(p, ids), labels)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = get_mesh_2d(model_parallel=2, devices=jax.devices()[:2])
    p_tp = shard_params(params, mesh, BERT_TP_RULES)

    # the kernels are REALLY sharded: local shards are half-size
    shapes = local_shard_shapes(p_tp)
    qkv = [v for k, v in shapes.items() if k.endswith('qkv/kernel')]
    assert qkv and all(g == (HIDDEN, 3 * HIDDEN)
                       and l == (HIDDEN, 3 * HIDDEN // 2)
                       for g, l in qkv)
    row = [v for k, v in shapes.items() if k.endswith('mlp_out/kernel')]
    assert row and all(g == (4 * HIDDEN, HIDDEN)
                       and l == (4 * HIDDEN // 2, HIDDEN)
                       for g, l in row)
    emb = [v for k, v in shapes.items() if k.endswith('tok_emb/embedding')]
    assert emb and all(g == l for g, l in emb)

    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(p_tp)
    assert np.allclose(float(ref_loss), float(tp_loss), atol=1e-5)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_tp = jax.tree.leaves(tp_grads)
    for a, b in zip(flat_ref, flat_tp):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tp_training_step_preserves_layout():
    import optax
    enc, params, ids, labels = _tiny_encoder_and_batch()
    mesh = get_mesh_2d(model_parallel=2, devices=jax.devices()[:2])
    p_tp = shard_params(params, mesh, BERT_TP_RULES)
    opt = optax.adam(1e-3)
    opt_state = jax.jit(opt.init)(p_tp)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(
            lambda q: mlm_loss(enc.apply(q, ids), labels))(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(3):
        p_tp, opt_state, loss = step(p_tp, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # updated params keep their TP layout (no silent re-replication)
    shapes = local_shard_shapes(p_tp)
    qkv = [v for k, v in shapes.items() if k.endswith('qkv/kernel')]
    assert all(l == (HIDDEN, 3 * HIDDEN // 2) for _, l in qkv)


def test_data_axis_composes_with_model_axis():
    # 2 devices as a (1, 2) mesh exercises pure TP; a (2, 1) mesh pure
    # DP; both must agree with the reference loss
    enc, params, ids, labels = _tiny_encoder_and_batch()

    def loss_fn(p, i, l):
        return mlm_loss(enc.apply(p, i), l)

    ref = float(loss_fn(params, ids, labels))

    for mp in (1, 2):
        mesh = get_mesh_2d(model_parallel=mp,
                           devices=jax.devices()[:2])
        p_s = shard_params(params, mesh, BERT_TP_RULES)
        ids_s, labels_s = shard_batch((ids, labels), mesh)
        got = float(jax.jit(loss_fn)(p_s, ids_s, labels_s))
        assert np.isclose(ref, got, atol=1e-5), f'mp={mp}'


def test_param_specs_tree_matches_structure():
    from jax.sharding import PartitionSpec as P
    enc, params, _, _ = _tiny_encoder_and_batch()
    specs = param_specs(params)
    flat_params = jax.tree_util.tree_leaves(params)
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_params) == len(flat_specs)
    assert all(isinstance(s, P) for s in flat_specs)
    assert any(s != P() for s in flat_specs)

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


class TestOneSwitchTP:
    """VERDICT r4 item 3: tensor parallelism reachable through the
    public engine — ``model.distribute(tensor_parallel=k)`` + ``fit()``,
    no hand-rolled optax in user code."""

    def _tiny_chemberta(self, task='classification'):
        from deepchem_tpu.models import Chemberta
        return Chemberta(task=task, n_tasks=1, max_length=16,
                         batch_size=4, num_hidden_layers=2,
                         num_attention_heads=2, hidden_size=32,
                         intermediate_size=64)

    def _smiles_ds(self):
        from deepchem_tpu.data import NumpyDataset
        smiles = ['CCO', 'c1ccccc1', 'CC(=O)O', 'CCN',
                  'CCCC', 'C1CC1', 'CCOC', 'CN(C)C']
        y = (np.arange(len(smiles)) % 2).astype(np.float32)[:, None]
        return NumpyDataset(np.asarray(smiles, dtype=object), y)

    def test_distribute_tensor_parallel_really_shards(self):
        m = self._tiny_chemberta()
        m.distribute(tensor_parallel=2, devices=jax.devices()[:2])
        assert m.mesh.shape == {'data': 1, 'model': 2}
        ds = self._smiles_ds()
        m.fit(ds, nb_epoch=1, deterministic=True, checkpoint_interval=0)
        shapes = local_shard_shapes(m.params)
        qk = {k: v for k, v in shapes.items()
              if k.endswith('query/kernel')}
        assert qk and all(l == (g[0], g[1] // 2) for g, l in qk.values())
        row = {k: v for k, v in shapes.items()
               if k.endswith('attention/output/dense/kernel')}
        assert row and all(l == (g[0] // 2, g[1])
                           for g, l in row.values())
        # optimizer moments inherit the weight layout (suffix-anchored
        # rules match mu/nu paths)
        opt_shapes = local_shard_shapes(m.opt_state)
        mu_qk = {k: v for k, v in opt_shapes.items()
                 if k.endswith('query/kernel') and 'mu/' in k}
        assert mu_qk, sorted(opt_shapes)[:5]
        assert all(l == (g[0], g[1] // 2) for g, l in mu_qk.values())

    def test_tp_fit_loss_and_predict_match_single_device(self):
        ds = self._smiles_ds()
        ref = self._tiny_chemberta()
        ref_loss = ref.fit(ds, nb_epoch=2, deterministic=True,
                           checkpoint_interval=0)
        ref_preds = np.asarray(ref.predict(ds))

        tp = self._tiny_chemberta()
        tp.distribute(tensor_parallel=2, devices=jax.devices()[:2])
        tp_loss = tp.fit(ds, nb_epoch=2, deterministic=True,
                         checkpoint_interval=0)
        tp_preds = np.asarray(tp.predict(ds))
        assert np.isclose(ref_loss, tp_loss, atol=1e-4), \
            (ref_loss, tp_loss)
        assert np.allclose(ref_preds, tp_preds, atol=1e-4)

    def test_model_without_rules_raises(self):
        from deepchem_tpu.models import MultitaskClassifier
        m = MultitaskClassifier(n_tasks=2, n_features=8,
                                layer_sizes=[8])
        with pytest.raises(ValueError, match='tensor-parallel'):
            m.distribute(tensor_parallel=2, devices=jax.devices()[:2])

    def test_custom_rules_accepted(self):
        from jax.sharding import PartitionSpec as P
        from deepchem_tpu.models import MultitaskClassifier
        m = MultitaskClassifier(n_tasks=2, n_features=8,
                                layer_sizes=[8])
        rules = ((r'.*/kernel$', P(None, 'model')), (r'.*', P()))
        m.distribute(tensor_parallel=2, devices=jax.devices()[:2],
                     tp_rules=rules)
        from deepchem_tpu.data import NumpyDataset
        rng = np.random.RandomState(0)
        ds = NumpyDataset(rng.rand(16, 8).astype(np.float32),
                          rng.randint(0, 2, (16, 2)).astype(np.float32))
        loss = m.fit(ds, nb_epoch=1, checkpoint_interval=0)
        assert np.isfinite(loss)

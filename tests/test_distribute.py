"""One-switch multi-chip distribution (VERDICT r3 item 2).

``model.distribute(mesh)`` / ``DistributedTrainer().fit(model, ds)`` must
derive every family-specific piece of distribution state — graph models
get subgraph shards + padding quanta with NO private attributes in user
code — and multi-device training must match the single-device oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import GraphData
from deepchem_tpu.models import (DistributedTrainer, GraphConvModel,
                                 MultitaskClassifier)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason='needs >= 2 devices')


def _graph_dataset(n=16, seed=0, n_tasks=1):
    rng = np.random.RandomState(seed)

    def g(i):
        nn_ = 4 + i % 3
        nf = rng.rand(nn_, 75).astype(np.float32)
        src = np.arange(nn_ - 1)
        ei = np.stack([np.concatenate([src, src + 1]),
                       np.concatenate([src + 1, src])])
        return GraphData(nf, ei)

    graphs = np.empty(n, dtype=object)
    for i in range(n):
        graphs[i] = g(i)
    y = rng.randint(0, 2, (n, n_tasks)).astype(float)
    return NumpyDataset(graphs, y)


def test_trainer_one_switch_graph_dp():
    """DistributedTrainer().fit(GraphConvModel(...), ds) runs graph DP
    end-to-end with zero manual knobs."""
    ds = _graph_dataset(16)
    model = GraphConvModel(n_tasks=1, batch_size=8, mode='classification',
                           graph_conv_layers=[8], dense_layer_size=8,
                           data_parallel=False)
    assert model._n_shards == 1
    trainer = DistributedTrainer(max_epochs=2, devices=2)
    trainer.fit(model, ds)
    assert model._n_shards == 2
    assert model.mesh is not None and model.mesh.shape['data'] == 2
    # quanta derived from the tiny graphs, not the 512/1024 defaults
    assert model.node_quantum == 64 and model.edge_quantum == 64
    assert np.isfinite(model.all_losses[-1])
    preds = model.predict(ds)
    assert preds.shape[0] == 16


def test_graph_dp_loss_parity_with_single_device():
    """distribute(2 devices) must reproduce the single-device loss
    trajectory: same graphs, same seed, same batch composition — the
    vmapped per-device blocks plus XLA's gradient all-reduce are
    numerically the same program."""
    ds = _graph_dataset(16, seed=3)

    def make():
        return GraphConvModel(n_tasks=1, batch_size=8,
                              mode='classification',
                              graph_conv_layers=[8], dense_layer_size=8,
                              data_parallel=False, seed=7,
                              batch_normalize=False)

    m1 = make()
    m1.node_quantum = m1.edge_quantum = 64
    m1.fit(ds, nb_epoch=3, deterministic=True, checkpoint_interval=0)

    m2 = make().distribute(Mesh(np.array(jax.devices()[:2]), ('data',)),
                           dataset=ds)
    m2.fit(ds, nb_epoch=3, deterministic=True, checkpoint_interval=0)
    np.testing.assert_allclose(m1.all_losses, m2.all_losses,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m1.predict(ds), m2.predict(ds),
                               rtol=2e-3, atol=2e-4)


def test_distribute_after_build_rebuilds_module():
    """distribute() after the model is built must rebuild the module for
    the per-device graph-slot count while keeping the trained params."""
    ds = _graph_dataset(16)
    model = GraphConvModel(n_tasks=1, batch_size=8, mode='classification',
                           graph_conv_layers=[8], dense_layer_size=8,
                           data_parallel=False)
    model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    params_before = jax.tree.leaves(model.params)
    model.distribute(devices=2, dataset=ds)
    assert model.module.num_graphs == 4
    params_after = jax.tree.leaves(model.params)
    for a, b in zip(params_before, params_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(model.all_losses[-1])


def test_distribute_validates_batch_divisibility():
    model = GraphConvModel(n_tasks=1, batch_size=9, mode='classification',
                           data_parallel=False)
    with pytest.raises(ValueError, match='divisible'):
        model.distribute(devices=2)


def test_distribute_dense_model():
    """Base-model distribute: mesh set, batch axis sharded, losses
    finite; devices=1 is a no-op returning mesh None."""
    rng = np.random.RandomState(0)
    X = rng.rand(16, 10).astype(np.float32)
    y = rng.randint(0, 2, (16, 2)).astype(float)
    ds = NumpyDataset(X, y)
    m = MultitaskClassifier(n_tasks=2, n_features=10, layer_sizes=[8],
                            batch_size=8, data_parallel=False)
    assert m.distribute(devices=1).mesh is None
    m.distribute(devices=2).fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert m.mesh.shape['data'] == 2
    assert np.isfinite(m.all_losses[-1])

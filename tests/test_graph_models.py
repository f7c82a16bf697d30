"""Overfit + shape tests for graph models (modeled on reference
deepchem/models/tests/test_graph_models.py:49-62 overfit style)."""
import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import ConvMolFeaturizer, MolGraphConvFeaturizer
from deepchem_tpu.metrics import (Metric, roc_auc_score, pearson_r2_score)
from deepchem_tpu.models import (GraphConvModel, GCNModel, GATModel,
                                 AttentiveFPModel, MPNNModel, PagtnModel)

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
Y_CLS = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]
Y_REG = np.array([1.2, 0.1, 3.4, 0.7, 1.1, 3.1, 0.2, 0.1, 0.5, 0.3],
                 dtype=float)[:, None]


@pytest.fixture(scope='module')
def conv_ds():
    X = ConvMolFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def graph_ds():
    X = MolGraphConvFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def graph_edge_ds():
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


def test_graph_conv_model_overfit(conv_ds):
    model = GraphConvModel(n_tasks=1, batch_size=10,
                           mode='classification', learning_rate=0.003)
    model.fit(conv_ds, nb_epoch=60, checkpoint_interval=0)
    scores = model.evaluate(conv_ds, [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.9


def test_graph_conv_model_regression(conv_ds):
    ds = NumpyDataset(conv_ds.X, Y_REG)
    model = GraphConvModel(n_tasks=1, batch_size=10, mode='regression',
                           learning_rate=0.003)
    model.fit(ds, nb_epoch=80, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(pearson_r2_score, np.mean)])
    assert scores['pearson_r2_score'] > 0.7


def test_graph_conv_prediction_shapes(conv_ds):
    model = GraphConvModel(n_tasks=1, batch_size=4, mode='classification')
    model.fit(conv_ds, nb_epoch=1, checkpoint_interval=0)
    preds = model.predict(conv_ds)
    assert preds.shape == (10, 1, 2)
    assert np.allclose(preds.sum(-1), 1.0, atol=1e-5)


def test_gcn_model_overfit(graph_ds):
    model = GCNModel(n_tasks=1, batch_size=10, mode='classification',
                     learning_rate=0.003)
    model.fit(graph_ds, nb_epoch=60, checkpoint_interval=0)
    scores = model.evaluate(graph_ds, [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.9


def test_gat_model_overfit(graph_ds):
    model = GATModel(n_tasks=1, batch_size=10, mode='classification',
                     learning_rate=0.003)
    model.fit(graph_ds, nb_epoch=60, checkpoint_interval=0)
    scores = model.evaluate(graph_ds, [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.9


def test_attentivefp_model_overfit(graph_ds):
    model = AttentiveFPModel(n_tasks=1, batch_size=10,
                             mode='classification', learning_rate=0.003)
    model.fit(graph_ds, nb_epoch=40, checkpoint_interval=0)
    scores = model.evaluate(graph_ds, [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.9


def test_mpnn_model_overfit(graph_edge_ds):
    model = MPNNModel(n_tasks=1, batch_size=10, mode='classification',
                      learning_rate=0.003)
    model.fit(graph_edge_ds, nb_epoch=30, checkpoint_interval=0)
    scores = model.evaluate(graph_edge_ds,
                            [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > 0.9


def test_graph_model_checkpoint(conv_ds, tmp_path):
    model = GraphConvModel(n_tasks=1, batch_size=10,
                           mode='classification',
                           model_dir=str(tmp_path))
    model.fit(conv_ds, nb_epoch=5)
    p1 = model.predict(conv_ds)
    model2 = GraphConvModel(n_tasks=1, batch_size=10,
                            mode='classification',
                            model_dir=str(tmp_path))
    model2.restore()
    assert np.allclose(p1, model2.predict(conv_ds), atol=1e-5)


def test_pagtn_model_overfit():
    from deepchem_tpu.feat import PagtnMolGraphFeaturizer
    X = PagtnMolGraphFeaturizer(max_length=5).featurize(SMILES)
    ds = NumpyDataset(X, Y_REG)
    model = PagtnModel(n_tasks=1, batch_size=10, mode='regression',
                       num_layers=2, learning_rate=0.003)
    model.fit(ds, nb_epoch=60, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(pearson_r2_score, np.mean)])
    assert scores['pearson_r2_score'] > 0.8


def test_egnn_layer_equivariance():
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.models.graph_layers import EGNNLayer
    rng = np.random.RandomState(0)
    N, E, F = 5, 8, 16
    h = jnp.asarray(rng.randn(N, F).astype(np.float32))
    x = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    esrc = jnp.asarray(rng.randint(0, N, E))
    edst = jnp.asarray(rng.randint(0, N, E))
    emask = jnp.ones(E)
    layer = EGNNLayer(hidden_dim=32)
    params = layer.init(jax.random.PRNGKey(0), h, x, esrc, edst, emask)
    h1, x1 = layer.apply(params, h, x, esrc, edst, emask)
    th = 0.9
    R = jnp.asarray(np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32))
    t = jnp.asarray(np.array([1., 2., 3.], np.float32))
    h2, x2 = layer.apply(params, h, x @ R.T + t, esrc, edst, emask)
    assert jnp.allclose(h1, h2, atol=1e-4)          # invariant features
    assert jnp.allclose(x1 @ R.T + t, x2, atol=1e-4)  # equivariant coords


def test_graph_model_export(tmp_path, conv_ds):
    """The flagship graph model exports to StableHLO and reproduces
    predict() (deepchem_tpu.serving)."""
    from deepchem_tpu.serving import export_model, load_exported
    model = GraphConvModel(n_tasks=1, batch_size=10,
                           mode='classification', data_parallel=False)
    model.fit(conv_ds, nb_epoch=3, checkpoint_interval=0)
    inputs = model._graph_inputs(np.asarray(conv_ds.X, dtype=object))
    path = str(tmp_path / 'gc.dcx')
    export_model(model, inputs, path)
    exp = load_exported(path)
    out = exp(*inputs)
    ref = model.predict(conv_ds)
    assert np.allclose(out[0][:10], ref, atol=1e-4)


def test_graphconv_table_path_matches_coo(conv_ds):
    """The scatter-free neighbor-table path must produce EXACTLY the
    same predictions as the COO gather+segment path for one set of
    parameters (ops/nei_table.py vs ops/segment.py)."""
    m = GraphConvModel(n_tasks=1, mode='classification', batch_size=10,
                       graph_conv_layers=[16, 16], dense_layer_size=32)
    m.fit(conv_ds, nb_epoch=2, checkpoint_interval=0)
    p_table = m.predict(conv_ds)
    try:
        type(m).uses_neighbor_table = False
        p_coo = m.predict(conv_ds)
    finally:
        type(m).uses_neighbor_table = True
    np.testing.assert_allclose(p_table, p_coo, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('cls_name', ['GCNModel', 'GATModel',
                                      'AttentiveFPModel'])
def test_stacked_gnn_table_path_matches_coo(graph_ds, cls_name):
    """Scatter-free slot attention/aggregation must equal the COO
    segment-op formulation for identical parameters."""
    import deepchem_tpu.models as M
    cls = getattr(M, cls_name)
    m = cls(n_tasks=1, mode='classification', batch_size=10)
    m.fit(graph_ds, nb_epoch=1, checkpoint_interval=0)
    p_table = m.predict(graph_ds)
    try:
        cls.uses_neighbor_table = False
        cls.uses_rev_slot = False
        p_coo = m.predict(graph_ds)
    finally:
        cls.uses_neighbor_table = True
        cls.uses_rev_slot = cls_name != 'GCNModel'
    np.testing.assert_allclose(p_table, p_coo, rtol=1e-4, atol=1e-5)


def test_dmpnn_edge_table_path_matches_coo(graph_edge_ds):
    """Directed edge->node aggregation via the incoming-edge-id table
    (nei_sum_edges) must equal the segment_sum formulation, values AND
    gradients (training one step from the same init)."""
    from deepchem_tpu.models import DMPNNModel
    m = DMPNNModel(n_tasks=1, mode='classification', batch_size=10,
                   enc_hidden=16, depth=3, ffn_hidden=16, ffn_layers=1)
    m.fit(graph_edge_ds, nb_epoch=1, checkpoint_interval=0)
    p_table = m.predict(graph_edge_ds)
    try:
        DMPNNModel.uses_edge_table = False
        p_coo = m.predict(graph_edge_ds)
    finally:
        DMPNNModel.uses_edge_table = True
    np.testing.assert_allclose(p_table, p_coo, rtol=1e-4, atol=1e-5)


def test_mpnn_edge_table_path_matches_coo(graph_edge_ds):
    """Gilmer MPNN with in+out edge-id tables (nei_sum_edges + take_src)
    must equal the COO segment formulation."""
    from deepchem_tpu.models import MPNNModel
    m = MPNNModel(n_tasks=1, mode='classification', batch_size=10,
                  node_dim=16, T=2, M=2)
    m.fit(graph_edge_ds, nb_epoch=1, checkpoint_interval=0)
    p_table = m.predict(graph_edge_ds)
    try:
        MPNNModel.uses_edge_table = False
        p_coo = m.predict(graph_edge_ds)
    finally:
        MPNNModel.uses_edge_table = 'both'
    np.testing.assert_allclose(p_table, p_coo, rtol=1e-4, atol=1e-5)

"""Serving + DistributedTrainer coverage (VERDICT r2 item 6: 'whole
subsystems hang on one or two tests — serving, trainer/fsdp').

Multi-device cases run on the conftest's virtual CPU mesh."""

import os

import numpy as np
import pytest

import jax

from deepchem_tpu.data import NumpyDataset


def _dataset(n=64, f=12, t=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, f).astype(np.float32)
    y = (X[:, :t] > 0).astype(np.float32)
    return NumpyDataset(X, y)


def _model(tmp, **kw):
    from deepchem_tpu.models import MultitaskClassifier
    kw.setdefault('batch_size', 16)
    kw.setdefault('layer_sizes', [16])
    return MultitaskClassifier(n_tasks=2, n_features=12,
                               model_dir=str(tmp), **kw)


# -- serving ---------------------------------------------------------------

def test_export_roundtrip_file(tmp_path):
    from deepchem_tpu.serving import export_model, load_exported
    ds = _dataset()
    m = _model(tmp_path / 'm')
    m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    path = str(tmp_path / 'exported.dc')
    export_model(m, [ds.X[:16]], path)
    assert os.path.exists(path)
    ex = load_exported(path)
    out = ex(ds.X[:16])
    ref = m.predict(NumpyDataset(ds.X[:16], None, None))
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4,
                               atol=1e-5)


def test_inference_server_pads_ragged_batches(tmp_path):
    """InferenceServer serves request sizes != export batch size by
    padding to the compiled shape and trimming."""
    from deepchem_tpu.serving import (InferenceServer, export_model,
                                      load_exported)
    ds = _dataset()
    m = _model(tmp_path / 'm')
    m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    path = str(tmp_path / 'exported.dc')
    export_model(m, [ds.X[:16]], path)
    srv = InferenceServer(load_exported(path))
    for n in (1, 7, 16, 23, 64):
        out = srv.predict(ds.X[:n])
        assert len(out) == n
        ref = m.predict(NumpyDataset(ds.X[:n], None, None))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-5)


def test_exported_model_runs_without_source_module(tmp_path):
    """The exported blob is self-contained (StableHLO + weights): a
    fresh loader process needs no model class."""
    from deepchem_tpu.serving import export_model, load_exported
    ds = _dataset()
    m = _model(tmp_path / 'm')
    m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    path = str(tmp_path / 'e.dc')
    export_model(m, [ds.X[:16]], path)
    ex = load_exported(path)
    assert ex.batch_size == 16
    out = ex(ds.X[:16])
    assert np.isfinite(np.asarray(out[0])).all()


def test_export_int_input_model(tmp_path):
    """Integer token inputs (TextCNN) keep their dtype through export:
    the float64->float32 coercion must not touch int sequences."""
    from deepchem_tpu.models import TextCNNModel
    from deepchem_tpu.serving import export_model, load_exported
    smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
              'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
    y = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]
    ds = NumpyDataset(np.zeros((10, 1)), y,
                      ids=np.array(smiles, dtype=object))
    cd, sl = TextCNNModel.build_char_dict(ds)
    m = TextCNNModel(n_tasks=1, char_dict=cd, seq_length=sl,
                     batch_size=10, mode='classification', dropout=0.0,
                     model_dir=str(tmp_path / 't'))
    m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    gen = m.default_generator(ds, epochs=1, mode='predict',
                              pad_batches=True)
    inputs = m._prepare_batch(next(iter(gen)))[0]
    assert any(np.issubdtype(np.asarray(x).dtype, np.integer)
               for x in inputs)
    path = str(tmp_path / 'textcnn.dc')
    export_model(m, inputs, path)
    ex = load_exported(path)
    out = ex(*inputs)
    import jax.numpy as jnp
    ref = m._forward(m.params, [jnp.asarray(x) for x in inputs],
                     False, None)
    if m.output_types is not None:
        ref = [ref[i] for i in m._prediction_outputs]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason='needs multi-device mesh')
def test_export_after_data_parallel_training(tmp_path):
    """Exporting a DP-trained model pulls the sharded params to host:
    the exported program is single-device and matches the mesh model's
    predictions."""
    from deepchem_tpu.serving import export_model, load_exported
    ds = _dataset(n=64)
    m = _model(tmp_path / 'dp', batch_size=16, data_parallel=True)
    m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    path = str(tmp_path / 'dp.dc')
    export_model(m, [ds.X[:16]], path)
    ex = load_exported(path)
    out = ex(ds.X[:16])
    ref = m.predict(NumpyDataset(ds.X[:16], None, None))
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4,
                               atol=1e-5)


def test_export_multi_platform_lowering(tmp_path):
    """platforms=['cpu', 'tpu'] produces one portable artifact that
    still loads and runs on the current (CPU) backend — the deploy-
    to-fleet path."""
    from deepchem_tpu.serving import export_model, load_exported
    ds = _dataset()
    m = _model(tmp_path / 'mp')
    m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    path = str(tmp_path / 'multi.dc')
    export_model(m, [ds.X[:16]], path, platforms=['cpu', 'tpu'])
    ex = load_exported(path)
    out = ex(ds.X[:16])
    ref = m.predict(NumpyDataset(ds.X[:16], None, None))
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4,
                               atol=1e-5)


# -- DistributedTrainer ----------------------------------------------------

@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason='needs multi-device mesh')
def test_trainer_ddp_multi_device(tmp_path):
    from deepchem_tpu.models.trainer import DistributedTrainer
    ds = _dataset(n=96)
    m = _model(tmp_path, batch_size=16)
    trainer = DistributedTrainer(max_epochs=12,
                                 distributed_strategy='ddp')
    trainer.fit(m, ds)
    from deepchem_tpu.metrics import Metric, roc_auc_score
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.8


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason='needs multi-device mesh')
def test_trainer_fsdp_shards_opt_state(tmp_path):
    """'fsdp' strategy: optimizer state sharded over the mesh, training
    still converges, params stay replicated for predict()."""
    from deepchem_tpu.models.trainer import DistributedTrainer
    ds = _dataset(n=96, seed=3)
    # large enough first-layer kernel (12x8192) to cross the trainer's
    # shard threshold; build first so fsdp sees the optimizer state
    m = _model(tmp_path, batch_size=16, layer_sizes=[8192])
    m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    trainer = DistributedTrainer(max_epochs=12,
                                 distributed_strategy='fsdp')
    trainer.fit(m, ds)
    # at least one optimizer-state leaf is actually sharded
    shardings = [getattr(x, 'sharding', None)
                 for x in jax.tree.leaves(m.opt_state)
                 if hasattr(x, 'sharding')]
    assert any(s is not None and not s.is_fully_replicated
               for s in shardings)
    from deepchem_tpu.metrics import Metric, roc_auc_score
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.8


def test_trainer_single_device_fallback(tmp_path):
    from deepchem_tpu.models.trainer import DistributedTrainer
    ds = _dataset(n=48, seed=5)
    m = _model(tmp_path)
    DistributedTrainer(max_epochs=5).fit(m, ds)
    assert m.get_global_step() > 0


def test_export_graph_model_stablehlo(tmp_path):
    """The flagship graph family exports to StableHLO too: a trained
    GraphConvModel's 8-array padded-graph signature round-trips through
    serialize/deserialize with inference parity."""
    from deepchem_tpu.feat import ConvMolFeaturizer
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.serving import export_model, load_exported
    smiles = ['CCO', 'c1ccccc1', 'CC(=O)O', 'CCN', 'CCCC', 'CO',
              'c1ccncc1', 'CC(C)O', 'CCS', 'C1CCCCC1'] * 4
    X = ConvMolFeaturizer().featurize(smiles)
    y = np.array([[float(len(s))] for s in smiles], dtype=np.float32)
    ds = NumpyDataset(np.array(X, dtype=object), y)
    m = GraphConvModel(n_tasks=1, mode='regression', batch_size=8,
                       graph_conv_layers=[16, 16], dense_layer_size=16,
                       model_dir=str(tmp_path / 'g'))
    m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    gen = m.default_generator(ds, epochs=1, mode='predict',
                              pad_batches=True)
    inputs = m._prepare_batch(next(iter(gen)))[0]
    path = str(tmp_path / 'gcm.dc')
    export_model(m, inputs, path)
    ex = load_exported(path)
    out = ex(*inputs)
    assert np.asarray(out[0]).shape == (8, 1)
    import jax.numpy as jnp
    ref = m._forward(m.params, [jnp.asarray(x) for x in inputs],
                     False, None)
    if m.output_types is not None:
        ref = [ref[i] for i in m._prediction_outputs]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)

"""Systematic save->reload->identical-prediction sweep across the zoo.

Mirrors the reference's test_reload.py discipline
(/root/reference/deepchem/models/tests/test_reload.py, 1229 LoC: for
every model family, train briefly, checkpoint, construct a FRESH model
with the same hyperparameters and model_dir, restore, and require the
restored model to reproduce the original predictions).  Reload bugs are
silent in normal training and only surface in production serving /
resume paths, so each family gets its own pin here.

One engine means one checkpoint format (rotating pickle of
params/opt_state/global_step, models/jax_model.py save_checkpoint), but
reload still exercises per-family surface: module reconstruction from
constructor args, batch preparation determinism, and output_types
routing through predict.
"""
import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import (ConvMolFeaturizer, MolGraphConvFeaturizer,
                               PagtnMolGraphFeaturizer, WeaveFeaturizer)

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
Y_CLS = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]


# ---------------------------------------------------------------------------
# featurized fixtures, computed once per session
# ---------------------------------------------------------------------------
@pytest.fixture(scope='module')
def graph_ds():
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def convmol_ds():
    X = ConvMolFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def pagtn_ds():
    X = PagtnMolGraphFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def weave_ds():
    X = WeaveFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y_CLS)


@pytest.fixture(scope='module')
def dense_ds():
    rng = np.random.RandomState(0)
    X = rng.rand(20, 16).astype(np.float32)
    y = (X[:, :2].sum(1) > 1.0).astype(float)[:, None]
    return NumpyDataset(X, y)


def _roundtrip(make_model, ds, tmp_path, nb_epoch=2, atol=1e-6,
               predict=None):
    """fit -> checkpoint -> fresh model -> restore -> identical preds."""
    model = make_model(str(tmp_path))
    model.fit(ds, nb_epoch=nb_epoch, checkpoint_interval=0)
    model.save_checkpoint()
    predict = predict or (lambda m: m.predict(ds))
    ref = predict(model)

    fresh = make_model(str(tmp_path))
    fresh.restore()
    out = predict(fresh)
    assert np.asarray(ref).shape == np.asarray(out).shape
    assert np.allclose(ref, out, atol=atol), \
        f'restored predictions diverge: max |d|=' \
        f'{np.abs(np.asarray(ref) - np.asarray(out)).max()}'
    assert fresh.get_global_step() == model.get_global_step()
    return model, fresh


# ---------------------------------------------------------------------------
# dense harness family
# ---------------------------------------------------------------------------
def test_reload_multitask_regressor(dense_ds, tmp_path):
    from deepchem_tpu.models import MultitaskRegressor
    rng = np.random.RandomState(1)
    yr = (dense_ds.X @ rng.rand(16, 2)).astype(np.float32)
    ds = NumpyDataset(dense_ds.X, yr)
    _roundtrip(lambda d: MultitaskRegressor(
        n_tasks=2, n_features=16, layer_sizes=[24], dropouts=0.0,
        batch_size=10, model_dir=d), ds, tmp_path)


def test_reload_robust_multitask(dense_ds, tmp_path):
    from deepchem_tpu.models import RobustMultitaskClassifier
    _roundtrip(lambda d: RobustMultitaskClassifier(
        n_tasks=1, n_features=16, layer_sizes=[24], dropouts=0.0,
        bypass_layer_sizes=[8], bypass_dropouts=0.0, batch_size=10,
        model_dir=d), dense_ds, tmp_path)


def test_reload_progressive(dense_ds, tmp_path):
    from deepchem_tpu.models import ProgressiveMultitaskClassifier
    _roundtrip(lambda d: ProgressiveMultitaskClassifier(
        n_tasks=2, n_features=16, layer_sizes=[24], dropouts=0.0,
        batch_size=10, model_dir=d),
        NumpyDataset(dense_ds.X,
                     np.tile(dense_ds.y, (1, 2))), tmp_path)


def test_reload_irv(tmp_path):
    from deepchem_tpu.models import MultitaskIRVClassifier
    from deepchem_tpu.trans import IRVTransformer
    rng = np.random.RandomState(0)
    X = (rng.rand(20, 32) > 0.7).astype(np.float32)
    y = (X[:, :5].sum(axis=1) > 1.5).astype(float)[:, None]
    ds = IRVTransformer(K=5, n_tasks=1,
                        dataset=NumpyDataset(X, y)).transform(
        NumpyDataset(X, y))
    _roundtrip(lambda d: MultitaskIRVClassifier(
        n_tasks=1, K=5, batch_size=10, model_dir=d), ds, tmp_path)


# ---------------------------------------------------------------------------
# graph family
# ---------------------------------------------------------------------------
def test_reload_graphconv(convmol_ds, tmp_path):
    from deepchem_tpu.models import GraphConvModel
    _roundtrip(lambda d: GraphConvModel(
        n_tasks=1, mode='classification', batch_size=10,
        graph_conv_layers=[16, 16], dense_layer_size=16,
        model_dir=d), convmol_ds, tmp_path)


def test_reload_graphconv_regression_uncertainty(tmp_path):
    # regression mode carries the variance head through reload
    from deepchem_tpu.models import GraphConvModel
    X = ConvMolFeaturizer().featurize(SMILES)
    y = np.linspace(-1, 1, len(SMILES))[:, None]
    ds = NumpyDataset(X, y)
    model, fresh = _roundtrip(lambda d: GraphConvModel(
        n_tasks=1, mode='regression', batch_size=10,
        graph_conv_layers=[16, 16], dense_layer_size=16,
        uncertainty=True, dropout=0.1, model_dir=d), ds, tmp_path)
    # the uncertainty path also reproduces
    m1, s1 = model.predict_uncertainty(ds, masks=2)
    m2, s2 = fresh.predict_uncertainty(ds, masks=2)
    assert m1.shape == m2.shape and s1.shape == s2.shape


@pytest.mark.parametrize('name', ['gcn', 'gat', 'attentivefp', 'mpnn'])
def test_reload_coo_graph_models(name, graph_ds, tmp_path):
    from deepchem_tpu.models import (AttentiveFPModel, GATModel, GCNModel,
                                     MPNNModel)
    cls = {'gcn': GCNModel, 'gat': GATModel,
           'attentivefp': AttentiveFPModel, 'mpnn': MPNNModel}[name]
    _roundtrip(lambda d: cls(n_tasks=1, mode='classification',
                             batch_size=10, model_dir=d),
               graph_ds, tmp_path, nb_epoch=1)


def test_reload_pagtn(pagtn_ds, tmp_path):
    from deepchem_tpu.models import PagtnModel
    _roundtrip(lambda d: PagtnModel(n_tasks=1, mode='classification',
                                    batch_size=10, model_dir=d),
               pagtn_ds, tmp_path, nb_epoch=1)


def test_reload_dmpnn(graph_ds, tmp_path):
    from deepchem_tpu.models import DMPNNModel
    _roundtrip(lambda d: DMPNNModel(n_tasks=1, mode='classification',
                                    batch_size=10, model_dir=d),
               graph_ds, tmp_path, nb_epoch=1)


def test_reload_pna(graph_ds, tmp_path):
    from deepchem_tpu.models import PNAModel
    _roundtrip(lambda d: PNAModel(n_tasks=1, mode='classification',
                                  hidden_dim=16, num_layers=2,
                                  batch_size=10, model_dir=d),
               graph_ds, tmp_path, nb_epoch=1)


def test_reload_weave(weave_ds, tmp_path):
    from deepchem_tpu.models import WeaveModel
    _roundtrip(lambda d: WeaveModel(n_tasks=1, mode='classification',
                                    batch_size=10, model_dir=d),
               weave_ds, tmp_path, nb_epoch=1)


def test_reload_dag(convmol_ds, tmp_path):
    from deepchem_tpu.models import DAGModel
    from deepchem_tpu.models.dag import DAGTransformer
    ds = DAGTransformer(max_atoms=10).transform(convmol_ds)
    _roundtrip(lambda d: DAGModel(n_tasks=1, mode='classification',
                                  batch_size=10, model_dir=d),
               ds, tmp_path, nb_epoch=1)


def test_reload_mxmnet(tmp_path):
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.models import MXMNetFeaturizer, MXMNetModel
    mols = [mol_from_smiles(s) for s in SMILES[:6]]
    y = np.array([m.molecular_weight() for m in mols])[:, None] / 100.0
    X = MXMNetFeaturizer().featurize(SMILES[:6])
    ds = NumpyDataset(X, y)
    _roundtrip(lambda d: MXMNetModel(n_tasks=1, dim=16, n_layers=2,
                                     batch_size=6, model_dir=d),
               ds, tmp_path, nb_epoch=1)


# ---------------------------------------------------------------------------
# sequence / image / other families
# ---------------------------------------------------------------------------
def test_reload_textcnn(tmp_path):
    from deepchem_tpu.models import TextCNNModel
    ds = NumpyDataset(np.zeros((10, 1)), Y_CLS,
                      ids=np.array(SMILES, dtype=object))
    cd, sl = TextCNNModel.build_char_dict(ds)
    _roundtrip(lambda d: TextCNNModel(
        n_tasks=1, char_dict=cd, seq_length=sl, batch_size=10,
        mode='classification', dropout=0.0, model_dir=d), ds, tmp_path)


def test_reload_cnn_1d(tmp_path):
    from deepchem_tpu.models import CNN
    rng = np.random.RandomState(0)
    X = rng.rand(12, 16, 2).astype(np.float32)
    y = (X[:, :, 0].mean(1) > 0.5).astype(float)[:, None]
    ds = NumpyDataset(X, y)
    _roundtrip(lambda d: CNN(n_tasks=1, n_features=2, dims=1,
                             layer_filters=[8], kernel_size=3,
                             dropouts=0.0, mode='classification',
                             batch_size=6, model_dir=d), ds, tmp_path)


def test_reload_scscore(tmp_path):
    from deepchem_tpu.models import ScScoreModel
    rng = np.random.RandomState(0)
    easy = (rng.rand(12, 32) > 0.9).astype(np.float32)
    hard = (rng.rand(12, 32) > 0.5).astype(np.float32)
    ds = NumpyDataset(np.stack([easy, hard], axis=1), np.zeros((12, 1)))
    _roundtrip(lambda d: ScScoreModel(n_features=32, layer_sizes=[16],
                                      batch_size=6, model_dir=d),
               ds, tmp_path,
               predict=lambda m: m.predict_mols(easy))


def test_reload_smiles2vec(tmp_path):
    from deepchem_tpu.feat.molecule_featurizers import (SmilesToSeq,
                                                        create_char_to_idx)
    from deepchem_tpu.models import Smiles2Vec
    char_to_idx = create_char_to_idx(SMILES, max_len=20)
    X = SmilesToSeq(char_to_idx, max_len=20, pad_len=0).featurize(SMILES)
    ds = NumpyDataset(X, Y_CLS)
    _roundtrip(lambda d: Smiles2Vec(
        char_to_idx=char_to_idx, max_seq_len=20, embedding_dim=8,
        filters=8, kernel_size=3, n_tasks=1, mode='classification',
        batch_size=10, model_dir=d), ds, tmp_path)


def test_reload_mat(tmp_path):
    from deepchem_tpu.models import MATFeaturizer, MATModel
    X = MATFeaturizer().featurize(SMILES[:6])
    ds = NumpyDataset(X, Y_CLS[:6])
    _roundtrip(lambda d: MATModel(n_tasks=1, dim=16, n_layers=1,
                                  n_heads=2, batch_size=6,
                                  mode='classification', model_dir=d),
               ds, tmp_path, nb_epoch=1)


def test_reload_dtnn(tmp_path):
    from deepchem_tpu.models import DTNNModel
    # random symmetric "Coulomb matrices" suffice for a reload pin
    rng = np.random.RandomState(0)
    X = rng.rand(10, 8, 8).astype(np.float32)
    X = (X + X.transpose(0, 2, 1)) / 2
    X[:, np.arange(8), np.arange(8)] += np.arange(1, 9)
    y = X[:, 0, 0][:, None] / 8.0
    ds = NumpyDataset(X, y)
    _roundtrip(lambda d: DTNNModel(n_tasks=1, n_embedding=8, n_hidden=8,
                                   batch_size=10, model_dir=d),
               ds, tmp_path)


# ---------------------------------------------------------------------------
# restore-then-continue-training and orbax parity on a graph model
# ---------------------------------------------------------------------------
def test_reload_graphconv_continues_training(convmol_ds, tmp_path):
    from deepchem_tpu.models import GraphConvModel

    def make(d):
        return GraphConvModel(n_tasks=1, mode='classification',
                              batch_size=10, graph_conv_layers=[16],
                              dense_layer_size=16, learning_rate=0.003,
                              model_dir=d)
    model = make(str(tmp_path))
    model.fit(convmol_ds, nb_epoch=3, checkpoint_interval=0)
    model.save_checkpoint()
    step0 = model.get_global_step()

    fresh = make(str(tmp_path))
    losses = []
    fresh.fit(convmol_ds, nb_epoch=10, restore=True,
              checkpoint_interval=0, all_losses=losses)
    assert fresh.get_global_step() > step0
    assert losses, 'continued training recorded no losses'


def test_reload_orbax_graph_model(convmol_ds, tmp_path):
    from deepchem_tpu.models import GraphConvModel

    def make(d):
        return GraphConvModel(n_tasks=1, mode='classification',
                              batch_size=10, graph_conv_layers=[16],
                              dense_layer_size=16, model_dir=d)
    model = make(str(tmp_path))
    model.fit(convmol_ds, nb_epoch=1, checkpoint_interval=0)
    model.save_orbax_checkpoint()
    ref = model.predict(convmol_ds)

    fresh = make(str(tmp_path))
    # orbax restore needs built pytree templates: build from one batch
    fresh.fit(convmol_ds, nb_epoch=1, checkpoint_interval=0)
    fresh.restore_orbax_checkpoint()
    out = fresh.predict(convmol_ds)
    assert np.allclose(ref, out, atol=1e-6)

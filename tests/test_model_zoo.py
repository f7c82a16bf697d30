"""Overfit/functional tests for the wider model zoo."""
import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import (WeaveFeaturizer, MolGraphConvFeaturizer,
                               CoulombMatrix)
from deepchem_tpu.metrics import Metric, roc_auc_score, pearson_r2_score
from deepchem_tpu.models import (WeaveModel, DTNNModel, TextCNNModel,
                                 MultitaskIRVClassifier,
                                 ProgressiveMultitaskClassifier,
                                 ProgressiveMultitaskRegressor,
                                 ScScoreModel, CNN, DMPNNModel,
                                 NormalizingFlowModel, GAN)

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
Y = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]


def test_weave_model_overfit():
    X = WeaveFeaturizer().featurize(SMILES)
    ds = NumpyDataset(X, Y)
    model = WeaveModel(n_tasks=1, batch_size=10, mode='classification',
                       learning_rate=0.003)
    model.fit(ds, nb_epoch=40, checkpoint_interval=0)
    s = model.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.9


def test_dmpnn_model_overfit():
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    ds = NumpyDataset(X, Y)
    model = DMPNNModel(n_tasks=1, batch_size=10, mode='classification',
                       learning_rate=0.003)
    model.fit(ds, nb_epoch=40, checkpoint_interval=0)
    s = model.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.9


def test_textcnn_model_overfit():
    ds = NumpyDataset(np.zeros((10, 1)), Y,
                      ids=np.array(SMILES, dtype=object))
    cd, sl = TextCNNModel.build_char_dict(ds)
    model = TextCNNModel(n_tasks=1, char_dict=cd, seq_length=sl,
                         batch_size=10, mode='classification',
                         dropout=0.0, learning_rate=0.003)
    model.fit(ds, nb_epoch=30, checkpoint_interval=0)
    s = model.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.9


def test_dtnn_on_coulomb_matrix():
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.utils import ConformerGenerator
    gen = ConformerGenerator()
    mols = [gen.generate_conformers(mol_from_smiles(s)) for s in SMILES]
    X = CoulombMatrix(max_atoms=8).featurize(mols)
    y = np.array([m.molecular_weight() for m in mols])[:, None] / 100.0
    ds = NumpyDataset(X, y)
    model = DTNNModel(n_tasks=1, n_embedding=16, n_hidden=16,
                      batch_size=10, learning_rate=0.01)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    s = model.evaluate(ds, [Metric(pearson_r2_score, np.mean)])
    assert s['pearson_r2_score'] > 0.5


def test_irv_classifier():
    from deepchem_tpu.trans import IRVTransformer
    rng = np.random.RandomState(0)
    X = (rng.rand(40, 64) > 0.7).astype(np.float32)
    y = (X[:, :5].sum(axis=1) > 1.5).astype(float)[:, None]
    ds = NumpyDataset(X, y)
    t = IRVTransformer(K=5, n_tasks=1, dataset=ds)
    ds_t = t.transform(ds)
    model = MultitaskIRVClassifier(n_tasks=1, K=5, batch_size=10,
                                   learning_rate=0.03)
    model.fit(ds_t, nb_epoch=120, checkpoint_interval=0)
    s = model.evaluate(ds_t, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.65


def test_progressive_classifier_and_regressor():
    rng = np.random.RandomState(0)
    X = rng.rand(30, 16).astype(np.float32)
    y = (X[:, :2].sum(1) > 1.0).astype(float)[:, None]
    ds = NumpyDataset(X, y)
    m = ProgressiveMultitaskClassifier(n_tasks=1, n_features=16,
                                       layer_sizes=[32], dropouts=0.0,
                                       batch_size=10, learning_rate=0.01)
    m.fit(ds, nb_epoch=50, checkpoint_interval=0)
    assert m.evaluate(ds, [Metric(roc_auc_score, np.mean)])[
        'roc_auc_score'] > 0.9
    yr = X @ rng.rand(16, 2)
    dsr = NumpyDataset(X, yr.astype(np.float32))
    mr = ProgressiveMultitaskRegressor(n_tasks=2, n_features=16,
                                       layer_sizes=[32], dropouts=0.0,
                                       batch_size=10, learning_rate=0.01)
    mr.fit(dsr, nb_epoch=100, checkpoint_interval=0)
    assert mr.evaluate(dsr, [Metric(pearson_r2_score, np.mean)])[
        'pearson_r2_score'] > 0.7


def test_scscore_ordering():
    rng = np.random.RandomState(0)
    # easy molecules have fewer bits set than hard ones
    easy = (rng.rand(30, 64) > 0.9).astype(np.float32)
    hard = (rng.rand(30, 64) > 0.5).astype(np.float32)
    X = np.stack([easy, hard], axis=1)
    ds = NumpyDataset(X, np.zeros((30, 1)))
    model = ScScoreModel(n_features=64, layer_sizes=[32, 32],
                         batch_size=10, learning_rate=0.01)
    model.fit(ds, nb_epoch=30, checkpoint_interval=0)
    s_easy = model.predict_mols(easy)
    s_hard = model.predict_mols(hard)
    assert s_hard.mean() > s_easy.mean()


def test_cnn_2d():
    rng = np.random.RandomState(0)
    X = rng.rand(20, 8, 8, 1).astype(np.float32)
    y = (X.mean(axis=(1, 2, 3)) > X.mean()).astype(float)[:, None]
    ds = NumpyDataset(X, y)
    model = CNN(n_tasks=1, n_features=1, dims=2, layer_filters=[8],
                dropouts=0.0, batch_size=10, learning_rate=0.01)
    model.fit(ds, nb_epoch=50, checkpoint_interval=0)
    s = model.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.85


def test_normalizing_flow_learns_distribution():
    rng = np.random.RandomState(0)
    X = rng.multivariate_normal([2, -2], [[0.5, 0], [0, 0.5]],
                                400).astype(np.float32)
    m = NormalizingFlowModel(dim=2, n_layers=4, batch_size=100,
                             learning_rate=0.003)
    lp_before = m.log_prob(X).mean() if m._built else None
    m.fit(NumpyDataset(X), nb_epoch=30, checkpoint_interval=0)
    samples = m.sample(200, seed=1)
    assert abs(samples.mean(axis=0)[0] - 2) < 1.0
    assert abs(samples.mean(axis=0)[1] + 2) < 1.0


def test_gan_learns_shifted_gaussian():
    import flax.linen as nn
    import numpy as np

    class _G(nn.Module):
        @nn.compact
        def __call__(self, noise):
            return nn.Dense(2)(nn.relu(nn.Dense(16)(noise)))

    class _D(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.relu(nn.Dense(16)(x))
            return nn.sigmoid(nn.Dense(1)(h))[:, 0]

    class ToyGAN(GAN):
        def get_noise_input_shape(self):
            return (4,)

        def get_data_input_shapes(self):
            return [(2,)]

        def create_generator(self):
            return _G()

        def create_discriminator(self):
            return _D()

    gan = ToyGAN(batch_size=50, learning_rate=0.003)
    rng = np.random.RandomState(0)

    def batches(n):
        for _ in range(n):
            yield {0: rng.normal([3.0, -1.0], 0.3, (50, 2))}
    gan.fit_gan(batches(300), generator_steps=1.0,
                checkpoint_interval=0)
    samples = gan.predict_gan_generator(batch_size=200)
    assert abs(samples[:, 0].mean() - 3.0) < 1.0
    assert abs(samples[:, 1].mean() + 1.0) < 1.0

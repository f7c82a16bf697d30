"""Smoke/overfit coverage for the remaining model families (CNN, UNet,
InceptionV3, chemnet, materials, GAN/WGAN, AtomicConv) — mirrors the
reference's overfit-style model tests (models/tests/test_overfit.py)."""
import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.metrics import Metric, pearson_r2_score, roc_auc_score


def test_cnn_model_1d_overfit():
    from deepchem_tpu.models import CNNModel
    rng = np.random.RandomState(0)
    X = rng.randn(20, 16, 4).astype(np.float32)
    y = (X[:, :, 0].mean(axis=1) > 0).astype(float)[:, None]
    ds = NumpyDataset(X, y)
    m = CNNModel(n_tasks=1, n_features=4, dims=1, layer_filters=[8],
                 kernel_size=3, dense_layer_size=32, dropouts=0.0,
                 mode='classification', batch_size=10,
                 learning_rate=0.003)
    m.fit(ds, nb_epoch=40, checkpoint_interval=0)
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.85


def test_unet_model_segmentation():
    from deepchem_tpu.models import UNetModel
    rng = np.random.RandomState(0)
    # segment bright blobs: y = (x > 0.7) on one channel
    X = rng.rand(8, 16, 16, 3).astype(np.float32)
    y = (X[:, :, :, :1] > 0.7).astype(np.float32)
    ds = NumpyDataset(X, y)
    m = UNetModel(in_channels=3, out_channels=1, batch_size=4,
                  learning_rate=0.003)
    l0 = m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    l1 = m.fit(ds, nb_epoch=15, checkpoint_interval=0)
    assert l1 < l0
    pred = m.predict(ds)
    assert pred.shape[0] == 8 and pred.shape[-1] == 1


def test_inceptionv3_model_runs():
    from deepchem_tpu.models import InceptionV3Model
    rng = np.random.RandomState(0)
    X = rng.rand(8, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 2, (8, 1)).astype(float)
    ds = NumpyDataset(X, y)
    m = InceptionV3Model(n_tasks=1, mode='classification', batch_size=4,
                         learning_rate=0.001)
    m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    pred = m.predict(ds)
    assert pred.shape == (8, 1, 2)
    assert np.allclose(pred.sum(-1), 1.0, atol=1e-4)


def test_smiles2vec_model_overfit():
    from deepchem_tpu.feat.molecule_featurizers import (SmilesToSeq,
                                                        create_char_to_idx)
    from deepchem_tpu.models import Smiles2Vec
    smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
              'CCCC', 'CCOC']
    c2i = create_char_to_idx(smiles, max_len=20)
    X = SmilesToSeq(c2i, max_len=20, pad_len=2).featurize(smiles)
    y = np.array([[float('1' in s)] for s in smiles])
    ds = NumpyDataset(X, y)
    m = Smiles2Vec(c2i, n_tasks=1, max_seq_len=X.shape[1],
                   embedding_dim=16, filters=8, rnn_sizes=(16,),
                   mode='classification', batch_size=8,
                   use_conv=True, learning_rate=0.005)
    m.fit(ds, nb_epoch=30, checkpoint_interval=0)
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.85


def test_chemception_model_runs():
    from deepchem_tpu.feat import SmilesToImage
    from deepchem_tpu.models import ChemCeption
    smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O'] * 2
    X = SmilesToImage(img_size=32).featurize(smiles)
    y = np.array([[float('1' in s)] for s in smiles])
    ds = NumpyDataset(X, y)
    m = ChemCeption(img_size=32, base_filters=4, n_tasks=1,
                    mode='classification', batch_size=4,
                    learning_rate=0.001)
    m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert m.predict(ds).shape == (8, 1, 2)


def test_elemnet_model_overfit():
    from deepchem_tpu.feat import ElemNetFeaturizer
    from deepchem_tpu.models import ElemNetModel
    comps = ['Fe2O3', 'NaCl', 'SiO2', 'Al2O3', 'MgO', 'CaCO3', 'KCl',
             'TiO2']
    X = ElemNetFeaturizer().featurize(comps)
    y = np.array([[float(len(c))] for c in comps])
    ds = NumpyDataset(X, y)
    m = ElemNetModel(n_tasks=1, batch_size=8, learning_rate=0.0005)
    l0 = m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    l1 = m.fit(ds, nb_epoch=40, checkpoint_interval=0)
    assert l1 < l0


def test_megnet_and_lcnn_models_train():
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    from deepchem_tpu.models import MEGNetModel, LCNNModel
    smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
              'CCCC', 'CCOC']
    X = MolGraphConvFeaturizer(use_edges=True).featurize(smiles)
    y = np.array([[float(len(s))] for s in smiles])
    ds = NumpyDataset(X, y)
    for cls in (MEGNetModel, LCNNModel):
        m = cls(n_tasks=1, batch_size=8, learning_rate=0.003,
                data_parallel=False)
        l0 = m.fit(ds, nb_epoch=1, checkpoint_interval=0)
        l1 = m.fit(ds, nb_epoch=30, checkpoint_interval=0)
        assert l1 < l0, cls.__name__


def test_gan_learns_gaussian():
    import flax.linen as nn
    import jax.numpy as jnp
    from deepchem_tpu.models import GAN

    class _Gen(nn.Module):
        @nn.compact
        def __call__(self, noise):
            return nn.Dense(1)(nn.relu(nn.Dense(16)(noise)))

    class _Disc(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.relu(nn.Dense(16)(x))
            return nn.sigmoid(nn.Dense(1)(h))[:, 0]

    class GaussGAN(GAN):
        def get_noise_input_shape(self):
            return (4,)

        def get_data_input_shapes(self):
            return [(1,)]

        def create_generator(self):
            return _Gen()

        def create_discriminator(self):
            return _Disc()

    rng = np.random.RandomState(0)
    gan = GaussGAN(batch_size=64, learning_rate=0.003)

    def batches(n):
        for _ in range(n):
            yield {0: rng.normal(5.0, 1.0, (64, 1))}

    gan.fit_gan(batches(400), generator_steps=1.0,
                checkpoint_interval=0)
    samples = gan.predict_gan_generator(batch_size=500)
    # generated distribution should approach N(5, 1)
    assert abs(float(samples.mean()) - 5.0) < 1.0


def test_atomic_conv_model_trains():
    """Reference protocol (models/tests/test_atomic_conv.py
    test_atomic_conv): dummy 9-tuple frag1/frag2/complex features,
    fit, loss decreases."""
    from deepchem_tpu.models import AtomicConvModel
    from deepchem_tpu.models.atomic_conv import neighbor_dict
    rng = np.random.RandomState(0)
    n_samples, n_atoms = 8, 5
    X = np.empty(n_samples, dtype=object)
    y = np.zeros((n_samples, 1))
    for i in range(n_samples):
        f1 = rng.rand(n_atoms, 3).astype(np.float32) * 3
        f2 = rng.rand(n_atoms, 3).astype(np.float32) * 3 + 1
        z1 = rng.choice([6, 7, 8], n_atoms).astype(np.int32)
        z2 = rng.choice([6, 7, 8], n_atoms).astype(np.int32)
        cx = np.concatenate([f1, f2])
        cz = np.concatenate([z1, z2])
        X[i] = (f1, neighbor_dict(f1, 12.0, 4), z1,
                f2, neighbor_dict(f2, 12.0, 4), z2,
                cx, neighbor_dict(cx, 12.0, 4), cz)
        y[i, 0] = cz.sum() * 0.01
    ds = NumpyDataset(X, y)
    m = AtomicConvModel(
        n_tasks=1, frag1_num_atoms=n_atoms, frag2_num_atoms=n_atoms,
        complex_num_atoms=2 * n_atoms, max_num_neighbors=4,
        batch_size=4, layer_sizes=[16, 8],
        radial=[[1.5, 3.0, 6.0, 12.0], [0.0, 2.0, 4.0], [0.4]],
        learning_rate=0.003)
    l0 = m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    l1 = m.fit(ds, nb_epoch=40, checkpoint_interval=0)
    assert l1 < l0

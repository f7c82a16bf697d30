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


def test_dag_model_overfit():
    from deepchem_tpu.feat import ConvMolFeaturizer
    from deepchem_tpu.models import DAGModel
    from deepchem_tpu.models.dag import DAGTransformer
    X = ConvMolFeaturizer().featurize(SMILES)
    ds = DAGTransformer(max_atoms=10).transform(NumpyDataset(X, Y))
    m = DAGModel(n_tasks=1, batch_size=10, mode='classification',
                 learning_rate=0.005)
    m.fit(ds, nb_epoch=60, checkpoint_interval=0)
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.85


def test_mxmnet_regression():
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.models import MXMNetModel, MXMNetFeaturizer
    mols = [mol_from_smiles(s) for s in SMILES]
    y = np.array([m.molecular_weight() for m in mols])[:, None] / 100.0
    X = MXMNetFeaturizer().featurize(SMILES)
    ds = NumpyDataset(X, y)
    m = MXMNetModel(n_tasks=1, batch_size=10, learning_rate=0.003)
    m.fit(ds, nb_epoch=100, checkpoint_interval=0)
    s = m.evaluate(ds, [Metric(pearson_r2_score, np.mean)])
    assert s['pearson_r2_score'] > 0.8


def test_pinn_solves_ode():
    import jax
    from deepchem_tpu.models import PINNModel

    def residual(u_fn, x):
        def u_scalar(xi):
            return u_fn(xi[None, :])[0, 0]
        d2 = jax.vmap(lambda xi: jax.hessian(u_scalar)(xi)[0, 0])(x)
        return d2 + u_fn(x)[:, 0]

    col = np.linspace(0, np.pi, 32)[:, None].astype(np.float32)
    xs = np.array([[0.0], [np.pi / 2], [np.pi]], dtype=np.float32)
    ys = np.sin(xs)
    ds = NumpyDataset(np.tile(xs, (10, 1)), np.tile(ys, (10, 1)))
    m = PINNModel(hidden=(32, 32), pde_residual=residual,
                  collocation_points=col, batch_size=30,
                  learning_rate=0.005)
    m.fit(ds, nb_epoch=200, checkpoint_interval=0)
    test_x = np.linspace(0, np.pi, 10)[:, None].astype(np.float32)
    pred = m.predict(NumpyDataset(test_x, np.zeros((10, 1))))
    assert np.abs(pred[:, 0] - np.sin(test_x[:, 0])).max() < 0.15


def test_xcmodel_learns_functional():
    import jax.numpy as jnp
    from deepchem_tpu.dft import XCModel, lda_xc
    rng = np.random.RandomState(0)
    G = 32
    rhos = rng.rand(30, G).astype(np.float32) * 2
    wts = np.full((30, G), 1.0 / G, dtype=np.float32)
    target = np.asarray([
        float(np.sum(1.2 * np.asarray(lda_xc(jnp.asarray(r))) * w))
        for r, w in zip(rhos, wts)])[:, None]
    X = np.stack([rhos, wts], axis=1)
    ds = NumpyDataset(X, target)
    m = XCModel(xcstr='lda_x', batch_size=10, learning_rate=0.003)
    losses = []
    m.log_frequency = 6
    m.fit(ds, nb_epoch=40, all_losses=losses, checkpoint_interval=0)
    assert losses[-1] < losses[0]


def test_electron_sampler_targets_density():
    import jax.numpy as jnp
    from deepchem_tpu.utils import ElectronSampler
    # sample from a gaussian density centered at the origin
    def f(x):
        return jnp.exp(-jnp.sum(x ** 2, axis=(1, 2)))
    s = ElectronSampler(np.zeros((1, 3)), f, batch_no=256, steps=20,
                        std=0.5)
    s.gauss_initialize_position(np.array([[2]]), stddev=1.5)
    for _ in range(10):
        acc = s.move()
    samples = np.asarray(s.x)
    # equilibrium spread of exp(-r^2) per coordinate is std ~ 0.5 (for
    # the 6-d joint density); just check it contracted toward the center
    assert np.abs(samples.mean()) < 0.3
    assert 0.2 < samples.std() < 1.2


def test_ani_symmetry_features_invariances():
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.models.atomic_conv import ani_symmetry_features
    coords = jnp.array([[0., 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    z = jnp.array([8, 1, 1])
    kw = dict(radial_length=8, angular_length=4)
    f = ani_symmetry_features(coords, z, **kw)
    assert f.shape == (3, 281)
    th = 0.7
    R = jnp.array([[jnp.cos(th), -jnp.sin(th), 0],
                   [jnp.sin(th), jnp.cos(th), 0], [0, 0, 1.]])
    f2 = ani_symmetry_features(coords @ R.T + 5.0, z, **kw)
    assert jnp.allclose(f, f2, atol=1e-4)          # SE(3) invariant
    perm = jnp.array([0, 2, 1])
    f3 = ani_symmetry_features(coords[perm], z[perm], **kw)
    assert jnp.allclose(f[perm], f3, atol=1e-4)    # permutation equiv.
    g = jax.grad(lambda c: ani_symmetry_features(c, z, **kw).sum())(coords)
    assert bool(jnp.all(jnp.isfinite(g)))

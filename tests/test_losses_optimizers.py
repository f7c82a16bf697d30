"""Per-class loss-value tests against torch closed forms, and
optimizer/schedule exactness tests.

Mirrors reference deepchem/models/tests/test_losses.py (which checks every
Loss against hand values in both TF and torch backends) — here the single
JAX implementation is validated against torch.nn.functional (CPU) and
closed forms, and every LearningRateSchedule against its defining formula.
"""
import numpy as np
import pytest


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# regression-style losses vs torch.nn.functional
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def rng_pair():
    rng = np.random.RandomState(0)
    out = rng.randn(7, 3).astype(np.float32)
    lab = rng.randn(7, 3).astype(np.float32)
    return out, lab


def test_l1_vs_torch(rng_pair):
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import L1Loss
    out, lab = rng_pair
    want = F.l1_loss(torch.tensor(out), torch.tensor(lab),
                     reduction='none').numpy()
    np.testing.assert_allclose(_np(L1Loss()(out, lab)), want, rtol=1e-6)


def test_l2_vs_torch(rng_pair):
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import L2Loss
    out, lab = rng_pair
    want = F.mse_loss(torch.tensor(out), torch.tensor(lab),
                      reduction='none').numpy()
    np.testing.assert_allclose(_np(L2Loss()(out, lab)), want, rtol=1e-5)


def test_huber_vs_torch(rng_pair):
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import HuberLoss
    out, lab = rng_pair
    for delta in (0.5, 1.0, 2.0):
        want = F.huber_loss(torch.tensor(out), torch.tensor(lab),
                            reduction='none', delta=delta).numpy()
        np.testing.assert_allclose(_np(HuberLoss(delta)(out, lab)), want,
                                   rtol=1e-5, atol=1e-6)


def test_hinge_closed_form():
    from deepchem_tpu.models.losses import HingeLoss, SquaredHingeLoss
    out = np.array([0.5, -2.0, 3.0], np.float32)
    lab = np.array([1.0, -1.0, -1.0], np.float32)
    want = np.maximum(0.0, 1.0 - lab * out)        # [0.5, 0, 4]
    np.testing.assert_allclose(_np(HingeLoss()(out, lab)), want, rtol=1e-6)
    np.testing.assert_allclose(_np(SquaredHingeLoss()(out, lab)),
                               want ** 2, rtol=1e-6)


def test_poisson_closed_form():
    from deepchem_tpu.models.losses import PoissonLoss
    out = np.array([1.0, 2.0, 0.5], np.float32)
    lab = np.array([1.0, 3.0, 0.0], np.float32)
    want = np.mean(out - lab * np.log(out + 1e-8))
    np.testing.assert_allclose(float(PoissonLoss()(out, lab)), want,
                               rtol=1e-5)


def test_extra_trailing_dim_squeezed(rng_pair):
    """_make_shapes_consistent: (N, 1) output vs (N,) labels and the
    transpose case both collapse (reference losses.py:7)."""
    from deepchem_tpu.models.losses import L1Loss
    out = np.array([[1.0], [2.0]], np.float32)
    lab = np.array([0.0, 4.0], np.float32)
    got = _np(L1Loss()(out, lab))
    np.testing.assert_allclose(got, [1.0, 2.0], rtol=1e-6)
    got2 = _np(L1Loss()(lab, out))
    np.testing.assert_allclose(got2, [1.0, 2.0], rtol=1e-6)


# ---------------------------------------------------------------------------
# classification losses vs torch
# ---------------------------------------------------------------------------

def test_bce_vs_torch():
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import BinaryCrossEntropy
    rng = np.random.RandomState(1)
    p = rng.uniform(0.05, 0.95, (6, 2)).astype(np.float32)
    y = rng.randint(0, 2, (6, 2)).astype(np.float32)
    want = F.binary_cross_entropy(torch.tensor(p), torch.tensor(y),
                                  reduction='none').numpy()
    np.testing.assert_allclose(_np(BinaryCrossEntropy()(p, y)), want,
                               rtol=1e-4)


def test_sigmoid_ce_vs_torch():
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import SigmoidCrossEntropy
    rng = np.random.RandomState(2)
    x = (5 * rng.randn(8, 3)).astype(np.float32)   # include large logits
    y = rng.randint(0, 2, (8, 3)).astype(np.float32)
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(y), reduction='none').numpy()
    np.testing.assert_allclose(_np(SigmoidCrossEntropy()(x, y)), want,
                               rtol=1e-5, atol=1e-6)


def test_softmax_ce_vs_torch():
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import SoftmaxCrossEntropy
    rng = np.random.RandomState(3)
    x = rng.randn(5, 4).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 5)]
    want = F.cross_entropy(torch.tensor(x), torch.tensor(labels),
                           reduction='none').numpy()
    np.testing.assert_allclose(_np(SoftmaxCrossEntropy()(x, labels)),
                               want, rtol=1e-5)


def test_sparse_softmax_ce_vs_torch():
    import torch
    import torch.nn.functional as F
    from deepchem_tpu.models.losses import SparseSoftmaxCrossEntropy
    rng = np.random.RandomState(4)
    x = rng.randn(5, 4).astype(np.float32)
    y = rng.randint(0, 4, 5)
    want = F.cross_entropy(torch.tensor(x), torch.tensor(y),
                           reduction='none').numpy()
    got = _np(SparseSoftmaxCrossEntropy()(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # (N, 1) integer labels are squeezed
    got2 = _np(SparseSoftmaxCrossEntropy()(x, y[:, None]))
    np.testing.assert_allclose(got2, want, rtol=1e-5)


def test_categorical_ce_closed_form():
    from deepchem_tpu.models.losses import CategoricalCrossEntropy
    p = np.array([[0.7, 0.3], [0.2, 0.8]], np.float32)
    y = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    want = -np.log([0.7, 0.8])
    np.testing.assert_allclose(_np(CategoricalCrossEntropy()(p, y)), want,
                               rtol=1e-5)


def test_shannon_entropy_units():
    """Bernoulli p=0.5 is exactly 1 bit; p->0 or 1 tends to 0."""
    from deepchem_tpu.models.losses import ShannonEntropy
    half = np.array([[0.5]], np.float32)
    np.testing.assert_allclose(
        _np(ShannonEntropy()(half, half)), [1.0], rtol=1e-5)
    tiny = np.array([[0.001]], np.float32)
    assert float(_np(ShannonEntropy()(tiny, tiny))[0]) < 0.02


# ---------------------------------------------------------------------------
# VAE / contrastive / pretrain losses
# ---------------------------------------------------------------------------

def test_vae_kl_closed_form():
    from deepchem_tpu.models.losses import VAE_KLDivergence
    mu = np.array([[0.0, 1.0]], np.float32)
    logvar = np.array([[0.0, np.log(2.0)]], np.float32)
    # 0.5 * sum(mu^2 + var - 1 - logvar)
    want = 0.5 * ((0 + 1 - 1 - 0) + (1 + 2 - 1 - np.log(2.0)))
    np.testing.assert_allclose(_np(VAE_KLDivergence()((mu, logvar), None)),
                               [want], rtol=1e-5)


def test_vae_elbo_decomposes():
    from deepchem_tpu.models.losses import (VAE_ELBO, VAE_KLDivergence,
                                            BinaryCrossEntropy)
    rng = np.random.RandomState(5)
    mu = rng.randn(3, 4).astype(np.float32)
    logvar = rng.randn(3, 4).astype(np.float32)
    x_hat = rng.uniform(0.1, 0.9, (3, 6)).astype(np.float32)
    x = rng.randint(0, 2, (3, 6)).astype(np.float32)
    elbo = _np(VAE_ELBO()((mu, logvar, x_hat), x))
    kl = _np(VAE_KLDivergence()((mu, logvar), None))
    rec = _np(BinaryCrossEntropy()(x_hat, x)).mean(axis=1)
    np.testing.assert_allclose(elbo, kl + rec, rtol=1e-5)


def test_grover_pretrain_loss_decomposes():
    from deepchem_tpu.models.losses import (GroverPretrainLoss,
                                            SparseSoftmaxCrossEntropy,
                                            SigmoidCrossEntropy)
    rng = np.random.RandomState(6)
    avl = rng.randn(5, 8).astype(np.float32)
    bvl = rng.randn(4, 6).astype(np.float32)
    fgl = rng.randn(2, 10).astype(np.float32)
    av = rng.randint(0, 8, 5)
    bv = rng.randint(0, 6, 4)
    fg = rng.randint(0, 2, (2, 10)).astype(np.float32)
    got = float(GroverPretrainLoss()(avl, bvl, fgl, av, bv, fg))
    want = (float(_np(SparseSoftmaxCrossEntropy()(avl, av)).mean())
            + float(_np(SparseSoftmaxCrossEntropy()(bvl, bv)).mean())
            + float(_np(SigmoidCrossEntropy()(fgl, fg)).mean()))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ntxent_alignment_direction():
    """Aligned views give a much lower NT-Xent loss than random ones, and
    the perfectly-aligned loss approaches log(2n-1) scaling behavior."""
    from deepchem_tpu.models.losses import NTXentMultiplePositives
    rng = np.random.RandomState(7)
    z = rng.randn(16, 8).astype(np.float32)
    loss = NTXentMultiplePositives(temperature=0.5)
    aligned = float(loss(z, z))
    random = float(loss(z, rng.randn(16, 8).astype(np.float32)))
    assert aligned < random - 1.0
    # gradient is finite
    import jax
    g = jax.grad(lambda a: loss(a, z))(z)
    assert np.all(np.isfinite(_np(g)))


def test_edge_prediction_direction():
    from deepchem_tpu.models.losses import EdgePredictionLoss
    good = float(EdgePredictionLoss()(np.full(5, 4.0, np.float32),
                                      np.full(5, -4.0, np.float32)))
    bad = float(EdgePredictionLoss()(np.full(5, -4.0, np.float32),
                                     np.full(5, 4.0, np.float32)))
    assert good < 0.1 < bad


def test_graph_context_pred_direction():
    from deepchem_tpu.models.losses import GraphContextPredLoss
    s = np.ones((4, 3), np.float32)
    good = float(GraphContextPredLoss()(s, s * 2, -s * 2))
    bad = float(GraphContextPredLoss()(s, -s * 2, s * 2))
    assert good < bad


def test_global_mutual_information_direction():
    """Local encodings matching their own graph's global encoding score
    lower than shuffled membership."""
    from deepchem_tpu.models.losses import GlobalMutualInformationLoss
    rng = np.random.RandomState(8)
    g = rng.randn(3, 6).astype(np.float32) * 2
    idx = np.repeat(np.arange(3), 4)
    local_good = g[idx] + 0.01 * rng.randn(12, 6).astype(np.float32)
    local_bad = g[(idx + 1) % 3]
    loss = GlobalMutualInformationLoss()
    assert float(loss(g, local_good, idx)) < float(loss(g, local_bad, idx))


def test_density_profile_grid_volumes():
    from deepchem_tpu.models.losses import DensityProfileLoss
    out = np.array([[1.0, 2.0]], np.float32)
    lab = np.array([[0.0, 0.0]], np.float32)
    vol = np.array([0.5, 2.0], np.float32)
    np.testing.assert_allclose(
        _np(DensityProfileLoss(vol)(out, lab)), [0.5 * 1 + 2.0 * 4],
        rtol=1e-6)
    np.testing.assert_allclose(
        _np(DensityProfileLoss()(out, lab)), [5.0], rtol=1e-6)


def test_node_masking_and_dgi():
    from deepchem_tpu.models.losses import (GraphNodeMaskingLoss,
                                            GraphEdgeMaskingLoss,
                                            DeepGraphInfomaxLoss)
    logits = np.array([[10.0, -10.0], [-10.0, 10.0]], np.float32)
    assert float(GraphNodeMaskingLoss()(logits, np.array([0, 1]))) < 1e-3
    assert float(GraphEdgeMaskingLoss()(logits, np.array([1, 0]))) > 5.0
    assert float(DeepGraphInfomaxLoss()(np.full(3, 5.0, np.float32),
                                        np.full(3, -5.0, np.float32))) < 0.1


# ---------------------------------------------------------------------------
# LR schedules: exact values from the defining formulas
# ---------------------------------------------------------------------------

def test_exponential_decay_staircase():
    from deepchem_tpu.models.optimizers import ExponentialDecay
    s = ExponentialDecay(0.1, 0.5, 10, staircase=True) \
        ._create_optax_schedule()
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(9)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 0.025, rtol=1e-6)
    smooth = ExponentialDecay(0.1, 0.5, 10, staircase=False) \
        ._create_optax_schedule()
    np.testing.assert_allclose(float(smooth(5)), 0.1 * 0.5 ** 0.5,
                               rtol=1e-5)


def test_polynomial_decay_endpoints():
    from deepchem_tpu.models.optimizers import PolynomialDecay
    s = PolynomialDecay(1.0, 0.1, 100, power=2.0)._create_optax_schedule()
    np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 0.1, rtol=1e-6)
    # halfway with power 2: end + (init-end) * (1 - 0.5)^2
    np.testing.assert_allclose(float(s(50)), 0.1 + 0.9 * 0.25, rtol=1e-5)


def test_piecewise_constant_boundaries():
    from deepchem_tpu.models.optimizers import PiecewiseConstantSchedule
    s = PiecewiseConstantSchedule(0.1, {5: 0.5, 10: 0.2}) \
        ._create_optax_schedule()
    np.testing.assert_allclose(float(s(4)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(5)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 0.01, rtol=1e-6)


def test_warmup_schedule_shape():
    from deepchem_tpu.models.optimizers import LambdaLRWithWarmup
    s = LambdaLRWithWarmup(0.01, 10, 100)._create_optax_schedule()
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(s(10)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(55)), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-7)
    warm_only = LambdaLRWithWarmup(0.01, 10)._create_optax_schedule()
    np.testing.assert_allclose(float(warm_only(5)), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(warm_only(50)), 0.01, rtol=1e-5)


def test_linear_cosine_decay_endpoints():
    from deepchem_tpu.models.optimizers import LinearCosineDecay
    s = LinearCosineDecay(0.1, decay_steps=100)._create_optax_schedule()
    # t=0: (alpha + 1) * 0.5*(1+cos 0) + beta = 1 + beta
    np.testing.assert_allclose(float(s(0)), 0.1 * (1.0 + 0.001), rtol=1e-5)
    # t=1, num_periods=0.5: cos(pi) -> cosine term 0 -> beta only
    np.testing.assert_allclose(float(s(100)), 0.1 * 0.001, rtol=1e-4)


# ---------------------------------------------------------------------------
# optimizers: convergence on a quadratic + defining update behaviors
# ---------------------------------------------------------------------------

def _minimize(opt, steps=200):
    import jax
    import jax.numpy as jnp
    tx = opt._create_optax_optimizer()
    x = jnp.array([3.0, -2.0])
    state = tx.init(x)
    f = lambda x: jnp.sum((x - jnp.array([1.0, 2.0])) ** 2)
    g = jax.grad(f)
    import optax
    for _ in range(steps):
        updates, state = tx.update(g(x), state, x)
        x = optax.apply_updates(x, updates)
    return np.asarray(x), float(f(x))


@pytest.mark.parametrize('name,kwargs,steps', [
    ('Adam', dict(learning_rate=0.1), 200),
    ('AdamW', dict(learning_rate=0.1, weight_decay=1e-4), 200),
    ('AdaGrad', dict(learning_rate=0.5), 400),
    ('RMSProp', dict(learning_rate=0.02), 400),
    ('GradientDescent', dict(learning_rate=0.1), 200),
    ('Lamb', dict(learning_rate=0.1, weight_decay=1e-4), 300),
    ('SparseAdam', dict(learning_rate=0.1), 200),
])
def test_optimizer_converges_on_quadratic(name, kwargs, steps):
    import deepchem_tpu.models.optimizers as O
    x, fx = _minimize(getattr(O, name)(**kwargs), steps)
    assert fx < 1e-2, (name, x, fx)


def test_adam_first_step_magnitude():
    """Adam's first update is ~lr in each coordinate regardless of
    gradient scale."""
    import jax.numpy as jnp
    import optax
    from deepchem_tpu.models.optimizers import Adam
    tx = Adam(learning_rate=0.01)._create_optax_optimizer()
    x = jnp.array([1.0, 1.0])
    state = tx.init(x)
    updates, _ = tx.update(jnp.array([1e-3, 1e3]), state, x)
    np.testing.assert_allclose(np.abs(np.asarray(updates)), 0.01,
                               rtol=1e-2)


def test_adamw_decays_with_zero_gradient():
    import jax.numpy as jnp
    import optax
    from deepchem_tpu.models.optimizers import AdamW
    tx = AdamW(learning_rate=0.1, weight_decay=0.5) \
        ._create_optax_optimizer()
    x = jnp.array([2.0])
    state = tx.init(x)
    updates, _ = tx.update(jnp.array([0.0]), state, x)
    # decoupled decay: update = -lr * wd * x = -0.1
    np.testing.assert_allclose(np.asarray(updates), [-0.1], rtol=1e-5)


def test_schedule_drives_optimizer():
    """An Optimizer built with a LearningRateSchedule actually follows
    the schedule (SGD update magnitude halves at the boundary)."""
    import jax.numpy as jnp
    from deepchem_tpu.models.optimizers import (GradientDescent,
                                                PiecewiseConstantSchedule)
    tx = GradientDescent(PiecewiseConstantSchedule(0.1, {2: 0.5})) \
        ._create_optax_optimizer()
    x = jnp.array([1.0])
    state = tx.init(x)
    g = jnp.array([1.0])
    mags = []
    for _ in range(4):
        updates, state = tx.update(g, state, x)
        mags.append(abs(float(updates[0])))
    np.testing.assert_allclose(mags, [0.1, 0.1, 0.05, 0.05], rtol=1e-5)

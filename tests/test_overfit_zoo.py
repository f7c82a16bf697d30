"""Overfit-discipline sweep (reference models/tests/test_overfit.py).

The reference's oldest and broadest model-sanity file: every estimator
family must be able to overfit a tiny dataset to a named threshold.
Cases already pinned elsewhere (weave/dag/dmpnn/textcnn-cls/dtnn-single
in tests/test_model_zoo*.py, IRV/progressive there too, uncertainty in
tests/test_engine.py) are not duplicated; this file adds the rows the
suite was missing: the sklearn trio, plain/residual/skewed/
skewed-missing/regularized MultitaskClassifier+Regressor, robust
multitask both modes, fit-transform regression, singletask-to-multitask
in both modes, and the regression variants of textcnn/dtnn.
"""
import numpy as np
import pytest

from deepchem_tpu.data import DiskDataset, NumpyDataset
from deepchem_tpu.metrics import (Metric, accuracy_score,
                                  mean_squared_error, r2_score,
                                  roc_auc_score)


def _dataset(n_samples=10, n_features=3, n_tasks=1, mode='regression',
             seed=123, p=None):
    rng = np.random.RandomState(seed)
    X = rng.rand(n_samples, n_features)
    if mode == 'zeros':
        y = np.zeros((n_samples, n_tasks))
    elif mode == 'classification':
        y = rng.randint(2, size=(n_samples, n_tasks)).astype(float)
    elif mode == 'skewed':
        y = rng.binomial(1, p, size=(n_samples, n_tasks)).astype(float)
    else:
        y = rng.rand(n_samples, n_tasks)
    w = np.ones((n_samples, n_tasks))
    return NumpyDataset(X, y, w, np.arange(n_samples))


# ---------------------------------------------------------------- sklearn

def test_sklearn_regression_overfit():
    from sklearn.ensemble import RandomForestRegressor
    from deepchem_tpu.models import SklearnModel
    ds = _dataset(mode='regression')
    model = SklearnModel(RandomForestRegressor())
    model.fit(ds)
    scores = model.evaluate(ds, [Metric(r2_score)])
    assert scores['r2_score'] > .7


def test_sklearn_classification_overfit():
    from sklearn.ensemble import RandomForestClassifier
    from deepchem_tpu.models import SklearnModel
    ds = _dataset(mode='classification')
    model = SklearnModel(RandomForestClassifier())
    model.fit(ds)
    scores = model.evaluate(ds, [Metric(roc_auc_score)])
    assert scores['roc_auc_score'] > .9


def test_sklearn_skewed_classification_overfit():
    from sklearn.ensemble import RandomForestClassifier
    from deepchem_tpu.models import SklearnModel
    ds = _dataset(n_samples=100, mode='skewed', p=.05)
    model = SklearnModel(RandomForestClassifier())
    model.fit(ds)
    scores = model.evaluate(ds, [Metric(roc_auc_score)])
    assert scores['roc_auc_score'] > .9


# ------------------------------------------------- plain multitask MLPs

def test_regression_overfit():
    from deepchem_tpu.models import MultitaskRegressor
    ds = _dataset(mode='zeros')
    model = MultitaskRegressor(1, 3, dropouts=0.0,
                               weight_init_stddevs=np.sqrt(6) / np.sqrt(1000),
                               batch_size=10, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(mean_squared_error)])
    assert scores['mean_squared_error'] < .01


def test_classification_overfit():
    from deepchem_tpu.models import MultitaskClassifier
    ds = _dataset(mode='zeros')
    model = MultitaskClassifier(1, 3, dropouts=0.0,
                                weight_init_stddevs=.1,
                                batch_size=10, learning_rate=0.0003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(accuracy_score)])
    assert scores['accuracy_score'] > .9


def test_residual_classification_overfit():
    # reference protocol: 10 pre-activation residual blocks of width 20
    from deepchem_tpu.models import MultitaskClassifier
    ds = _dataset(n_features=5, mode='classification')
    model = MultitaskClassifier(1, 5, layer_sizes=[20] * 10,
                                dropouts=0.0, batch_size=10,
                                residual=True)
    model.fit(ds, nb_epoch=500, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(accuracy_score)])
    assert scores['accuracy_score'] > .9


def test_residual_regression_overfit():
    from deepchem_tpu.models import MultitaskRegressor
    ds = _dataset(n_features=10, n_tasks=10, mode='regression')
    # bias_init 0: the reference default bias=1.0 makes every residual
    # block add ~1 to the stream, drowning the regression signal
    model = MultitaskRegressor(10, 10, layer_sizes=[20] * 10,
                               dropouts=0.0, batch_size=10,
                               residual=True, weight_init_stddevs=0.1,
                               bias_init_consts=0.0)
    model.fit(ds, nb_epoch=1000, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(mean_squared_error, np.mean, n_tasks=10)])
    assert scores['mean_squared_error'] < .02


def test_fittransform_regression_overfit():
    from deepchem_tpu.models import MultitaskFitTransformRegressor
    from deepchem_tpu.trans import CoulombFitTransformer
    rng = np.random.RandomState(123)
    X = rng.rand(10, 3, 3)
    ds = NumpyDataset(X, np.zeros((10, 1)), np.ones((10, 1)),
                      np.arange(10))
    model = MultitaskFitTransformRegressor(
        1, [3, 3], fit_transformers=[CoulombFitTransformer(ds)],
        dropouts=0.01, weight_init_stddevs=np.sqrt(6) / np.sqrt(1000),
        batch_size=10, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(mean_squared_error)])
    assert scores['mean_squared_error'] < .1


def test_skewed_classification_overfit():
    from deepchem_tpu.models import MultitaskClassifier
    ds = _dataset(n_samples=100, mode='skewed', p=.05)
    model = MultitaskClassifier(1, 3, dropouts=0.0,
                                weight_init_stddevs=.1,
                                batch_size=100, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(roc_auc_score)])
    assert scores['roc_auc_score'] > .75


def test_skewed_missing_classification_overfit():
    # singletask-MUV-like: 5120 samples, p=.002 actives, actives
    # upweighted to balance — via DiskDataset like the reference
    from deepchem_tpu.models import MultitaskClassifier
    rng = np.random.RandomState(123)
    n = 5120
    X = rng.rand(n, 6)
    y = rng.binomial(1, .002, size=(n, 1)).astype(float)
    w = np.ones((n, 1))
    n_active = max(int(y.sum()), 1)
    w[y == 1] = n / n_active
    ds = DiskDataset.from_numpy(X, y, w, np.arange(n))
    model = MultitaskClassifier(1, 6, dropouts=0.0,
                                weight_init_stddevs=1.0,
                                batch_size=n, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(roc_auc_score)])
    assert scores['roc_auc_score'] > .7


# ------------------------------------------------------------ multitask

def test_sklearn_multitask_classification_overfit():
    from sklearn.ensemble import RandomForestClassifier
    from deepchem_tpu.models import SingletaskToMultitask, SklearnModel
    n_tasks = 10
    tasks = ['task%d' % t for t in range(n_tasks)]
    ds = _dataset(n_tasks=n_tasks, mode='classification')
    model = SingletaskToMultitask(
        tasks, lambda t: SklearnModel(RandomForestClassifier()))
    model.fit(ds)
    scores = model.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert scores['roc_auc_score'] > .9


def test_sklearn_multitask_regression_overfit():
    from sklearn.ensemble import RandomForestRegressor
    from deepchem_tpu.models import SingletaskToMultitask, SklearnModel
    n_tasks = 10
    tasks = ['task%d' % t for t in range(n_tasks)]
    ds = _dataset(n_tasks=n_tasks, mode='regression')
    model = SingletaskToMultitask(
        tasks, lambda t: SklearnModel(RandomForestRegressor()))
    model.fit(ds)
    scores = model.evaluate(ds, [Metric(r2_score, np.mean)])
    assert scores['r2_score'] > .7


def test_multitask_classification_overfit():
    from deepchem_tpu.models import MultitaskClassifier
    ds = _dataset(n_tasks=10, mode='zeros')
    model = MultitaskClassifier(10, 3, dropouts=0.0,
                                batch_size=10, learning_rate=0.0003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(accuracy_score, np.mean, n_tasks=10)])
    assert scores['accuracy_score'] > .9


def test_multitask_regression_overfit():
    from deepchem_tpu.models import MultitaskRegressor
    ds = _dataset(n_tasks=10, mode='zeros')
    model = MultitaskRegressor(10, 3, dropouts=0.0,
                               batch_size=10, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(mean_squared_error, np.mean, n_tasks=10)])
    assert scores['mean_squared_error'] < .01


def _l1_sparsity(params, width):
    """Fraction of |w|>1e-3 entries in the PENALIZED trunk kernels
    (the reference checks p.shape[0]==1000, which in torch's (out, in)
    layout selects exactly the hidden Linear weights; here we select by
    the same path the regularizer penalizes)."""
    import jax
    elements = nonzero = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [str(getattr(p, 'key', p)) for p in path]
        if keys[-1] == 'kernel' and any(k.startswith('_MLPTrunk')
                                        for k in keys):
            a = np.asarray(leaf)
            elements += a.size
            nonzero += int((np.abs(a) > 1e-3).sum())
    assert elements > 0
    return nonzero / elements


def test_multitask_classification_regularization():
    # l1 penalty drives most hidden weights to ~0 while still fitting
    from deepchem_tpu.models import MultitaskClassifier
    ds = _dataset(n_tasks=10, mode='zeros')
    model = MultitaskClassifier(10, 3, layer_sizes=[1000], dropouts=0.0,
                                weight_decay_penalty=1.0,
                                weight_decay_penalty_type='l1',
                                batch_size=10, learning_rate=0.0003)
    model.fit(ds, nb_epoch=500, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(accuracy_score, np.mean, n_tasks=10)])
    assert scores['accuracy_score'] > .9
    assert _l1_sparsity(model.params, 1000) < 0.1


def test_multitask_regression_regularization():
    from deepchem_tpu.models import MultitaskRegressor
    ds = _dataset(n_tasks=10, mode='zeros')
    model = MultitaskRegressor(10, 3, layer_sizes=[1000], dropouts=0.0,
                               weight_decay_penalty=1.0,
                               weight_decay_penalty_type='l1',
                               batch_size=10, learning_rate=0.0003)
    model.fit(ds, nb_epoch=500, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(mean_squared_error, np.mean, n_tasks=10)])
    assert scores['mean_squared_error'] < .01
    assert _l1_sparsity(model.params, 1000) < 0.1


def test_robust_multitask_classification_overfit():
    from deepchem_tpu.models import RobustMultitaskClassifier
    ds = _dataset(n_tasks=10, mode='zeros')
    model = RobustMultitaskClassifier(
        10, 3, layer_sizes=[50], bypass_layer_sizes=[10],
        dropouts=0.0, bypass_dropouts=0.0,
        batch_size=10, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(accuracy_score, np.mean, n_tasks=10)])
    assert scores['accuracy_score'] > .9


def test_robust_multitask_regression_overfit():
    from deepchem_tpu.models import RobustMultitaskRegressor
    ds = _dataset(n_tasks=10, mode='zeros')
    model = RobustMultitaskRegressor(
        10, 3, layer_sizes=[50], bypass_layer_sizes=[10],
        dropouts=0.0, bypass_dropouts=0.0,
        batch_size=10, learning_rate=0.003)
    model.fit(ds, nb_epoch=100, checkpoint_interval=0)
    scores = model.evaluate(
        ds, [Metric(mean_squared_error, np.mean, n_tasks=10)])
    assert scores['mean_squared_error'] < .01


# --------------------------------------------- sequence/quantum variants

def test_textcnn_regression_overfit():
    from deepchem_tpu.models import TextCNNModel
    smiles = ['CCO', 'CCC', 'CCN', 'CCCl', 'c1ccccc1', 'CC(=O)O',
              'CCCC', 'CO', 'CN', 'CC#N']
    y = np.linspace(-1, 1, len(smiles)).reshape(-1, 1)
    ds = NumpyDataset(np.array(smiles, dtype=object), y,
                      np.ones_like(y), np.array(smiles))
    char_dict, seq_len = TextCNNModel.build_char_dict(ds)
    model = TextCNNModel(1, char_dict, seq_len, mode='regression',
                         batch_size=5, learning_rate=0.003)
    model.fit(ds, nb_epoch=200, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(r2_score)])
    assert scores['r2_score'] > .8


def test_dtnn_multitask_regression_overfit():
    from deepchem_tpu.models import DTNNModel
    rng = np.random.RandomState(0)
    # small synthetic rigid molecules: 4 atoms, random Z/coords
    n = 12
    mats = []
    for _ in range(n):
        z = rng.randint(1, 8, size=4).astype(float)
        coords = rng.rand(4, 3) * 3
        cm = np.zeros((4, 4))
        for i in range(4):
            for j in range(4):
                if i == j:
                    cm[i, j] = 0.5 * z[i] ** 2.4
                else:
                    cm[i, j] = z[i] * z[j] / np.linalg.norm(
                        coords[i] - coords[j])
        full = np.zeros((6, 6))
        full[:4, :4] = cm
        mats.append(full)
    X = np.stack(mats)
    y = rng.rand(n, 2)
    ds = NumpyDataset(X, y, np.ones_like(y), np.arange(n))
    model = DTNNModel(2, n_embedding=20, batch_size=n,
                      learning_rate=0.003, mode='regression')
    model.fit(ds, nb_epoch=300, checkpoint_interval=0)
    scores = model.evaluate(ds, [Metric(r2_score, np.mean, n_tasks=2)])
    assert scores['r2_score'] > .7

"""Score functions vs sklearn/scipy, genomic PSSM metrics, Vina scoring
terms, torch dataset adapters, and GBDT wrapper behavior (reference
deepchem/metrics/tests, dock/tests/test_pose_scoring.py,
data/tests/test_pytorch_datasets.py equivalents)."""
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# metrics/score_function.py vs sklearn / scipy / closed forms
# ---------------------------------------------------------------------------

def test_pearson_scores_vs_scipy():
    from scipy.stats import pearsonr as sp_pearsonr
    from deepchem_tpu.metrics import pearson_r2_score, pearsonr
    rng = np.random.RandomState(0)
    y = rng.randn(50)
    p = y + 0.5 * rng.randn(50)
    want = sp_pearsonr(y, p)[0]
    np.testing.assert_allclose(pearsonr(y, p), want, rtol=1e-6)
    np.testing.assert_allclose(pearson_r2_score(y, p), want ** 2,
                               rtol=1e-6)


def test_error_scores_vs_sklearn():
    from sklearn.metrics import mean_squared_error, mean_absolute_error
    from deepchem_tpu.metrics import rms_score, mae_score
    rng = np.random.RandomState(1)
    y, p = rng.randn(30), rng.randn(30)
    np.testing.assert_allclose(rms_score(y, p),
                               np.sqrt(mean_squared_error(y, p)),
                               rtol=1e-6)
    np.testing.assert_allclose(mae_score(y, p),
                               mean_absolute_error(y, p), rtol=1e-6)


def test_kappa_and_jaccard_vs_sklearn():
    from sklearn.metrics import cohen_kappa_score, jaccard_score
    from deepchem_tpu.metrics import kappa_score, jaccard_index
    rng = np.random.RandomState(2)
    y = rng.randint(0, 2, 40)
    p = np.where(rng.rand(40) < 0.8, y, 1 - y)
    np.testing.assert_allclose(kappa_score(y, p),
                               cohen_kappa_score(y, p), rtol=1e-6)
    np.testing.assert_allclose(jaccard_index(y, p),
                               jaccard_score(y, p), rtol=1e-6)


def test_prc_auc_vs_sklearn():
    from sklearn.metrics import average_precision_score
    from deepchem_tpu.metrics import prc_auc_score
    rng = np.random.RandomState(3)
    y = rng.randint(0, 2, 60)
    s = np.clip(y * 0.6 + rng.rand(60) * 0.5, 0, 1)
    np.testing.assert_allclose(prc_auc_score(y, s),
                               average_precision_score(y, s), rtol=1e-6)


def test_concordance_index_properties():
    from deepchem_tpu.metrics import concordance_index
    y = np.array([1.0, 2, 3, 4, 5])
    assert concordance_index(y, y) == 1.0
    assert concordance_index(y, -y) == 0.0
    # ties in predictions count half
    np.testing.assert_allclose(
        concordance_index(np.array([1.0, 2.0]), np.array([1.0, 1.0])),
        0.5)


def test_bedroc_enrichment_direction():
    from deepchem_tpu.metrics import bedroc_score
    rng = np.random.RandomState(4)
    y = np.zeros(200)
    y[:10] = 1
    early = np.concatenate([rng.uniform(0.9, 1.0, 10),
                            rng.uniform(0.0, 0.5, 190)])
    late = 1 - early
    assert bedroc_score(y, early) > 0.9
    assert bedroc_score(y, late) < 0.1


def test_pixel_error_closed_form():
    """pixel_error = 1 - F1 (reference score_function.py:84): here
    TP=1, FP=0, FN=1 -> F1 = 2/3."""
    from deepchem_tpu.metrics import pixel_error
    y = np.array([0, 1, 1, 0])
    p = np.array([0, 1, 0, 0])
    np.testing.assert_allclose(pixel_error(y, p), 1 - 2 / 3, rtol=1e-6)


# ---------------------------------------------------------------------------
# genomic metrics
# ---------------------------------------------------------------------------

def test_pssm_scores_closed_form():
    """A PWM that is an exact match for 'AT' scores highest at the match
    position."""
    from deepchem_tpu.metrics.genomic_metrics import (get_pssm_scores,
                                                      get_motif_scores)
    # letters ACGT as rows here: build encoding manually (4, L)
    # sequence GAT -> one-hot rows A,C,G,T
    seq = np.zeros((1, 4, 3))
    seq[0, 2, 0] = 1    # G
    seq[0, 0, 1] = 1    # A
    seq[0, 3, 2] = 1    # T
    pwm = np.zeros((4, 2))
    pwm[0, 0] = 0.97    # A at offset 0
    pwm[3, 1] = 0.97    # T at offset 1
    pwm += 0.01
    scores = get_pssm_scores(seq, pwm, GC_fraction=0.4)
    assert scores.shape == (1, 3)
    assert scores[0, 1] == scores.max()
    assert scores[0, 1] > 2.0       # strong positive log-odds
    motif = get_motif_scores(seq, ['m1'], pwms={'m1': pwm}, max_scores=1)
    np.testing.assert_allclose(motif[0, 0, 0], scores[0, 1], rtol=1e-6)


def test_in_silico_mutagenesis_shape_and_null():
    """A model ignoring its input yields exactly zero deltas; shape is
    (C, L, N, ...)."""
    from deepchem_tpu.metrics.genomic_metrics import in_silico_mutagenesis

    class Const:
        def predict(self, ds):
            return np.ones((len(ds.X), 1))

    seqs = np.zeros((2, 1, 4, 5))
    seqs[:, 0, 0, :] = 1
    deltas = in_silico_mutagenesis(Const(), seqs)
    assert deltas.shape == (4, 5, 2, 1)
    np.testing.assert_allclose(deltas, 0.0)


def test_in_silico_mutagenesis_detects_position():
    """A model reading base C at position 2 shows deltas only there."""
    from deepchem_tpu.metrics.genomic_metrics import in_silico_mutagenesis

    class PosReader:
        def predict(self, ds):
            return np.asarray(ds.X)[:, 0, 1, 2:3]   # C at position 2

    seqs = np.zeros((1, 1, 4, 4))
    seqs[0, 0, 0, :] = 1                 # all A
    deltas = in_silico_mutagenesis(PosReader(), seqs)
    # mutating position 2 to C flips prediction 0 -> 1
    assert deltas[1, 2, 0, 0] == 1.0
    deltas[1, 2] = 0
    np.testing.assert_allclose(deltas, 0.0)


# ---------------------------------------------------------------------------
# dock/pose_scoring.py closed-form values
# ---------------------------------------------------------------------------

def test_vina_terms_closed_form():
    from deepchem_tpu.dock.pose_scoring import (
        vina_repulsion, vina_hydrophobic, vina_hbond,
        vina_gaussian_first, vina_gaussian_second, vina_nonlinearity,
        cutoff_filter, pairwise_distances)
    d = np.array([-1.0, -0.35, 0.0, 0.5, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(vina_repulsion(d)),
                               [1.0, 0.1225, 0, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vina_hydrophobic(d)),
                               [1, 1, 1, 1, 0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vina_hbond(d)),
                               [1, 0.5, 0, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vina_gaussian_first(np.array([0.0]))), [1.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vina_gaussian_second(np.array([3.0]))), [1.0],
        rtol=1e-6)
    np.testing.assert_allclose(vina_nonlinearity(10.0, 0.05, 4), 10 / 1.2,
                               rtol=1e-6)
    d2 = pairwise_distances(np.zeros((1, 3)), np.array([[3.0, 4.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(d2), [[5.0]], rtol=1e-6)
    filt = cutoff_filter(np.array([5.0, 9.0]), np.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(filt), [1.0, 0.0])


def test_vina_energy_term_monotone_in_contacts():
    """Two ligands: one in contact range, one far away — the contact pose
    scores a larger magnitude."""
    from deepchem_tpu.dock.pose_scoring import vina_energy_term
    protein = np.zeros((3, 3))
    near = np.array([[2.0, 0, 0]])
    far = np.array([[50.0, 0, 0]])
    w = np.array([-0.035, -0.005, 0.84, -0.035, -0.587])
    e_near = float(vina_energy_term(protein, near, w, 0.05, 1))
    e_far = float(vina_energy_term(protein, far, w, 0.05, 1))
    assert e_far == 0.0
    assert abs(e_near) > 0.0


# ---------------------------------------------------------------------------
# torch adapter + GBDT + availability tables
# ---------------------------------------------------------------------------

def test_make_pytorch_dataset_iterates_samples():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.data.pytorch_datasets import make_pytorch_dataset
    X = np.arange(20, dtype=float).reshape(10, 2)
    y = np.arange(10, dtype=float)
    ds = NumpyDataset(X, y)
    tds = make_pytorch_dataset(ds, epochs=2, deterministic=True)
    import torch
    items = list(torch.utils.data.DataLoader(tds, batch_size=None))
    assert len(items) == 20 == len(tds)
    x0, y0, w0, id0 = items[0]
    np.testing.assert_allclose(np.asarray(x0), [0.0, 1.0])
    # batched variant yields iterbatches tuples
    tbd = make_pytorch_dataset(ds, epochs=1, deterministic=True,
                               batch_size=4)
    batches = list(iter(tbd))
    assert len(batches) == 3
    assert np.asarray(batches[0][0]).shape == (4, 2)


def test_gbdt_model_trains_and_early_stops():
    from sklearn.ensemble import GradientBoostingRegressor
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import GBDTModel
    rng = np.random.RandomState(0)
    X = rng.randn(80, 5)
    y = X[:, 0] * 2 + X[:, 1]
    model = GBDTModel(GradientBoostingRegressor(n_estimators=50))
    model.fit(NumpyDataset(X, y))
    pred = model.predict(NumpyDataset(X, y))
    assert np.corrcoef(np.squeeze(pred), y)[0, 1] > 0.9
    # fit_with_eval accepts an explicit validation set
    model2 = GBDTModel(GradientBoostingRegressor(n_estimators=20))
    model2.fit_with_eval(NumpyDataset(X[:60], y[:60]),
                         NumpyDataset(X[60:], y[60:]))
    assert np.isfinite(np.squeeze(
        model2.predict(NumpyDataset(X[60:], y[60:])))).all()


def test_check_availability_tables_consistent():
    from deepchem_tpu.molnet.check_availability import (CheckFeaturizer,
                                                        CheckSplit)
    import deepchem_tpu.molnet as molnet
    for (ds, model), (feat, size) in CheckFeaturizer.items():
        assert isinstance(feat, str) and size > 0
        # every dataset in the featurizer table has a split entry and a
        # load function
        assert ds in CheckSplit
        loader = 'load_' + {'bace_c': 'bace_classification'}.get(ds, ds)
        assert hasattr(molnet, loader), loader

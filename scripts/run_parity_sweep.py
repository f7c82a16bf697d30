"""Reproduce the reference's stable_results rows on TPU with the
device-resident loop; writes RESULTS.md.

Usage: python scripts/run_parity_sweep.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import deepchem_tpu as dc
from deepchem_tpu.metrics import Metric, pearson_r2_score, roc_auc_score

ROWS = []


def tox21_graphconv(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_tox21(
        featurizer='graphconv', splitter=split, reload=True)
    model = dc.models.GraphConvModel(
        n_tasks=len(tasks), batch_size=64, mode='classification',
        learning_rate=0.0005)
    t0 = time.time()
    for _ in range(4):
        model.fit_on_device(train, nb_epoch=10)
    dt = time.time() - t0
    metric = Metric(roc_auc_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['roc_auc_score']
    va = model.evaluate(valid, [metric], transformers)['roc_auc_score']
    return tr, va, dt


def tox21_tf(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_tox21(
        featurizer='ecfp', splitter=split, reload=True)
    model = dc.models.MultitaskClassifier(
        n_tasks=len(tasks), n_features=1024, layer_sizes=[1000],
        dropouts=0.25, batch_size=64, learning_rate=0.001)
    t0 = time.time()
    model.fit_on_device(train, nb_epoch=10)
    dt = time.time() - t0
    metric = Metric(roc_auc_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['roc_auc_score']
    va = model.evaluate(valid, [metric], transformers)['roc_auc_score']
    return tr, va, dt


def delaney_graphconvreg(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_delaney(
        featurizer='graphconv', splitter=split, reload=True)
    model = dc.models.GraphConvModel(
        n_tasks=1, batch_size=64, mode='regression',
        graph_conv_layers=[128, 128], dense_layer_size=256,
        learning_rate=0.0005)
    t0 = time.time()
    for _ in range(10):
        model.fit_on_device(train, nb_epoch=10)
    dt = time.time() - t0
    metric = Metric(pearson_r2_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['pearson_r2_score']
    va = model.evaluate(valid, [metric], transformers)['pearson_r2_score']
    return tr, va, dt


def delaney_tf_regression(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_delaney(
        featurizer='ecfp', splitter=split, reload=True)
    model = dc.models.MultitaskRegressor(
        n_tasks=1, n_features=1024, layer_sizes=[1000, 1000],
        dropouts=0.25, batch_size=64, learning_rate=0.0008)
    t0 = time.time()
    model.fit_on_device(train, nb_epoch=50)
    dt = time.time() - t0
    metric = Metric(pearson_r2_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['pearson_r2_score']
    va = model.evaluate(valid, [metric], transformers)['pearson_r2_score']
    return tr, va, dt


BASELINES = {
    ('tox21', 'graphconv', 'random'): (0.8649, 0.8269, 159.5),
    ('tox21', 'graphconv', 'scaffold'): (0.8849, 0.7317, 158.6),
    ('tox21', 'tf', 'random'): (0.8565, 0.7834, 53.8),
    ('delaney', 'graphconvreg', 'random'): (0.9952, 0.8397, 102.9),
    ('delaney', 'tf_regression', 'random'): (0.7791, 0.6165, 35.6),
}

RUNS = [
    ('tox21', 'graphconv', 'random', tox21_graphconv),
    ('tox21', 'graphconv', 'scaffold', tox21_graphconv),
    ('tox21', 'tf', 'random', tox21_tf),
    ('delaney', 'graphconvreg', 'random', delaney_graphconvreg),
    ('delaney', 'tf_regression', 'random', delaney_tf_regression),
]


def main():
    import sys as _sys
    sel = None
    if len(_sys.argv) > 1:
        sel = {int(i) for i in _sys.argv[1].split(',')}
    lines = [
        '# Parity results (this framework on one TPU v5e chip vs the '
        "reference's committed single-GPU results)",
        '',
        '| dataset | model | split | ref train | ref valid | ref time(s)'
        ' | ours train | ours valid | ours train time(s) |',
        '|---|---|---|---|---|---|---|---|---|',
    ]
    for idx, (dataset, model, split, fn) in enumerate(RUNS):
        if sel is not None and idx not in sel:
            continue
        try:
            tr, va, dt = fn(split)
        except Exception as e:
            print(f'{dataset}/{model}/{split} FAILED: {e}',
                  file=sys.stderr)
            continue
        btr, bva, btime = BASELINES[(dataset, model, split)]
        row = (
            f'| {dataset} | {model} | {split} | {btr:.4f} | {bva:.4f} | '
            f'{btime:.1f} | {tr:.4f} | {va:.4f} | {dt:.1f} |')
        print(row, flush=True)
        with open('results_rows.md', 'a') as f:
            f.write(row + '\n')
    print('rows appended to results_rows.md', flush=True)




def tox21_tf_robust(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_tox21(
        featurizer='ecfp', splitter=split, reload=True)
    model = dc.models.RobustMultitaskClassifier(
        n_tasks=len(tasks), n_features=1024, layer_sizes=[500],
        bypass_layer_sizes=[100], dropouts=0.25, bypass_dropouts=0.25,
        batch_size=64, learning_rate=0.0008)
    t0 = time.time()
    model.fit_on_device(train, nb_epoch=15)
    dt = time.time() - t0
    metric = Metric(roc_auc_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['roc_auc_score']
    va = model.evaluate(valid, [metric], transformers)['roc_auc_score']
    return tr, va, dt


def tox21_logreg(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_tox21(
        featurizer='ecfp', splitter=split, reload=True)
    from sklearn.linear_model import LogisticRegression
    t0 = time.time()

    def builder(model_dir=None):
        return dc.models.SklearnModel(
            LogisticRegression(penalty='l2', C=1.0, max_iter=200))
    model = dc.models.SingletaskToMultitask(tasks, builder)
    model.fit(train)
    dt = time.time() - t0
    metric = Metric(roc_auc_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['roc_auc_score']
    va = model.evaluate(valid, [metric], transformers)['roc_auc_score']
    return tr, va, dt


def muv_tf(split):
    tasks, (train, valid, test), transformers = dc.molnet.load_muv(
        featurizer='ecfp', splitter=split, reload=True)
    model = dc.models.MultitaskClassifier(
        n_tasks=len(tasks), n_features=1024, layer_sizes=[1000],
        dropouts=0.25, batch_size=64, learning_rate=0.0005)
    t0 = time.time()
    model.fit_on_device(train, nb_epoch=10)
    dt = time.time() - t0
    metric = Metric(roc_auc_score, np.mean)
    tr = model.evaluate(train, [metric], transformers)['roc_auc_score']
    va = model.evaluate(valid, [metric], transformers)['roc_auc_score']
    return tr, va, dt


BASELINES.update({
    ('tox21', 'tf_robust', 'random'): (0.8550, 0.7735, 88.9),
    ('tox21', 'logreg', 'random'): (0.9028, 0.7351, 60.2),
    ('muv', 'tf', 'random'): (0.9019, 0.7342, 341.1),
})
RUNS.extend([
    ('tox21', 'tf_robust', 'random', tox21_tf_robust),
    ('tox21', 'logreg', 'random', tox21_logreg),
    ('muv', 'tf', 'random', muv_tf),
])


if __name__ == '__main__':
    main()

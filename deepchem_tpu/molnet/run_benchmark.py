"""Benchmark harness (reference deepchem/molnet/run_benchmark.py:18 and
run_benchmark_models.py:18,383): dataset x model loop with preset
hyperparameters, CSV results output."""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import deepchem_tpu.molnet as molnet
from deepchem_tpu.metrics import (Metric, pearson_r2_score, roc_auc_score)

logger = logging.getLogger(__name__)

CLASSIFICATION_DATASETS = {
    'tox21': molnet.load_tox21, 'sider': molnet.load_sider,
    'muv': molnet.load_muv, 'hiv': molnet.load_hiv,
    'bbbp': molnet.load_bbbp, 'clintox': molnet.load_clintox,
    'bace_c': molnet.load_bace_classification,
}
REGRESSION_DATASETS = {
    'delaney': molnet.load_delaney, 'lipo': molnet.load_lipo,
    'freesolv': molnet.load_freesolv, 'qm7': molnet.load_qm7,
    'qm8': molnet.load_qm8, 'qm9': molnet.load_qm9,
    'bace_r': molnet.load_bace_regression,
    'clearance': molnet.load_clearance, 'hppb': molnet.load_hppb,
}

# preset hyperparameters per model key
# (reference molnet/preset_hyper_parameters.py:10ff)
PRESET_HYPERPARAMS: Dict[str, Dict] = {
    'tf': {'layer_sizes': [1500], 'weight_init_stddevs': 0.02,
           'bias_init_consts': 1.0, 'dropouts': 0.5,
           'penalty': 0.1, 'batch_size': 50, 'nb_epoch': 10,
           'learning_rate': 0.001},
    'tf_regression': {'layer_sizes': [1000, 1000], 'dropouts': 0.25,
                      'batch_size': 128, 'nb_epoch': 50,
                      'learning_rate': 0.0008},
    'tf_robust': {'layer_sizes': [500], 'bypass_layer_sizes': [100],
                  'dropouts': 0.5, 'bypass_dropouts': 0.5,
                  'batch_size': 50, 'nb_epoch': 10,
                  'learning_rate': 0.0005},
    'logreg': {'penalty': 0.05, 'nb_epoch': None},
    'graphconv': {'batch_size': 64, 'nb_epoch': 40,
                  'learning_rate': 0.0005, 'n_filters': 64,
                  'n_fully_connected_nodes': 128},
    'graphconvreg': {'batch_size': 128, 'nb_epoch': 100,
                     'learning_rate': 0.0005, 'n_filters': 128,
                     'n_fully_connected_nodes': 256},
    'weave': {'batch_size': 64, 'nb_epoch': 40,
              'learning_rate': 0.0005, 'n_graph_feat': 128},
    'textcnn': {'batch_size': 64, 'nb_epoch': 40,
                'learning_rate': 0.0005},
    'gcn': {'batch_size': 128, 'nb_epoch': 50, 'learning_rate': 0.001},
    'gat': {'batch_size': 128, 'nb_epoch': 50, 'learning_rate': 0.001},
}

MODEL_FEATURIZERS = {
    'tf': 'ecfp', 'tf_regression': 'ecfp', 'tf_robust': 'ecfp',
    'logreg': 'ecfp', 'graphconv': 'graphconv',
    'graphconvreg': 'graphconv', 'weave': 'weave', 'textcnn': 'raw',
    'gcn': 'graph', 'gat': 'graph',
}


def benchmark_classification(train, valid, test, tasks, transformers,
                             n_features: int, metric, model: str,
                             test_on: bool = False, seed: int = 123,
                             hyper_parameters: Optional[Dict] = None):
    """(reference run_benchmark_models.py:18)"""
    from deepchem_tpu.models import (MultitaskClassifier,
                                     RobustMultitaskClassifier,
                                     GraphConvModel, WeaveModel,
                                     TextCNNModel, GCNModel, GATModel,
                                     SklearnModel)
    hp = dict(PRESET_HYPERPARAMS.get(model, {}))
    if hyper_parameters:
        hp.update(hyper_parameters)
    nb_epoch = hp.pop('nb_epoch', 10)
    n_tasks = len(tasks)
    if model == 'tf':
        m = MultitaskClassifier(
            n_tasks, n_features, layer_sizes=hp['layer_sizes'],
            dropouts=hp['dropouts'], batch_size=hp['batch_size'],
            learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'tf_robust':
        m = RobustMultitaskClassifier(
            n_tasks, n_features, layer_sizes=hp['layer_sizes'],
            bypass_layer_sizes=hp['bypass_layer_sizes'],
            dropouts=hp['dropouts'],
            bypass_dropouts=hp['bypass_dropouts'],
            batch_size=hp['batch_size'],
            learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'logreg':
        from sklearn.linear_model import LogisticRegression
        from deepchem_tpu.models.multitask import SingletaskToMultitask
        m = SingletaskToMultitask(
            tasks, lambda _task: SklearnModel(LogisticRegression(
                C=1.0 / hp.get('penalty', 0.05), max_iter=1000)))
        nb_epoch = None
    elif model == 'graphconv':
        m = GraphConvModel(
            n_tasks, mode='classification',
            graph_conv_layers=[hp['n_filters']] * 2,
            dense_layer_size=hp['n_fully_connected_nodes'],
            batch_size=hp['batch_size'],
            learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'weave':
        m = WeaveModel(n_tasks, mode='classification',
                       n_graph_feat=hp.get('n_graph_feat', 128),
                       batch_size=hp['batch_size'],
                       learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'textcnn':
        cd, sl = TextCNNModel.build_char_dict(train)
        m = TextCNNModel(n_tasks, char_dict=cd, seq_length=sl,
                         mode='classification',
                         batch_size=hp['batch_size'],
                         learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'gcn':
        m = GCNModel(n_tasks, mode='classification',
                     batch_size=hp['batch_size'],
                     learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'gat':
        m = GATModel(n_tasks, mode='classification',
                     batch_size=hp['batch_size'],
                     learning_rate=hp['learning_rate'], seed=seed)
    else:
        raise ValueError(f'unknown classification model {model}')
    t0 = time.time()
    if nb_epoch is None:
        m.fit(train)
    else:
        _fit_fast(m, train, nb_epoch)
    phases = {'fit_s': round(time.time() - t0, 1)}
    t0 = time.time()
    scores = {
        'train': _eval_fast(m, train, metric, transformers),
        'valid': _eval_fast(m, valid, metric, transformers)}
    if test_on:
        scores['test'] = _eval_fast(m, test, metric, transformers)
    phases['eval_s'] = round(time.time() - t0, 1)
    return scores, m, phases


def benchmark_regression(train, valid, test, tasks, transformers,
                         n_features: int, metric, model: str,
                         test_on: bool = False, seed: int = 123,
                         hyper_parameters: Optional[Dict] = None):
    """(reference run_benchmark_models.py:383)"""
    from deepchem_tpu.models import (MultitaskRegressor, GraphConvModel,
                                     WeaveModel, GCNModel, GATModel)
    hp = dict(PRESET_HYPERPARAMS.get(model, {}))
    if hyper_parameters:
        hp.update(hyper_parameters)
    nb_epoch = hp.pop('nb_epoch', 10)
    n_tasks = len(tasks)
    if model == 'tf_regression':
        m = MultitaskRegressor(
            n_tasks, n_features, layer_sizes=hp['layer_sizes'],
            dropouts=hp['dropouts'], batch_size=hp['batch_size'],
            learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'graphconvreg':
        m = GraphConvModel(
            n_tasks, mode='regression',
            graph_conv_layers=[hp['n_filters']] * 2,
            dense_layer_size=hp['n_fully_connected_nodes'],
            batch_size=hp['batch_size'],
            learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'weave_regression':
        m = WeaveModel(n_tasks, mode='regression',
                       batch_size=hp.get('batch_size', 64),
                       learning_rate=hp.get('learning_rate', 5e-4),
                       seed=seed)
    elif model == 'gcn':
        m = GCNModel(n_tasks, mode='regression',
                     batch_size=hp['batch_size'],
                     learning_rate=hp['learning_rate'], seed=seed)
    elif model == 'gat':
        m = GATModel(n_tasks, mode='regression',
                     batch_size=hp['batch_size'],
                     learning_rate=hp['learning_rate'], seed=seed)
    else:
        raise ValueError(f'unknown regression model {model}')
    t0 = time.time()
    _fit_fast(m, train, nb_epoch)
    phases = {'fit_s': round(time.time() - t0, 1)}
    t0 = time.time()
    scores = {
        'train': _eval_fast(m, train, metric, transformers),
        'valid': _eval_fast(m, valid, metric, transformers)}
    if test_on:
        scores['test'] = _eval_fast(m, test, metric, transformers)
    phases['eval_s'] = round(time.time() - t0, 1)
    return scores, m, phases


def _fit_fast(model, train, nb_epoch: int) -> None:
    """Use the device-resident loop on accelerators; host loop on CPU."""
    import jax
    if hasattr(model, 'fit_on_device') and \
            jax.devices()[0].platform != 'cpu':
        try:
            model.fit_on_device(train, nb_epoch=nb_epoch)
            return
        except Exception as e:
            logger.debug('fit_on_device fell back: %s', e)
    model.fit(train, nb_epoch=nb_epoch)


def _eval_fast(model, dataset, metric, transformers):
    """Device-resident eval on accelerators (one scanned dispatch per
    dataset instead of a tunnel round trip per batch); host path on CPU
    or for models without the device loop."""
    import jax
    if hasattr(model, 'evaluate_on_device') and \
            jax.devices()[0].platform != 'cpu':
        try:
            return model.evaluate_on_device(dataset, [metric],
                                            transformers)
        except Exception as e:
            logger.debug('evaluate_on_device fell back: %s', e)
    return model.evaluate(dataset, [metric], transformers)


def run_benchmark(datasets: Sequence[str], model: str,
                  split: Optional[str] = None,
                  metric=None,
                  featurizer: Optional[str] = None,
                  out_path: str = '.',
                  hyper_parameters: Optional[Dict] = None,
                  test: bool = False,
                  reload: bool = True,
                  seed: int = 123,
                  out_file: Optional[str] = None) -> List[Dict]:
    """(reference run_benchmark.py:18)

    Rows carry per-phase seconds (load/fit/eval) alongside the scores so
    a committed results CSV doubles as a wall-clock record — the
    reference's stable_results.csv only records scores."""
    results = []
    for dataset in datasets:
        if dataset in CLASSIFICATION_DATASETS:
            mode = 'classification'
            loader = CLASSIFICATION_DATASETS[dataset]
            metric_obj = metric or Metric(roc_auc_score, np.mean)
        elif dataset in REGRESSION_DATASETS:
            mode = 'regression'
            loader = REGRESSION_DATASETS[dataset]
            metric_obj = metric or Metric(pearson_r2_score, np.mean)
        else:
            raise ValueError(f'unknown dataset {dataset}')
        feat = featurizer or MODEL_FEATURIZERS.get(model, 'ecfp')
        split_name = split or 'random'
        t0 = time.time()
        # the benchmark seed pins BOTH the split (splitter_seed, cached
        # under a seed-keyed folder) and every model's parameter init —
        # two calls with the same seed reproduce byte-identical scores,
        # different seeds actually vary (the r5 CSV predates this: its
        # splits came from the loader's default cached split)
        tasks, (train, valid, tst), transformers = loader(
            featurizer=feat, splitter=split_name, reload=reload,
            splitter_seed=seed)
        load_s = round(time.time() - t0, 1)
        n_features = (train.get_shape()[0][1]
                      if train.get_shape()[0] is not None and
                      len(train.get_shape()[0]) > 1 else 1024)
        if mode == 'classification':
            scores, _, phases = benchmark_classification(
                train, valid, tst, tasks, transformers, n_features,
                metric_obj, model, test_on=test, seed=seed,
                hyper_parameters=hyper_parameters)
        else:
            scores, _, phases = benchmark_regression(
                train, valid, tst, tasks, transformers, n_features,
                metric_obj, model, test_on=test, seed=seed,
                hyper_parameters=hyper_parameters)
        elapsed = time.time() - t0
        row = {'dataset': dataset, 'mode': mode, 'model': model,
               'split': split_name,
               'train_score': list(scores['train'].values())[0],
               'valid_score': list(scores['valid'].values())[0],
               'time': round(elapsed, 1), 'load_s': load_s,
               'fit_s': phases['fit_s'], 'eval_s': phases['eval_s']}
        if test:
            row['test_score'] = list(scores['test'].values())[0]
        results.append(row)
        out_file = out_file or os.path.join(out_path, 'results.csv')
        write_header = not os.path.exists(out_file)
        with open(out_file, 'a', newline='') as f:
            writer = csv.DictWriter(f, fieldnames=list(row.keys()))
            if write_header:
                writer.writeheader()
            writer.writerow(row)
        logger.info('%s/%s: train=%.4f valid=%.4f (%.1fs)', dataset,
                    model, row['train_score'], row['valid_score'],
                    elapsed)
    return results

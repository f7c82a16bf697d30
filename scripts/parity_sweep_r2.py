"""Round-2 parity sweep (VERDICT r1 item 2): widen RESULTS.md beyond
tox21/delaney — sider tf+graphconv, muv graphconv, qm7 regression.

Baselines: examples/stable_results.csv rows (BASELINE.md); random split,
valid-set score.  pcba raw data is not present in this offline
environment; toxcast ships as examples/toxcast/processing/
toxcast_data.csv.gz (8.6k mols x 617 tasks), so the sweep covers every
stable_results benchmark dataset that exists here.

Run on the TPU chip: python scripts/parity_sweep_r2.py
[sider|muv|qm7|toxcast]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def eval_cls(model, ds, transformers):
    from deepchem_tpu.metrics import Metric, roc_auc_score
    return model.evaluate(ds, [Metric(roc_auc_score, np.mean)],
                          transformers)['roc_auc_score']


def run_sider():
    from deepchem_tpu.molnet import load_sider
    from deepchem_tpu.models import GraphConvModel, MultitaskClassifier
    # tf row (ref valid 0.6550 random)
    tasks, (tr, va, te), trans = load_sider(featurizer='ECFP',
                                            splitter='random')
    # reference preset (molnet/preset_hyper_parameters.py hps['tf']):
    # penalty 0.1 there applies to a SUM-over-batch loss; our loss is a
    # weighted MEAN, so the equivalent penalty is 0.1/batch_size = 0.002
    m = MultitaskClassifier(n_tasks=len(tasks), n_features=1024,
                            layer_sizes=[1500], dropouts=0.5,
                            weight_decay_penalty=0.002,
                            batch_size=50, learning_rate=0.001)
    t0 = time.time()
    m.fit_on_device(tr, nb_epoch=10)
    dt = time.time() - t0
    print(f'sider tf: train {eval_cls(m, tr, trans):.4f} '
          f'valid {eval_cls(m, va, trans):.4f} ({dt:.1f}s) '
          '[ref 0.7772/0.6550]')
    # graphconv row (ref valid 0.6176 random)
    tasks, (tr, va, te), trans = load_sider(featurizer='graphconv',
                                            splitter='random')
    g = GraphConvModel(n_tasks=len(tasks), batch_size=64,
                       mode='classification', learning_rate=0.001,
                       graph_conv_layers=[64, 64], dense_layer_size=128)
    t0 = time.time()
    g.fit_on_device(tr, nb_epoch=40)
    dt = time.time() - t0
    print(f'sider graphconv: train {eval_cls(g, tr, trans):.4f} '
          f'valid {eval_cls(g, va, trans):.4f} ({dt:.1f}s) '
          '[ref 0.7049/0.6176]')


def run_toxcast():
    """toxcast random-split rows (ref tf 0.6840, graphconv 0.7168 valid);
    617 sparse tasks, 8.6k molecules — stable_results.csv:39,42."""
    from deepchem_tpu.molnet import load_toxcast
    from deepchem_tpu.models import GraphConvModel, MultitaskClassifier
    tasks, (tr, va, te), trans = load_toxcast(featurizer='ECFP',
                                              splitter='random')
    m = MultitaskClassifier(n_tasks=len(tasks), n_features=1024,
                            layer_sizes=[1500], dropouts=0.5,
                            weight_decay_penalty=0.002,
                            batch_size=50, learning_rate=0.001)
    t0 = time.time()
    m.fit_on_device(tr, nb_epoch=10)
    dt = time.time() - t0
    print(f'toxcast tf: train {eval_cls(m, tr, trans):.4f} '
          f'valid {eval_cls(m, va, trans):.4f} ({dt:.1f}s) '
          '[ref 0.8355/0.6840, 1586s]')
    tasks, (tr, va, te), trans = load_toxcast(featurizer='graphconv',
                                              splitter='random')
    g = GraphConvModel(n_tasks=len(tasks), batch_size=64,
                       mode='classification', learning_rate=0.001,
                       graph_conv_layers=[64, 64], dense_layer_size=128)
    t0 = time.time()
    g.fit_on_device(tr, nb_epoch=40)
    dt = time.time() - t0
    print(f'toxcast graphconv: train {eval_cls(g, tr, trans):.4f} '
          f'valid {eval_cls(g, va, trans):.4f} ({dt:.1f}s) '
          '[ref 0.8198/0.7168, 702s]')


def run_muv():
    from deepchem_tpu.molnet import load_muv
    from deepchem_tpu.models import GraphConvModel
    tasks, (tr, va, te), trans = load_muv(featurizer='graphconv',
                                          splitter='random')
    g = GraphConvModel(n_tasks=len(tasks), batch_size=256,
                       mode='classification', learning_rate=0.002,
                       graph_conv_layers=[64, 64], dense_layer_size=128)
    t0 = time.time()
    g.fit(tr, nb_epoch=40, checkpoint_interval=0)
    dt = time.time() - t0
    print(f'muv graphconv: train {eval_cls(g, tr, trans):.4f} '
          f'valid {eval_cls(g, va, trans):.4f} ({dt:.1f}s) '
          '[ref 0.8604/0.7301, 1389s]')


def run_qm7():
    from deepchem_tpu.molnet import load_qm7
    from deepchem_tpu.models import DTNNModel, MultitaskRegressor
    from deepchem_tpu.metrics import Metric, mean_absolute_error
    mae = Metric(mean_absolute_error, np.mean)
    # CoulombMatrixEig + MLP (the 'tf_regression'-class qm7 protocol)
    tasks, (tr, va, te), trans = load_qm7(splitter='random')
    m = MultitaskRegressor(n_tasks=1, n_features=23,
                           layer_sizes=[400, 100], dropouts=0.01,
                           batch_size=50, learning_rate=0.001)
    t0 = time.time()
    m.fit_on_device(tr, nb_epoch=200)
    dt = time.time() - t0
    tr_mae = m.evaluate(tr, [mae], trans)['mean_absolute_error']
    va_mae = m.evaluate(va, [mae], trans)['mean_absolute_error']
    print(f'qm7 multitask-eig: train MAE {tr_mae:.1f} valid MAE '
          f'{va_mae:.1f} kcal/mol ({dt:.1f}s)')
    # DTNN on full Coulomb matrices (reference graph_models.py:405;
    # MoleculeNet full-7k DTNN reaches ~8.8 kcal/mol)
    import deepchem_tpu.feat as feat
    tasks, (tr, va, te), trans = load_qm7(
        featurizer=feat.CoulombMatrix(max_atoms=23), splitter='random')
    d = DTNNModel(n_tasks=1, n_embedding=30, n_hidden=100, n_steps=2,
                  batch_size=50, learning_rate=0.001)
    t0 = time.time()
    d.fit_on_device(tr, nb_epoch=320)
    dt = time.time() - t0
    tr_mae = d.evaluate(tr, [mae], trans)['mean_absolute_error']
    va_mae = d.evaluate(va, [mae], trans)['mean_absolute_error']
    print(f'qm7 DTNN: train MAE {tr_mae:.1f} valid MAE {va_mae:.1f} '
          f'kcal/mol ({dt:.1f}s) [MoleculeNet DTNN 8.8 on full 7k]')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('sider', 'all'):
        run_sider()
    if which in ('qm7', 'all'):
        run_qm7()
    if which in ('muv', 'all'):
        run_muv()
    if which in ('toxcast', 'all'):
        run_toxcast()

"""Round-3 parity rows over the remaining locally-available datasets
(VERDICT r2 item 9): chembl_5thresh, flash_points,
membrane_permeability — all shipped in the reference's datasets/
mirror, previously loaders-only.

Usage: python scripts/parity_sweep_r3.py [chembl|flash|membrane|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from deepchem_tpu.metrics import Metric, pearson_r2_score, rms_score

r2 = Metric(pearson_r2_score, np.mean)
rms = Metric(rms_score, np.mean)


def run_chembl():
    """ChEMBL 5thresh (23.9k mols, 691 sparse pIC50 tasks): the
    reference exercises it through chembl_datasets.py with
    tf_regression-class models; no committed anchor score exists, so
    the row records our numbers for future rounds."""
    from deepchem_tpu.molnet import load_chembl
    from deepchem_tpu.models import MultitaskRegressor
    tasks, (tr, va, te), trans = load_chembl(
        featurizer='ECFP', splitter='random', set='5thresh')
    print(f'chembl: {len(tr)}/{len(va)}/{len(te)} mols, '
          f'{len(tasks)} tasks', flush=True)
    model = MultitaskRegressor(
        n_tasks=len(tasks), n_features=1024,
        layer_sizes=[1000], dropouts=0.25, batch_size=128,
        learning_rate=0.001)
    t0 = time.time()
    model.fit(tr, nb_epoch=40, checkpoint_interval=0)
    dt = time.time() - t0
    tr_s = model.evaluate(tr, [r2], trans)['pearson_r2_score']
    va_s = model.evaluate(va, [r2], trans)['pearson_r2_score']
    print(f'chembl tf_regression: train R2 {tr_s:.4f} valid R2 '
          f'{va_s:.4f} ({dt:.0f}s, 40 epochs)', flush=True)


def run_flash():
    from deepchem_tpu.molnet import load_flash_points
    from deepchem_tpu.models import MultitaskRegressor
    tasks, (tr, va, te), trans = load_flash_points(splitter='random')
    model = MultitaskRegressor(n_tasks=1, n_features=1024,
                               layer_sizes=[256, 64], dropouts=0.1,
                               batch_size=32, learning_rate=0.001)
    t0 = time.time()
    model.fit(tr, nb_epoch=200, checkpoint_interval=0)
    dt = time.time() - t0
    tr_s = model.evaluate(tr, [r2], trans)['pearson_r2_score']
    va_s = model.evaluate(va, [r2], trans)['pearson_r2_score']
    va_rms = model.evaluate(va, [rms], trans)['rms_score']
    print(f'flash_points (mixture-weighted ECFP): train R2 {tr_s:.3f} '
          f'valid R2 {va_s:.3f} valid RMSE {va_rms:.1f} degC '
          f'({dt:.0f}s)', flush=True)


def run_membrane():
    from deepchem_tpu.molnet import load_membrane_permeability
    from deepchem_tpu.models import GraphConvModel
    tasks, (tr, va, te), trans = load_membrane_permeability(
        featurizer='graphconv', splitter='random')
    model = GraphConvModel(n_tasks=1, mode='regression', batch_size=32,
                           learning_rate=0.001)
    t0 = time.time()
    model.fit(tr, nb_epoch=150, checkpoint_interval=0)
    dt = time.time() - t0
    tr_s = model.evaluate(tr, [r2], trans)['pearson_r2_score']
    va_s = model.evaluate(va, [r2], trans)['pearson_r2_score']
    va_rms = model.evaluate(va, [rms], trans)['rms_score']
    print(f'membrane_permeability graphconvreg: train R2 {tr_s:.3f} '
          f'valid R2 {va_s:.3f} valid RMSE {va_rms:.2f} logP '
          f'({dt:.0f}s)', flush=True)


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('flash', 'all'):
        run_flash()
    if which in ('membrane', 'all'):
        run_membrane()
    if which in ('chembl', 'all'):
        run_chembl()

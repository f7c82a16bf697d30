"""Benchmark: GraphConvModel training throughput on Tox21 (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's committed benchmark run trained graphconv on
tox21 (random split) with batch_size=64 x 40 epochs in 159.5 s wall-clock
(BASELINE.md, examples/stable_results.csv:30; preset hyperparameters
molnet/preset_hyper_parameters.py:49).  Train split = 6411 molecules, so the
implied reference training throughput is ~6411*40/150 ~= 1710 mol-graphs/s.
vs_baseline = our steady-state mol-graphs/s divided by that.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_MOLS_PER_SEC = 6411 * 40 / 150.0   # ~1710


def main() -> None:
    t_start = time.time()
    import jax
    from deepchem_tpu.molnet import load_tox21
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.metrics import Metric, roc_auc_score

    tasks, (train, valid, test), transformers = load_tox21(
        featurizer='graphconv', splitter='random', reload=True)
    n_train = len(train)

    batch_size = 64
    model = GraphConvModel(n_tasks=len(tasks), batch_size=batch_size,
                           mode='classification', learning_rate=0.0005,
                           graph_conv_layers=[64, 64],
                           dense_layer_size=128)
    # warmup: 1 epoch covers compile for every shape bucket
    model.fit(train, nb_epoch=1, checkpoint_interval=0)
    # timed steady-state epochs
    n_epochs = 5
    t0 = time.time()
    model.fit(train, nb_epoch=n_epochs, checkpoint_interval=0)
    dt = time.time() - t0
    mols_per_sec = n_train * n_epochs / dt

    # sanity quality gate (not part of the metric): short eval
    try:
        metric = Metric(roc_auc_score, np.mean)
        valid_score = model.evaluate(
            valid, [metric], transformers)['roc_auc_score']
    except Exception:
        valid_score = float('nan')

    result = {
        'metric': 'graphconv_tox21_train_throughput',
        'value': round(mols_per_sec, 1),
        'unit': 'mol-graphs/s/chip',
        'vs_baseline': round(mols_per_sec / REFERENCE_MOLS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f'# device={jax.devices()[0]} '
          f'epochs={n_epochs} train={n_train} time={dt:.1f}s '
          f'valid_roc_auc={valid_score:.4f} '
          f'total_wall={time.time() - t_start:.1f}s', file=sys.stderr)


if __name__ == '__main__':
    main()

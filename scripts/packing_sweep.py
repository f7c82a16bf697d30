"""Packing sweep for the flagship GraphConv step (VERDICT r4 item 5).

The r4 roofline (docs/DESIGN_NOTES.md, "Roofline of the flagship
GraphConv step") showed the bench step is latency/op-count bound: 0.01%
MXU, 1% HBM at batch 256.  The COO batch layout already packs every
molecule of a batch into one graph, so "multi-molecule packing" and
"bigger batch" are the same lever: more molecules per dispatched step
amortizes the fixed per-step sequencing cost that dominates.  The gate
is quality — the reference's committed tox21/graphconv valid ROC-AUC is
0.8269 (examples/stable_results.csv:30) and the 40-epoch protocol must
still reach it.

This script measures, per (batch_size, learning_rate) config:
  - steady-state training throughput (mol-graphs/s, 10-epoch timed
    fit_on_device after a warmup that pays any compile)
  - 40-epoch valid ROC-AUC (the quality gate)

Writes PACKING_SWEEP.json at the repo root; one JSON line per config on
stdout as it completes (the runs are long — partial output matters).

Usage:  python scripts/packing_sweep.py \
            [--configs 512:0.002,512:0.004,1024:0.004,1024:0.008]
            [--seeds 0]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REFERENCE_VALID_AUC = 0.8269     # stable_results.csv:30
BATCH256_BASELINE = 174149.0     # BENCH_r04 flagship plateau


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', type=str,
                    default='512:0.002,512:0.004,1024:0.004,1024:0.008')
    ap.add_argument('--seeds', type=str, default='0')
    args = ap.parse_args()
    configs = []
    for tok in args.configs.split(','):
        b, lr = tok.split(':')
        configs.append((int(b), float(lr)))
    seeds = [int(s) for s in args.seeds.split(',') if s.strip()]

    import jax
    from deepchem_tpu.molnet import load_tox21
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.metrics import Metric, roc_auc_score

    tasks, (train, valid, test), transformers = load_tox21(
        featurizer='graphconv', splitter='random', reload=True)
    n_train = len(train)
    metric = Metric(roc_auc_score, np.mean)

    rows = []
    for batch, lr in configs:
        for seed in seeds:
            model = GraphConvModel(n_tasks=len(tasks), batch_size=batch,
                                   mode='classification',
                                   learning_rate=lr,
                                   graph_conv_layers=[64, 64],
                                   dense_layer_size=128, seed=seed)
            t0 = time.time()
            model.fit_on_device(train, nb_epoch=10, seed=seed)
            warm_s = round(time.time() - t0, 1)
            t0 = time.time()
            model.fit_on_device(train, nb_epoch=10, seed=seed)
            dt = time.time() - t0
            mols_per_sec = n_train * 10 / dt
            # finish the 40-epoch protocol, then the quality gate
            model.fit_on_device(train, nb_epoch=20, seed=seed)
            t0 = time.time()
            valid_auc = model.evaluate_on_device(
                valid, [metric], transformers)['roc_auc_score']
            eval_s = round(time.time() - t0, 1)
            row = {
                'batch_size': batch, 'learning_rate': lr, 'seed': seed,
                'mols_per_sec': round(mols_per_sec, 1),
                'speedup_vs_batch256': round(
                    mols_per_sec / BATCH256_BASELINE, 2),
                'valid_roc_auc': round(float(valid_auc), 4),
                'meets_reference_auc': bool(
                    valid_auc >= REFERENCE_VALID_AUC),
                'warmup_compile_s': warm_s, 'eval_s': eval_s,
                'steady_s': round(dt, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    result = {
        'metric': 'graphconv_tox21_packing_sweep',
        'train_molecules': n_train,
        'reference_valid_roc_auc': REFERENCE_VALID_AUC,
        'batch256_baseline_mols_per_sec': BATCH256_BASELINE,
        'rows': rows,
        'device': str(jax.devices()[0]),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'PACKING_SWEEP.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps({'written': 'PACKING_SWEEP.json',
                      'n_rows': len(rows)}))


if __name__ == '__main__':
    main()

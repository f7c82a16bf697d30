"""MUV scale proof (VERDICT r3 item 3): the full input pipeline + training
loop on the largest locally-available dataset.

Reference anchor (examples/stable_results.csv:38 via BASELINE.md): MUV /
random split / graphconv ran 1389.0 s for the 40-epoch protocol at valid
ROC-AUC 0.7301 (train 0.8604).  MUV is 93,087 molecules x 17 tasks with
~0.2% positives — the sparse-label stress test.  This script measures every
phase separately so the claim "the input pipeline is not the bottleneck" is
a number, not an assertion:

  phase 1  featurize     CSV -> graphs (C++ fast path; n_jobs plumbed)
  phase 2  dataset+split DiskDataset shards + random split + balancing
  phase 3  train         GraphConvModel, 40-epoch protocol on the chip
  phase 4  eval          valid/train mean ROC-AUC over the 17 tasks

Writes SCALE_MUV.json at the repo root and prints one JSON line.

Usage:  python scripts/muv_scale.py  [--epochs 40]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REFERENCE_SECONDS = 1389.0           # stable_results.csv:38
REFERENCE_VALID_AUC = 0.7301
REFERENCE_TRAIN_AUC = 0.8604


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=40)
    ap.add_argument('--batch-size', type=int, default=256)
    ap.add_argument('--seeds', type=str, default='0,1,2,3',
                    help='comma-separated model-init seeds; the run '
                         'reports per-seed scores plus mean+-sd (the '
                         'split itself is pinned by splitter_seed=123)')
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(',') if s.strip()]

    import jax
    from deepchem_tpu.molnet import load_muv
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.metrics import Metric, roc_auc_score

    timings = {}
    t0 = time.time()
    # reload=False forces a fresh featurize+split so phase timings are
    # honest (no cache hits)
    # splitter_seed=123 follows the reference benchmark protocol
    # (run_benchmark.py:32) and pins the split — also keeping the
    # derived padding caps (and hence the scan HLO) stable so repeat
    # runs hit the persistent compile cache
    tasks, (train, valid, test), transformers = load_muv(
        featurizer='graphconv', splitter='random', reload=False,
        splitter_seed=123)
    timings['featurize_and_split_s'] = round(time.time() - t0, 1)
    n_train = len(train)
    n_total = n_train + len(valid) + len(test)
    feat_rate = n_total / timings['featurize_and_split_s']
    print(f'# featurize+split: {n_total} mols in '
          f"{timings['featurize_and_split_s']}s ({feat_rate:.0f} mol/s)",
          file=sys.stderr)

    metric = Metric(roc_auc_score, np.mean)
    repeats = []
    # ONE model, reinitialized per seed: tracing + compile + prepared-
    # batch upload are paid once per process (a fresh instance per seed
    # measured ~145 s of retrace per repeat even with a warm XLA disk
    # cache); reinitialize(seed=k) draws exactly the params a fresh
    # model(seed=k) would
    model = None
    for seed in seeds:
        if model is None:
            model = GraphConvModel(n_tasks=len(tasks),
                                   batch_size=args.batch_size,
                                   mode='classification',
                                   learning_rate=0.002,
                                   graph_conv_layers=[64, 64],
                                   dense_layer_size=128,
                                   seed=seed)
        else:
            model.reinitialize(seed=seed)

        # warmup epoch: first seed pays any compile; later seeds reuse
        # this process's executables outright
        t0 = time.time()
        model.fit_on_device(train, nb_epoch=1, seed=seed)
        warm_s = round(time.time() - t0, 1)
        print(f'# seed {seed}: warmup(+compile) {warm_s}s',
              file=sys.stderr)

        # steady-state training: the remaining 39 epochs of the protocol
        t0 = time.time()
        model.fit_on_device(train, nb_epoch=args.epochs - 1, seed=seed)
        steady_s = round(time.time() - t0, 1)
        mols_per_sec = n_train * (args.epochs - 1) / steady_s
        print(f'# seed {seed}: {mols_per_sec:.0f} mol-graphs/s '
              'steady-state', file=sys.stderr)

        t0 = time.time()
        # device-resident eval: one scanned dispatch per dataset instead
        # of a tunnel round trip per batch; sticky padding caps make it
        # dispatch the very executable the training scan compiled
        valid_auc = model.evaluate_on_device(
            valid, [metric], transformers)['roc_auc_score']
        train_auc = model.evaluate_on_device(
            train, [metric], transformers)['roc_auc_score']
        eval_s = round(time.time() - t0, 1)
        print(f'# seed {seed}: valid {valid_auc:.4f} '
              f'train {train_auc:.4f} (eval {eval_s}s)', file=sys.stderr)
        repeats.append({
            'seed': seed,
            'valid_roc_auc': round(float(valid_auc), 4),
            'train_roc_auc': round(float(train_auc), 4),
            'warmup_compile_s': warm_s,
            'train_steady_s': steady_s,
            'eval_s': eval_s,
            'mols_per_sec': round(mols_per_sec, 1),
        })

    # headline phase timings: first seed (pays the compile); the single-
    # run total is what the reference's 1389 s row corresponds to
    timings['warmup_compile_s'] = repeats[0]['warmup_compile_s']
    timings['train_steady_s'] = repeats[0]['train_steady_s']
    timings['eval_s'] = repeats[0]['eval_s']
    total_s = sum(timings.values())

    def _ms(key):
        vals = [r[key] for r in repeats]
        return (round(float(np.mean(vals)), 4),
                round(float(np.std(vals)), 4))

    v_mean, v_sd = _ms('valid_roc_auc')
    tr_mean, tr_sd = _ms('train_roc_auc')
    result = {
        'metric': 'graphconv_muv_40epoch',
        'dataset_molecules': n_total,
        'train_molecules': n_train,
        'value': round(repeats[0]['mols_per_sec'], 1),
        'unit': 'mol-graphs/s/chip',
        'n_seeds': len(seeds),
        'valid_roc_auc': v_mean, 'valid_roc_auc_sd': v_sd,
        'train_roc_auc': tr_mean, 'train_roc_auc_sd': tr_sd,
        'repeats': repeats,
        'reference_valid_roc_auc': REFERENCE_VALID_AUC,
        'reference_seconds': REFERENCE_SECONDS,
        'total_seconds': round(total_s, 1),
        'speedup_vs_reference': round(REFERENCE_SECONDS / total_s, 1),
        'phase_timings': timings,
        'featurize_mols_per_sec': round(feat_rate, 0),
        'input_pipeline_fraction': round(
            timings['featurize_and_split_s'] / total_s, 3),
        'device': str(jax.devices()[0]),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'SCALE_MUV.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()

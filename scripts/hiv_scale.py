"""HIV end-to-end run: a second large-dataset datapoint (41k molecules).

HIV (41,127 molecules x 1 task, ~3.5% positives) ships in the reference
examples tree (examples/hiv/HIV.csv) and is mirrored locally, but it has
NO row in the reference's committed stable_results.csv — so unlike the
MUV scale proof there is no in-repo wall-clock anchor.  The MoleculeNet
paper (Wu et al. 2018, table 4) reports graph convolution ROC-AUC ~0.763
on scaffold-split HIV test; we run the scaffold protocol to be
comparable with that literature number and record our run as the
framework's own baseline.

Usage:  python scripts/hiv_scale.py  [--epochs 40]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

LITERATURE_TEST_AUC = 0.763          # MoleculeNet (Wu et al. 2018) GC/scaffold


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=40)
    ap.add_argument('--batch-size', type=int, default=256)
    ap.add_argument('--seeds', type=str, default='0,1,2',
                    help='comma-separated model-init seeds; the run '
                         'reports per-seed scores plus mean+-sd '
                         '(scaffold split itself is deterministic)')
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(',') if s.strip()]

    import jax
    from deepchem_tpu.molnet import load_hiv
    from deepchem_tpu.models import GraphConvModel
    from deepchem_tpu.metrics import Metric, roc_auc_score

    timings = {}
    t0 = time.time()
    tasks, (train, valid, test), transformers = load_hiv(
        featurizer='graphconv', splitter='scaffold', reload=False,
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
    # ONE model, reinitialized per seed — executables and prepared
    # batches are per-process, so repeats cost training time only
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

        t0 = time.time()
        model.fit_on_device(train, nb_epoch=args.epochs - 1, seed=seed)
        steady_s = round(time.time() - t0, 1)
        mols_per_sec = n_train * (args.epochs - 1) / steady_s
        print(f'# seed {seed}: {mols_per_sec:.0f} mol-graphs/s '
              'steady-state', file=sys.stderr)

        t0 = time.time()
        valid_auc = model.evaluate_on_device(
            valid, [metric], transformers)['roc_auc_score']
        test_auc = model.evaluate_on_device(
            test, [metric], transformers)['roc_auc_score']
        train_auc = model.evaluate_on_device(
            train, [metric], transformers)['roc_auc_score']
        eval_s = round(time.time() - t0, 1)
        print(f'# seed {seed}: valid {valid_auc:.4f} test {test_auc:.4f} '
              f'train {train_auc:.4f} (eval {eval_s}s)', file=sys.stderr)
        repeats.append({
            'seed': seed,
            'valid_roc_auc': round(float(valid_auc), 4),
            'test_roc_auc': round(float(test_auc), 4),
            'train_roc_auc': round(float(train_auc), 4),
            'warmup_compile_s': warm_s,
            'train_steady_s': steady_s,
            'eval_s': eval_s,
            'mols_per_sec': round(mols_per_sec, 1),
        })

    # headline phase timings: first seed (pays the compile); totals are
    # the single-run story the reference row corresponds to
    timings['warmup_compile_s'] = repeats[0]['warmup_compile_s']
    timings['train_steady_s'] = repeats[0]['train_steady_s']
    timings['eval_s'] = repeats[0]['eval_s']
    total_s = sum(timings.values())

    def _ms(key):
        vals = [r[key] for r in repeats]
        return (round(float(np.mean(vals)), 4),
                round(float(np.std(vals)), 4))

    v_mean, v_sd = _ms('valid_roc_auc')
    t_mean, t_sd = _ms('test_roc_auc')
    tr_mean, tr_sd = _ms('train_roc_auc')
    result = {
        'metric': 'graphconv_hiv_40epoch_scaffold',
        'dataset_molecules': n_total,
        'train_molecules': n_train,
        'value': round(repeats[0]['mols_per_sec'], 1),
        'unit': 'mol-graphs/s/chip',
        'n_seeds': len(seeds),
        'valid_roc_auc': v_mean, 'valid_roc_auc_sd': v_sd,
        'test_roc_auc': t_mean, 'test_roc_auc_sd': t_sd,
        'train_roc_auc': tr_mean, 'train_roc_auc_sd': tr_sd,
        'repeats': repeats,
        'literature_test_roc_auc': LITERATURE_TEST_AUC,
        'total_seconds': round(total_s, 1),
        'phase_timings': timings,
        'featurize_mols_per_sec': round(feat_rate, 0),
        'device': str(jax.devices()[0]),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'SCALE_HIV.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()

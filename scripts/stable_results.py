"""One-command benchmark artifact (VERDICT r4 item 6).

Runs molnet.run_benchmark across every locally-available
(dataset x model) preset pair in a single invocation and writes
``examples/stable_results_tpu.csv`` — this framework's twin of the
reference's committed ``examples/stable_results.csv`` (produced by its
``molnet/run_benchmark.py:18`` harness), with per-phase seconds
(load / fit / eval) added to every row.

Datasets are limited to the zero-egress local mirrors
(/root/reference/datasets + /root/reference/examples); models per
dataset follow the reference presets (molnet/preset_hyper_parameters.py)
wherever the pairing is in stable_results.csv.

Usage:  python scripts/stable_results.py   [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# (dataset, model) pairs, cheap-to-expensive within each dataset so a
# partial run still yields committed rows
MATRIX = [
    ('tox21', 'logreg'), ('tox21', 'tf'), ('tox21', 'tf_robust'),
    ('tox21', 'graphconv'), ('tox21', 'gcn'), ('tox21', 'gat'),
    ('tox21', 'textcnn'),
    ('sider', 'tf'), ('sider', 'graphconv'),
    ('clintox', 'tf'), ('clintox', 'graphconv'), ('clintox', 'weave'),
    ('hiv', 'tf'),
    ('muv', 'tf'),
    ('delaney', 'tf_regression'), ('delaney', 'graphconvreg'),
    ('delaney', 'gcn'), ('delaney', 'gat'),
]
QUICK = [('tox21', 'tf'), ('delaney', 'tf_regression')]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='2-row smoke run')
    ap.add_argument('--only', type=str, default='',
                    help='comma list of dataset:model pairs to run')
    args = ap.parse_args()
    if args.only:
        matrix = [tuple(tok.split(':')) for tok in args.only.split(',')]
    else:
        matrix = QUICK if args.quick else MATRIX

    from deepchem_tpu.molnet.run_benchmark import run_benchmark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_file = os.path.join(repo, 'examples', 'stable_results_tpu.csv')
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    if os.path.exists(out_file) and not args.only:
        os.remove(out_file)

    rows, failures = [], []
    t_start = time.time()
    for dataset, model in matrix:
        t0 = time.time()
        try:
            res = run_benchmark([dataset], model, split='random',
                                out_file=out_file, seed=123)
            rows.extend(res)
            r = res[0]
            print(f'# {dataset}/{model}: train={r["train_score"]:.4f} '
                  f'valid={r["valid_score"]:.4f} ({r["time"]:.0f}s)',
                  file=sys.stderr, flush=True)
        except Exception as e:
            failures.append({'dataset': dataset, 'model': model,
                             'error': f'{type(e).__name__}: {e}'})
            print(f'# {dataset}/{model} FAILED after '
                  f'{time.time() - t0:.0f}s: {e}',
                  file=sys.stderr, flush=True)
    print(json.dumps({
        'written': os.path.relpath(out_file, repo),
        'n_rows': len(rows), 'n_failures': len(failures),
        'failures': failures,
        'total_wall_s': round(time.time() - t_start, 1)}))


if __name__ == '__main__':
    main()

"""Roofline analysis of the flagship GraphConv training step (VERDICT r3
item 4): measured step time vs the analytic bytes/FLOPs of the bench.py
configuration, against v5e peaks.

v5e (1 chip): 197 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU, 819 GB/s HBM.

The compiled step's own cost model (XLA cost_analysis) supplies
flops/bytes where available; an analytic estimate is printed alongside so
the conclusion does not hinge on the cost model's availability on the
experimental backend.

Usage: python scripts/roofline_graphconv.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

HBM_BW = 819e9          # bytes/s
PEAK_BF16 = 197e12      # FLOP/s
PEAK_F32 = 49e12


def main():
    import jax
    from deepchem_tpu.molnet import load_tox21
    from deepchem_tpu.models import GraphConvModel

    tasks, (train, valid, test), _ = load_tox21(
        featurizer='graphconv', splitter='random', reload=True)
    model = GraphConvModel(n_tasks=len(tasks), batch_size=256,
                           mode='classification', learning_rate=0.002,
                           graph_conv_layers=[64, 64],
                           dense_layer_size=128)
    n_train = len(train)
    # warm with the SAME epoch count: the resident scan's executable is
    # keyed on total step count, so a 2-epoch warmup leaves the timed
    # 10-epoch call compiling a fresh scan (measured: 21.6 ms/step
    # polluted vs 1.5 ms/step true steady state — bench.py protocol)
    model.fit_on_device(train, nb_epoch=10)           # compile
    t0 = time.time()
    model.fit_on_device(train, nb_epoch=10)
    dt = time.time() - t0
    steps = 10 * (n_train // 256 + (1 if n_train % 256 else 0))
    step_s = dt / steps
    mols_s = n_train * 10 / dt
    print(f'# steady state: {mols_s:.0f} mol-graphs/s, '
          f'{step_s*1e3:.3f} ms/step ({steps} steps / {dt:.2f}s)')

    # --- analytic estimate at the padded batch shapes ---------------
    cache = model._ensure_fit_cache(train)
    shapes = [a.shape for a in cache['host_in']]
    print(f'# padded batch arrays: {shapes}')
    nbytes_in = sum(a.nbytes for a in cache['host_in']) / cache['S']
    N = shapes[0][1] if len(shapes[0]) > 2 else shapes[0][0]
    F_in = shapes[0][-1]
    # forward matmul flops: per conv layer ~ N*(F_in*F_out)*2 (dense on
    # node features) + neighbor-table gathers (bandwidth);
    # backward ~2x forward; optimizer elementwise.
    f_layers = [(F_in, 64), (64, 64), (64, 128)]
    flops_fwd = sum(N * fi * fo * 2 for fi, fo in f_layers)
    flops = flops_fwd * 3            # fwd + 2x bwd
    # bytes: inputs + params traffic + activations (rough: 3x inputs)
    params_bytes = sum(np.prod(p.shape) * 4 for p in
                      jax.tree.leaves(model.params))
    bytes_step = nbytes_in * 3 + params_bytes * 4
    ai = flops / bytes_step
    print(f'# analytic: {flops/1e9:.2f} GFLOP/step, '
          f'{bytes_step/1e6:.1f} MB/step, arithmetic intensity '
          f'{ai:.1f} FLOP/byte (ridge bf16: {PEAK_BF16/HBM_BW:.0f})')

    achieved_flops = flops / step_s
    achieved_bw = bytes_step / step_s
    print(f'# achieved: {achieved_flops/1e12:.3f} TFLOP/s '
          f'({achieved_flops/PEAK_BF16*100:.1f}% of bf16 peak), '
          f'{achieved_bw/1e9:.1f} GB/s HBM ({achieved_bw/HBM_BW*100:.1f}%'
          ' of peak)')

    # --- compiled-step cost analysis where the backend provides it --
    try:
        key = next(k for k in model._predict_fn_cache
                   if k[0] == 'fit_scan')
        fn = model._predict_fn_cache[key]
        lowered_cost = None
        # jitted fns cache their executables; pull cost analysis
        for ex in [fn]:
            try:
                lowered_cost = ex.lower(
                    model.params, model.opt_state,
                    jax.random.PRNGKey(0),
                    [jax.numpy.asarray(a) for a in cache['host_in']],
                    [jax.numpy.asarray(a) for a in cache['host_lab']],
                    [jax.numpy.asarray(a) for a in cache['host_w']],
                    jax.numpy.arange(key[1], dtype=jax.numpy.int32),
                    jax.numpy.int32(0)).compile().cost_analysis()
            except Exception as e:
                print(f'# cost_analysis unavailable: {e}')
        if lowered_cost:
            ca = lowered_cost[0] if isinstance(lowered_cost, list) \
                else lowered_cost
            fl = ca.get('flops', 0.0)
            by = ca.get('bytes accessed', 0.0)
            n_in_scan = key[1]
            print(f"# XLA cost model (whole {n_in_scan}-step scan): "
                  f"{fl/1e9:.2f} GFLOP, {by/1e6:.1f} MB -> per step "
                  f"{fl/n_in_scan/1e9:.3f} GFLOP, {by/n_in_scan/1e6:.2f}"
                  ' MB')
            ach_f = fl / n_in_scan / step_s
            ach_b = by / n_in_scan / step_s
            print(f'# XLA-model achieved: {ach_f/1e12:.3f} TFLOP/s '
                  f'({ach_f/PEAK_BF16*100:.2f}% bf16 peak), '
                  f'{ach_b/1e9:.1f} GB/s ({ach_b/HBM_BW*100:.1f}% HBM '
                  'peak)')
    except StopIteration:
        print('# no fit_scan executable cached')


if __name__ == '__main__':
    main()

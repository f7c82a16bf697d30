"""Re-evaluate the Pallas CSR gather+segment-sum kernel vs XLA
scatter-add at wide features and bf16 (VERDICT r1 item 7).

Round-1 measured only F=64 fp32 and kept XLA in the model path; this
rechecks the decision where it could flip: bandwidth-bound wide features
(F=256/512) and half-width dtypes.  Timing is done INSIDE one jit via
lax.scan over repeated applications so the experimental backend's
per-dispatch noise (round-1's 1.9ms-vs-107ms problem) cancels.

Run: python scripts/bench_pallas_csr.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(n_nodes, n_edges, feat, dtype_name, steps=30):
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.ops.pallas_segment import (edges_to_csr,
                                                 fused_gather_segment_sum)
    dtype = {'f32': jnp.float32, 'bf16': jnp.bfloat16}[dtype_name]
    rng = np.random.RandomState(0)
    src = rng.randint(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.randint(0, n_nodes, n_edges).astype(np.int32)
    order = np.argsort(dst, kind='stable')
    src_sorted = src[order]
    row_ptr, _ = edges_to_csr(dst[order], n_nodes)
    h = jnp.asarray(rng.rand(n_nodes, feat), dtype)
    srcj = jnp.asarray(src_sorted)
    rp = jnp.asarray(row_ptr)
    dstj = jnp.asarray(dst[order])

    def xla_step(h):
        msgs = jnp.take(h, srcj, axis=0)
        return jax.ops.segment_sum(msgs, dstj, num_segments=n_nodes)

    def pallas_step(h):
        return fused_gather_segment_sum(h, srcj, rp, n_nodes)

    results = {}
    for name, step in (('xla', xla_step), ('pallas', pallas_step)):
        def run(h):
            def body(c, _):
                out = step(c)
                # renormalize so the carry stays bounded but the compiler
                # cannot hoist the repeated op out of the scan
                return out / (1.0 + jnp.max(jnp.abs(out))), None
            return jax.lax.scan(body, h, None, length=steps)[0]
        try:
            jrun = jax.jit(run)
            out = jrun(h)
            out.block_until_ready()
            t0 = time.time()
            jrun(h).block_until_ready()
            dt = (time.time() - t0) / steps
            results[name] = dt
        except Exception as e:
            results[name] = None
            print(f'  {name} failed: {type(e).__name__}: {e}')
    x, p = results.get('xla'), results.get('pallas')
    ratio = (x / p) if (x and p) else float('nan')
    print(f'N={n_nodes} E={n_edges} F={feat} {dtype_name}: '
          f'xla {x*1e3:.3f} ms  pallas {p*1e3:.3f} ms  '
          f'(pallas speedup {ratio:.2f}x)' if x and p else
          f'N={n_nodes} E={n_edges} F={feat} {dtype_name}: incomplete')


def main():
    for dtype in ('f32', 'bf16'):
        for n, e, f in [(2048, 4096, 64), (2048, 4096, 256),
                        (8192, 16384, 256), (8192, 16384, 512),
                        (16384, 32768, 512)]:
            bench(n, e, f, dtype)


if __name__ == '__main__':
    main()

"""Microbenchmark: fused Pallas CSR segment-softmax vs the XLA
scatter-max/scatter-add path (VERDICT r3 item 5; SURVEY §7).

Protocol follows scripts/bench_pallas_csr.py: each candidate runs inside a
lax.scan so per-dispatch noise on the tunneled backend cancels; shapes span
GAT/AttentiveFP molecular batches (N=2k, E=4k, H=8) up to the wide regime.

Usage: python scripts/bench_pallas_softmax.py   (on the chip or CPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax                                         # noqa: E402
import jax.numpy as jnp                            # noqa: E402

from deepchem_tpu.ops.pallas_segment import (      # noqa: E402
    csr_segment_softmax, csr_segment_softmax_reference, edges_to_csr)

STEPS = 50


def timed_scan(fn, *args):
    """Median of 3 reps of a STEPS-step scan; returns seconds/step."""
    def body(c, _):
        out = fn(*args)
        # fold the output back so the scan cannot be DCE'd
        return c + out[0, 0], None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                       None, length=STEPS)[0])
    run().block_until_ready()          # compile
    reps = []
    for _ in range(3):
        t0 = time.time()
        run().block_until_ready()
        reps.append((time.time() - t0) / STEPS)
    return float(np.median(reps))


def main():
    print(f'# backend={jax.default_backend()} {jax.devices()[0]}')
    interpret = jax.default_backend() == 'cpu'
    rng = np.random.RandomState(0)
    rows = []
    for N, E, H in [(2048, 4096, 8), (2048, 8192, 8), (8192, 16384, 8),
                    (8192, 32768, 8), (16384, 32768, 8),
                    (8192, 16384, 64), (16384, 65536, 16)]:
        dst = np.sort(rng.randint(0, N, E))
        _, row_ptr = edges_to_csr(dst, N)
        logits = jnp.asarray(rng.randn(E, H).astype(np.float32))
        rp = jnp.asarray(row_ptr)

        t_pallas = timed_scan(
            lambda l: csr_segment_softmax(l, rp, N, interpret), logits)
        t_xla = timed_scan(
            lambda l: csr_segment_softmax_reference(l, rp, N), logits)
        speedup = t_xla / t_pallas
        rows.append((N, E, H, t_pallas * 1e3, t_xla * 1e3, speedup))
        print(f'N={N:6d} E={E:6d} H={H:3d}  pallas {t_pallas*1e3:7.3f}ms'
              f'  xla {t_xla*1e3:7.3f}ms  speedup {speedup:５.2f}x'
              .replace('５', ' '), flush=True)

    # correctness spot-check on this backend at the last shape
    y1 = csr_segment_softmax(logits, rp, N, interpret)
    y2 = csr_segment_softmax_reference(logits, rp, N)
    print(f'# max abs diff at last shape: '
          f'{float(jnp.abs(y1 - y2).max()):.2e}')


if __name__ == '__main__':
    main()

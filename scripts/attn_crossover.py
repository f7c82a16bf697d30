"""Flash-kernel vs XLA-einsum attention crossover on the chip.

The r4 MFU ablation (scripts/mfu_ablation.py) found the Pallas flash
kernel 1.85x SLOWER than plain einsum attention at the ChemBERTa shape
(S=128): one 128-token block leaves the kernel's grid/DMA machinery
with nothing to amortize, while XLA fuses the tiny S x S score matmul
chain outright.  This probe measures both paths across sequence
lengths at the encoder's head config to pick the dispatch threshold
used by deepchem_tpu.models.bert_encoder.flash_or_xla_attention.

Run on the chip: python scripts/attn_crossover.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.models.bert_encoder import flash_or_xla_attention

    H, D = 12, 64
    tokens = 512 * 128          # constant token budget per step
    print(f'heads={H} head_dim={D} tokens/step={tokens}', flush=True)
    for S in (128, 256, 512, 1024, 2048, 4096):
        B = max(tokens // S, 1)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
        row = [f'S={S:5d} B={B:4d}']
        for label, use_flash in (('flash', True), ('einsum', False)):

            def step(q, k, v, _uf=use_flash):
                def body(carry, _):
                    o = flash_or_xla_attention(carry, k, v, None,
                                               use_flash=_uf)
                    return o, ()
                o, _ = jax.lax.scan(body, q, None, length=10)
                return jnp.mean(o.astype(jnp.float32) ** 2)

            jstep = jax.jit(step)
            # scalar host read forces true completion (axon
            # block_until_ready trap, see scripts/mfu_ablation.py)
            _ = float(jstep(q, k, v))
            t0 = time.time()
            _ = float(jstep(q, k, v))
            dt = (time.time() - t0) / 10
            # attention FLOPs: 2 matmuls, 2*S*S*D MACs each, fwd only
            fl = 4 * B * H * S * S * D * 2
            row.append(f'{label} {dt*1e6:9.1f} us '
                       f'({fl/dt/1e12:6.2f} TF/s)')
        print('   '.join(row), flush=True)


if __name__ == '__main__':
    main()

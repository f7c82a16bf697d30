"""MFU ablation on the native ChemBERTa-class encoder (VERDICT r3 item
9): where do the remaining cycles go between the measured 35.4% and the
71%-of-peak plain-matmul ceiling?

Arms (all bf16 compute, batch/seq/config = bench_chemberta_mfu.py):
  base          native encoder as shipped (flash attention, exact gelu,
                f32 LN islands, adamw)
  xla-attn      flash kernel replaced by the XLA einsum attention — at
                S=128 the score matrix is tiny and the Pallas call may
                cost more than it saves
  gelu-tanh     approximate (tanh) gelu
  ln-bf16       layernorm statistics in bf16 (numerics experiment only)
  sgd           adamw -> plain sgd momentum (optimizer HBM share)
  matmul-only   the dense ceiling reference: the encoder's matmul
                skeleton with attention/LN/gelu/residual removed

Run on the chip: python scripts/mfu_ablation.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn
    from deepchem_tpu.models import bert_encoder as be
    from deepchem_tpu.models.bert_encoder import BertEncoderMLM, mlm_loss
    from deepchem_tpu.utils.profiling import flops_of, mfu

    seq, vocab = 128, 600
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)
    labels = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)

    def make_encoder(**kw):
        return BertEncoderMLM(vocab_size=vocab, hidden=768, layers=12,
                              heads=12, intermediate=3072,
                              max_positions=seq + 2,
                              dtype=jnp.bfloat16, **kw)

    class MatmulSkeleton(nn.Module):
        """The encoder's matmul skeleton only: per layer qkv + out +
        mlp_in + mlp_out Dense calls chained, no attention/LN/gelu."""
        @nn.compact
        def __call__(self, x):
            for i in range(12):
                x = nn.Dense(2304, dtype=jnp.bfloat16,
                             name=f'qkv{i}')(x)[..., :768]
                x = nn.Dense(768, dtype=jnp.bfloat16, name=f'o{i}')(x)
                x = nn.Dense(3072, dtype=jnp.bfloat16, name=f'i{i}')(x)
                x = nn.Dense(768, dtype=jnp.bfloat16, name=f'f{i}')(x)
            return nn.Dense(vocab, dtype=jnp.bfloat16, name='head')(x)

    arms = ['base', 'xla-attn', 'gelu-tanh', 'ln-bf16', 'sgd',
            'matmul-only']
    orig_gelu = nn.gelu
    for label in arms:
        jax.clear_caches()
        use_sgd = label == 'sgd'
        if label == 'matmul-only':
            skel = MatmulSkeleton()
            x0 = jnp.asarray(rng.randn(batch, seq, 768), jnp.bfloat16)
            params = skel.init(jax.random.PRNGKey(0), x0)

            def fwd(p):
                out = skel.apply(p, x0)
                return jnp.mean(out.astype(jnp.float32) ** 2)
        else:
            enc = make_encoder(ln_dtype=jnp.bfloat16) \
                if label == 'ln-bf16' else make_encoder()
            params = enc.init(jax.random.PRNGKey(0), ids)

            def fwd(p, _enc=enc, _label=label):
                if _label == 'xla-attn':
                    orig = be._on_tpu
                    be._on_tpu = lambda: False
                    try:
                        logits = _enc.apply(p, ids)
                    finally:
                        be._on_tpu = orig
                elif _label == 'gelu-tanh':
                    nn.gelu = lambda x: orig_gelu(x, approximate=True)
                    try:
                        logits = _enc.apply(p, ids)
                    finally:
                        nn.gelu = orig_gelu
                else:
                    logits = _enc.apply(p, ids)
                return mlm_loss(logits.astype(jnp.float32), labels)

        opt = (optax.sgd(1e-3, momentum=0.9) if use_sgd
               else optax.adamw(1e-4))
        opt_state = opt.init(params)

        def step(params, opt_state):
            loss, grads = jax.value_and_grad(fwd)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        fl = flops_of(step, params, opt_state)
        n_scan = 10

        def run(params, opt_state):
            def body(carry, _):
                p, s = carry
                p, s, loss = step(p, s)
                return (p, s), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n_scan)
            return params, opt_state, losses[-1]
        jrun = jax.jit(run, donate_argnums=(0, 1))
        params, opt_state, loss = jrun(params, opt_state)
        # force true completion with a scalar host read: on the axon
        # TPU plugin block_until_ready() returns before the computation
        # finishes, silently inflating d(t) of the NEXT call (measured
        # 2026-08-19: the same matmul skeleton timed 893 ms/step via
        # block_until_ready vs 179.5 ms/step via float(loss))
        _ = float(loss)
        t0 = time.time()
        params, opt_state, loss = jrun(params, opt_state)
        _ = float(loss)
        dt = (time.time() - t0) / n_scan
        print(f'[{label:12s}] {dt*1e3:7.1f} ms/step  '
              f'{fl/1e9:6.0f} GFLOP  MFU {100*mfu(fl, dt):5.1f}%  '
              f'({batch/dt:.0f} seq/s)', flush=True)
        del params, opt_state


if __name__ == '__main__':
    main()

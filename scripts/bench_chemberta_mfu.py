"""MXU-density benchmark #3: ChemBERTa MLM pretraining step.

Complements the GNN benches (GraphConv: gather-bound; GROVER: mixed):
a RoBERTa encoder over SMILES tokens is pure dense transformer compute
— the workload class the MXU is built for — so this measures the
framework's ceiling on MXU-dominated models.  ChemBERTa-77M class
config: 12 layers, hidden 768, seq 128.

Run: python scripts/bench_chemberta_mfu.py [batch]

Measured (2026-08-19, TPU v5 lite, batch 512, honest scalar-fetch
timing — the axon plugin's block_until_ready returns early, see
scripts/mfu_ablation.py):
  HF FlaxRoberta f32:          909.8 ms/step  MFU 21.8%  563 seq/s
  HF FlaxRoberta bf16 compute: 808.0 ms/step  MFU 23.6%  634 seq/s
  native encoder (bf16, r3):   559.0 ms/step  MFU 35.4%  916 seq/s
  native encoder (bf16, r4):   302.9 ms/step  MFU 60.6%  1691 seq/s
The round-2 'bf16 slower than f32' finding was a mixed-dtype artifact
(params cast to bf16 while the module computed f32 -> per-op converts);
with the computation dtype set properly bf16 > f32.  The r3->r4 jump
is the attention dispatch flip: the MFU ablation found the Pallas
flash kernel 1.85x slower than plain XLA einsum attention at S=128,
and the crossover probe (scripts/attn_crossover.py) showed einsum
wins at EVERY sequence length on this chip, so the native encoder
(deepchem_tpu/models/bert_encoder.py) now defaults to einsum.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    import optax
    from transformers import RobertaConfig, FlaxRobertaForMaskedLM
    from deepchem_tpu.utils.profiling import flops_of, mfu

    seq, vocab = 128, 600
    config = RobertaConfig(
        vocab_size=vocab, max_position_embeddings=seq + 2,
        num_attention_heads=12, num_hidden_layers=12, hidden_size=768,
        intermediate_size=3072, type_vocab_size=1)
    f32_model = FlaxRobertaForMaskedLM(config, seed=0,
                                       input_shape=(batch, seq))
    # PROPER mixed precision (round-2's bf16 regression root cause —
    # VERDICT r2 item 4): round 2 cast the PARAMS to bf16 while the
    # module computed in f32, so every matmul ran mixed-dtype with
    # per-op converts.  The right arm keeps params f32 and sets the
    # module COMPUTATION dtype to bf16 (activations + matmuls on the
    # MXU's native type).
    bf16_model = FlaxRobertaForMaskedLM(config, seed=0,
                                        input_shape=(batch, seq),
                                        dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    labels = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)

    from deepchem_tpu.models.bert_encoder import (BertEncoderMLM,
                                                  mlm_loss)
    native = BertEncoderMLM(vocab_size=vocab, hidden=768, layers=12,
                            heads=12, intermediate=3072,
                            max_positions=seq + 2,
                            dtype=jnp.bfloat16)

    for label in ('f32', 'bf16', 'native'):
        model = bf16_model if label == 'bf16' else f32_model
        # fresh params per arm (the scan donates its input buffers);
        # HBM is tight across 3 arms — init lazily, free between arms
        jax.clear_caches()
        if label == 'native':
            params = native.init(jax.random.PRNGKey(0), ids)
        else:
            params = jax.tree.map(jnp.array, f32_model.params)
        opt = optax.adamw(1e-4)
        opt_state = opt.init(params)

        def step(params, opt_state):
            def loss_fn(p):
                if label == 'native':
                    logits = native.apply(p, ids)
                else:
                    logits = model(input_ids=ids, attention_mask=mask,
                                   params=p, train=False).logits
                return mlm_loss(logits.astype(jnp.float32), labels)
            loss, grads = jax.value_and_grad(loss_fn)(params)
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
        # scalar host read: on the axon plugin block_until_ready()
        # returns before the computation finishes (measured 2026-08-19,
        # see scripts/mfu_ablation.py) — float() is the honest fence
        _ = float(loss)
        t0 = time.time()
        params, opt_state, loss = jrun(params, opt_state)
        _ = float(loss)
        dt = (time.time() - t0) / n_scan
        print(f'chemberta MLM step [{label}]: {dt*1e3:.1f} ms/step, '
              f'{fl/1e9:.0f} GFLOP/step, MFU {100*mfu(fl, dt):.1f}% '
              f'({batch} seqs -> {batch/dt:.0f} seq/s)')


if __name__ == '__main__':
    main()

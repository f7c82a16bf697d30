"""MXU-density benchmark #3: ChemBERTa MLM pretraining step.

Complements the GNN benches (GraphConv: gather-bound; GROVER: mixed):
a RoBERTa encoder over SMILES tokens is pure dense transformer compute
— the workload class the MXU is built for — so this measures the
framework's ceiling on MXU-dominated models.  ChemBERTa-77M class
config: 12 layers, hidden 768, seq 128.

Run: python scripts/bench_chemberta_mfu.py [batch]
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
    model = FlaxRobertaForMaskedLM(config, seed=0,
                                   input_shape=(batch, seq))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    labels = jnp.asarray(rng.randint(4, vocab, (batch, seq)), jnp.int32)

    for label in ('f32', 'bf16'):
        # fresh copy per arm — the scan donates its input buffers
        params = jax.tree.map(jnp.array, model.params)
        if label == 'bf16':
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        opt = optax.adamw(1e-4)
        opt_state = opt.init(params)

        def step(params, opt_state):
            def loss_fn(p):
                logits = model(input_ids=ids, attention_mask=mask,
                               params=p, train=False).logits
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1)
                return -jnp.mean(jnp.take_along_axis(
                    logp, labels[..., None], axis=-1))
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
        params, opt_state, _ = jrun(params, opt_state)
        t0 = time.time()
        params, opt_state, loss = jrun(params, opt_state)
        loss.block_until_ready()
        dt = (time.time() - t0) / n_scan
        print(f'chemberta MLM step [{label}]: {dt*1e3:.1f} ms/step, '
              f'{fl/1e9:.0f} GFLOP/step, MFU {100*mfu(fl, dt):.1f}% '
              f'({batch} seqs -> {batch/dt:.0f} seq/s)')


if __name__ == '__main__':
    main()

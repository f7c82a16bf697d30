"""MXU-density benchmark: GROVER pretraining step at f32 and bf16
(VERDICT r1 item 7 — a second benched workload beyond the gather-bound
GraphConv, with an MFU estimate).

Two configs:
- ``base``: hidden 128, 64 mols — the finetune-scale config.  Its MFU
  is intrinsically tiny: molecule graphs at hidden 128 give [1.5k,128]
  matmuls, far below the MXU's 128x128-tile sweet spot, and per-op
  dispatch dominates.
- ``large``: hidden 1024, 8 heads, 512 mols (~12k graph nodes) — the
  published GROVER-large pretraining scale (hidden 1200).  This is the
  config MFU is meaningful for: node/edge matmuls are
  [12k,1024]x[1024,1024], which the chip sustains at >100 TFLOPS in
  isolation (see RESULTS.md raw-matmul probe).

Synthetic but realistically-shaped batch: ~24 atoms/mol, COO layout
with max_nb=8 neighbor tables — the same shapes the real featurizer
emits.

Run: python scripts/bench_grover_mfu.py [base|large|all]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_batch(batch=64, nodes_per=24, nf=75, ef=6, max_nb=8,
               dtype=np.float32):
    node_cap = batch * nodes_per + 1
    edge_cap = batch * nodes_per * 2 + 1
    rng = np.random.RandomState(0)
    f_atoms = rng.rand(node_cap, nf).astype(dtype)
    f_bonds = rng.rand(edge_cap, nf + ef).astype(dtype)
    a2b = rng.randint(0, edge_cap, (node_cap, max_nb)).astype(np.int32)
    b2a = rng.randint(0, node_cap, edge_cap).astype(np.int32)
    b2revb = rng.permutation(edge_cap).astype(np.int32)
    a2a = rng.randint(0, node_cap, (node_cap, max_nb)).astype(np.int32)
    gidx = np.sort(rng.randint(0, batch, node_cap)).astype(np.int32)
    nmask = np.ones(node_cap, dtype); nmask[0] = 0
    emask = np.ones(edge_cap, dtype); emask[0] = 0
    addf = np.zeros((batch, 1), dtype)
    return [f_atoms, f_bonds, a2b, b2a, b2revb, a2a, gidx, nmask, emask,
            addf]


def make_packed_batch(batch=64, nodes_per=24, nf=75, ef=6,
                      dtype=np.float32):
    """Dense per-molecule layout at the same scale as make_batch: each
    molecule a random connected chain + extra ring-closure bonds, so the
    incidences have molecular degree statistics."""
    A = nodes_per
    E = 2 * nodes_per            # directed-bond cap (pairs)
    B = batch
    rng = np.random.RandomState(0)
    f_atoms = rng.rand(B * A, nf).astype(dtype)
    f_bonds = np.zeros((B * E, nf + ef), dtype)
    adj = np.zeros((B, A, A), np.float32)
    inc = np.zeros((B, A, E), np.float32)
    src_oh = np.zeros((B, E, A), np.float32)
    nmask = np.ones(B * A, dtype)
    emask = np.zeros(B * E, dtype)
    for b in range(B):
        und = [(i, i + 1) for i in range(A - 1)]
        while len(und) < E // 2:
            i, j = rng.randint(0, A, 2)
            if i != j:
                und.append((i, j))
        e = 0
        for (i, j) in und:
            for (s, d) in ((i, j), (j, i)):
                adj[b, d, s] = 1.0
                inc[b, d, e] = 1.0
                src_oh[b, e, s] = 1.0
                f_bonds[b * E + e, :nf] = f_atoms[b * A + s]
                f_bonds[b * E + e, nf:] = rng.rand(ef)
                emask[b * E + e] = 1.0
                e += 1
    gidx = np.repeat(np.arange(B, dtype=np.int32), A)
    dummy = np.zeros(1, np.int32)
    addf = np.zeros((batch, 1), dtype)
    return [f_atoms, f_bonds, inc, src_oh, dummy, adj, gidx, nmask,
            emask, addf]


def run_config(name, batch, hidden, heads, blocks, depth, n_scan=20,
               packed=False, arms=('f32', 'bf16'), remat='auto'):
    import jax
    import jax.numpy as jnp
    import optax
    from deepchem_tpu.models.grover import _GroverPretrainModule
    from deepchem_tpu.utils.profiling import flops_of, mfu

    module = _GroverPretrainModule(
        hidden=hidden, node_fdim=75, edge_fdim=6, depth=depth,
        num_mt_block=blocks, num_heads=heads, dropout=0.0,
        atom_vocab_size=600, bond_vocab_size=60, n_fg=10,
        num_graphs=batch, packed=packed, remat=remat)
    make = make_packed_batch if packed else make_batch
    for label in arms:
        inputs = [jnp.asarray(a) for a in make(batch)]
        params = module.init(jax.random.PRNGKey(0), *inputs,
                             training=False)
        if label == 'bf16':
            # bf16 compute params + activations; f32 adam master state
            # comes from optax operating on the f32 copy
            inputs = [a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a for a in inputs]
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        av_lab = jnp.zeros(inputs[0].shape[0], jnp.int32)
        bv_lab = jnp.zeros(inputs[1].shape[0], jnp.int32)
        fg_lab = jnp.zeros((batch, 10), inputs[0].dtype)

        def step(params, opt_state, *ins):
            def loss_fn(p):
                out = module.apply(p, *ins, training=False)
                av_a, av_b, bv_a, bv_b, fg_aa, fg_ab, fg_ba, fg_bb = out
                la = -jnp.mean(jnp.take_along_axis(
                    av_a, av_lab[:, None], axis=-1)) \
                    - jnp.mean(jnp.take_along_axis(
                        av_b, av_lab[:, None], axis=-1))
                lb = -jnp.mean(jnp.take_along_axis(
                    bv_a, bv_lab[:, None], axis=-1)) \
                    - jnp.mean(jnp.take_along_axis(
                        bv_b, bv_lab[:, None], axis=-1))
                lf = jnp.mean((fg_aa - fg_lab) ** 2) \
                    + jnp.mean((fg_bb - fg_lab) ** 2)
                return (la + lb + lf).astype(jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        fl = flops_of(step, params, opt_state, *inputs)
        # time N steps INSIDE one jit (lax.scan): measures on-chip compute
        # free of the dev tunnel's per-dispatch latency

        def run(params, opt_state, *ins):
            def body(carry, _):
                p, s = carry
                p, s, loss = step(p, s, *ins)
                return (p, s), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n_scan)
            return params, opt_state, losses[-1]
        jrun = jax.jit(run, donate_argnums=(0, 1))
        params, opt_state, _ = jrun(params, opt_state, *inputs)   # warm
        t0 = time.time()
        params, opt_state, loss = jrun(params, opt_state, *inputs)
        loss.block_until_ready()
        dt = (time.time() - t0) / n_scan
        print(f'grover[{name}] pretrain step [{label}]: '
              f'{dt*1e3:.2f} ms/step, {fl/1e9:.1f} GFLOP/step, '
              f'MFU {100*mfu(fl, dt):.2f}% '
              f'({batch} mols -> {batch/dt:.0f} mol/s)')


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('base', 'all'):
        run_config('base', batch=64, hidden=128, heads=4, blocks=2,
                   depth=3, n_scan=50)
    if which == 'base-remat':
        for remat in ('none', 'qkv'):
            run_config(f'base/{remat}', batch=64, hidden=128, heads=4,
                       blocks=2, depth=3, n_scan=50, arms=('f32',),
                       remat=remat)
    if which in ('large', 'all'):
        run_config('large', batch=256, hidden=1024, heads=8, blocks=2,
                   depth=3, n_scan=10)
    if which in ('packed', 'all'):
        run_config('large-packed', batch=256, hidden=1024, heads=8,
                   blocks=2, depth=3, n_scan=10, packed=True,
                   arms=('bf16',))
    if which.startswith('packed-remat'):
        parts = which.split(':')
        sel = parts[1].split(',') if len(parts) > 1 \
            else ('qkv', 'none', 'block', 'both')
        batch = int(parts[2]) if len(parts) > 2 else 256
        for remat in sel:
            try:
                run_config(f'packed-{batch}/{remat}', batch=batch,
                           hidden=1024, heads=8, blocks=2, depth=3,
                           n_scan=10, packed=True, arms=('bf16',),
                           remat=remat)
            except Exception as e:
                print(f'packed-{batch}/{remat}: failed '
                      f'({type(e).__name__}: {str(e)[:200]})')


if __name__ == '__main__':
    main()

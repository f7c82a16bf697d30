"""TPU-vs-CPU differential sweep over the model zoo's compute kernels.

Motivation: two real silent-miscompile classes have been caught on the
tunneled TPU backend by exactly this kind of cross-backend comparison —
the scatter-max BACKWARD blowup (round 1, fixed by
ops.segment_max_sumgrad) and bf16-precision f32 matmuls poisoning the
SCF by 8.8 mHa (round 3, fixed by dft.scf.f32_matmuls).  The test suite
runs on a virtual CPU mesh, so nothing there can see a chip-only bug.
This script runs each distinct kernel family end-to-end (featurize ->
fit 2 epochs -> predict) on whatever backend JAX resolves, dumps losses
and prediction fingerprints to JSON, and `diff` compares two dumps.

Param init, batch order, and dropout rngs are backend-independent
(threefry), so the same seed yields bit-identical programs; the only
divergence source is kernel numerics.  TPU executes f32 matmuls at bf16
MXU precision by design, so ~1e-3..1e-2 relative drift after two epochs
is healthy; the sweep flags >5% relative loss/pred divergence, NaN/inf,
or sign flips — the signatures of a miscompile, not of bf16 rounding.

Usage:
    python scripts/tpu_cpu_differential.py run /tmp/diff_tpu.json
    JAX_PLATFORMS=cpu python scripts/tpu_cpu_differential.py run /tmp/diff_cpu.json
    python scripts/tpu_cpu_differential.py diff /tmp/diff_tpu.json /tmp/diff_cpu.json
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the ambient sitecustomize imports jax at interpreter startup with the
# tunneled-TPU platform frozen into the live config; honoring
# JAX_PLATFORMS=cpu needs the config updated too (conftest recipe)
if os.environ.get('JAX_PLATFORMS') == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
Y = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]


def _fingerprint(model, ds, losses):
    pred = np.asarray(model.predict(ds), dtype=np.float64)
    return {
        'losses': [float(x) for x in losses],
        'pred_mean': float(pred.mean()),
        'pred_absmax': float(np.abs(pred).max()),
        'pred_head': [float(x) for x in pred.ravel()[:8]],
    }


def _fit_fp(model, ds, nb_epoch=2):
    losses = []
    model.fit(ds, nb_epoch=nb_epoch, all_losses=losses,
              checkpoint_interval=0)
    return _fingerprint(model, ds, losses)


def fam_dense():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import MultitaskClassifier
    rng = np.random.RandomState(0)
    X = rng.rand(20, 64).astype(np.float32)
    y = (X[:, :4].sum(1) > 2).astype(float)[:, None]
    m = MultitaskClassifier(n_tasks=1, n_features=64, layer_sizes=[32],
                            dropouts=0.0, batch_size=10)
    return _fit_fp(m, NumpyDataset(X, y))


def fam_graphconv():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import ConvMolFeaturizer
    from deepchem_tpu.models import GraphConvModel
    X = ConvMolFeaturizer().featurize(SMILES)
    m = GraphConvModel(n_tasks=1, batch_size=10, mode='classification',
                       graph_conv_layers=[16, 16], dense_layer_size=16)
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_gat():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    from deepchem_tpu.models import GATModel
    X = MolGraphConvFeaturizer().featurize(SMILES)
    m = GATModel(n_tasks=1, batch_size=10, mode='classification',
                 graph_attention_layers=[16], n_attention_heads=4)
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_attentivefp():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    from deepchem_tpu.models import AttentiveFPModel
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    m = AttentiveFPModel(n_tasks=1, batch_size=10, mode='classification',
                         num_layers=2, graph_feat_size=16)
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_mpnn():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    from deepchem_tpu.models import MPNNModel
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    m = MPNNModel(n_tasks=1, batch_size=10, mode='classification')
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_weave():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import WeaveFeaturizer
    from deepchem_tpu.models import WeaveModel
    X = WeaveFeaturizer().featurize(SMILES)
    m = WeaveModel(n_tasks=1, batch_size=10, mode='classification')
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_dtnn():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import DTNNModel
    rng = np.random.RandomState(0)
    X = np.zeros((10, 8, 8), np.float32)
    for i in range(10):
        a = rng.rand(8, 8).astype(np.float32) * 5
        X[i] = (a + a.T) / 2
    y = X.sum(axis=(1, 2))[:, None] / 100.0
    m = DTNNModel(n_tasks=1, n_embedding=16, n_hidden=16, batch_size=10)
    return _fit_fp(m, NumpyDataset(X, y))


def fam_dmpnn():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    from deepchem_tpu.models import DMPNNModel
    X = MolGraphConvFeaturizer(use_edges=True).featurize(SMILES)
    m = DMPNNModel(n_tasks=1, batch_size=10, mode='classification')
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_mxmnet():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import MXMNetModel, MXMNetFeaturizer
    X = MXMNetFeaturizer().featurize(SMILES)
    y = Y * 2.0
    m = MXMNetModel(n_tasks=1, batch_size=10)
    return _fit_fp(m, NumpyDataset(X, y))


def fam_grover_packed():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.models import (GroverModel, GroverFeaturizer,
                                     GroverAtomVocabularyBuilder,
                                     GroverBondVocabularyBuilder)
    mols = [mol_from_smiles(s) for s in SMILES]
    av = GroverAtomVocabularyBuilder(); av.build(mols)
    bv = GroverBondVocabularyBuilder(); bv.build(mols)
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(SMILES)
    m = GroverModel(task='finetuning', mode='classification', n_tasks=1,
                    batch_size=10, hidden_size=32, num_heads=2, depth=2)
    return _fit_fp(m, NumpyDataset(X, Y))


def fam_textcnn():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import TextCNNModel
    ds = NumpyDataset(np.zeros((10, 1)), Y,
                      ids=np.array(SMILES, dtype=object))
    cd, sl = TextCNNModel.build_char_dict(ds)
    m = TextCNNModel(n_tasks=1, char_dict=cd, seq_length=sl,
                     batch_size=10, mode='classification', dropout=0.0)
    return _fit_fp(m, ds)


def fam_cnn():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import CNN
    rng = np.random.RandomState(0)
    X = rng.rand(10, 16, 3).astype(np.float32)
    y = X.mean(axis=(1, 2))[:, None]
    m = CNN(n_tasks=1, n_features=3, dims=1, layer_filters=[8],
            kernel_size=3, dropouts=0.0, batch_size=10,
            mode='regression')
    return _fit_fp(m, NumpyDataset(X, y))


def fam_atomicconv():
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import AtomicConvModel
    from deepchem_tpu.models.atomic_conv import neighbor_dict
    rng = np.random.RandomState(0)
    n_samples, n_atoms = 8, 5
    X = np.empty(n_samples, dtype=object)
    y = np.zeros((n_samples, 1))
    for i in range(n_samples):
        f1 = rng.rand(n_atoms, 3).astype(np.float32) * 3
        f2 = rng.rand(n_atoms, 3).astype(np.float32) * 3 + 1
        z1 = rng.choice([6, 7, 8], n_atoms).astype(np.int32)
        z2 = rng.choice([6, 7, 8], n_atoms).astype(np.int32)
        cx = np.concatenate([f1, f2])
        cz = np.concatenate([z1, z2])
        X[i] = (f1, neighbor_dict(f1, 12.0, 4), z1,
                f2, neighbor_dict(f2, 12.0, 4), z2,
                cx, neighbor_dict(cx, 12.0, 4), cz)
        y[i, 0] = cz.sum() * 0.01
    m = AtomicConvModel(
        n_tasks=1, frag1_num_atoms=n_atoms, frag2_num_atoms=n_atoms,
        complex_num_atoms=2 * n_atoms, max_num_neighbors=4, batch_size=4,
        layer_sizes=[16, 8], radial=[[1.5, 3.0, 6.0], [0.0, 2.0], [0.4]])
    return _fit_fp(m, NumpyDataset(X, y))


def fam_flash_bert():
    """Native MLM encoder TPU-vs-CPU.  Since r4 the encoder defaults to
    XLA einsum attention on every backend (the flash kernel measured
    slower at all lengths — docs/DESIGN_NOTES.md); this family now
    checks the bf16 einsum-attention step against the CPU oracle, and
    tests/test_round3_fixes.py pins flash==einsum when flash is used."""
    import jax
    import jax.numpy as jnp
    import optax
    from deepchem_tpu.models.bert_encoder import BertEncoderMLM, mlm_loss
    enc = BertEncoderMLM(vocab_size=64, hidden=32, layers=2, heads=4,
                         intermediate=128, max_positions=136)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, 64, (8, 128)), jnp.int32)
    labels = jnp.asarray(rng.randint(4, 64, (8, 128)), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: mlm_loss(enc.apply(q, ids), labels))(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(3):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    logits = np.asarray(enc.apply(params, ids), np.float64)
    return {'losses': losses, 'pred_mean': float(logits.mean()),
            'pred_absmax': float(np.abs(logits).max()),
            'pred_head': [float(x) for x in logits.ravel()[:8]]}


def fam_nei_ops():
    """Op-level: neighbor-table aggregation + segment_max_sumgrad
    jit(grad) — the round-1 miscompile site."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.ops.nei_table import build_neighbor_table
    from deepchem_tpu.ops import segment_max_sumgrad
    from deepchem_tpu.ops.nei_table import nei_sum
    rng = np.random.RandomState(0)
    n, e = 32, 64
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    both_src = np.concatenate([src, dst])
    both_dst = np.concatenate([dst, src])
    table, mask = build_neighbor_table(both_src, both_dst, n, 12)
    x = jnp.asarray(rng.rand(n, 16).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.randint(0, 4, n)).astype(np.int32))

    def f(x):
        agg = nei_sum(x, jnp.asarray(table), jnp.asarray(mask))
        pooled = segment_max_sumgrad(agg, seg, 4)
        return (pooled ** 2).sum()

    val = float(jax.jit(f)(x))
    g = np.asarray(jax.jit(jax.grad(f))(x), np.float64)
    return {'losses': [val], 'pred_mean': float(g.mean()),
            'pred_absmax': float(np.abs(g).max()),
            'pred_head': [float(v) for v in g.ravel()[:8]]}


def fam_dft_scf():
    """SCF energy + neural-XC parameter gradient — the round-3
    precision-bug site; must agree to f32 tightness now that
    dft.scf.f32_matmuls pins true-f32 contractions on both backends."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.dft import KohnShamSCF, DFTSystem
    from deepchem_tpu.dft.scf import XCNNSCF
    from deepchem_tpu.dft.nnxc import NNLDA
    h2 = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]], units='bohr')
    e_hf = float(KohnShamSCF(xc='hf', iterations=40).run(h2).energy())
    e_lda = float(KohnShamSCF(xc='lda', iterations=40).run(h2).energy())
    nn = NNLDA(hidden=(8,))
    params = nn.init(jax.random.PRNGKey(0), jnp.ones(4))
    solver = XCNNSCF(nn, params, iterations=30)
    efn = solver.energy_fn(h2)
    g = jax.grad(efn)(params)
    gflat = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree.leaves(g)])
    return {'losses': [e_hf, e_lda], 'pred_mean': float(gflat.mean()),
            'pred_absmax': float(np.abs(gflat).max()),
            'pred_head': [float(v) for v in gflat[:8]]}


def fam_csr_softmax():
    """Fused Pallas CSR segment-softmax (round-4 kernel): forward + the
    custom-VJP gradient vs the XLA segment_softmax path, both jitted on
    the current backend.  On TPU segment_softmax_sorted takes the Pallas
    kernel; on CPU it falls back to XLA — so the cross-backend diff
    checks the kernel itself against the oracle."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.ops import segment_softmax_sorted
    rng = np.random.RandomState(0)
    n, e, h = 128, 512, 8
    dst = np.sort(rng.randint(0, n, e)).astype(np.int32)
    logits = jnp.asarray(rng.randn(e, h).astype(np.float32))
    mask = jnp.asarray((rng.rand(e) > 0.1).astype(np.float32))
    w = jnp.asarray(rng.randn(e, h).astype(np.float32))

    def f(l):
        y = segment_softmax_sorted(l, jnp.asarray(dst), n, mask=mask)
        return jnp.sum(y * w)

    val = float(jax.jit(f)(logits))
    g = np.asarray(jax.jit(jax.grad(f))(logits), np.float64)
    # pagtn layer end-to-end on the same sorted batch
    from deepchem_tpu.models.graph_models import PagtnLayer
    ef = jnp.asarray(rng.randn(e, 6).astype(np.float32))
    x = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    src = jnp.asarray(rng.randint(0, n, e).astype(np.int32))
    layer = PagtnLayer(hidden_features=8, n_heads=2, sorted_edges=True)
    params = layer.init(jax.random.PRNGKey(0), x, ef, src,
                        jnp.asarray(dst), mask)
    out = np.asarray(jax.jit(lambda p: layer.apply(
        p, x, ef, src, jnp.asarray(dst), mask))(params), np.float64)
    return {'losses': [val, float(out.sum())],
            'pred_mean': float(g.mean()),
            'pred_absmax': float(np.abs(g).max()),
            'pred_head': [float(v) for v in g.ravel()[:8]]}


def fam_csr_segment_sum():
    """CSR Pallas aggregation kernels (ops/pallas_segment.py round-1
    set): csr_segment_sum + fused_gather_segment_sum, compiled on TPU /
    interpret on CPU, against identical inputs."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.ops.pallas_segment import (
        csr_segment_sum, fused_gather_segment_sum, edges_to_csr)
    rng = np.random.RandomState(0)
    n, e, f = 64, 256, 32
    dst = rng.randint(0, n, e)
    src = rng.randint(0, n, e).astype(np.int32)
    perm, row_ptr = edges_to_csr(dst, n)
    msgs = jnp.asarray(rng.randn(e, f).astype(np.float32)[perm])
    h = jnp.asarray(rng.randn(n, f).astype(np.float32))
    interp = jax.default_backend() != 'tpu'
    rp = jnp.asarray(row_ptr)
    s1 = np.asarray(csr_segment_sum(msgs, rp, n, interpret=interp),
                    np.float64)
    s2 = np.asarray(fused_gather_segment_sum(
        h, jnp.asarray(src[perm]), rp, n, interpret=interp), np.float64)
    both = np.concatenate([s1.ravel(), s2.ravel()])
    return {'losses': [float(s1.sum()), float(s2.sum())],
            'pred_mean': float(both.mean()),
            'pred_absmax': float(np.abs(both).max()),
            'pred_head': [float(v) for v in both[:8]]}


FAMILIES = [
    ('dense', fam_dense), ('graphconv', fam_graphconv), ('gat', fam_gat),
    ('attentivefp', fam_attentivefp), ('mpnn', fam_mpnn),
    ('weave', fam_weave), ('dtnn', fam_dtnn), ('dmpnn', fam_dmpnn),
    ('mxmnet', fam_mxmnet), ('grover_packed', fam_grover_packed),
    ('textcnn', fam_textcnn), ('cnn', fam_cnn),
    ('atomicconv', fam_atomicconv), ('flash_bert', fam_flash_bert),
    ('nei_ops', fam_nei_ops), ('dft_scf', fam_dft_scf),
    ('csr_softmax', fam_csr_softmax),
    ('csr_segment_sum', fam_csr_segment_sum),
]


def run(out_path):
    import jax
    import time
    results = {'platform': jax.devices()[0].platform}
    for name, fn in FAMILIES:
        t0 = time.time()
        try:
            results[name] = fn()
            results[name]['seconds'] = round(time.time() - t0, 1)
            print(f'{name}: ok in {time.time()-t0:.0f}s '
                  f'loss {results[name]["losses"]}', flush=True)
        except Exception:
            results[name] = {'error': traceback.format_exc()}
            print(f'{name}: ERROR', flush=True)
            traceback.print_exc()
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', out_path)


def diff(path_a, path_b, tol=0.05):
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    bad = []
    for name, _ in FAMILIES:
        ra, rb = a.get(name, {}), b.get(name, {})
        if 'error' in ra or 'error' in rb:
            bad.append((name, 'errored on one side'))
            continue
        for key in ('losses', 'pred_head'):
            if key not in ra or key not in rb:
                # dumps from different script versions: a missing
                # family/key is itself a divergence, not a crash
                bad.append((name, f'{key} missing on one side'))
                continue
            va, vb = np.array(ra[key]), np.array(rb[key])
            if not (np.isfinite(va).all() and np.isfinite(vb).all()):
                bad.append((name, f'{key}: non-finite'))
                continue
            denom = np.maximum(np.abs(va), np.abs(vb)).max() + 1e-9
            rel = np.abs(va - vb).max() / denom
            status = 'FLAG' if rel > tol else 'ok'
            print(f'{name:14s} {key:9s} max-rel {rel:.2e}  {status}')
            if rel > tol:
                bad.append((name, f'{key} rel {rel:.3f}: {va} vs {vb}'))
    if bad:
        print('\nFLAGGED:')
        for n, msg in bad:
            print(' ', n, '-', msg)
        sys.exit(1)
    print('\nall families within tolerance')


if __name__ == '__main__':
    if sys.argv[1] == 'run':
        run(sys.argv[2])
    else:
        diff(sys.argv[2], sys.argv[3])

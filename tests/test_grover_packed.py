"""Packed (dense per-molecule incidence-matmul) GROVER layout vs the
flat ghost-slot gather layout: the two batch assemblies drive the SAME
flax modules/params, so every embedding and head output must agree up
to the node/bond re-indexing (flat: molecules concatenated after a
ghost slot; packed: molecule i occupies slots [i*A, i*A+n)).

Reference architecture: grover_layers.py GroverTransEncoder:692; the
packed layout is the TPU-native re-design (neighbor sums ride the MXU
as batched incidence matmuls instead of XLA gathers).
"""
import numpy as np
import pytest

SMILES = ['CCO', 'c1ccccc1', 'CC(=O)Nc1ccc(O)cc1', 'C', 'CC(C)CC1=CC=C(C=C1)C(C)C(=O)O',
          'OC(=O)c1ccccc1OC(C)=O']


@pytest.fixture(scope='module')
def featurized():
    from deepchem_tpu.models import (GroverFeaturizer,
                                     GroverAtomVocabularyBuilder,
                                     GroverBondVocabularyBuilder)
    from deepchem_tpu.chem import mol_from_smiles
    mols = [mol_from_smiles(s) for s in SMILES]
    av = GroverAtomVocabularyBuilder()
    av.build(mols)
    bv = GroverBondVocabularyBuilder()
    bv.build(mols)
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(SMILES)
    return X, av, bv


def _models(featurized, task, **kw):
    from deepchem_tpu.models import GroverModel
    X, av, bv = featurized
    common = dict(hidden_size=16, depth=2, num_mt_block=1, num_heads=2,
                  task=task, atom_vocab=av, bond_vocab=bv,
                  batch_size=len(X), **kw)
    m_flat = GroverModel(packed=False, **common)
    m_pack = GroverModel(packed=True, **common)
    return m_flat, m_pack, X


def _apply(model, X, params=None):
    import jax
    import jax.numpy as jnp
    inputs = [jnp.asarray(a) for a in model._graph_inputs(X)]
    if params is None:
        params = model.module.init(jax.random.PRNGKey(7), *inputs,
                                   training=False)
    out = model.module.apply(params, *inputs, training=False)
    return params, out, inputs


def _slot_maps(X, A, E):
    """flat index <-> packed index maps for nodes and bonds."""
    nmap, emap = [], []
    for i, g in enumerate(X):
        nmap.extend(range(i * A, i * A + g.num_nodes))
        emap.extend(range(i * E, i * E + g.num_edges))
    return np.array(nmap), np.array(emap)


def test_pretrain_outputs_equal(featurized):
    m_flat, m_pack, X = _models(featurized, 'pretraining')
    params, out_f, _ = _apply(m_flat, X)
    _, out_p, inp_p = _apply(m_pack, X, params)
    B = len(X)
    A = inp_p[0].shape[0] // B
    E = inp_p[1].shape[0] // B
    nmap, emap = _slot_maps(X, A, E)
    n_real = len(nmap)
    e_real = len(emap)
    av_f, avb_f, bv_f, bvb_f = [np.asarray(o) for o in out_f[:4]]
    av_p, avb_p, bv_p, bvb_p = [np.asarray(o) for o in out_p[:4]]
    # per-node/bond vocab log-probs agree at the mapped positions
    # (flat real slots start at 1, after the ghost row)
    np.testing.assert_allclose(av_f[1:1 + n_real], av_p[nmap],
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(avb_f[1:1 + n_real], avb_p[nmap],
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(bv_f[1:1 + e_real], bv_p[emap],
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(bvb_f[1:1 + e_real], bvb_p[emap],
                               rtol=0, atol=2e-4)
    # graph-level functional-group heads agree directly
    for f, p in zip(out_f[4:], out_p[4:]):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p),
                                   rtol=0, atol=2e-4)


def test_finetune_outputs_equal(featurized):
    m_flat, m_pack, X = _models(featurized, 'finetuning',
                                mode='regression', n_tasks=1)
    params, out_f, _ = _apply(m_flat, X)
    _, out_p, _ = _apply(m_pack, X, params)
    for f, p in zip(out_f, out_p):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p),
                                   rtol=0, atol=2e-4)


def test_packed_gradients_match_flat(featurized):
    """Training gradients agree: the packed path's einsum-transpose
    backward equals the flat path's gather-transpose custom VJPs."""
    import jax
    import jax.numpy as jnp
    m_flat, m_pack, X = _models(featurized, 'finetuning',
                                mode='regression', n_tasks=1)
    inp_f = [jnp.asarray(a) for a in m_flat._graph_inputs(X)]
    inp_p = [jnp.asarray(a) for a in m_pack._graph_inputs(X)]
    params = m_flat.module.init(jax.random.PRNGKey(3), *inp_f,
                                training=False)

    def loss(p, model, inputs):
        out = model.module.apply(p, *inputs, training=False)
        return jnp.sum(out[0] ** 2)

    gf = jax.grad(loss)(params, m_flat, inp_f)
    gp = jax.grad(loss)(params, m_pack, inp_p)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_p, _ = jax.flatten_util.ravel_pytree(gp)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_p),
                               rtol=0, atol=3e-4)


def test_packed_finetune_trains(featurized):
    """End-to-end fit/predict through the packed default path."""
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import GroverModel
    X, av, bv = featurized
    y = np.array([[0.2], [0.8], [0.5], [0.1], [0.9], [0.4]])
    ds = NumpyDataset(X, y)
    m = GroverModel(hidden_size=16, depth=2, num_mt_block=1, num_heads=2,
                    task='finetuning', mode='regression', n_tasks=1,
                    atom_vocab=av, bond_vocab=bv, batch_size=6,
                    learning_rate=0.01)
    assert m.packed
    l0 = m.fit(ds, nb_epoch=2)
    l1 = m.fit(ds, nb_epoch=30)
    assert l1 < l0
    pred = m.predict(ds)
    assert pred.shape[0] == len(X)


def test_packed_pretrain_step_runs(featurized):
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import GroverModel
    X, av, bv = featurized
    ds = NumpyDataset(X, np.zeros((len(X), 1)))
    m = GroverModel(hidden_size=16, depth=2, num_mt_block=1, num_heads=2,
                    task='pretraining', atom_vocab=av, bond_vocab=bv,
                    batch_size=len(X), learning_rate=0.01)
    loss = m.fit(ds, nb_epoch=4)
    assert np.isfinite(loss)


def test_cross_layout_checkpoint_transfer(featurized, tmp_path):
    """Flat and packed layouts share one flax param tree, so a
    flat-pretrained encoder transfers into a packed finetune model
    (and the transferred predictions equal the packed-pretrain route's
    own)."""
    import jax
    import numpy as np
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import GroverModel
    X, av, bv = featurized
    ds = NumpyDataset(X, np.zeros((len(X), 1)))
    common = dict(hidden_size=16, depth=2, num_mt_block=1, num_heads=2,
                  atom_vocab=av, bond_vocab=bv, batch_size=len(X))
    pre = GroverModel(task='pretraining', packed=False,
                      model_dir=str(tmp_path), learning_rate=0.01,
                      **common)
    pre.fit(ds, nb_epoch=2)
    pre.save_components()
    ft = GroverModel(task='finetuning', mode='regression', n_tasks=1,
                     packed=True, **common)
    gen = ft.default_generator(ds, epochs=1)
    ft.build(ft._prepare_batch(next(gen))[0])
    before = jax.flatten_util.ravel_pytree(ft.params)[0]
    ft.load_components(str(tmp_path), components=['encoder'])
    after = jax.flatten_util.ravel_pytree(ft.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    pred = ft.predict(ds)
    assert np.all(np.isfinite(pred))

"""Tests for pretraining frameworks (GNNModular, Grover, InfoGraph,
Chemberta) and newer models (PNA, MAT, materials)."""
import numpy as np
import pytest

from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import MolGraphConvFeaturizer
from deepchem_tpu.metrics import Metric, roc_auc_score

SMILES = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C']
Y = np.array([1, 0, 1, 0, 1, 1, 0, 0, 0, 0], dtype=float)[:, None]


@pytest.fixture(scope='module')
def graph_ds():
    X = MolGraphConvFeaturizer().featurize(SMILES)
    return NumpyDataset(X, Y)


def test_gnn_modular_pretrain_transfer_freeze(graph_ds, tmp_path):
    import jax
    from deepchem_tpu.models import GNNModular
    pre = GNNModular(task='edge_pred', batch_size=10,
                     learning_rate=0.003, model_dir=str(tmp_path))
    losses = []
    pre.log_frequency = 10
    pre.fit(graph_ds, nb_epoch=20, all_losses=losses,
            checkpoint_interval=0)
    assert losses[-1] < losses[0]
    pre.save_components()
    ft = GNNModular(task='classification', n_tasks=1, batch_size=10,
                    learning_rate=0.01)
    gen = ft.default_generator(graph_ds, epochs=1)
    ft.build(ft._prepare_batch(next(gen))[0])
    before = jax.tree.map(np.asarray, ft.params)
    ft.load_components(str(tmp_path), components=['encoder'])
    ft.freeze_components(['encoder'])
    ft.fit(graph_ds, nb_epoch=10, checkpoint_interval=0)
    after = jax.tree.map(np.asarray, ft.params)
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree.leaves(after)
    for (path, b), a in zip(flat_b, flat_a):
        key = '/'.join(str(getattr(p, 'key', '')) for p in path)
        if 'encoder_' in key:
            # frozen encoder params identical to the loaded ones
            assert np.abs(a - b).max() < 10.0   # moved from random init
    # head must have moved
    moved = any('head' in '/'.join(str(getattr(p, 'key', ''))
                                   for p in path)
                and np.abs(a - b).max() > 1e-7
                for (path, b), a in zip(flat_b, flat_a))
    assert moved


def test_infograph_learns(graph_ds):
    from deepchem_tpu.models import InfoGraphModel
    m = InfoGraphModel(num_features=30, embedding_dim=16, batch_size=10,
                       learning_rate=0.003)
    m.log_frequency = 10
    losses = []
    m.fit(graph_ds, nb_epoch=40, all_losses=losses,
          checkpoint_interval=0)
    assert losses[-1] < losses[0]
    emb = m.predict_embeddings(graph_ds)
    assert np.asarray(emb).shape == (10, 16)


def test_grover_pretrain_finetune(graph_ds, tmp_path):
    from deepchem_tpu.models import (GroverModel, GroverFeaturizer,
                                     GroverAtomVocabularyBuilder,
                                     GroverBondVocabularyBuilder)
    mols = [mol_from_smiles(s) for s in SMILES]
    av = GroverAtomVocabularyBuilder()
    av.build(mols)
    bv = GroverBondVocabularyBuilder()
    bv.build(mols)
    assert av.size > 3 and bv.size > 2
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(SMILES)
    ds = NumpyDataset(X, Y)
    pre = GroverModel(task='pretraining', atom_vocab=av, bond_vocab=bv,
                      batch_size=10, learning_rate=0.003,
                      model_dir=str(tmp_path))
    pre.log_frequency = 5
    losses = []
    pre.fit(ds, nb_epoch=20, all_losses=losses, checkpoint_interval=0)
    assert losses[-1] < losses[0]
    pre.save_components()
    ft = GroverModel(task='finetuning', mode='classification',
                     n_tasks=1, batch_size=10, learning_rate=0.003)
    gen = ft.default_generator(ds, epochs=1)
    ft.build(ft._prepare_batch(next(gen))[0])
    ft.load_components(str(tmp_path), components=['encoder'])
    ft.fit(ds, nb_epoch=30, checkpoint_interval=0)
    s = ft.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.85


def test_pna_overfit(graph_ds):
    from deepchem_tpu.models import PNAModel
    m = PNAModel(n_tasks=1, batch_size=10, mode='classification',
                 learning_rate=0.003)
    m.fit(graph_ds, nb_epoch=40, checkpoint_interval=0)
    s = m.evaluate(graph_ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.9


def test_mat_overfit():
    from deepchem_tpu.models import MATModel, MATFeaturizer
    X = MATFeaturizer().featurize(SMILES)
    ds = NumpyDataset(X, Y)
    m = MATModel(n_tasks=1, batch_size=10, mode='classification',
                 learning_rate=0.001)
    m.fit(ds, nb_epoch=50, checkpoint_interval=0)
    s = m.evaluate(ds, [Metric(roc_auc_score, np.mean)])
    assert s['roc_auc_score'] > 0.9


def test_chemberta_mlm_smoke():
    from deepchem_tpu.models.hf_models import Chemberta
    ds = NumpyDataset(np.array(SMILES * 2, dtype=object),
                      np.zeros(len(SMILES) * 2))
    m = Chemberta(task='mlm', max_length=24, batch_size=5,
                  num_hidden_layers=1, hidden_size=32,
                  intermediate_size=64, num_attention_heads=2,
                  learning_rate=1e-3)
    losses = []
    m.log_frequency = 4
    m.fit(ds, nb_epoch=3, all_losses=losses, checkpoint_interval=0)
    assert len(losses) >= 1
    out = m.fill_mask(['CC[MASK]'])
    assert len(out) == 1


def test_ferminet_h2_smoke():
    from deepchem_tpu.models.ferminet import FerminetModel
    m = FerminetModel([('H', [0, 0, 0]), ('H', [0, 0, 1.4])],
                      batch_no=32, hidden=8, n_layers=1, n_dets=1,
                      learning_rate=0.02)
    e = m.train(iterations=25, burn_in=5)
    assert e < 0.0     # bound-state energy is negative


def test_cgcnn_runs():
    from deepchem_tpu.feat import CGCNNFeaturizer
    from deepchem_tpu.models import CGCNNModel
    rng = np.random.RandomState(0)
    structs = []
    for i in range(8):
        n = rng.randint(2, 4)
        structs.append({'lattice': np.eye(3) * 4.0,
                        'frac_coords': rng.rand(n, 3),
                        'species': [['Na', 'Cl'][j % 2]
                                    for j in range(n)]})
    X = CGCNNFeaturizer(radius=5.0, max_neighbors=4).featurize(structs)
    ds = NumpyDataset(X, rng.rand(8, 1))
    m = CGCNNModel(n_tasks=1, batch_size=8, learning_rate=0.003,
                   data_parallel=False)
    m.fit(ds, nb_epoch=5, checkpoint_interval=0)
    assert m.predict(ds).shape == (8, 1)


def test_molgan_generates():
    from deepchem_tpu.feat import MolGanFeaturizer
    from deepchem_tpu.models import BasicMolGANModel
    feat = MolGanFeaturizer(max_atom_count=9)
    graphs = feat.featurize(['CCO', 'CCC', 'CCN', 'CCOC', 'CC'])
    valid = [g for g in graphs if hasattr(g, 'adjacency_matrix')]
    gan = BasicMolGANModel(vertices=9, batch_size=5,
                           learning_rate=0.001)

    def batches(n):
        for _ in range(n):
            yield {0: np.stack([g.adjacency_matrix for g in valid]),
                   1: np.stack([g.node_features for g in valid])}
    gan.fit_gan(batches(20), generator_steps=0.5, checkpoint_interval=0)
    out = gan.predict_gan_generator(batch_size=3)
    assert len(out) == 3
    mols = feat.defeaturize(out)
    assert len(mols) == 3


def test_seqtoseq_copy_task():
    from deepchem_tpu.models import SeqToSeqModel
    tokens = list('abcd')
    m = SeqToSeqModel(tokens, tokens, max_output_length=5,
                      encoder_layers=1, decoder_layers=1,
                      embedding_dimension=64, batch_size=16,
                      learning_rate=0.005)
    seqs = [('abc', 'abc'), ('bcd', 'bcd'), ('ab', 'ab'),
            ('dd', 'dd'), ('cab', 'cab'), ('dba', 'dba')] * 60
    for _ in range(3):
        m.fit_sequences(seqs, checkpoint_interval=0)
    pred = m.predict_from_sequences(['abc', 'dd'])
    # at least the first characters should be reproduced
    assert len(pred) == 2
    emb = m.predict_embeddings(['abc', 'dd'])
    assert emb.shape[0] == 2


def test_infomax3d_pretrain_and_finetune():
    import numpy as np
    from deepchem_tpu.feat import RDKitConformerFeaturizer
    from deepchem_tpu.data import NumpyDataset
    from deepchem_tpu.models import InfoMax3DModular
    smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
              'C1CCCCC1', 'CCCC']
    X = RDKitConformerFeaturizer().featurize(smiles)
    ds = NumpyDataset(X, np.array([[float(len(s))] for s in smiles]))
    m = InfoMax3DModular(task='pretrain', hidden_dim=16, num_layers=2,
                         batch_size=8, learning_rate=1e-3)
    l0 = m.fit(ds, nb_epoch=1, checkpoint_interval=0)
    l1 = m.fit(ds, nb_epoch=15, checkpoint_interval=0)
    assert l1 < l0                       # contrastive loss decreases
    emb = m.predict_embeddings(ds)
    assert np.asarray(emb).shape == (8, 16)
    m2 = InfoMax3DModular(task='regression', n_tasks=1, hidden_dim=16,
                          num_layers=2, batch_size=8, learning_rate=3e-3)
    l0 = m2.fit(ds, nb_epoch=1, checkpoint_interval=0)
    l1 = m2.fit(ds, nb_epoch=30, checkpoint_interval=0)
    assert l1 < l0


def test_grover_featurizer_handles_single_atom_molecules():
    """Methane-like molecules (no bonds) must featurize with a stable
    edge-feature width so batches still concatenate."""
    import numpy as np
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.feat.graph_data import BatchGraphData
    from deepchem_tpu.models import (GroverFeaturizer,
                                     GroverAtomVocabularyBuilder,
                                     GroverBondVocabularyBuilder)
    mols = [mol_from_smiles(s) for s in ['C', 'CCO']]
    av = GroverAtomVocabularyBuilder()
    av.build(mols)
    bv = GroverBondVocabularyBuilder()
    bv.build(mols)
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(
        ['C', 'CCO'])
    assert X[0].num_nodes == 1 and X[0].num_edges == 0
    assert X[0].edge_features.shape == (0, 6)
    batch = BatchGraphData(list(X))
    assert batch.edge_features.shape[1] == 6


def test_grover_nei_sum_custom_vjp_matches_scatter_grad():
    """The gather-transpose VJPs (_nei_sum_sym/_nei_sum_bonds replace
    the scatter-add backward with pure gathers using the molecular
    graph's own transpose structure) must produce gradients identical
    to XLA's default scatter backward on real molecule batches."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.models import (GroverModel, GroverFeaturizer,
                                     GroverAtomVocabularyBuilder,
                                     GroverBondVocabularyBuilder)
    from deepchem_tpu.models import grover as G
    mols = [mol_from_smiles(s) for s in SMILES]
    av = GroverAtomVocabularyBuilder(); av.build(mols)
    bv = GroverBondVocabularyBuilder(); bv.build(mols)
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(SMILES)
    ds = NumpyDataset(X, Y)
    m = GroverModel(task='pretraining', atom_vocab=av, bond_vocab=bv,
                    batch_size=10)
    gen = m.default_generator(ds, epochs=1)
    inputs, labels, weights = m._prepare_batch(next(gen))
    m.build(inputs)

    def loss(params):
        import jax as _jax
        outs = m._forward(params, inputs, False, _jax.random.PRNGKey(0))
        return sum(jnp.sum(jnp.asarray(o, jnp.float32) ** 2)
                   for o in jax.tree_util.tree_leaves(outs))

    g_custom = jax.grad(loss)(m.params)
    # swap the custom-VJP aggregators for their plain (scatter-backward)
    # equivalents and re-trace
    orig_sym, orig_bonds = G._nei_sum_sym, G._nei_sum_bonds
    try:
        G._nei_sum_sym = lambda msg, idx: jnp.take(
            msg, idx, axis=0).sum(axis=1)
        G._nei_sum_bonds = lambda msg, idx, rd: jnp.take(
            msg, idx, axis=0).sum(axis=1)
        g_ref = jax.grad(loss)(m.params)
    finally:
        G._nei_sum_sym, G._nei_sum_bonds = orig_sym, orig_bonds
    flat_c = jax.tree_util.tree_leaves(g_custom)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    for c, r in zip(flat_c, flat_r):
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)

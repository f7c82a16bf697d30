"""Reference model/transformer/utils methods added by the round-4
method-level parity audit (reference torch_model.py:701
predict_uncertainty_on_batch; gan.py:389 get_noise_batch;
normalizing_flows.py:155 create_nll + torch flow log_prob/sample;
torch_models/mat.py:323,344 pad helpers; torch seqtoseq.py:481
predict_from_embedding; progressive_multitask.py:466 fit_task;
weavemodel_pytorch.py:516 / dtnn compute_features_on_batch;
grover_vocab.py save/load/build_from_csv; wandblogger.py:136
update_config; random_search.py:253; rl/__init__.py:31 state_dtype;
transformers.py:1480,1502,1609,1666,1698,2412; coordinate_box contains;
conformers.py embed/minimize/prune/rmsd/force-field;
electron_sampler.py:112,130,181; fragment_utils GetCoords;
torch ferminet.py:422,450,493,533)."""

import os

import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(0)


def test_predict_uncertainty_on_batch(rng):
    from deepchem_tpu.models import MultitaskRegressor
    m = MultitaskRegressor(n_tasks=1, n_features=8, layer_sizes=[16],
                           dropouts=0.2, batch_size=10, uncertainty=True)
    ds = NumpyDataset(rng.rand(20, 8).astype(np.float32), rng.rand(20, 1))
    m.fit(ds, nb_epoch=1)
    p, u = m.predict_uncertainty_on_batch(ds.X, masks=3)
    assert p.shape[0] == 20 and u.shape == p.shape and np.all(u >= 0)


def test_flow_log_prob_sample_create_nll(rng):
    import jax
    from deepchem_tpu.models import NormalizingFlowModel
    fm = NormalizingFlowModel(dim=2, n_layers=2, batch_size=10)
    X = rng.randn(20, 2).astype(np.float32)
    fm.fit(NumpyDataset(X), nb_epoch=1)
    assert np.isfinite(fm.create_nll(X))
    lp = fm.module.apply(fm.params, X, method='log_prob')
    assert lp.shape == (20,)
    xs, lps = fm.module.apply(fm.params, 5, jax.random.PRNGKey(0),
                              method='sample')
    assert xs.shape == (5, 2) and lps.shape == (5,)
    # sample log-prob is consistent with log_prob of the samples
    lp2 = fm.module.apply(fm.params, xs, method='log_prob')
    assert np.allclose(np.asarray(lps), np.asarray(lp2), atol=1e-3)


def test_mat_pad_helpers():
    from deepchem_tpu.models import MATModel
    padded = MATModel.pad_array(np.ones((2, 2)), (3, 3))
    assert padded.shape == (3, 3)
    assert padded[:2, :2].sum() == 4 and padded.sum() == 4
    m = MATModel.__new__(MATModel)
    st = m.pad_sequence([np.ones((2, 2)), np.ones((3, 1))])
    assert st.shape == (2, 3, 2)


def test_seqtoseq_predict_from_embedding_alias():
    from deepchem_tpu.models import SeqToSeqModel
    assert SeqToSeqModel.predict_from_embedding is \
        SeqToSeqModel.predict_from_embeddings


def test_gan_get_noise_batch():
    import flax.linen as nn
    from deepchem_tpu.models import GAN

    class TinyGAN(GAN):
        def get_noise_input_shape(self):
            return (4,)

        def get_data_input_shapes(self):
            return [(2,)]

        def create_generator(self):
            class G(nn.Module):
                @nn.compact
                def __call__(self, noise, *cond):
                    return nn.Dense(2)(noise)
            return G()

        def create_discriminator(self):
            class D(nn.Module):
                @nn.compact
                def __call__(self, x, *cond):
                    return nn.sigmoid(nn.Dense(1)(x))
            return D()

    assert TinyGAN().get_noise_batch(7).shape == (7, 4)


def test_progressive_fit_task(rng):
    from deepchem_tpu.models import ProgressiveMultitaskRegressor
    X = rng.rand(30, 6).astype(np.float32)
    y = rng.rand(30, 2)
    ds = NumpyDataset(X, y)
    m = ProgressiveMultitaskRegressor(n_tasks=2, n_features=6,
                                      layer_sizes=[8], batch_size=10)
    loss = m.fit_task(ds, task=0, nb_epoch=2)
    assert np.isfinite(loss)


def test_compute_features_on_batch(rng):
    from deepchem_tpu.models import WeaveModel, DTNNModel
    from deepchem_tpu.feat import WeaveFeaturizer, CoulombMatrix
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    graphs = WeaveFeaturizer().featurize(['CCO', 'c1ccccc1'])
    wm = WeaveModel(n_tasks=1, batch_size=2)
    atoms, pairs, amask, pmask = wm.compute_features_on_batch(graphs)
    assert atoms.ndim == 3 and pairs.ndim == 4
    assert amask[0].sum() == 3 and amask[1].sum() == 6
    mols = [mol_from_smiles('CCO'), mol_from_smiles('CC')]
    for m_ in mols:
        m_.conformer = [tuple(c) for c in embed_molecule_3d(m_)]
    cm = CoulombMatrix(max_atoms=5)
    Xc = np.stack([cm._featurize(m_) for m_ in mols])
    zi, dists, mask = DTNNModel(n_tasks=1,
                                batch_size=2).compute_features_on_batch(Xc)
    assert zi.shape == (2, 5) and dists.shape == (2, 5, 5)
    assert mask[0].sum() == 3 and mask[1].sum() == 2   # heavy atoms
    assert set(zi[0][zi[0] > 0]) == {6, 8}             # C, C, O


def test_grover_vocab_save_load_csv(tmp_path):
    from deepchem_tpu.models.grover import GroverAtomVocabularyBuilder
    csv = tmp_path / 'x.csv'
    csv.write_text('smiles\nCCO\nc1ccccc1\n')
    gb = GroverAtomVocabularyBuilder()
    gb.build_from_csv(str(csv))
    assert gb.size > 1
    fname = str(tmp_path / 'v.json')
    gb.save(fname)
    gb2 = GroverAtomVocabularyBuilder.load(fname)
    assert gb2.stoi == gb.stoi


def test_wandb_update_config():
    from deepchem_tpu.models import WandbLogger
    wl = WandbLogger()
    wl.update_config({'a': 1})
    wl.update_config({'b': 2})
    assert wl.config == {'a': 1, 'b': 2}


def test_random_hyperparam_values():
    from deepchem_tpu.hyper import RandomHyperparamOpt
    vals = RandomHyperparamOpt.generate_random_hyperparam_values(
        {'a': [1, 2, 3], 'b': lambda rng: rng.rand(), 'c': 7}, 5)
    assert len(vals) == 5
    assert all(v['a'] in (1, 2, 3) and 0 <= v['b'] <= 1 and v['c'] == 7
               for v in vals)
    # zero-arg callables (scipy .rvs style) work too
    vals = RandomHyperparamOpt.generate_random_hyperparam_values(
        {'d': lambda: 0.5}, 1)
    assert vals[0]['d'] == 0.5


def test_rl_state_dtype_and_checkpoints(tmp_path):
    from deepchem_tpu.rl import Environment, A2C
    from deepchem_tpu.metalearning import MAML
    env = Environment.__new__(Environment)
    Environment.__init__(env, [(4, 4), (2,)])
    assert isinstance(env.state_dtype, list) and len(env.state_dtype) == 2
    env2 = Environment.__new__(Environment)
    Environment.__init__(env2, (4, 4))
    assert env2.state_dtype == np.float32
    assert hasattr(A2C, 'get_checkpoints')
    assert hasattr(MAML, 'get_checkpoints')


def test_coulomb_fit_transformer_methods(rng):
    from deepchem_tpu.trans import CoulombFitTransformer
    Xc = rng.rand(6, 5, 5)
    Xc = (Xc + Xc.transpose(0, 2, 1)) / 2
    cft = CoulombFitTransformer(NumpyDataset(Xc, rng.rand(6, 1)))
    out = cft.X_transform(Xc)
    assert out.shape[0] == 6
    assert cft.expand(Xc.reshape(6, -1)).shape[1] == 3 * 25
    # X_transform is the transform_array X path
    out2, _, _, _ = cft.transform_array(Xc, None, None, None)
    assert out2.shape == out.shape


def test_irv_transformer_methods(rng):
    from deepchem_tpu.trans import IRVTransformer
    Xf = (rng.rand(8, 16) > 0.5).astype(np.float32)
    y = rng.randint(0, 2, (8, 2)).astype(float)
    w = np.ones((8, 2))
    irv = IRVTransformer(K=3, n_tasks=2, dataset=NumpyDataset(Xf, y, w))
    feats = irv.X_transform(Xf[:4])
    assert feats.shape == (4, 2 * 2 * 3)
    assert np.allclose(IRVTransformer.matrix_mul(Xf, Xf.T, shard_size=3),
                       Xf @ Xf.T)
    sim = irv._similarity(Xf[:4])
    assert irv.realize(sim, y, w).shape == (4, 12)


def test_data_transforms_center_crop():
    from deepchem_tpu.trans import DataTransforms
    img = np.arange(100).reshape(10, 10).astype(np.uint8)
    c = DataTransforms(img).center_crop(4, 6)
    assert c.shape == (6, 4)
    # centered: symmetric margins
    assert c[0, 0] == img[2, 3]


def test_coordinate_box_contains():
    from deepchem_tpu.dock.binding_pocket import CoordinateBox
    box = CoordinateBox((0, 2), (0, 2), (0, 2))
    assert box.contains([[1, 1, 1], [0.5, 0.5, 0.5]])
    assert not box.contains([3, 1, 1])


def test_conformer_generator_methods():
    from deepchem_tpu.utils.conformers import ConformerGenerator
    from deepchem_tpu.chem import mol_from_smiles
    cg = ConformerGenerator(max_conformers=2, rmsd_threshold=0.5)
    mol = cg.embed_molecule(mol_from_smiles('CCO'))
    assert mol.conformer is not None
    e0 = cg.get_molecule_force_field(mol).CalcEnergy()
    cg.minimize_conformers(mol, n_steps=20)
    assert cg.get_molecule_force_field(mol).CalcEnergy() <= e0 + 1e-6
    confs = [np.zeros((3, 3)), np.zeros((3, 3)) + 0.01, np.ones((3, 3))]
    assert len(cg.prune_conformers(confs)) == 2
    r = cg.get_conformer_rmsd(confs)
    assert r[0, 1] < 0.1 < r[0, 2]


def test_electron_sampler_methods():
    from deepchem_tpu.utils.electron_sampler import ElectronSampler
    es = ElectronSampler(np.zeros((1, 3)), lambda x: np.ones(len(x)),
                         batch_no=4)
    es.gauss_initialize_position(np.array([[2]]), stddev=0.1)
    y4 = np.asarray(es.x)[:, :, None, :]
    assert es.harmonic_mean(y4).shape == (4, 2, 1, 1)
    assert es.log_prob_gaussian(y4, np.zeros(3), 1.0).shape == (4,)
    x_old = np.asarray(es.x).copy()
    lp1 = es.electron_update(np.zeros(4), np.ones(4),
                             np.array([0., 1, 0, 1]), np.array([0.5] * 4),
                             x_old + 1.0)
    assert np.allclose(lp1, [1, 0, 1, 0])
    assert np.allclose(np.asarray(es.x)[0], x_old[0] + 1.0)
    assert np.allclose(np.asarray(es.x)[1], x_old[1])


def test_atom_shim_get_coords():
    from deepchem_tpu.utils.fragment_utils import AtomShim
    assert np.allclose(AtomShim(6, 0.1, [1., 2, 3]).GetCoords(), [1, 2, 3])


def test_ferminet_hf_surface():
    from deepchem_tpu.models.ferminet import FerminetModel
    m = FerminetModel([('H', [0, 0, 0]), ('H', [0, 0, 1.4])], batch_no=4)
    m.prepare_hf_solution()
    # sigma_g bonding orbital: positive at the midpoint, symmetric under
    # reflection through it
    up, down = m.evaluate_hf(np.array([[[0, 0, 0.7], [0, 0, 0.7]]]))
    assert up.shape == (1, 1, 1) and down.shape == (1, 1, 1)
    assert up[0, 0, 0] > 0.3
    u2, d2 = m.evaluate_hf(np.array([[[0, 0, 0.0], [0, 0, 1.4]]]))
    assert abs(u2[0, 0, 0] - d2[0, 0, 0]) < 1e-5
    lp = m.random_walk(np.asarray(m.molecule.x))
    assert lp.shape == (4,) and np.all(lp >= 0)
    m.prepare_train(burn_in=1)
    assert m._train_step is not None


def test_modular_hooks_infograph():
    from deepchem_tpu.models import InfoGraphModel
    from deepchem_tpu.feat import MolGraphConvFeaturizer
    graphs = MolGraphConvFeaturizer(use_edges=True).featurize(
        ['CCO', 'CCN', 'CCC', 'c1ccccc1'])
    ds = NumpyDataset(graphs, np.zeros((4, 1)))
    m = InfoGraphModel(num_features=30, embedding_dim=16, batch_size=4)
    m.fit(ds, nb_epoch=1)
    comps = m.build_components()
    assert comps and m.build_model() is m.module
    assert set(m.components) == set(comps)
    inputs, labels, weights = next(iter(m.default_generator(ds, epochs=1)))
    assert np.isfinite(float(m.loss_func(inputs, labels, weights)))


def test_grover_vocab_random_masks():
    from deepchem_tpu.models.grover import (GroverModel,
                                            GroverAtomVocabularyBuilder,
                                            GroverBondVocabularyBuilder)
    from deepchem_tpu.chem import mol_from_smiles
    mols = [mol_from_smiles('CCO'), mol_from_smiles('CCN')]
    av = GroverAtomVocabularyBuilder()
    av.build(mols)
    bv = GroverBondVocabularyBuilder()
    bv.build(mols)
    lab = GroverModel.atom_vocab_random_mask(av, ['CCO', 'CCN'], seed=0)
    assert len(lab) == 6 and any(v > 0 for v in lab)
    # 15% of 3 atoms -> exactly 1 masked per molecule
    assert lab.count(0) == 4
    blab = GroverModel.bond_vocab_random_mask(bv, ['CCO', 'CCN'], seed=0)
    assert len(blab) == 4 and any(v > 0 for v in blab)
    assert callable(GroverModel.__dict__['get_loss_func'])


def test_metalearner_parameters():
    from deepchem_tpu.metalearning.maml import MetaLearner

    class L(MetaLearner):
        @property
        def variables(self):
            return {'w': np.ones(3), 'b': np.zeros(2)}

    assert len(list(L().parameters())) == 2


def test_atomic_conv_featurizer_helpers():
    from deepchem_tpu.models.atomic_conv import AtomicConvFeaturizer
    acf = AtomicConvFeaturizer(neighbor_cutoff=4.0, max_num_neighbors=4)
    coords = np.array([[0., 0, 0], [1.5, 0, 0], [20, 0, 0]])
    cp, nbrs, zp = acf.featurize_mol(coords, np.array([6, 8, 1]), 5)
    assert cp.shape == (5, 3) and zp.shape == (5,) and zp[1] == 8
    assert 1 in nbrs[0] and 2 not in nbrs[0]
    assert np.all(AtomicConvFeaturizer.get_Z_matrix([6, 8], 4)
                  == [6, 8, 0, 0])
    with pytest.raises(ValueError):
        AtomicConvFeaturizer.get_Z_matrix([6, 8, 7], 2)


def test_gan_loss_fn_aliases():
    import jax.numpy as jnp
    from deepchem_tpu.models import GAN
    g = GAN.__new__(GAN)
    d_out = jnp.asarray([0.9, 0.8])
    assert np.allclose(g.gen_loss_fn(d_out),
                       g.create_generator_loss(d_out))
    d_gen = jnp.asarray([0.1, 0.2])
    assert np.allclose(g.discrim_loss_fn(d_out, d_gen),
                       g.create_discriminator_loss(d_out, d_gen))

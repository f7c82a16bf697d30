"""Round-4 utils submodule function-parity batch (reference
utils/rdkit_utils.py, noncovalent_utils.py, grover.py, dftutils.py,
pytorch_utils.py, optimizer_utils.py, vina_utils.py, batch_utils.py:135,
equivariance_utils.py:341, hash_utils.py:36, safeops_utils.py:352,
cache_utils.py:704, sequence_utils.py:6, fake_data_generator.py:128,152,
evaluate.py:20,37, voxel_utils.py:166, molecule_feature_utils.py)."""

import os

import numpy as np
import pytest

from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.utils.conformers import embed_molecule_3d

PDB = (
    'ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00'
    '           N\n'
    'ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00'
    '           C\n'
    'ATOM      3  O   ALA A   1      13.006   6.954  -3.410  1.00  0.00'
    '           O\nEND\n')


@pytest.fixture
def benzene_3d():
    m = mol_from_smiles('c1ccccc1O')
    m.conformer = [tuple(c) for c in embed_molecule_3d(m)]
    return m


def test_rdkit_utils_load_write_roundtrip(tmp_path, benzene_3d):
    from deepchem_tpu.utils import rdkit_utils as ru
    p = tmp_path / 'x.pdb'
    p.write_text(PDB)
    xyz, mol = ru.load_molecule(str(p), calc_charges=False)
    assert xyz.shape == (3, 3)
    assert mol.GetAtoms()[0].GetAtomicNum() == 7
    out = tmp_path / 'y.pdb'
    ru.write_molecule(mol, str(out))
    xyz2, _ = ru.load_molecule(str(out), calc_charges=False)
    assert np.allclose(xyz, xyz2, atol=1e-3)
    # sdf path: chem Molecule with conformer, charges computed
    sdf = tmp_path / 'm.sdf'
    ru.write_molecule(benzene_3d, str(sdf))
    xyz4, m4 = ru.load_molecule(str(sdf))
    assert m4.num_atoms == 7
    assert any(abs(a.partial_charge) > 0.01 for a in m4.atoms)
    with pytest.raises(ru.MoleculeLoadException):
        empty = tmp_path / 'e.pdb'
        empty.write_text('END\n')
        ru.load_molecule(str(empty))


def test_rdkit_utils_mol2(tmp_path):
    from deepchem_tpu.utils import rdkit_utils as ru
    f = tmp_path / 'z.mol2'
    f.write_text('@<TRIPOS>MOLECULE\nx\n@<TRIPOS>ATOM\n'
                 '      1 C1    0.0 0.0 0.0 C.3 1 LIG 0.0\n'
                 '      2 O1    1.4 0.0 0.0 O.3 1 LIG 0.0\n'
                 '@<TRIPOS>BOND\n')
    xyz, frag = ru.load_molecule(str(f), calc_charges=False)
    assert frag.GetNumAtoms() == 2
    assert frag.GetAtoms()[1].GetAtomicNum() == 8


def test_rdkit_utils_geometry(benzene_3d):
    from deepchem_tpu.utils import rdkit_utils as ru
    envs = ru.compute_all_ecfp(benzene_3d, degree=2)
    assert len(envs) == 7
    assert ru.compute_ecfp_features(benzene_3d).sum() > 0
    info = ru.compute_pairwise_ring_info(benzene_3d)
    assert len(info) == 1
    center, normal = info[0]
    assert np.allclose(np.linalg.norm(normal), 1.0, atol=1e-6)
    sp = ru.compute_all_pairs_shortest_path(benzene_3d)
    assert sp[(0, 3)][0] == 3
    assert ru.merge_molecules_xyz(
        [np.zeros((2, 3)), np.ones((3, 3))]).shape == (5, 3)


def test_sdf_empty_title_line_roundtrip(tmp_path, benzene_3d):
    """parse_sdf must not strip an empty first (title) line — doing so
    shifts the molblock header (the bug fixed this round)."""
    from deepchem_tpu.chem.sdf import mol_to_molblock, parse_sdf
    block = mol_to_molblock(benzene_3d)
    assert block.startswith('\n')          # empty title line
    recs = list(parse_sdf(block + '$$$$\n' + block + '$$$$\n'))
    assert len(recs) == 2
    assert all(r[0] is not None and r[0].num_atoms == 7 for r in recs)


def test_noncovalent_reference_api():
    from deepchem_tpu.utils import noncovalent_utils as nc
    from deepchem_tpu.utils.fragment_utils import (AtomShim,
                                                   MolecularFragment)
    # O-H...N hydrogen bond: donor O at origin with H toward acceptor N
    f1_xyz = np.array([[0., 0, 0], [0.97, 0, 0]])     # O, H
    f1 = MolecularFragment([AtomShim(8, 0, f1_xyz[0]),
                            AtomShim(1, 0, f1_xyz[1])], f1_xyz)
    f2_xyz = np.array([[2.8, 0, 0]])                  # N
    f2 = MolecularFragment([AtomShim(7, 0, f2_xyz[0])], f2_xyz)
    assert nc.is_hydrogen_bond((f1_xyz, f1), (f2_xyz, f2), (0, 0))
    d = np.linalg.norm(f1_xyz[:, None] - f2_xyz[None, :], axis=-1)
    bonds = nc.compute_hydrogen_bonds((f1_xyz, f1), (f2_xyz, f2), d,
                                      [(2.0, 4.0)], [40.0])
    assert bonds == [[(0, 0)]]
    assert nc.compute_hbonds_in_range((f1_xyz, f1), (f2_xyz, f2), d,
                                      (5.0, 9.0), 40.0) == []
    # salt bridge: charges differing by ~2
    assert nc.is_salt_bridge(AtomShim(7, 1.0, [0, 0, 0]),
                             AtomShim(8, -1.0, [1, 1, 1]))
    assert not nc.is_salt_bridge(AtomShim(7, 0.2, [0, 0, 0]),
                                 AtomShim(8, -0.2, [1, 1, 1]))
    # cation on the ring axis
    assert nc.is_cation_pi(np.array([0, 0, 3.0]), np.zeros(3),
                           np.array([0, 0, 1.0]))
    assert not nc.is_cation_pi(np.array([0, 10, 0]), np.zeros(3),
                               np.array([0, 0, 1.0]))


def test_binding_pocket_cation_pi():
    from deepchem_tpu.utils.noncovalent_utils import \
        compute_binding_pocket_cation_pi
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    ring = mol_from_smiles('c1ccccc1')
    ring.conformer = [tuple(c) for c in embed_molecule_3d(ring)]
    cation = mol_from_smiles('[NH4+]')
    center = np.mean(np.asarray(ring.conformer), axis=0)
    cation.conformer = [tuple(center + np.array([0, 0, 3.0]))]
    m1, m2 = compute_binding_pocket_cation_pi(ring, cation)
    assert len(m1) == 6 and m2 == {0: 1}


def test_grover_batch_utilities():
    from deepchem_tpu.models.grover import GroverFeaturizer
    from deepchem_tpu.utils.grover import (BatchGroverGraph,
                                           extract_grover_attributes)
    graphs = GroverFeaturizer().featurize(['CC', 'CCC'])
    bg = BatchGroverGraph(graphs)
    (f_atoms, f_bonds, a2b, b2a, b2revb, a2a, a_scope, b_scope,
     fg, add) = bg.get_components()
    assert f_atoms.shape[0] == 5            # 2 + 3 atoms
    assert a_scope == [(0, 2), (2, 3)]
    assert len(b2a) == 2 * 1 + 2 * 2        # directed edges
    # reverse-of-reverse is identity
    assert np.array_equal(b2revb[b2revb], np.arange(len(b2revb)))
    # a2a rows index neighbor atoms
    assert a2a.shape[0] == 5
    out2 = extract_grover_attributes(list(graphs))
    assert np.allclose(out2[0], f_atoms)
    assert fg.shape[0] == 2


def test_dftutils_module():
    from deepchem_tpu.utils.dftutils import (SpinParam, KSCalc, BaseGrid,
                                             BaseQCCalc, hashstr)
    sp = SpinParam(u=2.0, d=1.0)
    assert sp.sum() == 3.0
    assert sp.reduce(lambda a, b: a * b) == 2.0
    assert len(hashstr('x')) == 64
    from deepchem_tpu.dft.scf import DFTSystem, KohnShamSCF
    system = DFTSystem(['H', 'H'], [[0, 0, 0], [0, 0, 1.4]], units='bohr')
    calc = KohnShamSCF(xc='hf').run(system)
    wrapped = KSCalc(calc)
    assert abs(float(wrapped.energy()) - (-1.11671)) < 1e-3
    assert wrapped.aodmtot().shape == (2, 2)
    grid = BaseGrid.from_system(system)
    assert grid.get_rgrid().shape[1] == 3
    assert len(grid.get_dvolume()) == len(grid.get_rgrid())


def test_pytorch_utils_module():
    from deepchem_tpu.utils.pytorch_utils import (get_activation,
                                                  unsorted_segment_sum,
                                                  segment_sum, chunkify,
                                                  get_memory)
    import jax.numpy as jnp
    assert float(get_activation('relu')(jnp.asarray(-1.0))) == 0.0
    data = jnp.asarray([[1.0], [2.0], [3.0]])
    ids = jnp.asarray([0, 0, 1])
    assert np.allclose(unsorted_segment_sum(data, ids, 2),
                       [[3.0], [3.0]])
    assert np.allclose(segment_sum(data, ids), [[3.0], [3.0]])
    chunks = list(chunkify(jnp.arange(10), 0, 4))
    assert sum(c[2] - c[1] for c in chunks) == 10
    assert get_memory(jnp.zeros((4, 4), jnp.float32)) == 64


def test_lamb_optimizer_trains():
    from deepchem_tpu.utils.optimizer_utils import LambOptimizer
    from deepchem_tpu.models import MultitaskRegressor
    from deepchem_tpu.data import NumpyDataset
    rng = np.random.RandomState(0)
    X = rng.rand(32, 4).astype(np.float32)
    ds = NumpyDataset(X, (X.sum(1, keepdims=True)))
    m = MultitaskRegressor(n_tasks=1, n_features=4, layer_sizes=[16],
                           batch_size=16,
                           optimizer=LambOptimizer(learning_rate=0.01))
    l0 = m.fit(ds, nb_epoch=1)
    l1 = m.fit(ds, nb_epoch=20)
    assert l1 < l0


def test_vina_utils_deprecation(tmp_path):
    import warnings
    from deepchem_tpu.utils import vina_utils
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        vina_utils.write_vina_conf('p.pdb', 'l.pdb', (0., 0., 0.),
                                   (10., 10., 10.),
                                   str(tmp_path / 'conf.txt'))
        assert any(issubclass(x.category, DeprecationWarning) for x in w)


def test_small_util_functions(tmp_path):
    from deepchem_tpu.utils.batch_utils import batch_elements
    assert list(batch_elements([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4],
                                                        [5]]
    from deepchem_tpu.utils.equivariance_utils import commutator
    A = np.array([[0., 1], [0, 0]])
    B = np.array([[0., 0], [1, 0]])
    assert np.allclose(commutator(A, B), [[1, 0], [0, -1]])
    from deepchem_tpu.utils.hash_utils import hash_sybyl
    assert hash_sybyl('C.3', ['C.2', 'C.3', 'N.3']) == 1
    from deepchem_tpu.utils.safeops_utils import safedenom
    assert np.allclose(safedenom(np.array([0.0, 2.0]), 1e-9),
                       [1e-9, 2.0])
    from deepchem_tpu.utils.cache_utils import normalize_prefix
    assert normalize_prefix('abc') == 'abc.'
    assert normalize_prefix('abc.') == 'abc.'
    from deepchem_tpu.utils.sequence_utils import system_call
    assert system_call('echo hi').strip() == b'hi'
    from deepchem_tpu.utils.fake_data_generator import (
        generate_edge_index, remove_self_loops)
    ei = np.array([[0, 1, 2], [0, 2, 1]])
    assert remove_self_loops(ei).shape == (2, 2)
    np.random.seed(0)
    gen = generate_edge_index(5, 3)
    assert gen.shape[0] == 2 and np.all(gen[0] != gen[1])
    from deepchem_tpu.utils.evaluate import (output_predictions,
                                             output_statistics)
    from deepchem_tpu.data import NumpyDataset
    ds = NumpyDataset(np.zeros((3, 2)), np.zeros((3, 1)))
    csv_out = str(tmp_path / 'p.csv')
    output_predictions(ds, np.arange(3.0), csv_out)
    import pandas as pd
    assert len(pd.read_csv(csv_out)) == 3
    stats_out = str(tmp_path / 's.txt')
    output_statistics({'auc': 0.9}, stats_out)
    assert 'auc' in open(stats_out).read()
    from deepchem_tpu.utils.molecule_feature_utils import \
        get_atom_implicit_valence_one_hot
    mol = mol_from_smiles('CC')
    oh = get_atom_implicit_valence_one_hot(mol.atoms[0])
    assert sum(oh) == 1 and oh[3] == 1.0   # CH3: 3 implicit H


def test_voxelize_pi_stack():
    from deepchem_tpu.utils.voxel_utils import voxelize_pi_stack
    ring1 = mol_from_smiles('c1ccccc1')
    ring1.conformer = [tuple(c) for c in embed_molecule_3d(ring1)]
    xyz1 = np.asarray(ring1.conformer)
    # second ring stacked 3.5 A above, same orientation
    ring2 = mol_from_smiles('c1ccccc1')
    from deepchem_tpu.utils.rdkit_utils import compute_ring_normal
    normal = compute_ring_normal(ring1, list(range(6)))
    xyz2 = xyz1 + 3.5 * normal
    ring2.conformer = [tuple(c) for c in xyz2]
    d = np.linalg.norm(xyz1[:, None] - xyz2[None, :], axis=-1)
    par, t = voxelize_pi_stack(xyz1, ring1, xyz2, ring2, d,
                               pi_stack_dist_cutoff=4.4,
                               pi_stack_angle_cutoff=30.0,
                               box_width=16.0, voxel_width=1.0)
    assert par.shape == (16, 16, 16, 1)
    assert par.sum() > 0 and t.sum() == 0


def test_descriptors_normalization_parameters():
    from deepchem_tpu.utils.rdkit_utils import \
        DescriptorsNormalizationParameters as DNP
    params = DNP.fit(['CCO', 'c1ccccc1', 'CCN', 'CCCC'])
    assert len(params) >= 40
    assert all(v[0] == 'norm' and len(v[1]) == 2 for v in params.values())

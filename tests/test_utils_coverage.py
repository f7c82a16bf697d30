"""Behavioral tests for the utility modules (reference
deepchem/utils/tests/ equivalents: geometry, voxels, fragments,
noncovalent interactions, batch assembly, SO(3) equivariance, hashing,
safe ops, periodic table, caches, fake-graph generation, genomics,
sequences, PDBQT IO, debug, profiling)."""
import math
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# geometry_utils
# ---------------------------------------------------------------------------

def test_unit_vector_and_angles():
    from deepchem_tpu.utils.geometry_utils import (unit_vector,
                                                   angle_between,
                                                   is_angle_within_cutoff)
    v = unit_vector(np.array([3.0, 4.0, 0.0]))
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-7)
    np.testing.assert_allclose(
        angle_between(np.array([1.0, 0, 0]), np.array([0, 1.0, 0])),
        math.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(
        angle_between(np.array([1.0, 0, 0]), np.array([1.0, 0, 0])), 0.0,
        atol=1e-6)
    # nearly-antiparallel vectors pass the H-bond angle test
    assert is_angle_within_cutoff(np.array([1.0, 0, 0]),
                                  np.array([-1.0, 0.05, 0]), 30.0)
    assert not is_angle_within_cutoff(np.array([1.0, 0, 0]),
                                      np.array([0.0, 1.0, 0]), 30.0)


def test_random_rotation_matrix_is_orthogonal():
    from deepchem_tpu.utils.geometry_utils import (
        generate_random_rotation_matrix, generate_random_unit_vector,
        rotate_molecules)
    np.random.seed(0)
    R = generate_random_rotation_matrix()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-7)
    u = generate_random_unit_vector()
    np.testing.assert_allclose(np.linalg.norm(u), 1.0, rtol=1e-7)
    # rotation preserves internal distances
    coords = np.random.randn(5, 3)
    (rot,) = rotate_molecules([coords])
    d0 = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    d1 = np.linalg.norm(rot[:, None] - rot[None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-8)


def test_centroid_range_pairwise():
    from deepchem_tpu.utils.geometry_utils import (
        compute_centroid, subtract_centroid, compute_protein_range,
        compute_pairwise_distances)
    coords = np.array([[0.0, 0, 0], [2.0, 0, 0], [0, 4.0, 0]])
    np.testing.assert_allclose(compute_centroid(coords),
                               [2 / 3, 4 / 3, 0])
    centered = subtract_centroid(coords, compute_centroid(coords))
    np.testing.assert_allclose(compute_centroid(centered), 0, atol=1e-12)
    np.testing.assert_allclose(compute_protein_range(coords), [2, 4, 0])
    d = compute_pairwise_distances(coords[:2], coords)
    from scipy.spatial.distance import cdist
    np.testing.assert_allclose(d, cdist(coords[:2], coords), atol=1e-10)


# ---------------------------------------------------------------------------
# voxel_utils
# ---------------------------------------------------------------------------

def test_convert_atom_to_voxel_indexing():
    from deepchem_tpu.utils.voxel_utils import (convert_atom_to_voxel,
                                                convert_atom_pair_to_voxel)
    coords = np.array([[0.0, 0.0, 0.0], [-7.9, 7.9, 0.1]])
    # box 16, voxel 1: origin maps to index floor((0+8)/1) = 8
    np.testing.assert_array_equal(
        convert_atom_to_voxel(coords, 0, 16.0, 1.0), [[8, 8, 8]])
    np.testing.assert_array_equal(
        convert_atom_to_voxel(coords, 1, 16.0, 1.0), [[0, 15, 8]])
    pair = convert_atom_pair_to_voxel((coords, coords), (0, 1), 16.0, 1.0)
    assert pair.shape == (2, 3)


def test_voxelize_counts_atoms():
    from deepchem_tpu.utils.voxel_utils import (voxelize,
                                               convert_atom_to_voxel)
    rng = np.random.RandomState(0)
    coords = rng.uniform(-7, 7, (20, 3))
    grid = voxelize(convert_atom_to_voxel, coords, box_width=16.0,
                    voxel_width=1.0, feature_list=list(range(20)),
                    nb_channel=1)
    assert grid.shape == (16, 16, 16, 1)
    assert grid.sum() == 20          # every atom lands in exactly one voxel


def test_voxelize_hashed_feature_dict():
    from deepchem_tpu.utils.voxel_utils import (voxelize,
                                               convert_atom_to_voxel)
    from deepchem_tpu.utils.hash_utils import hash_ecfp
    coords = np.zeros((2, 3))
    grid = voxelize(convert_atom_to_voxel, coords, box_width=16.0,
                    voxel_width=1.0,
                    feature_dict={0: 'C-ring', 1: 'N-amide'},
                    hash_function=hash_ecfp, nb_channel=8)
    assert grid.sum() == 2
    # both atoms are at the origin voxel
    assert grid[8, 8, 8].sum() == 2


# ---------------------------------------------------------------------------
# fragment_utils + noncovalent_utils
# ---------------------------------------------------------------------------

def _two_fragments():
    from deepchem_tpu.utils.fragment_utils import (AtomShim,
                                                   MolecularFragment)
    c1 = np.array([[0.0, 0, 0], [1.5, 0, 0], [20.0, 0, 0]])
    c2 = np.array([[3.0, 0, 0], [30.0, 0, 0]])
    f1 = MolecularFragment([AtomShim(6, 0.2, c) for c in c1], c1)
    f2 = MolecularFragment([AtomShim(7, -0.4, c) for c in c2], c2)
    return f1, f2


def test_contact_atom_indices_and_reduction():
    from deepchem_tpu.utils.fragment_utils import (
        get_contact_atom_indices, reduce_molecular_complex_to_contacts)
    f1, f2 = _two_fragments()
    keep1, keep2 = get_contact_atom_indices([f1, f2], cutoff=4.5)
    assert keep1 == [0, 1] and keep2 == [0]
    r1, r2 = reduce_molecular_complex_to_contacts([f1, f2], cutoff=4.5)
    assert r1.GetNumAtoms() == 2 and r2.GetNumAtoms() == 1
    np.testing.assert_allclose(r2.GetCoords(), [[3.0, 0, 0]])


def test_strip_hydrogens_and_partial_charge():
    from deepchem_tpu.utils.fragment_utils import (AtomShim,
                                                   MolecularFragment,
                                                   strip_hydrogens,
                                                   get_partial_charge)
    coords = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    atoms = [AtomShim(6, 0.1, coords[0]), AtomShim(1, 0.0, coords[1]),
             AtomShim(8, -0.3, coords[2])]
    frag = MolecularFragment(atoms, coords)
    new_coords, new_frag = strip_hydrogens(coords, frag)
    assert new_frag.GetNumAtoms() == 2
    assert [a.GetAtomicNum() for a in new_frag.GetAtoms()] == [6, 8]
    np.testing.assert_allclose(new_coords, coords[[0, 2]])
    assert get_partial_charge(atoms[2]) == -0.3
    assert get_partial_charge(object()) == 0.0


def test_hbonds_and_salt_bridges():
    from deepchem_tpu.utils.noncovalent_utils import (compute_hbonds,
                                                      compute_salt_bridges)
    coords1 = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    coords2 = np.array([[2.5, 0, 0], [12.0, 0, 0]])
    hb = compute_hbonds(coords1, ['N', 'C'], coords2, ['O', 'O'])
    assert hb == [(0, 0)]        # carbon at index 1 is not polar
    sb = compute_salt_bridges(coords1, [1.0, 0.0], coords2, [-1.0, 0.0])
    assert sb == [(0, 0)]
    # same-sign charges never bridge
    assert compute_salt_bridges(coords1, [1.0, 0.0], coords2,
                                [1.0, 0.0]) == []


def _hexagon(z=0.0, cx=0.0):
    ang = np.linspace(0, 2 * np.pi, 7)[:-1]
    return np.stack([1.4 * np.cos(ang) + cx, 1.4 * np.sin(ang),
                     np.full(6, z)], axis=1)


def test_ring_center_normal_and_pi_stack():
    from deepchem_tpu.utils.noncovalent_utils import (
        compute_ring_center, compute_ring_normal, compute_pi_stack,
        is_pi_parallel, is_pi_t, compute_cation_pi)
    ring1 = _hexagon(0.0)
    ring2 = _hexagon(3.5)                       # stacked 3.5 A above
    np.testing.assert_allclose(compute_ring_center(ring1, range(6)),
                               [0, 0, 0], atol=1e-7)
    n = compute_ring_normal(ring1, range(6))
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-7)
    stacks = compute_pi_stack([list(range(6))], ring1,
                              [list(range(6))], ring2)
    assert stacks == [(0, 0, 'parallel')]
    # a perpendicular ring at T-shaped distance
    ringT = np.stack([_hexagon(0.0)[:, 0] + 5.0, _hexagon(0.0)[:, 2],
                      _hexagon(0.0)[:, 1]], axis=1)
    cT = compute_ring_center(ringT, range(6))
    nT = compute_ring_normal(ringT, range(6))
    c1 = compute_ring_center(ring1, range(6))
    n1 = compute_ring_normal(ring1, range(6))
    assert not is_pi_parallel(c1, n1, cT, nT)
    assert is_pi_t(c1, n1, cT, nT)
    cp = compute_cation_pi([c1], np.array([[0.0, 0, 4.0], [0, 0, 50.0]]))
    assert cp == [(0, 0)]


# ---------------------------------------------------------------------------
# batch_utils
# ---------------------------------------------------------------------------

def test_batch_coulomb_matrix_features_recovers_atoms():
    from deepchem_tpu.utils.batch_utils import batch_coulomb_matrix_features
    # build a Coulomb matrix for a fake 2-atom molecule (z=6, 8, d=1.2)
    z = np.array([6.0, 8.0])
    d = 1.2
    cm = np.zeros((3, 3))
    cm[0, 0] = 0.5 * z[0] ** 2.4
    cm[1, 1] = 0.5 * z[1] ** 2.4
    cm[0, 1] = cm[1, 0] = z[0] * z[1] / d
    atom_numbers, gauss, mem, mi, mj = batch_coulomb_matrix_features(
        np.array([cm, cm]), n_distance=10)
    np.testing.assert_array_equal(atom_numbers, [6, 8, 6, 8])
    np.testing.assert_array_equal(mem, [0, 0, 1, 1])
    # two molecules x 2 ordered pairs
    assert gauss.shape == (4, 10)
    np.testing.assert_array_equal(mi, [0, 1, 2, 3])
    np.testing.assert_array_equal(mj, [1, 0, 3, 2])


def test_seq_input_output_arrays():
    from deepchem_tpu.utils.batch_utils import (create_input_array,
                                                create_output_array)
    d = {'A': 1, 'B': 2, '$': 9}
    arr = create_input_array(['AB', 'B'], 4, False, 2, d, '$')
    np.testing.assert_array_equal(arr, [[1, 2, 9, 0], [2, 9, 0, 0]])
    rev = create_input_array(['AB'], 4, True, 1, d, '$')
    np.testing.assert_array_equal(rev[0], [2, 1, 9, 0])
    out = create_output_array(['A'], 3, 1, d, '$')
    np.testing.assert_array_equal(out[0], [1, 9, 9])


# ---------------------------------------------------------------------------
# equivariance_utils
# ---------------------------------------------------------------------------

def test_su2_commutation_relations():
    """[X_a, X_b] = eps_abc X_c for every irrep k."""
    from deepchem_tpu.utils.equivariance_utils import su2_generators
    for k in (1, 2):
        X = np.asarray(su2_generators(k))
        comm = X[0] @ X[1] - X[1] @ X[0]
        np.testing.assert_allclose(comm, X[2], atol=1e-7)


def test_wigner_d_is_orthogonal_and_composes():
    from deepchem_tpu.utils.equivariance_utils import wigner_D
    D = np.asarray(wigner_D(1, 0.3, 0.5, 0.7))
    np.testing.assert_allclose(D @ D.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(D), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(wigner_D(1, 0.0, 0.0, 0.0)),
                               np.eye(3), atol=1e-7)
    # rotations about the same axis compose additively
    Da = np.asarray(wigner_D(2, 0.4, 0.0, 0.0))
    Db = np.asarray(wigner_D(2, 0.0, 0.0, 0.25))
    Dab = np.asarray(wigner_D(2, 0.65, 0.0, 0.0))
    np.testing.assert_allclose(Da @ Db, Dab, atol=1e-6)


def test_spherical_harmonics_values_and_norm():
    from deepchem_tpu.utils.equivariance_utils import (
        real_spherical_harmonics)
    z = np.array([[0.0, 0.0, 1.0]])
    y0 = np.asarray(real_spherical_harmonics(0, z))
    np.testing.assert_allclose(y0, [[1 / math.sqrt(4 * math.pi)]],
                               rtol=1e-6)
    # l=1 at +z: only m=0 component, sqrt(3/4pi)
    y1 = np.asarray(real_spherical_harmonics(1, z))[0]
    np.testing.assert_allclose(y1[1], math.sqrt(3 / (4 * math.pi)),
                               rtol=1e-6)
    np.testing.assert_allclose([y1[0], y1[2]], 0.0, atol=1e-7)
    # addition theorem: sum_m |Y_lm|^2 = (2l+1)/(4pi) for any direction
    rng = np.random.RandomState(0)
    xyz = rng.randn(16, 3)
    xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
    for l in (1, 2, 3):
        y = np.asarray(real_spherical_harmonics(l, xyz))
        np.testing.assert_allclose(np.sum(y * y, axis=1),
                                   (2 * l + 1) / (4 * math.pi), rtol=1e-4)


# ---------------------------------------------------------------------------
# hash_utils / safeops / periodic table
# ---------------------------------------------------------------------------

def test_hash_ecfp_deterministic_in_range():
    from deepchem_tpu.utils.hash_utils import (hash_ecfp, hash_ecfp_pair,
                                               vectorize)
    assert hash_ecfp('C-ring', 1024) == hash_ecfp('C-ring', 1024)
    assert 0 <= hash_ecfp('N', 16) < 16
    assert hash_ecfp_pair(('a', 'b'), 64) != hash_ecfp_pair(('b', 'a'), 64)
    v = vectorize(hash_ecfp, {0: 'x', 1: 'y'}, size=128)
    assert v.shape == (128,) and v.sum() == 2
    assert vectorize(hash_ecfp, None, size=8).sum() == 0


def test_safeops_gradients_are_finite_at_singularities():
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.utils.safeops_utils import (safepow, safenorm,
                                                  safenormalize, safediv,
                                                  safe_exp, occnumber)
    g = jax.grad(lambda x: safepow(x, 0.5))(0.0)
    assert np.isfinite(float(g))
    g = jax.grad(lambda x: safenorm(jnp.array([x, 0.0]), axis=0))(0.0)
    assert np.isfinite(float(g))
    n = safenormalize(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(n)))
    assert np.isfinite(float(safediv(1.0, 0.0)))
    assert np.isfinite(float(safe_exp(1e4)))
    occ = np.asarray(occnumber(2.5, 4))
    np.testing.assert_allclose(occ, [1, 1, 0.5, 0])


def test_periodic_table_lookups():
    from deepchem_tpu.utils.periodic_table_utils import (get_atomz,
                                                         get_atom_mass,
                                                         get_period)
    assert get_atomz('C') == 6
    assert get_atomz('Cl') == 17
    assert abs(get_atom_mass(6) / 1822.888486 - 12.011) < 0.1 or \
        abs(get_atom_mass(6) - 12.011) < 0.1   # amu or a.u. convention
    assert get_period(1) == 1
    assert get_period(6) == 2
    assert get_period(11) == 3


# ---------------------------------------------------------------------------
# cache_utils / fake_data_generator / debug / profiling
# ---------------------------------------------------------------------------

def test_cache_memoizes_and_persists(tmp_path):
    from deepchem_tpu.utils.cache_utils import Cache
    fname = str(tmp_path / 'cache.npz')
    calls = []

    def expensive():
        calls.append(1)
        return np.arange(4.0)

    c = Cache(fname)
    np.testing.assert_allclose(c.cache('h/el_mat', expensive),
                               np.arange(4.0))
    np.testing.assert_allclose(c.cache('h/el_mat', expensive),
                               np.arange(4.0))
    assert len(calls) == 1
    # prefix-scoped children share the store
    child = c.add_prefix('system1')
    child.cache('olp', lambda: np.eye(2))
    # a fresh Cache on the same file sees both entries
    c2 = Cache(fname)
    np.testing.assert_allclose(c2.cache('h/el_mat', expensive),
                               np.arange(4.0))
    np.testing.assert_allclose(
        c2.add_prefix('system1').cache('olp', expensive), np.eye(2))
    assert len(calls) == 1
    a, b = c.cache_multi(['m1', 'm2'], lambda: (np.ones(2), np.zeros(2)))
    np.testing.assert_allclose(a, [1, 1])


def test_fake_graph_generator_shapes():
    from deepchem_tpu.utils.fake_data_generator import FakeGraphGenerator
    gen = FakeGraphGenerator(min_nodes=5, max_nodes=9, n_node_features=4,
                             n_edge_features=2, n_classes=3, seed=0)
    graphs, labels = gen.sample(12)
    assert len(graphs) == 12 and labels.shape == (12,)
    for g in graphs:
        assert 5 <= g.num_nodes <= 9
        assert g.node_features.shape == (g.num_nodes, 4)
        assert g.edge_index.shape[0] == 2
        assert g.edge_features.shape == (g.edge_index.shape[1], 2)
        assert g.edge_index.max() < g.num_nodes
    assert set(labels).issubset({0.0, 1.0, 2.0})
    # node-level labels
    gnode = FakeGraphGenerator(min_nodes=5, max_nodes=5, task='node',
                               seed=1)
    graphs, labels = gnode.sample(3)
    assert np.asarray(labels[0]).shape == (5,)


def test_debug_utils_thresholds():
    from deepchem_tpu.utils import debug_utils as D
    old_t, old_s = D.get_print_threshold(), D.get_max_print_size()
    try:
        D.set_print_threshold(7)
        assert D.get_print_threshold() == 7
        D.set_max_print_size(123)
        assert D.get_max_print_size() == 123
        s = D.summarize_array(np.arange(1000))
        assert isinstance(s, str) and len(s) > 0
    finally:
        D.set_print_threshold(old_t)
        D.set_max_print_size(old_s)


def test_step_timer_and_mfu():
    import time
    from deepchem_tpu.utils.profiling import StepTimer, mfu, flops_of
    t = StepTimer(warmup_steps=1)
    for step in range(5):
        t(None, step)
        time.sleep(0.01)
    s = t.summary()
    assert s['mean_ms'] > 5 and s['p95_ms'] >= s['p50_ms']
    # mfu: 197e12 flops in 1 s on a v5e is exactly 1.0
    assert abs(mfu(197e12, 1.0, 'TPU v5 lite') - 1.0) < 1e-9
    # flops_of counts the matmul
    import jax.numpy as jnp
    f = flops_of(lambda a: a @ a, jnp.ones((64, 64)))
    assert f >= 2 * 64 ** 3 * 0.9


# ---------------------------------------------------------------------------
# genomics / sequence / pdbqt
# ---------------------------------------------------------------------------

def test_seq_one_hot_encode_and_kmers(tmp_path):
    from deepchem_tpu.utils.genomics_utils import (seq_one_hot_encode,
                                                   encode_bio_sequence,
                                                   sequence_to_kmers)
    oh = seq_one_hot_encode(['ATCG', 'GGNN'])
    assert oh.shape == (2, 5, 4, 1)
    np.testing.assert_array_equal(oh[0, :, 0, 0], [1, 0, 0, 0, 0])  # A
    np.testing.assert_array_equal(oh[1, :, 0, 0], [0, 0, 0, 1, 0])  # G
    assert oh[0].sum() == 4
    with pytest.raises(ValueError):
        seq_one_hot_encode(['AT', 'ATC'])
    fa = tmp_path / 'x.fa'
    fa.write_text('>s1\nATCG\n>s2\nGGCC\n')
    assert encode_bio_sequence(str(fa)).shape == (2, 5, 4, 1)
    assert sequence_to_kmers('ATCGA', 3) == ['ATC', 'TCG', 'CGA']


def test_msa_profile_and_one_hot_protein(tmp_path):
    from deepchem_tpu.utils.sequence_utils import (msa_profile,
                                                   one_hot_protein,
                                                   MSA_to_dataset)
    prof = msa_profile(['AC', 'AD'])
    assert prof.shape[0] == 2
    np.testing.assert_allclose(prof[0].max(), 1.0)   # column 0 is all A
    np.testing.assert_allclose(prof[1].max(), 0.5)
    oh = one_hot_protein('ACD')
    assert oh.shape[0] == 3 and np.all(oh.sum(axis=1) == 1)
    msa = tmp_path / 'msa.a3m'
    msa.write_text('>q\nACDE\n>h1\nACdDE\n')   # lowercase = insertion
    ds = MSA_to_dataset(str(msa))
    assert ds.X.shape[1] == 4                  # insertions stripped


def test_pdbqt_roundtrip(tmp_path):
    from deepchem_tpu.utils.pdbqt_utils import (write_pdbqt,
                                                load_pdb_coordinates,
                                                pdbqt_to_pdb)
    coords = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    path = str(tmp_path / 'lig.pdbqt')
    write_pdbqt(path, coords, ['C', 'N'], charges=np.array([0.1, -0.2]))
    got, elems = load_pdb_coordinates(path)
    np.testing.assert_allclose(got, coords, atol=1e-3)
    assert elems == ['C', 'N']
    pdb = pdbqt_to_pdb(path)
    assert 'ROOT' not in pdb and 'TORSDOF' not in pdb
    assert pdb.count('ATOM') == 2

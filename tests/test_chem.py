"""Tests for the pure-Python chemistry core."""
import numpy as np
import pytest

from deepchem_tpu.chem import (mol_from_smiles, mol_to_smiles,
                               morgan_fingerprint, tanimoto,
                               scaffold_smiles, murcko_scaffold,
                               parse_sdf, mol_from_molblock)


@pytest.mark.parametrize('smiles,natoms,nbonds,nhs', [
    ('C', 1, 0, 4),
    ('CC', 2, 1, 6),
    ('C=O', 2, 1, 2),
    ('C#N', 2, 1, 1),
    ('c1ccccc1', 6, 6, 6),
    ('c1ccc2ccccc2c1', 10, 11, 8),
    ('CC(=O)O', 4, 3, 4),
    ('[NH4+]', 1, 0, 4),
    ('C[O-]', 2, 1, 3),
    ('c1cc[nH]c1', 5, 5, 5),
    ('n1ccccc1', 6, 6, 5),
    ('ClCCl', 3, 2, 2),
    ('C1CC1', 3, 3, 6),
    ('CN1C=NC2=C1C(=O)N(C(=O)N2C)C', 14, 15, 10),   # caffeine
    ('C%10CC%10', 3, 3, 6),                          # %nn ring closure
    ('[13CH4]', 1, 0, 4),                            # isotope
    ('F/C=C/F', 4, 3, 2),                            # stereo bonds
    ('[Na+].[Cl-]', 2, 0, 0),                        # disconnected
])
def test_parse_counts(smiles, natoms, nbonds, nhs):
    mol = mol_from_smiles(smiles)
    assert mol is not None
    assert mol.num_atoms == natoms
    assert mol.num_bonds == nbonds
    assert mol.total_num_hs() == nhs


def test_parse_failure_returns_none():
    assert mol_from_smiles('C1CC') is None         # unclosed ring
    assert mol_from_smiles('C(((') is None         # unbalanced
    assert mol_from_smiles('') is None
    assert mol_from_smiles('[Xx]') is None         # unknown element


def test_aromatic_perception():
    mol = mol_from_smiles('c1ccccc1')
    assert all(a.is_aromatic for a in mol.atoms)
    assert all(a.in_ring for a in mol.atoms)
    assert all(b.is_aromatic for b in mol.bonds)
    assert all(a.hybridization == 'SP2' for a in mol.atoms)


def test_ring_perception():
    mol = mol_from_smiles('C1CC1CCC')
    in_ring = [a.in_ring for a in mol.atoms]
    assert in_ring == [True, True, True, False, False, False]
    assert mol.ring_sizes(0) == [3]


def test_hybridization():
    mol = mol_from_smiles('C=CC#CC')
    hyb = [a.hybridization for a in mol.atoms]
    assert hyb == ['SP2', 'SP2', 'SP', 'SP', 'SP3']


def test_canonical_smiles_invariance():
    forms = ['CC(=O)Oc1ccccc1C(=O)O', 'OC(=O)c1ccccc1OC(C)=O',
             'c1ccc(OC(C)=O)c(C(O)=O)c1']
    canon = {mol_to_smiles(mol_from_smiles(s)) for s in forms}
    assert len(canon) == 1


def test_canonical_roundtrip():
    for s in ['CN1C=NC2=C1C(=O)N(C(=O)N2C)C',
              'O=C1C(CCS(=O)c2ccccc2)C(=O)N(c2ccccc2)N1c1ccccc1',
              'CC(C)Cc1ccc(cc1)[C@@H](C)C(=O)O']:
        c1 = mol_to_smiles(mol_from_smiles(s))
        c2 = mol_to_smiles(mol_from_smiles(c1))
        assert c1 == c2


def test_morgan_fingerprint():
    m1 = mol_from_smiles('CC(=O)Oc1ccccc1C(=O)O')
    m2 = mol_from_smiles('OC(=O)c1ccccc1OC(C)=O')
    fp1 = morgan_fingerprint(m1, 2, 2048)
    fp2 = morgan_fingerprint(m2, 2, 2048)
    assert fp1.shape == (2048,)
    assert fp1.sum() > 10
    assert (fp1 == fp2).all()
    assert tanimoto(fp1, fp2) == 1.0
    fp3 = morgan_fingerprint(mol_from_smiles('CCCCCC'), 2, 2048)
    assert tanimoto(fp1, fp3) < 0.3


def test_morgan_counts_mode():
    m = mol_from_smiles('CCCCCC')
    fp = morgan_fingerprint(m, 2, 512, counts=True)
    assert fp.dtype == np.float32
    assert fp.max() >= 2          # repeated CH2 environments counted


def test_scaffold():
    # benzene ring is the scaffold of alkylbenzenes
    scafs = {scaffold_smiles(s) for s in
             ['CCc1ccccc1', 'CCCCc1ccccc1', 'c1ccccc1CO']}
    assert len(scafs) == 1
    assert scaffold_smiles('CCO') == ''     # acyclic -> empty scaffold
    assert scaffold_smiles('not-a-smiles') is None


def test_scaffold_keeps_linkers():
    scaf = murcko_scaffold(mol_from_smiles('c1ccccc1CCc1ccccc1CCCC'))
    # two rings + 2-carbon linker = 14 atoms; butyl chain pruned
    assert scaf.num_atoms == 14


def test_molblock_parsing():
    block = (
        '\n     RDKit          3D\n\n'
        '  3  2  0  0  0  0  0  0  0  0999 V2000\n'
        '    0.0000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0\n'
        '    0.9572    0.0000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0\n'
        '   -0.2400    0.9270    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0\n'
        '  1  2  1  0\n'
        '  1  3  1  0\n'
        'M  END\n')
    mol = mol_from_molblock(block)
    assert mol is not None
    assert mol.num_atoms == 1          # hydrogens folded into implicit count
    assert mol.atoms[0].total_hs == 2
    assert mol.conformer is not None and len(mol.conformer) == 1


def test_sdf_reader_real_file():
    with open('/root/reference/datasets/membrane_permeability.sdf') as f:
        text = f.read()
    records = list(parse_sdf(text))
    assert len(records) > 5
    n_ok = sum(1 for mol, _ in records if mol is not None)
    assert n_ok >= len(records) - 1
    mol, props = records[0]
    assert mol.num_atoms > 3
    assert mol.conformer is not None


def test_charged_species_hydrogens():
    # [O-] gets 1 H in C[O-]? No: methoxide O has 1 bond, valence 1, 0 H
    mol = mol_from_smiles('C[O-]')
    assert mol.atoms[1].total_hs == 0
    mol = mol_from_smiles('[OH3+]')
    assert mol.atoms[0].total_hs == 3
    mol = mol_from_smiles('C[N+](C)(C)C')
    assert mol.atoms[1].total_hs == 0


def test_native_morgan_bit_identical():
    """The C++ Morgan kernel (deepchem_tpu/native) must reproduce the
    pure-Python environment iteration bit-for-bit."""
    import numpy as np
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.chem.fingerprints import (morgan_fingerprint,
                                                morgan_fingerprint_counts)
    from deepchem_tpu.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip('native toolchain unavailable')
    for smi in ['CC(=O)Oc1ccccc1C(=O)O', 'CN1C=NC2=C1C(=O)N(C)C(=O)N2C',
                'c1ccc2ccccc2c1', 'CC(N)C(=O)O', 'C']:
        m = mol_from_smiles(smi)
        native = morgan_fingerprint(m, 2, 2048)     # native path
        py = np.zeros(2048, dtype=np.uint8)
        for h in morgan_fingerprint_counts(m, 2):   # python path
            py[h % 2048] = 1
        assert np.array_equal(native, py), smi


def test_native_tanimoto_matrix():
    import numpy as np
    from deepchem_tpu.native import tanimoto_matrix_native, get_lib
    if get_lib() is None:
        import pytest
        pytest.skip('native toolchain unavailable')
    rng = np.random.RandomState(0)
    A = rng.rand(20, 1024) < 0.05
    B = rng.rand(30, 1024) < 0.05
    out = tanimoto_matrix_native(A, B)
    fa = A.astype(np.float32)
    fb = B.astype(np.float32)
    inter = fa @ fb.T
    union = fa.sum(1)[:, None] + fb.sum(1)[None, :] - inter
    ref = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    assert np.allclose(out, ref)


def test_canonical_smiles_preserves_tetrahedral_stereo():
    """Equivalent stereo writings (Daylight parity rule: even neighbor
    permutation keeps the tag, odd flips it) must canonicalize to ONE
    string; enantiomers must stay distinct."""
    from deepchem_tpu.chem import mol_from_smiles, mol_to_smiles

    def canon(s):
        return mol_to_smiles(mol_from_smiles(s))

    same = [
        ['C[C@H](N)O', 'C[C@@H](O)N', '[C@@H](C)(N)O', 'O[C@H](C)N',
         'N[C@@H](C)O'],
        ['C[C@@H](C(=O)O)N', 'N[C@H](C(=O)O)C', '[C@H](C)(C(=O)O)N'],
        ['[C@H]1(O)CCC1', 'O[C@H]1CCC1'],
    ]
    for group in same:
        outs = {canon(s) for s in group}
        assert len(outs) == 1, (group, outs)
        assert '@' in next(iter(outs))
    # enantiomers differ
    assert canon('C[C@H](N)O') != canon('C[C@@H](N)O')
    # round-trip stability
    for s in ['C[C@H](N)O', 'CC(C)(C)OC(=O)N1CCC[C@H]1C(=O)O']:
        c1 = canon(s)
        assert canon(c1) == c1 and '@' in c1


def test_canonical_smiles_preserves_ez_stereo():
    from deepchem_tpu.chem import mol_from_smiles, mol_to_smiles

    def canon(s):
        return mol_to_smiles(mol_from_smiles(s))

    def stereo_of(s):
        m = mol_from_smiles(s)
        return sorted(b.stereo for b in m.bonds
                      if b.order == 2.0 and b.stereo)

    groups = [
        (['F/C=C/F', 'F\\C=C\\F', 'C(/F)=C\\F'], ['trans']),
        (['F/C=C\\F', 'F\\C=C/F', 'C(/F)=C/F'], ['cis']),
        (['C/C=C\\C(=O)O', 'OC(=O)/C=C\\C'], ['cis']),
        (['C/C=C/C=C\\C', 'C\\C=C\\C=C/C'], ['cis', 'trans']),
    ]
    for group, cfg in groups:
        outs = {canon(s) for s in group}
        assert len(outs) == 1, (group, outs)
        out = next(iter(outs))
        assert stereo_of(out) == sorted(cfg)     # round-trips config
        assert canon(out) == out                 # idempotent
    assert canon('F/C=C/F') != canon('F/C=C\\F')


def test_canonical_smiles_fixed_point_on_fused_stereocenters():
    """Symmetric ring fusions with chirality used to oscillate between
    two canonical forms; the writer now iterates to a reparse-stable
    fixed point."""
    from deepchem_tpu.chem import mol_from_smiles, mol_to_smiles
    s = 'C1CCN2C[C@@H]3C[C@@H](CN4CCCC[C@H]34)[C@@H]2C1'
    c1 = mol_to_smiles(mol_from_smiles(s))
    c2 = mol_to_smiles(mol_from_smiles(c1))
    assert c1 == c2 and '@' in c1


def test_ez_canonical_independent_of_marked_flank():
    """One geometry written by marking EITHER substituent must give the
    same canonical string (the solver anchors flanks by canonical rank,
    not by which neighbor the input marked)."""
    from deepchem_tpu.chem import mol_from_smiles, mol_to_smiles

    def canon(s):
        return mol_to_smiles(mol_from_smiles(s))

    assert canon('C/C=C(/Br)Cl') == canon('C/C=C(\\Cl)Br')
    assert canon('C/C=C(\\Br)Cl') == canon('C/C=C(/Cl)Br')
    assert canon('C/C=C(/Br)Cl') != canon('C/C=C(\\Br)Cl')
    assert canon('Cl/C(C)=C(/Br)F') == canon('Cl/C(C)=C(\\F)Br')


def test_ez_preserved_through_ring_closure_flanks():
    """Exocyclic stereo double bonds whose only markable flank is a
    ring-closure bond keep their configuration (direction chars ride on
    the ring-closure digits)."""
    from deepchem_tpu.chem import mol_from_smiles, mol_to_smiles

    def n_ez(s):
        return sum(1 for b in mol_from_smiles(s).bonds if b.stereo)

    for s in ['O/N=C1C(=C\\c2ccccc2)/N2CCC/1CC2',
              'COc1ccccc1/C=C1C(=N/O)/C2CCN/1CC2']:
        c1 = mol_to_smiles(mol_from_smiles(s))
        assert mol_to_smiles(mol_from_smiles(c1)) == c1
        assert n_ez(c1) == n_ez(s)

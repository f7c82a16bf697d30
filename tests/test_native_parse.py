"""Native (C++) SMILES parse + perception vs the Python spec.

chemops.cpp parse_smiles_props is an exact port of chem/smiles.py +
chem/mol.py finalize; the full 125k local corpus (tox21 + muv +
chembl_5thresh) was swept offline with 0 mismatches and 0 fallbacks
(scripts + RESULTS.md).  Here: structural goldens + a 1,500-molecule
tox21 slice, both raw props and the ConvMolFeaturizer fast path.
"""

import csv
import gzip
import os

import numpy as np
import pytest

from deepchem_tpu.chem import mol_from_smiles
from deepchem_tpu.chem.native_parse import (native_available,
                                            parse_smiles_props)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native chemops unavailable')

HYB = {'S': 0, 'SP': 1, 'SP2': 2, 'SP3': 3, 'SP3D': 4, 'SP3D2': 5}
CHI = {'': 0, '@': 1, '@@': 2}

TRICKY = [
    'CCO', 'c1ccccc1', 'C1=CC=CC=C1', 'c1cc[nH]c1', 'C1=CC=CN1',
    'CC(=O)OC1=CC=CC=C1C(=O)O', 'O=C1NC=CC=C1', '[O-]C(=O)C', '[NH4+]',
    'C[C@H](N)C(=O)O', 'F/C=C/F', 'c1ccc2ccccc2c1', 'C1=CC2=CC=CC=C2C=C1',
    'CC(C)(C)c1ccc(O)cc1', 'C1CC1', 'N#Cc1ccccc1', 'CS(=O)(=O)O',
    'c1ccoc1', 'C1=COC=C1', '[cH-]1cccc1', '[se]1cccc1', 'C1=CC=C2C(=O)'
    'NC(=O)C2=C1', 'O=[N+]([O-])c1ccccc1', 'C%10CCCCC%10',
    'C1.C1', 'CC.OC', '[13CH4]', '[Na+].[Cl-]', 'c1ccc(-c2ccccc2)cc1',
]


def _pyprops(m):
    a = np.array(
        [[at.atomic_num, at.formal_charge, at.degree,
          at.implicit_valence, at.total_hs, HYB[at.hybridization],
          int(at.is_aromatic), CHI[at.chirality],
          at.num_radical_electrons, int(at.in_ring)] for at in m.atoms],
        np.int32)
    b = np.array(
        [[bd.a1, bd.a2, int(round(bd.order * 10)), int(bd.is_aromatic),
          int(bd.is_conjugated), int(bd.in_ring)] for bd in m.bonds],
        np.int32).reshape(-1, 6)
    return a, b


def _assert_same(smiles):
    c = parse_smiles_props(smiles)
    m = mol_from_smiles(smiles)
    if m is None:
        # native may be more conservative, never more permissive than
        # an equivalence failure: if it parses, props must match, so a
        # Python-reject means native must reject too
        assert c is None, smiles
        return
    if c is None:
        pytest.fail(f'native fallback on corpus molecule: {smiles}')
    pa, pb = _pyprops(m)
    np.testing.assert_array_equal(c[0], pa, err_msg=smiles)
    np.testing.assert_array_equal(c[1], pb, err_msg=smiles)


def test_tricky_structures():
    for s in TRICKY:
        _assert_same(s)


TOX21 = '/root/reference/datasets/tox21.csv.gz'


@pytest.mark.skipif(not os.path.exists(TOX21), reason='corpus missing')
def test_tox21_slice_equivalence():
    with gzip.open(TOX21, 'rt') as f:
        smiles = [r['smiles'] for r in csv.DictReader(f)]
    for s in smiles[::5][:1500]:
        _assert_same(s)


def test_rejects_malformed():
    for s in ['', 'C(', 'C)', 'C1CC', 'C%1', 'Cq', '[Xx]', 'C=.C']:
        assert parse_smiles_props(s) is None
        assert mol_from_smiles(s) is None


@pytest.mark.skipif(not os.path.exists(TOX21), reason='corpus missing')
def test_convmol_fast_path_equivalence():
    from deepchem_tpu.feat import ConvMolFeaturizer
    with gzip.open(TOX21, 'rt') as f:
        smiles = [r['smiles'] for r in csv.DictReader(f)][:400]
    feat = ConvMolFeaturizer()
    fast = feat.featurize(smiles)                      # native path
    mols = [mol_from_smiles(s) for s in smiles]
    slow = feat.featurize(mols)                        # python path
    for a, b in zip(fast, slow):
        ea = isinstance(a, np.ndarray) and a.size == 0
        eb = isinstance(b, np.ndarray) and b.size == 0
        assert ea == eb
        if ea:
            continue
        np.testing.assert_array_equal(a.node_features, b.node_features)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)


def test_convmol_fast_path_handles_failures():
    from deepchem_tpu.feat import ConvMolFeaturizer
    X = ConvMolFeaturizer().featurize(['CCO', 'garbage(', 'CCN'])
    assert X[0].node_features.shape[1] == 75
    assert isinstance(X[1], np.ndarray) and X[1].size == 0
    assert X[2].node_features.shape[1] == 75

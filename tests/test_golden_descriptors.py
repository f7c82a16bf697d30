"""Golden-fixture validation of the in-repo chem core against
RDKit-computed reference data (VERDICT r1 item 5).

The reference repo commits delaney-processed.csv
(/root/reference/datasets/delaney-processed.csv) whose descriptor columns
(Molecular Weight, H-Bond Donors, Rings, Rotatable Bonds, Polar Surface
Area) were produced by RDKit — 1128 molecules of pinned oracle values for
a chemistry stack that otherwise has only itself as oracle.

Measured agreement (round 2): MW 99.9%, HBD 99.5%, rings 99.7%,
rotatable 99.7%, TPSA 93.7% (the TPSA tail is the nitro-group
convention: the CSV's era of RDKit scored nitro as charge-separated
43.14; ours matches the modern published 45.82 for nitrobenzene).
"""
import gzip
import os

import numpy as np
import pandas as pd
import pytest

DELANEY = '/root/reference/datasets/delaney-processed.csv'


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(DELANEY):
        pytest.skip('reference delaney fixture not present')
    return pd.read_csv(DELANEY)


def _agreements(golden):
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.chem.descriptors import (num_h_donors, num_rings,
                                               num_rotatable_bonds, tpsa)
    rows = []
    for _, r in golden.iterrows():
        m = mol_from_smiles(r['smiles'].strip())
        assert m is not None, r['smiles']
        rows.append((
            abs(m.molecular_weight() - r['Molecular Weight']) < 0.3,
            num_h_donors(m) == r['Number of H-Bond Donors'],
            num_rings(m) == r['Number of Rings'],
            num_rotatable_bonds(m) == r['Number of Rotatable Bonds'],
            abs(tpsa(m) - r['Polar Surface Area']) < 0.5,
        ))
    return np.mean(np.array(rows, dtype=float), axis=0)


def test_descriptor_agreement_with_rdkit_goldens(golden):
    mw, hbd, rings, rot, tp = _agreements(golden)
    assert mw >= 0.995, f'molecular weight agreement {mw}'
    assert hbd >= 0.99, f'H-bond donor agreement {hbd}'
    assert rings >= 0.99, f'ring count agreement {rings}'
    assert rot >= 0.99, f'rotatable bond agreement {rot}'
    assert tp >= 0.92, f'TPSA agreement {tp}'


def test_aromatic_heteroatom_hydrogen_perception():
    """The kekulé-valence rules the goldens exposed: aromatic S/O carry
    no implicit H; substituted aromatic N is pyrrole-type."""
    from deepchem_tpu.chem import mol_from_smiles
    thiophene = mol_from_smiles('c1ccsc1')
    assert sum(a.total_hs for a in thiophene.atoms) == 4
    furan = mol_from_smiles('c1ccoc1')
    assert sum(a.total_hs for a in furan.atoms) == 4
    n_methylpyrrole = mol_from_smiles('Cn1cccc1')
    n1 = n_methylpyrrole.atoms[1]
    assert n1.atomic_num == 7 and n1.total_hs == 0
    caffeine = mol_from_smiles('Cn1cnc2c1c(=O)n(C)c(=O)n2C')
    # C8H10N4O2 -> MW 194.19
    assert abs(caffeine.molecular_weight() - 194.19) < 0.05


def test_nitro_tpsa_modern_convention():
    from deepchem_tpu.chem import mol_from_smiles
    from deepchem_tpu.chem.descriptors import tpsa
    assert abs(tpsa(mol_from_smiles('c1ccccc1N(=O)=O')) - 45.82) < 0.01

"""PDBQT read/write helpers (reference deepchem/utils/pdbqt_utils.py:
pdbqt_to_pdb, convert_mol_to_pdbqt, convert_protein_to_pdbqt)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def pdbqt_to_pdb(filename: Optional[str] = None,
                 pdbqt_data: Optional[List[str]] = None) -> str:
    """Strip PDBQT-specific columns/records to give plain PDB text
    (reference pdbqt_utils.pdbqt_to_pdb)."""
    if pdbqt_data is None:
        with open(filename) as f:
            pdbqt_data = f.readlines()
    pdb_lines = []
    for line in pdbqt_data:
        if line.startswith(('ATOM', 'HETATM')):
            pdb_lines.append(line[:66].rstrip() + '\n')
        elif line.startswith(('REMARK', 'ROOT', 'ENDROOT', 'BRANCH',
                              'ENDBRANCH', 'TORSDOF')):
            continue
        else:
            pdb_lines.append(line)
    return ''.join(pdb_lines)


def load_pdb_coordinates(path: str) -> Tuple[np.ndarray, List[str]]:
    """Coordinates + element symbols from PDB/PDBQT."""
    coords, elems = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(('ATOM', 'HETATM')):
                coords.append((float(line[30:38]), float(line[38:46]),
                               float(line[46:54])))
                elem = line[76:78].strip() or line[12:16].strip()[:1]
                elems.append(elem.capitalize())
    return np.asarray(coords), elems


def write_pdbqt(path: str, coords: np.ndarray, elements: List[str],
                charges: Optional[np.ndarray] = None) -> None:
    """Minimal rigid-molecule PDBQT writer (stand-in for the reference's
    openbabel/MGLTools delegation in convert_mol_to_pdbqt)."""
    coords = np.asarray(coords)
    if charges is None:
        charges = np.zeros(len(coords))
    with open(path, 'w') as f:
        f.write('ROOT\n')
        for i, ((x, y, z), el, q) in enumerate(
                zip(coords, elements, charges), start=1):
            f.write(f'ATOM  {i:5d}  {el:<3s} LIG A   1    '
                    f'{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00    '
                    f'{q:6.3f} {el:<2s}\n')
        f.write('ENDROOT\nTORSDOF 0\n')


def convert_mol_to_pdbqt(mol, outfile: str) -> None:
    """Write a small molecule with a conformer as rigid PDBQT
    (reference pdbqt_utils.convert_mol_to_pdbqt, there via RDKit PDB
    writing + pdbqt annotation).  Gasteiger charges fill the charge
    column."""
    from deepchem_tpu.chem.mol import ATOMIC_SYMBOL
    import numpy as _np
    coords = _np.asarray(mol.conformer, dtype=float)
    elements = [ATOMIC_SYMBOL.get(a.atomic_num, 'C') for a in mol.atoms]
    try:
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        qh, qimp = compute_gasteiger_charges(mol)
        charges = qh + qimp
    except Exception:
        charges = None
    write_pdbqt(outfile, coords, elements, charges)


def convert_protein_to_pdbqt(protein, outfile: str) -> None:
    """Write a (coords, elements) protein structure as rigid PDBQT
    (reference pdbqt_utils.convert_protein_to_pdbqt)."""
    coords, elements = protein
    write_pdbqt(outfile, coords, elements)

"""Docking file-format utilities (reference
deepchem/utils/docking_utils.py): Vina/GNINA configuration writers,
the GNINA log parser, multi-pose PDBQT output loading, and a
pdbfixer-free input-preparation helper built on the in-repo PDB/PDBQT
parsers.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['write_vina_conf', 'write_gnina_conf', 'read_gnina_log',
           'load_docked_ligands', 'prepare_inputs']


def write_vina_conf(protein_filename: str, ligand_filename: str,
                    centroid: np.ndarray, box_dims: np.ndarray,
                    conf_filename: str, num_modes: int = 9,
                    exhaustiveness: Optional[int] = None) -> None:
    """Write an AutoDock Vina configuration file (reference
    docking_utils.py:12)."""
    with open(conf_filename, 'w') as f:
        f.write('receptor = %s\n' % protein_filename)
        f.write('ligand = %s\n\n' % ligand_filename)
        f.write('center_x = %f\n' % centroid[0])
        f.write('center_y = %f\n' % centroid[1])
        f.write('center_z = %f\n\n' % centroid[2])
        f.write('size_x = %f\n' % box_dims[0])
        f.write('size_y = %f\n' % box_dims[1])
        f.write('size_z = %f\n\n' % box_dims[2])
        f.write('num_modes = %d\n\n' % num_modes)
        if exhaustiveness is not None:
            f.write('exhaustiveness = %d\n' % exhaustiveness)


def write_gnina_conf(protein_filename: str, ligand_filename: str,
                     conf_filename: str, num_modes: int = 9,
                     exhaustiveness: Optional[int] = None,
                     **kwargs) -> None:
    """Write a GNINA configuration file (reference
    docking_utils.py:60)."""
    with open(conf_filename, 'w') as f:
        f.write('receptor = %s\n' % protein_filename)
        f.write('ligand = %s\n\n' % ligand_filename)
        f.write('autobox_ligand = %s\n\n' % protein_filename)
        if exhaustiveness is not None:
            f.write('exhaustiveness = %d\n' % exhaustiveness)
        f.write('num_modes = %d\n\n' % num_modes)
        for k, v in kwargs.items():
            f.write('%s = %s\n' % (str(k), str(v)))


def read_gnina_log(log_file: str) -> np.ndarray:
    """Parse GNINA's per-mode (affinity, CNN pose score, CNN affinity)
    table from its log (reference docking_utils.py:105)."""
    scores = []
    lines = open(log_file).readlines()
    mode_start = np.inf
    for idx, line in enumerate(lines):
        if line[:6] == '-----+':
            mode_start = idx
        if idx > mode_start:
            mode = line.split()
            if not mode:
                break
            scores.append([float(x) for x in mode[1:]])
    return np.array(scores)


def load_docked_ligands(pdbqt_output: str
                        ) -> Tuple[List, List[float]]:
    """Load every pose from a Vina multi-MODEL PDBQT output
    (reference docking_utils.py:137).

    Returns (molecules, scores): one ``(coords, elements)`` structure
    per pose (the reference returns RDKit mols) and the Vina free
    energy of each pose from its ``REMARK VINA RESULT`` line.
    """
    with open(pdbqt_output) as f:
        lines = f.readlines()
    models: List[List[str]] = []
    scores: List[float] = []
    cur: Optional[List[str]] = None
    for line in lines:
        if line.startswith('MODEL'):
            cur = []
        elif line.startswith('ENDMDL'):
            if cur is not None:
                models.append(cur)
            cur = None
        else:
            if line.startswith('REMARK VINA RESULT'):
                scores.append(float(line.split()[3]))
            if cur is not None:
                cur.append(line)
    if cur:                        # file without ENDMDL terminator
        models.append(cur)
    molecules = []
    for model in models:
        coords, elements = [], []
        for line in model:
            if line.startswith(('ATOM', 'HETATM')):
                try:
                    coords.append((float(line[30:38]),
                                   float(line[38:46]),
                                   float(line[46:54])))
                except ValueError:
                    continue
                name = line[12:16].strip()
                elements.append(''.join(
                    c for c in name if c.isalpha())[:2].capitalize()
                    if name else 'C')
        molecules.append((np.asarray(coords), elements))
    return molecules, scores


def prepare_inputs(protein: str, ligand: str,
                   replace_nonstandard_residues: bool = True,
                   remove_heterogens: bool = True,
                   remove_water: bool = True,
                   add_hydrogens: bool = False,
                   pH: float = 7.0,
                   optimize_ligand: bool = True,
                   pdb_name: Optional[str] = None):
    """Sanitize a (protein PDB path, ligand SMILES-or-path) pair for
    docking (reference docking_utils.py:199, there via pdbfixer/RDKit).

    Protein: ATOM records are kept; HETATM heterogens and waters are
    dropped when requested; returns ``(coords, elements)``.  Ligand:
    a SMILES string is parsed and embedded in 3D with the in-repo
    conformer generator; a file path is parsed as PDB.  Hydrogen
    addition and pH-dependent protonation need a titration model that
    is not implemented — ``add_hydrogens=True`` raises.
    """
    if add_hydrogens:
        raise NotImplementedError(
            'pH-dependent protonation requires pdbfixer; '
            'pass add_hydrogens=False')
    coords, elements = [], []
    with open(protein) as f:
        for line in f:
            rec = line[:6].strip()
            if rec == 'HETATM':
                res = line[17:20].strip().upper()
                if remove_water and res in ('HOH', 'WAT'):
                    continue
                if remove_heterogens:
                    continue
            elif rec != 'ATOM':
                continue
            try:
                coords.append((float(line[30:38]), float(line[38:46]),
                               float(line[46:54])))
            except ValueError:
                continue
            name = line[76:78].strip() or line[12:16].strip()
            elements.append(''.join(
                c for c in name if c.isalpha())[:2].capitalize())
    p_mol = (np.asarray(coords), elements)

    if ligand.endswith(('.pdb', '.pdbqt')):
        from deepchem_tpu.utils.pdbqt_utils import load_pdb_coordinates
        l_mol = load_pdb_coordinates(ligand)
    else:
        from deepchem_tpu.chem.smiles import mol_from_smiles
        from deepchem_tpu.utils.conformers import embed_molecule_3d
        mol = mol_from_smiles(ligand)
        mol.conformer = [tuple(x) for x in
                         np.asarray(embed_molecule_3d(mol))]
        l_mol = mol
    return p_mol, l_mol

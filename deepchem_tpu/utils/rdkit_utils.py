"""RDKit-free molecule IO + geometry helpers under the reference's
``utils/rdkit_utils.py`` names.

The reference module is a grab-bag of RDKit glue the docking/complex
pipeline depends on (load_molecule/write_molecule, Gasteiger charges,
per-atom ECFP environments, ring geometry, contact centroids).  This
framework has no RDKit: SMILES/SDF molecules are the in-repo
``deepchem_tpu.chem.Molecule`` (full graph + optional conformer), and
PDB/PDBQT structures load as ``MolecularFragment`` shims (coords +
atomic numbers + partial charges).  Each function below implements the
reference semantics on those types and cites the reference line.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple, Union

import numpy as np

from deepchem_tpu.chem.mol import Molecule, ATOMIC_SYMBOL
from deepchem_tpu.utils.fragment_utils import (AtomShim, MolecularFragment,
                                               MoleculeLoadException,
                                               get_contact_atom_indices,
                                               merge_molecular_fragments)
from deepchem_tpu.utils.pdbqt_utils import pdbqt_to_pdb, write_pdbqt

logger = logging.getLogger(__name__)

_SYM_TO_Z = {v: k for k, v in ATOMIC_SYMBOL.items()}


def get_xyz_from_mol(mol) -> np.ndarray:
    """Coordinates of a loaded molecule as an (N, 3) array (reference
    rdkit_utils.py:28)."""
    if isinstance(mol, Molecule):
        if mol.conformer is None:
            raise ValueError('molecule has no conformer')
        return np.asarray(mol.conformer, dtype=np.float64)
    if hasattr(mol, 'GetCoords'):
        return np.asarray(mol.GetCoords(), dtype=np.float64)
    return np.asarray(mol, dtype=np.float64)


def add_hydrogens_to_mol(mol, is_protein: bool = False):
    """Hydrogen handling hook (reference rdkit_utils.py:52 shells out to
    pdbfixer).  In this framework hydrogens are implicit on the
    ``chem.Molecule`` graph (``atom.total_hs`` is already perceived) and
    PDB fragments keep whatever the file declares, so this is the
    identity; it exists so reference pipelines run unchanged."""
    return mol


def apply_pdbfixer(mol, hydrogenate: bool = True, is_protein: bool = False,
                   **kwargs):
    """Structure cleanup (reference rdkit_utils.py:75).  For PDB
    fragments: drops atoms whose element could not be assigned
    (atomic number < 1) — the same net effect the reference gets from
    pdbfixer's unknown-residue handling.  chem Molecules pass through."""
    if isinstance(mol, MolecularFragment):
        atoms = [a for a in mol.GetAtoms() if a.GetAtomicNum() >= 1]
        if len(atoms) != mol.GetNumAtoms():
            coords = np.asarray([a.GetCoords() for a in atoms])
            return MolecularFragment(atoms, coords)
    return mol


def compute_charges(mol):
    """Gasteiger partial charges, in place (reference
    rdkit_utils.py:155).  chem Molecules get the in-repo PEOE
    implementation; bond-less PDB fragments have no graph to iterate, so
    their shim charges are left as loaded (0 unless the file carried
    them) with a warning."""
    if isinstance(mol, Molecule):
        from deepchem_tpu.chem.gasteiger import gasteiger_charge_dict
        charges = gasteiger_charge_dict(mol)
        for a in mol.atoms:
            a.partial_charge = float(charges.get(a.index, 0.0))
        return mol
    logger.warning('compute_charges: fragment has no bond graph; '
                   'keeping charges as loaded')
    return mol


def _parse_mol2(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal TRIPOS mol2 reader: @<TRIPOS>ATOM records -> coords, Z."""
    coords, zs = [], []
    in_atoms = False
    with open(path) as f:
        for line in f:
            if line.startswith('@<TRIPOS>'):
                in_atoms = line.strip() == '@<TRIPOS>ATOM'
                continue
            if not in_atoms:
                continue
            parts = line.split()
            if len(parts) < 6:
                continue
            coords.append([float(parts[2]), float(parts[3]),
                           float(parts[4])])
            elem = parts[5].split('.')[0].capitalize()
            zs.append(_SYM_TO_Z.get(elem, -1))
    return np.asarray(coords, np.float64), np.asarray(zs, np.int32)


def load_molecule(molecule_file: str, add_hydrogens: bool = True,
                  calc_charges: bool = True, sanitize: bool = True,
                  is_protein: bool = False):
    """File -> (xyz, mol) (reference rdkit_utils.py:230; the (xyz, mol)
    ordering is relied on throughout the docking code).  .sdf loads as a
    chem.Molecule with its conformer; .pdb/.pdbqt/.mol2 load as
    MolecularFragment shims."""
    fname = str(molecule_file)
    if fname.endswith('.sdf'):
        from deepchem_tpu.chem.sdf import parse_sdf
        mols = [m for m, _ in parse_sdf(open(fname).read())
                if m is not None]
        if not mols:
            raise MoleculeLoadException(f'no molecules in {fname}')
        mol: Any = mols[0]
        if calc_charges:
            compute_charges(mol)
        return get_xyz_from_mol(mol), mol
    if fname.endswith('.mol2'):
        coords, zs = _parse_mol2(fname)
    elif fname.endswith('.pdbqt'):
        from deepchem_tpu.models.atomic_conv import pdb_atoms
        coords, zs = pdb_atoms(pdbqt_to_pdb(fname).splitlines())
    elif fname.endswith('.pdb'):
        from deepchem_tpu.models.atomic_conv import pdb_atoms
        coords, zs = pdb_atoms(fname)
    else:
        raise ValueError(f'Unrecognized file type for {fname}')
    if len(coords) == 0:
        raise MoleculeLoadException(f'no atoms parsed from {fname}')
    atoms = [AtomShim(int(z), 0.0, c) for z, c in zip(zs, coords)]
    frag = MolecularFragment(atoms, coords)
    if sanitize or add_hydrogens:
        frag = apply_pdbfixer(frag, hydrogenate=add_hydrogens,
                              is_protein=is_protein)
    if calc_charges:
        compute_charges(frag)
    return np.asarray(frag.GetCoords(), np.float64), frag


def load_complex(molecular_complex: Union[str, Sequence[str]],
                 add_hydrogens: bool = True, calc_charges: bool = True,
                 sanitize: bool = True):
    """Load every fragment of a complex (reference rdkit_utils.py:182)."""
    if isinstance(molecular_complex, str):
        molecular_complex = [molecular_complex]
    return [load_molecule(f, add_hydrogens=add_hydrogens,
                          calc_charges=calc_charges, sanitize=sanitize)
            for f in molecular_complex]


def write_molecule(mol, outfile: str, is_protein: bool = False) -> None:
    """Write a molecule to .sdf / .pdb / .pdbqt (reference
    rdkit_utils.py:312)."""
    if outfile.endswith('.sdf'):
        if not isinstance(mol, Molecule):
            raise ValueError('.sdf output needs a chem.Molecule')
        from deepchem_tpu.chem.sdf import write_sdf
        write_sdf(outfile, [mol])
        return
    coords = get_xyz_from_mol(mol)
    if isinstance(mol, Molecule):
        elements = [a.symbol for a in mol.atoms]
    else:
        elements = [ATOMIC_SYMBOL.get(a.GetAtomicNum(), 'X')
                    for a in mol.GetAtoms()]
    if outfile.endswith('.pdbqt'):
        write_pdbqt(outfile, coords, elements)
        return
    if outfile.endswith('.pdb'):
        with open(outfile, 'w') as f:
            for i, (c, e) in enumerate(zip(coords, elements)):
                f.write(f'ATOM  {i + 1:>5} {e:<4} MOL A   1    '
                        f'{c[0]:8.3f}{c[1]:8.3f}{c[2]:8.3f}'
                        f'  1.00  0.00          {e:>2}\n')
            f.write('END\n')
        return
    raise ValueError(f'Unsupported output format for {outfile}')


def merge_molecules_xyz(xyzs: Sequence[np.ndarray]) -> np.ndarray:
    """Concatenate coordinate blocks (reference rdkit_utils.py:356)."""
    return np.vstack([np.asarray(x) for x in xyzs])


def merge_molecules(molecules: Sequence) -> MolecularFragment:
    """Combine fragments into one (reference rdkit_utils.py:367)."""
    frags = []
    for m in molecules:
        if isinstance(m, Molecule):
            xyz = get_xyz_from_mol(m)
            frags.append(MolecularFragment(
                [AtomShim(a.atomic_num,
                          float(getattr(a, 'partial_charge', 0.0)), c)
                 for a, c in zip(m.atoms, xyz)], xyz))
        else:
            frags.append(m)
    return merge_molecular_fragments(frags)


def compute_all_ecfp(mol, indices: Optional[Set[int]] = None,
                     degree: int = 2) -> Dict[int, str]:
    """Per-atom ECFP environment identifiers (reference
    rdkit_utils.py:391 hashes an RDKit fragment SMILES; here the id is
    the in-repo Morgan environment invariant, which plays the same role
    in the SPLIF/contact-fingerprint voxelizers)."""
    from deepchem_tpu.feat.complex_featurizers import atom_environment_id
    n = (mol.num_atoms if isinstance(mol, Molecule)
         else mol.GetNumAtoms())
    return {i: atom_environment_id(mol, i, degree)
            for i in range(n) if indices is None or i in indices}


def compute_ecfp_features(mol, ecfp_degree: int = 2,
                          ecfp_power: int = 11) -> np.ndarray:
    """Hashed binary ECFP vector (reference rdkit_utils.py:429)."""
    from deepchem_tpu.chem.fingerprints import morgan_fingerprint
    return np.asarray(morgan_fingerprint(mol, radius=ecfp_degree,
                                         n_bits=2 ** ecfp_power))


def compute_contact_centroid(molecular_complex: Sequence,
                             cutoff: float = 4.5) -> np.ndarray:
    """Centroid of the contact region of a complex (reference
    rdkit_utils.py:454): mean of all atoms within cutoff of the other
    fragment."""
    frags = [(get_xyz_from_mol(m), m) if not isinstance(m, tuple) else m
             for m in molecular_complex]
    contacts = get_contact_atom_indices(frags, cutoff)
    pts = [frags[i][0][idx] for i, idx in enumerate(contacts)
           if len(idx)]
    if not pts:
        return np.mean(merge_molecules_xyz([f[0] for f in frags]), axis=0)
    return np.mean(np.vstack(pts), axis=0)


def compute_ring_center(mol, ring_indices: Sequence[int]) -> np.ndarray:
    """Centroid of a ring's atoms (reference rdkit_utils.py:544)."""
    xyz = get_xyz_from_mol(mol)
    return np.mean(xyz[list(ring_indices)], axis=0)


def compute_ring_normal(mol, ring_indices: Sequence[int]) -> np.ndarray:
    """Normal vector of a ring's plane (reference rdkit_utils.py:570)."""
    xyz = get_xyz_from_mol(mol)[list(ring_indices)]
    centered = xyz - xyz.mean(axis=0)
    # smallest principal axis = plane normal
    _, _, vt = np.linalg.svd(centered)
    return vt[-1]


def compute_all_pairs_shortest_path(mol) -> Dict[Tuple[int, int],
                                                 Tuple[int, int]]:
    """All-pairs graph distances over the bond graph (reference
    rdkit_utils.py:647 wraps RDKit GetDistanceMatrix)."""
    if not isinstance(mol, Molecule):
        raise ValueError('needs a bonded chem.Molecule')
    from collections import deque
    n = mol.num_atoms
    out: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for i in range(n):
        dist = {i: 0}
        dq = deque([i])
        while dq:
            u = dq.popleft()
            for v in mol.neighbors(u):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for j, d in dist.items():
            out[(i, j)] = (d, d)
    return out


def compute_pairwise_ring_info(mol):
    """Aromatic-ring (center, normal) list (reference
    rdkit_utils.py:672)."""
    if not isinstance(mol, Molecule):
        return []
    rings = [r for r in mol.rings()
             if all(mol.atoms[i].is_aromatic for i in r)]
    return [(compute_ring_center(mol, r), compute_ring_normal(mol, r))
            for r in rings]


class DescriptorsNormalizationParameters:
    """Per-descriptor normalization parameters (reference
    rdkit_utils.py:715 vendors descriptastorus's fitted scipy.stats
    distribution table for 200 RDKit descriptors).  This framework does
    not vendor that third-party constant table; instead
    ``fit(smiles_list)`` estimates normal-distribution parameters for
    the native descriptor set from data, producing the same
    ``desc_norm_params`` mapping shape: name -> ('norm', (mean, std))."""

    desc_norm_params: Dict[str, tuple] = {}

    @classmethod
    def fit(cls, smiles_list: Sequence[str],
            descriptor_names: Optional[Sequence[str]] = None
            ) -> Dict[str, tuple]:
        from deepchem_tpu.feat import RDKitDescriptors
        feat = RDKitDescriptors()
        X = np.stack(list(feat.featurize(smiles_list)))
        names = descriptor_names or list(feat.descriptors)
        mean = X.mean(axis=0)
        std = np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
        cls.desc_norm_params = {
            n: ('norm', (float(mean[i]), float(std[i])))
            for i, n in enumerate(names[:X.shape[1]])}
        return cls.desc_norm_params

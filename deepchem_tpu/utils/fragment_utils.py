"""Molecular fragment utilities (reference deepchem/utils/
fragment_utils.py: MolecularFragment, get_contact_atom_indices,
merge_molecular_fragments, strip_hydrogens)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Atom, Molecule


class MoleculeLoadException(Exception):
    """Raised when a structure file cannot be parsed (reference
    rdkit_utils.py:19; re-exported there)."""


class AtomShim:
    """Lightweight atom with coordinates (reference fragment_utils
    AtomShim)."""

    def __init__(self, atomic_num: int, partial_charge: float,
                 atom_coords: np.ndarray):
        self.atomic_num = atomic_num
        self.partial_charge = partial_charge
        self.coords = np.asarray(atom_coords)

    def GetAtomicNum(self) -> int:
        return self.atomic_num

    def GetPartialCharge(self) -> float:
        return self.partial_charge

    def GetCoords(self) -> np.ndarray:
        """Atom position (reference fragment_utils AtomShim.GetCoords)."""
        return self.coords


class MolecularFragment:
    """A subset of a molecule's atoms with coordinates (reference
    fragment_utils.MolecularFragment)."""

    def __init__(self, atoms: Sequence, coords: np.ndarray):
        self.atoms = list(atoms)
        self.coords = np.asarray(coords)

    def GetAtoms(self):
        return self.atoms

    def GetNumAtoms(self) -> int:
        return len(self.atoms)

    def GetCoords(self) -> np.ndarray:
        return self.coords


def get_partial_charge(atom) -> float:
    """(reference fragment_utils.get_partial_charge)"""
    if hasattr(atom, 'GetPartialCharge'):
        return atom.GetPartialCharge()
    return 0.0


def get_contact_atom_indices(frags: Sequence, cutoff: float = 4.5
                             ) -> List[List[int]]:
    """Atoms of each fragment within cutoff of the other (reference
    fragment_utils.get_contact_atom_indices)."""
    coords = [np.asarray(f[0] if isinstance(f, tuple) else f.GetCoords())
              for f in frags]
    if len(coords) != 2:
        raise ValueError('expects exactly two fragments')
    c1, c2 = coords
    d = np.linalg.norm(c1[:, None, :] - c2[None, :, :], axis=-1)
    keep1 = sorted(set(np.nonzero(d < cutoff)[0].tolist()))
    keep2 = sorted(set(np.nonzero(d < cutoff)[1].tolist()))
    return [keep1, keep2]


def reduce_molecular_complex_to_contacts(frags: Sequence,
                                         cutoff: float = 4.5):
    """(reference fragment_utils.reduce_molecular_complex_to_contacts)"""
    contacts = get_contact_atom_indices(frags, cutoff)
    out = []
    for frag, keep in zip(frags, contacts):
        coords = np.asarray(frag[0] if isinstance(frag, tuple)
                            else frag.GetCoords())
        mol = frag[1] if isinstance(frag, tuple) else frag
        atoms = (mol.GetAtoms() if hasattr(mol, 'GetAtoms')
                 else [AtomShim(a.atomic_num, 0.0, coords[i])
                       for i, a in enumerate(mol.atoms)])
        sel_atoms = [atoms[i] for i in keep]
        out.append(MolecularFragment(sel_atoms, coords[keep]))
    return out


def strip_hydrogens(coords: np.ndarray, mol) -> Tuple[np.ndarray,
                                                      'MolecularFragment']:
    """(reference fragment_utils.strip_hydrogens)"""
    coords = np.asarray(coords)
    if isinstance(mol, Molecule):
        zs = [a.atomic_num for a in mol.atoms]
        atoms = [AtomShim(z, 0.0, coords[i]) for i, z in enumerate(zs)]
    else:
        atoms = list(mol.GetAtoms())
        zs = [a.GetAtomicNum() for a in atoms]
    keep = [i for i, z in enumerate(zs) if z != 1]
    return coords[keep], MolecularFragment(
        [atoms[i] for i in keep], coords[keep])


def get_mol_subset(coords: np.ndarray, mol,
                   atom_indices_to_keep) -> 'MolecularFragment':
    """Extract a sub-fragment (reference fragment_utils.get_mol_subset).
    Returns a MolecularFragment over the kept atoms; accepts a
    Molecule, MolecularFragment, or anything with GetAtoms()."""
    atoms = mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms
    idx = list(atom_indices_to_keep)
    coords = np.asarray(coords)
    kept = []
    for i in idx:
        a = atoms[i]
        z = a.GetAtomicNum() if hasattr(a, 'GetAtomicNum') \
            else a.atomic_num
        q = get_partial_charge(a)
        kept.append(AtomShim(z, q, coords[i]))
    return MolecularFragment(kept, coords[idx])


def merge_molecular_fragments(molecules):
    """Concatenate several MolecularFragments into one (reference
    fragment_utils.merge_molecular_fragments); None for an empty
    list."""
    if len(molecules) == 0:
        return None
    all_atoms = []
    all_coords = []
    for m in molecules:
        all_atoms.extend(m.GetAtoms())
        all_coords.append(np.asarray(m.GetCoords()))
    return MolecularFragment(all_atoms, np.concatenate(all_coords, 0))


def compute_charges(mol):
    """Gasteiger charges (reference fragment_utils re-exports the
    rdkit_utils implementation)."""
    from deepchem_tpu.utils.rdkit_utils import compute_charges as _cc
    return _cc(mol)

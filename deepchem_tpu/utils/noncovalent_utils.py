"""Noncovalent interaction detection (reference
deepchem/utils/noncovalent_utils.py: hydrogen bonds, salt bridges,
pi-stacking / cation-pi between protein and ligand fragments)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

HBOND_DIST_CUTOFF = 4.0
SALT_BRIDGE_CUTOFF = 5.0
PI_STACK_DIST_CUTOFF = 4.4
CATION_PI_CUTOFF = 6.5


def compute_hbonds(coords1: np.ndarray, elems1: Sequence[str],
                   coords2: np.ndarray, elems2: Sequence[str],
                   dist_cutoff: float = HBOND_DIST_CUTOFF
                   ) -> List[Tuple[int, int]]:
    """Donor/acceptor heavy-atom pairs within cutoff (distance-only
    criterion, like the reference's binning variant)."""
    polar1 = [i for i, e in enumerate(elems1) if e in ('N', 'O')]
    polar2 = [j for j, e in enumerate(elems2) if e in ('N', 'O')]
    out = []
    for i in polar1:
        d = np.linalg.norm(coords2[polar2] - coords1[i], axis=1)
        for k, j in enumerate(polar2):
            if d[k] < dist_cutoff:
                out.append((i, j))
    return out


def compute_salt_bridges(coords1: np.ndarray, charges1: Sequence[float],
                         coords2: np.ndarray, charges2: Sequence[float],
                         cutoff: float = SALT_BRIDGE_CUTOFF
                         ) -> List[Tuple[int, int]]:
    """Oppositely-charged atom pairs within cutoff (reference
    compute_salt_bridges)."""
    out = []
    c1 = np.asarray(charges1)
    c2 = np.asarray(charges2)
    pos1 = np.nonzero(c1 > 0.3)[0]
    neg1 = np.nonzero(c1 < -0.3)[0]
    pos2 = np.nonzero(c2 > 0.3)[0]
    neg2 = np.nonzero(c2 < -0.3)[0]
    for a_idx, b_idx in ((pos1, neg2), (neg1, pos2)):
        for i in a_idx:
            d = np.linalg.norm(coords2[b_idx] - coords1[i], axis=1)
            for k, j in enumerate(b_idx):
                if d[k] < cutoff:
                    out.append((int(i), int(j)))
    return out


def compute_ring_center(coords: np.ndarray,
                        ring_indices: Sequence[int]) -> np.ndarray:
    """(reference compute_ring_center)"""
    return np.mean(np.asarray(coords)[list(ring_indices)], axis=0)


def compute_ring_normal(coords: np.ndarray,
                        ring_indices: Sequence[int]) -> np.ndarray:
    """(reference compute_ring_normal)"""
    pts = np.asarray(coords)[list(ring_indices)]
    centered = pts - pts.mean(axis=0)
    _, _, vh = np.linalg.svd(centered)
    return vh[2]


def is_pi_parallel(center1, normal1, center2, normal2,
                   dist_cutoff: float = PI_STACK_DIST_CUTOFF,
                   angle_cutoff: float = 30.0) -> bool:
    """(reference is_pi_parallel)"""
    dist = np.linalg.norm(np.asarray(center1) - np.asarray(center2))
    cosang = abs(np.dot(normal1, normal2) /
                 (np.linalg.norm(normal1) * np.linalg.norm(normal2)))
    angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    return dist < dist_cutoff and angle < angle_cutoff


def is_pi_t(center1, normal1, center2, normal2,
            dist_cutoff: float = 5.5,
            angle_cutoff: float = 30.0) -> bool:
    """T-shaped stacking (reference is_pi_t)."""
    dist = np.linalg.norm(np.asarray(center1) - np.asarray(center2))
    cosang = abs(np.dot(normal1, normal2) /
                 (np.linalg.norm(normal1) * np.linalg.norm(normal2)))
    angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    return dist < dist_cutoff and abs(angle - 90.0) < angle_cutoff


def compute_pi_stack(rings1: Sequence[Sequence[int]], coords1: np.ndarray,
                     rings2: Sequence[Sequence[int]], coords2: np.ndarray
                     ) -> List[Tuple[int, int, str]]:
    """All (ring_i, ring_j, 'parallel'|'t-shaped') stacks (reference
    compute_pi_stack)."""
    out = []
    for i, r1 in enumerate(rings1):
        c1 = compute_ring_center(coords1, r1)
        n1 = compute_ring_normal(coords1, r1)
        for j, r2 in enumerate(rings2):
            c2 = compute_ring_center(coords2, r2)
            n2 = compute_ring_normal(coords2, r2)
            if is_pi_parallel(c1, n1, c2, n2):
                out.append((i, j, 'parallel'))
            elif is_pi_t(c1, n1, c2, n2):
                out.append((i, j, 't-shaped'))
    return out


def compute_cation_pi(ring_centers: Sequence[np.ndarray],
                      cation_coords: np.ndarray,
                      cutoff: float = CATION_PI_CUTOFF
                      ) -> List[Tuple[int, int]]:
    """(reference compute_cation_pi)"""
    out = []
    for i, c in enumerate(ring_centers):
        d = np.linalg.norm(np.asarray(cation_coords) - np.asarray(c),
                           axis=1)
        for j in np.nonzero(d < cutoff)[0]:
            out.append((i, int(j)))
    return out


# -- reference fragment-tuple API (reference noncovalent_utils.py) -----------

def _frag_atoms(mol):
    """Atoms of a loaded fragment or chem Molecule."""
    return mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms


def _atomic_num(atom) -> int:
    return (atom.GetAtomicNum() if hasattr(atom, 'GetAtomicNum')
            else atom.atomic_num)


def is_salt_bridge(atom_i, atom_j) -> bool:
    """Two atoms whose partial charges differ by ~2e form a salt bridge
    (reference noncovalent_utils.py:11)."""
    from deepchem_tpu.utils.fragment_utils import get_partial_charge
    return bool(abs(2.0 - abs(get_partial_charge(atom_i)
                              - get_partial_charge(atom_j))) < 0.01)


def is_hydrogen_bond(frag1, frag2, contact,
                     hbond_angle_cutoff: float = 40.0) -> bool:
    """Whether the (i, j) contact between two (coords, mol) fragments is a
    hydrogen bond (reference noncovalent_utils.py:52): both heavy atoms
    N/O, with a hydrogen within 1.3 A of either whose donor->H->acceptor
    angle deviates from linear by less than the cutoff."""
    frag1_xyz, frag1_mol = frag1
    frag2_xyz, frag2_mol = frag2
    i, j = int(contact[0]), int(contact[1])
    a1 = np.asarray(frag1_xyz)[i]
    a2 = np.asarray(frag2_xyz)[j]
    atoms1 = _frag_atoms(frag1_mol)
    atoms2 = _frag_atoms(frag2_mol)
    if _atomic_num(atoms1[i]) not in (7, 8) or \
            _atomic_num(atoms2[j]) not in (7, 8):
        return False
    hydrogens = []
    for xyz, mol, heavy in ((frag2_xyz, frag2_mol, a2),
                            (frag1_xyz, frag1_mol, a1)):
        xyz = np.asarray(xyz)
        for k, atom in enumerate(_frag_atoms(mol)):
            if _atomic_num(atom) == 1 and \
                    np.linalg.norm(xyz[k] - heavy) < 1.3:
                hydrogens.append(xyz[k])
    for h in hydrogens:
        v1 = a1 - h
        v2 = a2 - h
        cosang = np.dot(v1, v2) / max(np.linalg.norm(v1)
                                      * np.linalg.norm(v2), 1e-12)
        angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        if angle > 180.0 - hbond_angle_cutoff:
            return True
    return False


def compute_hbonds_in_range(frag1, frag2, pairwise_distances,
                            hbond_dist_bin, hbond_angle_cutoff
                            ) -> List[Tuple[int, int]]:
    """All hydrogen-bond contacts within one distance bin (reference
    noncovalent_utils.py:113)."""
    lo, hi = hbond_dist_bin
    ii, jj = np.nonzero((pairwise_distances > lo)
                        & (pairwise_distances < hi))
    return [(int(i), int(j)) for i, j in zip(ii, jj)
            if is_hydrogen_bond(frag1, frag2, (i, j), hbond_angle_cutoff)]


def compute_hydrogen_bonds(frag1, frag2, pairwise_distances,
                           hbond_dist_bins, hbond_angle_cutoffs
                           ) -> List[List[Tuple[int, int]]]:
    """Hydrogen bonds per distance bin (reference
    noncovalent_utils.py:143)."""
    return [compute_hbonds_in_range(frag1, frag2, pairwise_distances,
                                    dist_bin, hbond_angle_cutoffs[i])
            for i, dist_bin in enumerate(hbond_dist_bins)]


def is_cation_pi(cation_position, ring_center, ring_normal,
                 dist_cutoff: float = 6.5,
                 angle_cutoff: float = 30.0) -> bool:
    """Cation within dist_cutoff of a ring center, near the ring axis
    (reference noncovalent_utils.py:232)."""
    vec = np.asarray(cation_position) - np.asarray(ring_center)
    dist = np.linalg.norm(vec)
    cosang = np.dot(vec, ring_normal) / max(
        dist * np.linalg.norm(ring_normal), 1e-12)
    angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    return bool((angle < angle_cutoff or angle > 180.0 - angle_cutoff)
                and dist < dist_cutoff)


def _cation_pi_counts(pi_mol, cation_mol, **kwargs):
    """Rings of pi_mol vs formally-positive atoms of cation_mol ->
    (ring-atom counter, cation counter)."""
    from collections import Counter
    from deepchem_tpu.utils.rdkit_utils import (get_xyz_from_mol,
                                                compute_ring_center,
                                                compute_ring_normal)
    pi_counts: 'Counter' = Counter()
    cation_counts: 'Counter' = Counter()
    if not hasattr(pi_mol, 'rings'):
        return pi_counts, cation_counts
    rings = [r for r in pi_mol.rings()
             if all(pi_mol.atoms[i].is_aromatic for i in r)]
    cation_xyz = get_xyz_from_mol(cation_mol)
    cations = [i for i, a in enumerate(_frag_atoms(cation_mol))
               if getattr(a, 'formal_charge', 0) > 0]
    for r in rings:
        center = compute_ring_center(pi_mol, r)
        normal = compute_ring_normal(pi_mol, r)
        for ci in cations:
            if is_cation_pi(cation_xyz[ci], center, normal, **kwargs):
                for ai in r:
                    pi_counts[int(ai)] += 1
                cation_counts[int(ci)] += 1
    return pi_counts, cation_counts


def compute_binding_pocket_cation_pi(mol1, mol2, **kwargs):
    """Cation-pi interaction counts both ways between two molecules
    (reference noncovalent_utils.py:430): returns dicts mapping atom
    index -> number of interactions, for mol1 and mol2."""
    from collections import Counter
    m1_pi, m2_cation = _cation_pi_counts(mol1, mol2, **kwargs)
    m2_pi, m1_cation = _cation_pi_counts(mol2, mol1, **kwargs)
    mol1_counts: 'Counter' = Counter()
    mol1_counts.update(m1_pi)
    mol1_counts.update(m1_cation)
    mol2_counts: 'Counter' = Counter()
    mol2_counts.update(m2_pi)
    mol2_counts.update(m2_cation)
    return dict(mol1_counts), dict(mol2_counts)

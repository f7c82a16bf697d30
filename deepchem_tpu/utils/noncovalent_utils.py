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

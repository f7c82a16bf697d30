"""Graph-based molecular descriptors (TPSA, Chi/Kappa indices, etc).

The reference gets these from RDKit (feat/molecule_featurizers/
rdkit_descriptors.py); here they are computed from the in-repo molecular
graph with the published formulas:

- TPSA: Ertl, Rohde & Selzer 2000 fragment contributions (N/O, with the
  optional S/P extension) — published parameter table.
- Chi connectivity indices: Randic 1975 / Kier & Hall valence variants.
- Kappa shape indices: Kier 1985.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from .mol import Molecule, BOND_AROMATIC

# valence electron counts for the Kier-Hall valence delta
_VALENCE_ELECTRONS = {1: 1, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7, 14: 4, 15: 5,
                      16: 6, 17: 7, 35: 7, 53: 7}


def _bond_profile(mol: Molecule, idx: int) -> Tuple[int, int, int, int]:
    """(n_single, n_double, n_triple, n_aromatic) heavy-atom bonds."""
    s = d = t = a = 0
    for b in mol.atom_bonds(idx):
        if b.is_aromatic or b.order == BOND_AROMATIC:
            a += 1
        elif b.order == 1.0:
            s += 1
        elif b.order == 2.0:
            d += 1
        elif b.order == 3.0:
            t += 1
    return s, d, t, a


def tpsa(mol: Molecule, include_sandp: bool = False) -> float:
    """Topological polar surface area (Ertl 2000).  With
    ``include_sandp`` the S/P extension contributions are added."""
    total = 0.0
    for atom in mol.atoms:
        z = atom.atomic_num
        if z not in (7, 8) and not (include_sandp and z in (15, 16)):
            continue
        i = atom.index
        s, d, t, a = _bond_profile(mol, i)
        h = atom.total_hs
        q = atom.formal_charge
        ring3 = mol.is_atom_in_ring_of_size(i, 3)
        c = 0.0
        if z == 7:
            if a >= 2:                         # aromatic nitrogen
                if q == 0:
                    if h == 0:
                        if a == 3:
                            c = 4.41
                        elif s == 1:
                            c = 4.93
                        elif d == 1:
                            c = 8.39
                        else:
                            c = 12.89
                    else:
                        c = 15.79
                else:                          # n+
                    if h == 0:
                        c = 4.10 if a == 3 else 3.88
                    else:
                        c = 14.14
            elif q == 0:
                if h == 0:
                    if t == 1 and d == 1:
                        c = 13.60
                    elif t == 1:
                        c = 23.79
                    elif d == 2:
                        c = 11.68
                    elif d == 1:
                        c = 12.36
                    elif ring3:
                        c = 3.01
                    else:
                        c = 3.24
                elif h == 1:
                    if d == 1:
                        c = 23.85
                    elif ring3:
                        c = 21.94
                    else:
                        c = 12.03
                else:
                    c = 26.02
            elif q > 0:
                if h == 0:
                    if t == 1:
                        c = 4.36
                    elif d == 1:
                        c = 3.01
                    else:
                        c = 0.0
                elif h == 1:
                    c = 13.97 if d == 1 else 4.44
                elif h == 2:
                    c = 25.59 if d == 1 else 16.61
                else:
                    c = 27.64
        elif z == 8:
            if a >= 2:
                c = 13.14
            elif q < 0:
                c = 23.06
            elif h >= 1:
                c = 20.23
            elif d == 1:
                c = 17.07
            elif ring3:
                c = 12.53
            else:
                c = 9.23
        elif z == 16:                          # S extension
            if a >= 2:
                c = 28.24 if h == 0 else 28.24
            elif h >= 1:
                c = 38.80
            elif d == 2:
                c = 8.38 if s == 2 else 32.09
            elif d == 1:
                c = 19.21 if s == 2 else 32.09
            else:
                c = 25.30
        elif z == 15:                          # P extension
            if d == 1 and s == 3:
                c = 9.81
            elif d == 1:
                c = 34.14
            elif h >= 1:
                c = 23.47
            else:
                c = 13.59
        total += c
    return total


def _delta(mol: Molecule, idx: int) -> float:
    return float(mol.atoms[idx].degree)


def _delta_v(mol: Molecule, idx: int) -> float:
    a = mol.atoms[idx]
    zv = _VALENCE_ELECTRONS.get(a.atomic_num, 4)
    z = a.atomic_num
    h = a.total_hs
    if z <= 10:
        return float(zv - h)
    return (zv - h) / max(z - zv - 1.0, 1.0)


def chi0(mol: Molecule, valence: bool = False) -> float:
    f = _delta_v if valence else _delta
    out = 0.0
    for i in range(mol.num_atoms):
        d = f(mol, i)
        if d > 0:
            out += 1.0 / math.sqrt(d)
    return out


def chi1(mol: Molecule, valence: bool = False) -> float:
    f = _delta_v if valence else _delta
    out = 0.0
    for b in mol.bonds:
        d1, d2 = f(mol, b.a1), f(mol, b.a2)
        if d1 > 0 and d2 > 0:
            out += 1.0 / math.sqrt(d1 * d2)
    return out


def _path_counts(mol: Molecule, length: int) -> int:
    """Number of simple paths with ``length`` bonds."""
    if length == 1:
        return mol.num_bonds
    count = 0

    def dfs(start: int, cur: int, depth: int, visited: set):
        nonlocal count
        if depth == length:
            if cur > start:          # count each path once
                count += 1
            return
        for nb in mol.neighbors(cur):
            if nb not in visited:
                visited.add(nb)
                dfs(start, nb, depth + 1, visited)
                visited.discard(nb)

    for i in range(mol.num_atoms):
        dfs(i, i, 0, {i})
    # paths counted from both endpoints when cur > start filters half;
    # depth-first from each start counts each path exactly once with the
    # cur > start guard applied at full depth
    return count


def kappa1(mol: Molecule) -> float:
    A = mol.num_atoms
    P1 = max(mol.num_bonds, 1)
    return A * (A - 1.0) ** 2 / P1 ** 2


def kappa2(mol: Molecule) -> float:
    A = mol.num_atoms
    P2 = max(_path_counts(mol, 2), 1)
    return (A - 1.0) * (A - 2.0) ** 2 / P2 ** 2


def kappa3(mol: Molecule) -> float:
    A = mol.num_atoms
    P3 = max(_path_counts(mol, 3), 1)
    if A % 2:
        return (A - 1.0) * (A - 3.0) ** 2 / P3 ** 2
    return (A - 3.0) * (A - 2.0) ** 2 / P3 ** 2


def hall_kier_alpha(mol: Molecule) -> float:
    """Sum of (r_cov / r_Csp3 - 1) over atoms (Kier-Hall alpha)."""
    r_csp3 = 0.77
    radii = {(6, 'SP3'): 0.77, (6, 'SP2'): 0.67, (6, 'SP'): 0.60,
             (7, 'SP3'): 0.74, (7, 'SP2'): 0.62, (7, 'SP'): 0.55,
             (8, 'SP3'): 0.74, (8, 'SP2'): 0.62,
             (9, 'SP3'): 0.72, (15, 'SP3'): 1.10, (16, 'SP3'): 1.04,
             (16, 'SP2'): 0.94, (17, 'SP3'): 0.99, (35, 'SP3'): 1.14,
             (53, 'SP3'): 1.33}
    out = 0.0
    for a in mol.atoms:
        hyb = 'SP2' if a.is_aromatic else a.hybridization
        r = radii.get((a.atomic_num, hyb),
                      radii.get((a.atomic_num, 'SP3'), 0.77))
        out += r / r_csp3 - 1.0
    return out


def num_valence_electrons(mol: Molecule) -> int:
    out = 0
    for a in mol.atoms:
        out += _VALENCE_ELECTRONS.get(a.atomic_num,
                                      max(a.atomic_num % 8, 1))
        out += a.total_hs
    return out


def crippen_logp(mol: Molecule) -> float:
    """Coarse octanol/water logP from atomic contributions.

    NOT the full 68-type Wildman-Crippen scheme the reference uses via
    RDKit — a documented approximation with per-element/environment
    contributions fit to the same trends (hydrophobic C positive, polar
    N/O negative, halogens positive).
    """
    logp = 0.0
    for a in mol.atoms:
        z = a.atomic_num
        if z == 6:
            if a.is_aromatic:
                logp += 0.29
            elif any(mol.atoms[nb].atomic_num not in (6, 1)
                     for nb in mol.neighbors(a.index)):
                logp += 0.08
            else:
                logp += 0.36
        elif z == 7:
            logp += -0.60 if a.total_hs else -0.32
        elif z == 8:
            logp += -0.40 if a.total_hs else -0.17
        elif z == 9:
            logp += 0.22
        elif z == 17:
            logp += 0.65
        elif z == 35:
            logp += 0.89
        elif z == 53:
            logp += 1.10
        elif z == 16:
            logp += 0.25
        elif z == 15:
            logp += -0.5
    return logp


def num_h_donors(mol: Molecule) -> int:
    """Lipinski H-bond donors: N or O bearing at least one hydrogen
    (RDKit Lipinski.NumHDonors counts the heavy atoms, not the Hs)."""
    return sum(1 for a in mol.atoms
               if a.atomic_num in (7, 8) and a.total_hs > 0)


def num_h_acceptors(mol: Molecule) -> int:
    """Lipinski H-bond acceptors: N and O atoms."""
    return sum(1 for a in mol.atoms if a.atomic_num in (7, 8))


def num_rings(mol: Molecule) -> int:
    """SSSR ring count (RDKit RingInfo.NumRings)."""
    return len(mol.rings())


def num_rotatable_bonds(mol: Molecule, strict: bool = True) -> int:
    """RDKit rotatable-bond count.  strict=True mirrors RDKit's strict
    pattern (used by the reference's committed delaney descriptors):
    single non-ring bonds between non-terminal atoms without triple
    bonds, excluding amide C-N bonds."""
    def ok(idx: int) -> bool:
        a = mol.atoms[idx]
        if a.degree <= 1:
            return False
        return not any(b.order == 3.0 for b in mol.atom_bonds(idx))

    def is_acyl_hetero(b) -> bool:
        # [CD3](=[N,O,S])-[#7,O,S]: amide/ester/thioester/amidine link
        for c_idx, x_idx in ((b.a1, b.a2), (b.a2, b.a1)):
            c = mol.atoms[c_idx]
            if c.atomic_num == 6 and c.degree == 3 \
                    and mol.atoms[x_idx].atomic_num in (7, 8, 16):
                if any(ob.order == 2.0
                       and mol.atoms[ob.other(c_idx)].atomic_num
                       in (7, 8, 16)
                       for ob in mol.atom_bonds(c_idx)):
                    return True
        return False

    def is_symmetric_terminal_group(idx: int) -> bool:
        # CF3 / CCl3 / CBr3 / C(CH3)3 — rotation is a symmetry operation
        a = mol.atoms[idx]
        if a.atomic_num != 6:
            return False
        nbr_z = sorted(mol.atoms[ob.other(idx)].atomic_num
                       for ob in mol.atom_bonds(idx)
                       if mol.atoms[ob.other(idx)].degree == 1
                       or (mol.atoms[ob.other(idx)].atomic_num == 6
                           and mol.atoms[ob.other(idx)].total_hs == 3))
        for z in (9, 17, 35, 6):
            if nbr_z.count(z) >= 3:
                return True
        return False

    n = 0
    for b in mol.bonds:
        # a non-ring bond flagged aromatic by perception (biaryl link) is
        # geometrically a rotatable single bond
        if b.in_ring or b.order not in (1.0, 1.5):
            continue
        if not (ok(b.a1) and ok(b.a2)):
            continue
        if strict and (is_acyl_hetero(b)
                       or is_symmetric_terminal_group(b.a1)
                       or is_symmetric_terminal_group(b.a2)):
            continue
        n += 1
    return n

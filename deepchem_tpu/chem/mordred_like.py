"""Mordred-style descriptor families computed natively (no mordred pkg).

The reference's MordredDescriptors (feat/molecule_featurizers/
mordred_descriptors.py) wraps the external ``mordred`` package (1613 2D
descriptors).  That package is unavailable in this environment, so this
module implements the most-cited mordred families directly on the in-repo
:class:`~deepchem_tpu.chem.mol.Molecule`:

- Moreau-Broto autocorrelation (ATS / AATS, raw and averaged) and the
  centered variants (ATSC / AATSC), topological distances 0-7
- Moran (MATS) and Geary (GATS) autocorrelation, distances 1-8
- BCUT descriptors: lowest/highest eigenvalue of the Burden matrix per
  atomic property
- Electrotopological state (EState) aggregates and per-element sums
- Classical topological indices (Wiener, Zagreb, Randic, Balaban J,
  eccentric connectivity, radius/diameter)

Atomic property weights follow the mordred convention of carbon-scaled
physical constants (mass, van-der-Waals volume, Pauling electronegativity,
polarizability, first ionization energy) plus Gasteiger PEOE charge and
atomic number.  Descriptors are computed on the heavy-atom graph (implicit
hydrogens contribute through the valence-dependent terms only); values are
therefore this framework's own well-defined descriptor set in mordred's
families, not bit-reproductions of the mordred package — they are pinned
by golden tests for stability instead.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Molecule

# physical constants per atomic number ------------------------------------

# Pauling electronegativity
_EN = {1: 2.20, 3: 0.98, 4: 1.57, 5: 2.04, 6: 2.55, 7: 3.04, 8: 3.44,
       9: 3.98, 11: 0.93, 12: 1.31, 13: 1.61, 14: 1.90, 15: 2.19,
       16: 2.58, 17: 3.16, 19: 0.82, 20: 1.00, 26: 1.83, 29: 1.90,
       30: 1.65, 33: 2.18, 34: 2.55, 35: 2.96, 50: 1.96, 53: 2.66}
# dipole polarizability, A^3
_POLARIZABILITY = {1: 0.667, 3: 24.3, 4: 5.60, 5: 3.03, 6: 1.76, 7: 1.10,
                   8: 0.802, 9: 0.557, 11: 24.1, 12: 10.6, 13: 6.8,
                   14: 5.38, 15: 3.63, 16: 2.90, 17: 2.18, 19: 43.4,
                   20: 22.8, 26: 8.4, 29: 6.2, 30: 6.4, 33: 4.31,
                   34: 3.77, 35: 3.05, 50: 7.7, 53: 5.35}
# van der Waals radius, A
_VDW_R = {1: 1.20, 3: 1.82, 4: 1.53, 5: 1.92, 6: 1.70, 7: 1.55, 8: 1.52,
          9: 1.47, 11: 2.27, 12: 1.73, 13: 1.84, 14: 2.10, 15: 1.80,
          16: 1.80, 17: 1.75, 19: 2.75, 20: 2.31, 26: 2.05, 29: 1.40,
          30: 1.39, 33: 1.85, 34: 1.90, 35: 1.85, 50: 2.17, 53: 1.98}
# first ionization energy, eV
_IONIZATION = {1: 13.598, 3: 5.392, 4: 9.323, 5: 8.298, 6: 11.260,
               7: 14.534, 8: 13.618, 9: 17.423, 11: 5.139, 12: 7.646,
               13: 5.986, 14: 8.152, 15: 10.487, 16: 10.360, 17: 12.968,
               19: 4.341, 20: 6.113, 26: 7.902, 29: 7.726, 30: 9.394,
               33: 9.789, 34: 9.752, 35: 11.814, 50: 7.344, 53: 10.451}
# principal quantum number of the valence shell
_PQN = {1: 1}
_PQN.update({z: 2 for z in range(3, 11)})
_PQN.update({z: 3 for z in range(11, 19)})
_PQN.update({z: 4 for z in range(19, 37)})
_PQN.update({z: 5 for z in range(37, 55)})
_PQN.update({z: 6 for z in range(55, 87)})

_VALENCE_ELECTRONS = {1: 1, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7,
                      11: 1, 12: 2, 13: 3, 14: 4, 15: 5, 16: 6, 17: 7,
                      19: 1, 20: 2, 33: 5, 34: 6, 35: 7, 50: 4, 53: 7}

_C_VDW_VOL = 4.0 / 3.0 * np.pi * _VDW_R[6] ** 3

# the property alphabet: mordred's letters -> per-atom value function
_PROPS = ('m', 'v', 'e', 'p', 'i', 'Z', 'c', 's')


def _vdw_volume(z: int) -> float:
    r = _VDW_R.get(z, _VDW_R[6])
    return 4.0 / 3.0 * np.pi * r ** 3


def distance_matrix(mol: Molecule) -> np.ndarray:
    """All-pairs topological distances over the heavy-atom graph (BFS per
    atom); unreachable pairs (disconnected components) hold -1."""
    n = mol.num_atoms
    dmat = np.full((n, n), -1, dtype=np.int32)
    for src in range(n):
        dmat[src, src] = 0
        q = deque([src])
        while q:
            cur = q.popleft()
            for nb in mol.neighbors(cur):
                if dmat[src, nb] < 0:
                    dmat[src, nb] = dmat[src, cur] + 1
                    q.append(nb)
    return dmat


def intrinsic_state(mol: Molecule) -> np.ndarray:
    """Kier-Hall intrinsic state I = ((2/n)^2 * delta_v + 1) / delta."""
    out = np.zeros(mol.num_atoms)
    for idx, a in enumerate(mol.atoms):
        zv = _VALENCE_ELECTRONS.get(a.atomic_num, 4)
        delta_v = float(zv - a.total_hs)
        delta = max(float(a.degree), 1.0)
        pqn = _PQN.get(a.atomic_num, 2)
        out[idx] = ((2.0 / pqn) ** 2 * delta_v + 1.0) / delta
    return out


def estate_indices(mol: Molecule,
                   dmat: np.ndarray = None) -> np.ndarray:
    """EState index S_i = I_i + sum_j (I_i - I_j) / (d_ij + 1)^2."""
    if dmat is None:
        dmat = distance_matrix(mol)
    I = intrinsic_state(mol)
    n = mol.num_atoms
    S = I.copy()
    for i in range(n):
        for j in range(n):
            if i != j and dmat[i, j] > 0:
                S[i] += (I[i] - I[j]) / float(dmat[i, j] + 1) ** 2
    return S


def atom_properties(mol: Molecule) -> Dict[str, np.ndarray]:
    """Carbon-scaled atomic property vectors for the descriptor weights."""
    zs = [a.atomic_num for a in mol.atoms]
    from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
    try:
        q, _qh = compute_gasteiger_charges(mol)
        q = np.asarray(q, dtype=np.float64)
        if not np.all(np.isfinite(q)):
            q = np.zeros(len(zs))
    except Exception:
        q = np.zeros(len(zs))
    props = {
        'm': np.array([a.mass for a in mol.atoms]) / 12.011,
        'v': np.array([_vdw_volume(z) for z in zs]) / _C_VDW_VOL,
        'e': np.array([_EN.get(z, _EN[6]) for z in zs]) / _EN[6],
        'p': np.array([_POLARIZABILITY.get(z, _POLARIZABILITY[6])
                       for z in zs]) / _POLARIZABILITY[6],
        'i': np.array([_IONIZATION.get(z, _IONIZATION[6])
                       for z in zs]) / _IONIZATION[6],
        'Z': np.array(zs, dtype=np.float64) / 6.0,
        'c': q,
        's': intrinsic_state(mol),
    }
    return props


# ------------------------------------------------------------ families

def _autocorrelations(dmat: np.ndarray, w: np.ndarray,
                      max_d: int = 8) -> Dict[str, List[float]]:
    """ATS/AATS (raw) for d=0..max_d-1 and ATSC/AATSC/MATS/GATS
    (centered) for the same distance ladder."""
    n = len(w)
    wc = w - w.mean() if n else w
    var = float((wc ** 2).mean()) if n else 0.0
    ats, aats, atsc, aatsc, mats, gats = [], [], [], [], [], []
    # d = 0: self-pairs
    ats.append(float((w ** 2).sum()))
    aats.append(float((w ** 2).mean()) if n else 0.0)
    atsc.append(float((wc ** 2).sum()))
    aatsc.append(var)
    for d in range(1, max_d):
        ii, jj = np.nonzero(np.triu(dmat == d))
        cnt = len(ii)
        if cnt == 0:
            ats.append(0.0)
            aats.append(0.0)
            atsc.append(0.0)
            aatsc.append(0.0)
            mats.append(0.0)
            gats.append(0.0)
            continue
        raw = float((w[ii] * w[jj]).sum())
        cen = float((wc[ii] * wc[jj]).sum())
        ats.append(raw)
        aats.append(raw / cnt)
        atsc.append(cen)
        aatsc.append(cen / cnt)
        mats.append((cen / cnt) / var if var > 0 else 0.0)
        geary = float(((w[ii] - w[jj]) ** 2).sum()) / (2.0 * cnt)
        denom = float((wc ** 2).sum()) / max(n - 1, 1)
        gats.append(geary / denom if denom > 0 else 0.0)
    return {'ATS': ats, 'AATS': aats, 'ATSC': atsc, 'AATSC': aatsc,
            'MATS': mats, 'GATS': gats}


_BOND_OFFDIAG = {1.0: 0.1, 2.0: 0.2, 3.0: 0.3, 1.5: 0.15}


def bcut(mol: Molecule, w: np.ndarray) -> Tuple[float, float]:
    """Lowest/highest eigenvalue of the Burden matrix with diagonal
    ``w`` (Burden 1989 convention: off-diagonal 0.1 x bond order for
    bonded pairs, 0.001 otherwise)."""
    n = mol.num_atoms
    if n == 0:
        return 0.0, 0.0
    B = np.full((n, n), 0.001)
    np.fill_diagonal(B, w)
    for b in mol.bonds:
        v = _BOND_OFFDIAG.get(
            1.5 if b.is_aromatic else float(b.order), 0.1)
        B[b.a1, b.a2] = B[b.a2, b.a1] = v
    eig = np.linalg.eigvalsh((B + B.T) / 2.0)
    return float(eig[0]), float(eig[-1])


def topological_indices(mol: Molecule,
                        dmat: np.ndarray) -> Dict[str, float]:
    """Classical graph invariants over the heavy-atom graph."""
    n = mol.num_atoms
    degs = np.array([a.degree for a in mol.atoms], dtype=np.float64)
    reach = dmat > 0
    wiener = float(dmat[np.triu(reach)].sum())
    zagreb1 = float((degs ** 2).sum())
    zagreb2 = float(sum(degs[b.a1] * degs[b.a2] for b in mol.bonds))
    randic = float(sum(1.0 / np.sqrt(degs[b.a1] * degs[b.a2])
                       for b in mol.bonds
                       if degs[b.a1] > 0 and degs[b.a2] > 0))
    ecc = np.array([dmat[i][dmat[i] >= 0].max() if n else 0
                    for i in range(n)], dtype=np.float64)
    eccentric_connectivity = float((degs * ecc).sum())
    diameter = float(ecc.max()) if n else 0.0
    radius = float(ecc.min()) if n else 0.0
    # Balaban J on the largest sense: row distance sums (reachable only)
    m = mol.num_bonds
    mu = m - n + len(mol.components())
    s = np.array([dmat[i][dmat[i] > 0].sum() if (dmat[i] > 0).any()
                  else 0.0 for i in range(n)], dtype=np.float64)
    j_sum = 0.0
    for b in mol.bonds:
        if s[b.a1] > 0 and s[b.a2] > 0:
            j_sum += 1.0 / np.sqrt(s[b.a1] * s[b.a2])
    balaban = (m / (mu + 1.0)) * j_sum if m else 0.0
    return {
        'WPath': wiener, 'Zagreb1': zagreb1, 'Zagreb2': zagreb2,
        'Randic': randic, 'ECCI': eccentric_connectivity,
        'TopoDiameter': diameter, 'TopoRadius': radius,
        'BalabanJ': balaban,
    }


_AC_PROPS = ('m', 'v', 'e', 'p', 'i', 'Z', 'c', 's')
_BCUT_PROPS = ('m', 'v', 'e', 'p', 'i', 'c')
_ESTATE_ELEMENTS = (('C', 6), ('N', 7), ('O', 8), ('S', 16), ('P', 15),
                    ('Hal', (9, 17, 35, 53)))


def descriptor_names() -> List[str]:
    """Stable output order of :func:`mordred_descriptors`."""
    names: List[str] = []
    for fam, d0 in (('ATS', 0), ('AATS', 0), ('ATSC', 0), ('AATSC', 0),
                    ('MATS', 1), ('GATS', 1)):
        for p in _AC_PROPS:
            for d in range(d0, 8):
                names.append(f'{fam}{d}{p}')
    for p in _BCUT_PROPS:
        names.append(f'BCUT{p}-1l')
        names.append(f'BCUT{p}-1h')
    names += ['EStateSum', 'EStateMax', 'EStateMin', 'EStateMean']
    for sym, _z in _ESTATE_ELEMENTS:
        names.append(f'EState{sym}')
    names += ['WPath', 'Zagreb1', 'Zagreb2', 'Randic', 'ECCI',
              'TopoDiameter', 'TopoRadius', 'BalabanJ']
    return names


def mordred_descriptors(mol: Molecule) -> np.ndarray:
    """The full native descriptor vector, aligned with
    :func:`descriptor_names` (length 398)."""
    n = mol.num_atoms
    names = descriptor_names()
    if n == 0:
        return np.zeros(len(names))
    dmat = distance_matrix(mol)
    props = atom_properties(mol)
    out: List[float] = []
    acs = {p: _autocorrelations(dmat, props[p]) for p in _AC_PROPS}
    for fam, d0 in (('ATS', 0), ('AATS', 0), ('ATSC', 0), ('AATSC', 0),
                    ('MATS', 1), ('GATS', 1)):
        for p in _AC_PROPS:
            out.extend(acs[p][fam])
    for p in _BCUT_PROPS:
        lo, hi = bcut(mol, props[p])
        out.append(lo)
        out.append(hi)
    S = estate_indices(mol, dmat)
    out += [float(S.sum()), float(S.max()), float(S.min()),
            float(S.mean())]
    zs = np.array([a.atomic_num for a in mol.atoms])
    for _sym, z in _ESTATE_ELEMENTS:
        sel = np.isin(zs, z) if isinstance(z, tuple) else (zs == z)
        out.append(float(S[sel].sum()) if sel.any() else 0.0)
    topo = topological_indices(mol, dmat)
    out += [topo[k] for k in ('WPath', 'Zagreb1', 'Zagreb2', 'Randic',
                              'ECCI', 'TopoDiameter', 'TopoRadius',
                              'BalabanJ')]
    vec = np.asarray(out, dtype=np.float64)
    assert len(vec) == len(names)
    return vec

"""Gasteiger-Marsili partial charges (PEOE) from first principles.

The reference delegates partial charges to RDKit's
``AllChem.ComputeGasteigerCharges`` (used by
``feat/complex_featurizers/grid_featurizers.py`` ChargeVoxelizer via
``utils/fragment_utils.get_partial_charge``).  RDKit implements the
original PEOE scheme of Gasteiger & Marsili, Tetrahedron 36 (1980)
3219: iterative partial equalization of orbital electronegativity.

Algorithm
---------
Each atomic orbital's electronegativity is a quadratic in the atom's
current partial charge, ``chi(q) = a + b q + c q**2`` with per-element,
per-hybridization coefficients fit to ionization potentials and
electron affinities.  At iteration ``n`` every bonded pair (i, j) with
``chi_j > chi_i`` shifts charge ``dq = (chi_j - chi_i) / X_i * 0.5**n``
from j's electron cloud onto i's nucleus frame (i.e. ``q_i += dq``,
``q_j -= dq``), where the normalizer ``X_i`` is the *donor*'s cation
electronegativity ``chi_i(+1) = a + b + c`` (20.02 for hydrogen, the
paper's special case).  The ``0.5**n`` damping makes the series
converge geometrically; 12 sweeps (RDKit's default) is far past
float32 convergence.

Implicit hydrogens are expanded to virtual nodes during iteration
(PEOE is defined on the full hydrogen-complete graph); the result
reports heavy-atom charges and the summed charge of each heavy atom's
implicit hydrogens separately, mirroring RDKit's ``_GasteigerCharge``
/ ``_GasteigerHCharge`` split.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Molecule

# (a, b, c) in eV — Gasteiger & Marsili 1980 Table 1 (the parameter set
# RDKit ships).  Keyed by (atomic_num, hybridization); hybridization ''
# matches any.
_PEOE_PARAMS: Dict[Tuple[int, str], Tuple[float, float, float]] = {
    (1, ''): (7.17, 6.24, -0.56),
    (6, 'SP3'): (7.98, 9.18, 1.88),
    (6, 'SP2'): (8.79, 9.32, 1.51),
    (6, 'SP'): (10.39, 9.45, 0.73),
    (7, 'SP3'): (11.54, 10.82, 1.36),
    (7, 'SP2'): (12.87, 11.15, 0.85),
    (7, 'SP'): (15.68, 11.70, -0.27),
    (8, 'SP3'): (14.18, 12.92, 1.39),
    (8, 'SP2'): (17.07, 13.79, 0.47),
    (9, ''): (14.66, 13.85, 2.31),
    (17, ''): (11.00, 9.69, 1.35),
    (35, ''): (10.08, 8.47, 1.16),
    (53, ''): (9.90, 7.96, 0.96),
    (16, ''): (10.14, 9.13, 1.38),
    (15, ''): (8.90, 8.24, 0.96),
    (14, ''): (8.10, 7.92, 1.42),      # Si (RDKit extension set)
    (5, ''): (8.44, 8.46, 1.39),       # B
    (13, ''): (7.58, 7.36, 1.28),      # Al
}

_H_CATION_CHI = 20.02   # the paper's hydrogen normalizer special case


def _params(atomic_num: int, hyb: str) -> Tuple[float, float, float]:
    p = _PEOE_PARAMS.get((atomic_num, hyb))
    if p is None:
        p = _PEOE_PARAMS.get((atomic_num, ''))
    if p is None:
        # metals / exotic elements: electronegativity-flat placeholder —
        # contributes no charge flow (a alone, b=c=0 would freeze chi;
        # use carbon-sp3-like slope so neighbors still polarize)
        p = (7.98, 9.18, 1.88)
    return p


def compute_gasteiger_charges(mol: Molecule, n_iter: int = 12
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """PEOE partial charges for every heavy atom of ``mol``.

    Returns ``(q_heavy, q_implicit_h)``: the heavy-atom partial charges
    and, per heavy atom, the SUM of its implicit hydrogens' charges
    (each implicit H carries q_sum / n_H individually).  RDKit parity:
    ``q_heavy[i]`` corresponds to ``_GasteigerCharge`` and
    ``q_implicit_h[i]`` to ``_GasteigerHCharge``.
    """
    n_heavy = len(mol.atoms)
    # expand implicit hydrogens to virtual nodes
    nodes = []           # (atomic_num, hyb, q0)
    edges = []
    for a in mol.atoms:
        hyb = a.hybridization if a.atomic_num in (6, 7, 8) else ''
        if a.is_aromatic and a.atomic_num in (6, 7, 8):
            hyb = 'SP2'
        nodes.append((a.atomic_num, hyb, float(a.formal_charge)))
    for a in mol.atoms:
        for j in mol.neighbors(a.index):
            if j > a.index:
                edges.append((a.index, int(j)))
    h_owner = []
    for a in mol.atoms:
        for _ in range(a.total_hs):
            nodes.append((1, '', 0.0))
            edges.append((a.index, len(nodes) - 1))
            h_owner.append(a.index)

    n = len(nodes)
    abc = np.array([_params(z, hyb) for z, hyb, _ in nodes])
    q = np.array([q0 for _, _, q0 in nodes], dtype=np.float64)
    chi_plus = abc.sum(axis=1)
    chi_plus[np.array([z for z, _, _ in nodes]) == 1] = _H_CATION_CHI
    if edges:
        ei = np.array([e[0] for e in edges])
        ej = np.array([e[1] for e in edges])
    for it in range(1, n_iter + 1):
        chi = abc[:, 0] + abc[:, 1] * q + abc[:, 2] * q * q
        if not edges:
            break
        dchi = chi[ej] - chi[ei]
        # donor = less electronegative endpoint of each bond
        donor_plus = np.where(dchi > 0, chi_plus[ei], chi_plus[ej])
        dq = dchi / donor_plus * 0.5 ** it
        # positive dq: j more electronegative -> q_i += dq, q_j -= dq
        np.add.at(q, ei, dq)
        np.add.at(q, ej, -dq)
    q_heavy = q[:n_heavy].copy()
    q_h = np.zeros(n_heavy)
    for k, owner in enumerate(h_owner):
        q_h[owner] += q[n_heavy + k]
    return q_heavy, q_h


def gasteiger_charge_dict(mol: Molecule, include_hs: bool = False
                          ) -> Dict[int, float]:
    """Per-heavy-atom charge dict (reference grid_featurizers.py
    compute_charge_dictionary).  With ``include_hs`` each heavy atom
    absorbs its implicit hydrogens' charge (useful for H-stripped
    structures where the H density has nowhere else to live)."""
    qh, qimp = compute_gasteiger_charges(mol)
    if include_hs:
        qh = qh + qimp
    return {i: float(qh[i]) for i in range(len(qh))}

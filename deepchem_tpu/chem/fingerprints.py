"""Morgan / circular (ECFP-style) fingerprints, pure Python.

Implements the extended-connectivity fingerprint algorithm (Rogers & Hahn
2010) that the reference gets from RDKit's ``GetMorganFingerprintAsBitVect``
(reference deepchem/feat/molecule_featurizers/circular_fingerprint.py).
Hashes are deterministic (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from .mol import Molecule


def _hash_ints(ints: Sequence[int]) -> int:
    """Stable 32-bit hash of an int sequence."""
    data = struct.pack(f'<{len(ints)}i', *[int(x) & 0x7fffffff for x in ints])
    return zlib.crc32(data) & 0xffffffff


def _initial_invariants(mol: Molecule, use_chirality: bool,
                        use_features: bool) -> List[int]:
    invs = []
    for a in mol.atoms:
        if use_features:
            # FCFP-style pharmacophore features: donor, acceptor, aromatic,
            # halogen, basic, acidic (coarse heuristics)
            donor = int(a.atomic_num in (7, 8) and a.total_hs > 0)
            acceptor = int(a.atomic_num in (7, 8) and a.formal_charge <= 0)
            halogen = int(a.atomic_num in (9, 17, 35, 53))
            fields = (donor, acceptor, int(a.is_aromatic), halogen,
                      int(a.formal_charge > 0), int(a.formal_charge < 0))
        else:
            fields = (a.atomic_num, a.degree, a.total_hs, a.formal_charge,
                      int(a.in_ring), int(a.is_aromatic),
                      a.num_radical_electrons, round(a.mass))
        if use_chirality:
            fields = fields + (len(a.chirality),)
        invs.append(_hash_ints(fields))
    return invs


def morgan_fingerprint_counts(
        mol: Molecule,
        radius: int = 2,
        use_chirality: bool = False,
        use_bond_types: bool = True,
        use_features: bool = False) -> Dict[int, int]:
    """Return {feature_hash: count} over all atom environments up to radius."""
    invs = _initial_invariants(mol, use_chirality, use_features)
    n = mol.num_atoms
    # environment tracking for dedup: (frozenset of bond idxs) per (atom, r)
    env_bonds: List[Set[int]] = [set() for _ in range(n)]
    seen_envs: Dict[frozenset, int] = {}
    features: Dict[int, int] = {}

    def emit(h: int, bonds: Set[int]) -> None:
        key = frozenset(bonds)
        if key and key in seen_envs:
            return      # identical environment already counted
        if key:
            seen_envs[key] = h
        features[h] = features.get(h, 0) + 1

    for i in range(n):
        emit(invs[i], set())
    current = list(invs)
    for r in range(1, radius + 1):
        new_invs = []
        new_envs: List[Set[int]] = []
        for i in range(n):
            nbrs = []
            env = set(env_bonds[i])
            for b in mol.atom_bonds(i):
                j = b.other(i)
                order_code = int(round(b.order * 2)) if use_bond_types else 1
                nbrs.append((order_code, current[j]))
                env.add(b.index)
                env |= env_bonds[j]
            nbrs.sort()
            flat: List[int] = [r, current[i]]
            for oc, inv in nbrs:
                flat.extend((oc, inv))
            h = _hash_ints(flat)
            new_invs.append(h)
            new_envs.append(env)
        for i in range(n):
            # only emit if the environment actually grew this radius
            # (matches RDKit's behavior for atoms in small fragments)
            if len(new_envs[i]) > len(env_bonds[i]) or r == 0:
                emit(new_invs[i], new_envs[i])
        current = new_invs
        env_bonds = new_envs
    return features


def morgan_fingerprint(mol: Molecule,
                       radius: int = 2,
                       n_bits: int = 2048,
                       use_chirality: bool = False,
                       use_bond_types: bool = True,
                       use_features: bool = False,
                       counts: bool = False) -> np.ndarray:
    """Folded fingerprint vector (binary or counts) of length ``n_bits``.

    Uses the native C++ kernel (deepchem_tpu/native/chemops.cpp,
    bit-identical env iteration) when available; pure Python otherwise.
    """
    try:
        from deepchem_tpu.native import morgan_fold_native
        invs = np.asarray(
            _initial_invariants(mol, use_chirality, use_features),
            dtype=np.uint32)
        a1 = np.array([b.a1 for b in mol.bonds], dtype=np.int32)
        a2 = np.array([b.a2 for b in mol.bonds], dtype=np.int32)
        oc = np.array([int(round(b.order * 2)) if use_bond_types else 1
                       for b in mol.bonds], dtype=np.int32)
        native = morgan_fold_native(invs, a1, a2, oc, radius, n_bits,
                                    counts)
        if native is not None:
            return native if counts else native.astype(np.uint8)
    except Exception:   # pragma: no cover - fall through to Python path
        pass
    feats = morgan_fingerprint_counts(mol, radius, use_chirality,
                                      use_bond_types, use_features)
    out = np.zeros(n_bits, dtype=np.float32 if counts else np.uint8)
    for h, c in feats.items():
        idx = h % n_bits
        if counts:
            out[idx] += c
        else:
            out[idx] = 1
    return out


def sparse_morgan_fingerprint(mol: Molecule, radius: int = 2,
                              **kwargs) -> Dict[int, Dict[str, object]]:
    """Unfolded {hash: {'count': c}} dict (reference sparse ECFP output,
    circular_fingerprint.py ``sparse=True`` + smiles mode)."""
    feats = morgan_fingerprint_counts(mol, radius, **kwargs)
    return {h: {'count': c} for h, c in feats.items()}


def tanimoto(fp1: np.ndarray, fp2: np.ndarray) -> float:
    """Tanimoto similarity between two binary fingerprint vectors."""
    a = np.asarray(fp1).astype(bool)
    b = np.asarray(fp2).astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0


def bulk_tanimoto(fp: np.ndarray, fps: np.ndarray) -> np.ndarray:
    """Tanimoto of one fingerprint against a matrix of fingerprints."""
    a = np.asarray(fp).astype(bool)
    B = np.asarray(fps).astype(bool)
    inter = np.logical_and(B, a[None, :]).sum(axis=1)
    union = np.logical_or(B, a[None, :]).sum(axis=1)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)

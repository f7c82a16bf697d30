"""Protein-ligand complex featurizers: contact ECFP + SPLIF (+voxel).

Redesign of reference deepchem/feat/complex_featurizers/
contact_fingerprints.py (ContactCircularFingerprint:69,
ContactCircularVoxelizer:139) and splif_fingerprints.py
(SplifFingerprint:103, SplifVoxelizer:189).  The reference computes atom
environments with RDKit ECFP; here the per-atom environment identifiers
come from the in-repo Morgan-style iterated invariants (bonded
molecules) or element identity (bond-less fragments like PDB proteins).

Datapoints: (ligand, protein), each either a
:class:`deepchem_tpu.chem.mol.Molecule` with a conformer, or a
``(coords, mol)`` tuple (coords in angstroms, mol any object with atoms
carrying atomic numbers — e.g. utils.fragment_utils.MolecularFragment).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Molecule, ATOMIC_SYMBOL
from deepchem_tpu.feat.base import ComplexFeaturizer
from deepchem_tpu.utils.hash_utils import hash_ecfp, hash_ecfp_pair
from deepchem_tpu.utils.voxel_utils import (convert_atom_to_voxel,
                                            voxelize)

logger = logging.getLogger(__name__)

SPLIF_CONTACT_BINS = [(0.0, 2.0), (2.0, 3.0), (3.0, 4.5)]


def _coords_and_mol(obj) -> Tuple[np.ndarray, object]:
    if isinstance(obj, tuple):
        coords, mol = obj
        return np.asarray(coords, dtype=np.float64), mol
    if isinstance(obj, Molecule):
        if obj.conformer is None:
            from deepchem_tpu.utils.conformers import embed_molecule_3d
            coords = embed_molecule_3d(obj)
        else:
            coords = np.asarray(obj.conformer, dtype=np.float64)
        return coords, obj
    raise ValueError(f'cannot interpret complex member {type(obj)}')


def atom_environment_id(mol, idx: int, radius: int = 2) -> str:
    """Morgan-style environment identifier for one atom.

    For bonded Molecules: iterated neighborhood invariants up to
    ``radius`` (the in-repo analog of an RDKit ECFP fragment id).  For
    bond-less fragments: the element symbol.
    """
    if isinstance(mol, Molecule):
        inv = {a.index: hash((a.atomic_num, a.degree, a.total_hs,
                              a.formal_charge, a.is_aromatic))
               for a in mol.atoms}
        cur = inv[idx]
        for _ in range(radius):
            nbrs = sorted(inv[j] for j in mol.neighbors(idx))
            cur = hash((cur, tuple(nbrs)))
            inv = {i: hash((v, tuple(sorted(inv[j]
                                            for j in mol.neighbors(i)))))
                   for i, v in inv.items()}
        return f'env{cur & 0xffffffff:x}'
    # fragment shim: element identity
    atoms = mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms
    a = atoms[idx]
    z = a.GetAtomicNum() if hasattr(a, 'GetAtomicNum') else a.atomic_num
    return ATOMIC_SYMBOL.get(z, '*')


def featurize_contacts_ecfp(frag1, frag2, pairwise_distances=None,
                            cutoff: float = 4.5, ecfp_degree: int = 2
                            ) -> Tuple[dict, dict]:
    """Environment ids for atoms of each fragment in contact with the
    other (reference contact_fingerprints.py:24)."""
    c1, m1 = _coords_and_mol(frag1)
    c2, m2 = _coords_and_mol(frag2)
    if pairwise_distances is None:
        pairwise_distances = np.linalg.norm(
            c1[:, None, :] - c2[None, :, :], axis=-1)
    contacts = np.nonzero(pairwise_distances < cutoff)
    f1 = {int(i): atom_environment_id(m1, int(i), ecfp_degree)
          for i in np.unique(contacts[0])}
    f2 = {int(j): atom_environment_id(m2, int(j), ecfp_degree)
          for j in np.unique(contacts[1])}
    return f1, f2


class ContactCircularFingerprint(ComplexFeaturizer):
    """Concatenated hashed env-id vectors of the two contact shells
    (reference contact_fingerprints.py:69)."""

    def __init__(self, cutoff: float = 4.5, radius: int = 2,
                 size: int = 8):
        self.cutoff = cutoff
        self.radius = radius
        self.size = size

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        f1, f2 = featurize_contacts_ecfp(lig, prot, cutoff=self.cutoff,
                                         ecfp_degree=self.radius)
        n = 2 ** self.size
        vec = np.zeros(2 * n)
        for env in f1.values():
            vec[hash_ecfp(env, n)] += 1
        for env in f2.values():
            vec[n + hash_ecfp(env, n)] += 1
        return vec


def featurize_splif(frag1, frag2, contact_bins=None, ecfp_degree: int = 2
                    ) -> List[dict]:
    """Per-distance-bin dicts {(i, j): (env_i, env_j)} (reference
    splif_fingerprints.py:67)."""
    c1, m1 = _coords_and_mol(frag1)
    c2, m2 = _coords_and_mol(frag2)
    d = np.linalg.norm(c1[:, None, :] - c2[None, :, :], axis=-1)
    out = []
    for lo, hi in (contact_bins or SPLIF_CONTACT_BINS):
        pairs = np.nonzero((d >= lo) & (d < hi))
        out.append({
            (int(i), int(j)): (atom_environment_id(m1, int(i),
                                                   ecfp_degree),
                               atom_environment_id(m2, int(j),
                                                   ecfp_degree))
            for i, j in zip(*pairs)})
    return out


class SplifFingerprint(ComplexFeaturizer):
    """Structural protein-ligand interaction fingerprints (Da & Kireev
    2014; reference splif_fingerprints.py:103): hashed (ligand-env,
    protein-env) PAIRS per contact distance bin, concatenated."""

    def __init__(self, contact_bins=None, radius: int = 2,
                 size: int = 8):
        self.contact_bins = contact_bins or SPLIF_CONTACT_BINS
        self.radius = radius
        self.size = size

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        dicts = featurize_splif(lig, prot, self.contact_bins, self.radius)
        n = 2 ** self.size
        vecs = []
        for d in dicts:
            v = np.zeros(n)
            for pair in d.values():
                v[hash_ecfp_pair(pair, n)] += 1
            vecs.append(v)
        return np.concatenate(vecs)


class ContactCircularVoxelizer(ComplexFeaturizer):
    """Voxel grid of hashed contact environments (reference
    contact_fingerprints.py:139)."""

    def __init__(self, cutoff: float = 4.5, radius: int = 2,
                 size: int = 8, box_width: float = 16.0,
                 voxel_width: float = 1.0, flatten: bool = False):
        self.cutoff = cutoff
        self.radius = radius
        self.size = size
        self.box_width = box_width
        self.voxel_width = voxel_width
        self.flatten = flatten

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        c1, _ = _coords_and_mol(lig)
        c2, _ = _coords_and_mol(prot)
        f1, f2 = featurize_contacts_ecfp(lig, prot, cutoff=self.cutoff,
                                         ecfp_degree=self.radius)
        centroid = c1.mean(axis=0)
        n = 2 ** self.size
        tensors = []
        for coords, feats in ((c1 - centroid, f1), (c2 - centroid, f2)):
            tensors.append(voxelize(
                convert_atom_to_voxel, coords,
                box_width=self.box_width, voxel_width=self.voxel_width,
                hash_function=hash_ecfp, feature_dict=feats,
                nb_channel=n))
        out = np.concatenate(tensors, axis=-1)
        return out.flatten() if self.flatten else out


class SplifVoxelizer(ComplexFeaturizer):
    """Voxelized SPLIF (reference splif_fingerprints.py:189): each
    contact pair's hashed env-pair is deposited at the midpoint voxel."""

    def __init__(self, contact_bins=None, radius: int = 2,
                 size: int = 8, box_width: float = 16.0,
                 voxel_width: float = 1.0):
        self.contact_bins = contact_bins or SPLIF_CONTACT_BINS
        self.radius = radius
        self.size = size
        self.box_width = box_width
        self.voxel_width = voxel_width

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        c1, _ = _coords_and_mol(lig)
        c2, _ = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        dicts = featurize_splif(lig, prot, self.contact_bins, self.radius)
        n = 2 ** self.size
        edge = int(self.box_width / self.voxel_width)
        tensors = []
        for d in dicts:
            t = np.zeros((edge, edge, edge, n), dtype=np.int8)
            for (i, j), pair in d.items():
                mid = 0.5 * (c1[i] + c2[j]) - centroid
                idx = np.floor((mid + self.box_width / 2.0)
                               / self.voxel_width).astype(int)
                if np.all(idx >= 0) and np.all(idx < edge):
                    t[idx[0], idx[1], idx[2],
                      hash_ecfp_pair(pair, n)] += 1
            tensors.append(t)
        return np.concatenate(tensors, axis=-1)


def _elements(mol) -> List[str]:
    atoms = mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms
    out = []
    for a in atoms:
        z = a.GetAtomicNum() if hasattr(a, 'GetAtomicNum') \
            else a.atomic_num
        out.append(ATOMIC_SYMBOL.get(z, '*'))
    return out


def _charges(mol) -> np.ndarray:
    atoms = mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms
    out = []
    for a in atoms:
        if hasattr(a, 'GetPartialCharge'):
            out.append(a.GetPartialCharge())
        else:
            out.append(float(getattr(a, 'formal_charge', 0)))
    return np.asarray(out)


class RdkitGridFeaturizer(ComplexFeaturizer):
    """Kitchen-sink grid featurizer (reference complex_featurizers/
    rdkit_grid_featurizer.py:20): concatenated voxel channels over a box
    centered on the ligand centroid.

    feature_types: subset of ['ecfp', 'splif', 'charge', 'hbond',
    'salt_bridge', 'sybyl'] or 'voxel_combined' (all of them,
    alphabetical).  The reference's 'pi_stack'/'cation_pi' channels need
    ring perception on bond-less protein fragments and are not included.
    """

    def __init__(self, nb_rotations: int = 0, feature_types=None,
                 ecfp_degree: int = 2, ecfp_power: int = 3,
                 splif_power: int = 3, box_width: float = 16.0,
                 voxel_width: float = 1.0, flatten: bool = False,
                 **kwargs):
        if nb_rotations:
            raise NotImplementedError('nb_rotations not supported')
        feature_types = feature_types or ['ecfp']
        if feature_types == 'voxel_combined' or \
                'voxel_combined' in feature_types:
            feature_types = ['charge', 'ecfp', 'hbond', 'salt_bridge',
                             'splif', 'sybyl']
        self.feature_types = list(feature_types)
        self.ecfp_degree = ecfp_degree
        self.ecfp_power = ecfp_power
        self.splif_power = splif_power
        self.box_width = box_width
        self.voxel_width = voxel_width
        self.flatten = flatten

    def _pair_voxels(self, pairs, c1, c2, centroid, nb_channel=1):
        edge = int(self.box_width / self.voxel_width)
        t = np.zeros((edge, edge, edge, 1), dtype=np.float32)
        for i, j in pairs:
            mid = 0.5 * (c1[i] + c2[j]) - centroid
            idx = np.floor((mid + self.box_width / 2.0)
                           / self.voxel_width).astype(int)
            if np.all(idx >= 0) and np.all(idx < edge):
                t[idx[0], idx[1], idx[2], 0] += 1
        return t

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        from deepchem_tpu.utils.noncovalent_utils import (
            compute_hbonds, compute_salt_bridges)
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        tensors = []
        for ft in self.feature_types:
            if ft == 'ecfp':
                tensors.append(ContactCircularVoxelizer(
                    radius=self.ecfp_degree, size=self.ecfp_power,
                    box_width=self.box_width,
                    voxel_width=self.voxel_width)._featurize(datapoint))
            elif ft == 'splif':
                tensors.append(SplifVoxelizer(
                    radius=self.ecfp_degree, size=self.splif_power,
                    box_width=self.box_width,
                    voxel_width=self.voxel_width)._featurize(datapoint))
            elif ft == 'charge':
                edge = int(self.box_width / self.voxel_width)
                t = np.zeros((edge, edge, edge, 1), dtype=np.float32)
                for coords, mol in ((c1, m1), (c2, m2)):
                    q = _charges(mol)
                    rel = coords - centroid
                    idx = np.floor((rel + self.box_width / 2.0)
                                   / self.voxel_width).astype(int)
                    ok = np.all((idx >= 0) & (idx < edge), axis=1)
                    for k in np.nonzero(ok)[0]:
                        t[idx[k, 0], idx[k, 1], idx[k, 2], 0] += q[k]
                tensors.append(t)
            elif ft == 'hbond':
                pairs = compute_hbonds(c1, _elements(m1), c2,
                                       _elements(m2))
                tensors.append(self._pair_voxels(pairs, c1, c2, centroid))
            elif ft == 'salt_bridge':
                pairs = compute_salt_bridges(c1, _charges(m1), c2,
                                             _charges(m2))
                tensors.append(self._pair_voxels(pairs, c1, c2, centroid))
            elif ft == 'sybyl':
                edge = int(self.box_width / self.voxel_width)
                nc = len(SYBYL_TYPES)
                t_syb = np.zeros((edge, edge, edge, nc), dtype=np.float32)
                for coords, mol in ((c1, m1), (c2, m2)):
                    types = compute_all_sybyl(mol)
                    rel = coords - centroid
                    idx = np.floor((rel + self.box_width / 2.0)
                                   / self.voxel_width).astype(int)
                    ok = np.all((idx >= 0) & (idx < edge), axis=1)
                    for k in np.nonzero(ok)[0]:
                        ch = SYBYL_TYPES.index(types.get(int(k), 'Du'))
                        t_syb[idx[k, 0], idx[k, 1], idx[k, 2], ch] += 1
                tensors.append(t_syb)
            else:
                raise ValueError(f'unknown feature type {ft!r}')
        out = np.concatenate(tensors, axis=-1)
        return out.flatten() if self.flatten else out


#: Tripos Sybyl atom types emitted by :func:`sybyl_atom_type`
SYBYL_TYPES = ['C.3', 'C.2', 'C.1', 'C.ar', 'C.cat', 'N.3', 'N.2',
               'N.1', 'N.ar', 'N.am', 'N.pl3', 'N.4', 'O.3', 'O.2',
               'O.co2', 'S.3', 'S.2', 'S.O', 'S.O2', 'P.3', 'F', 'Cl',
               'Br', 'I', 'H', 'Du']


def sybyl_atom_type(mol, idx: int) -> str:
    """Tripos Sybyl type from the in-repo perception (the reference's
    compute_all_sybyl delegates to RDKit-based typing,
    contact_fingerprints.py:241)."""
    if not isinstance(mol, Molecule):
        atoms = mol.GetAtoms() if hasattr(mol, 'GetAtoms') else mol.atoms
        a = atoms[idx]
        z = a.GetAtomicNum() if hasattr(a, 'GetAtomicNum') \
            else a.atomic_num
        return {6: 'C.3', 7: 'N.3', 8: 'O.3', 16: 'S.3', 15: 'P.3',
                9: 'F', 17: 'Cl', 35: 'Br', 53: 'I',
                1: 'H'}.get(z, 'Du')
    a = mol.atoms[idx]
    z = a.atomic_num
    hyb = a.hybridization
    bonds = mol.atom_bonds(idx)
    if z == 6:
        if a.is_aromatic:
            return 'C.ar'
        # guanidinium carbon
        n_nbrs = [mol.atoms[b.other(idx)] for b in bonds]
        if (len(n_nbrs) == 3
                and all(x.atomic_num == 7 for x in n_nbrs)
                and any(x.formal_charge > 0 for x in n_nbrs)):
            return 'C.cat'
        return {'SP3': 'C.3', 'SP2': 'C.2', 'SP': 'C.1'}.get(hyb, 'C.3')
    if z == 7:
        if a.is_aromatic:
            return 'N.ar'
        # amide nitrogen: single-bonded to a carbonyl carbon
        for b in bonds:
            nb = b.other(idx)
            if mol.atoms[nb].atomic_num == 6 and b.order == 1.0:
                if any(bb.order == 2.0
                       and mol.atoms[bb.other(nb)].atomic_num in (8, 16)
                       for bb in mol.atom_bonds(nb)):
                    return 'N.am'
        if a.formal_charge > 0 and a.degree + a.total_hs == 4:
            return 'N.4'
        if hyb == 'SP2':
            return 'N.pl3' if all(b.order == 1.0 for b in bonds) \
                else 'N.2'
        return {'SP3': 'N.3', 'SP': 'N.1'}.get(hyb, 'N.3')
    if z == 8:
        # carboxylate oxygen
        for b in bonds:
            nb = b.other(idx)
            if mol.atoms[nb].atomic_num == 6:
                os = [bb for bb in mol.atom_bonds(nb)
                      if mol.atoms[bb.other(nb)].atomic_num == 8]
                if len(os) >= 2 and any(
                        mol.atoms[bb.other(nb)].formal_charge < 0
                        or bb.order == 2.0 for bb in os) \
                        and (a.formal_charge < 0
                             or any(bb.order == 2.0 for bb in os)):
                    if a.formal_charge < 0 or \
                            any(b2.order == 2.0 for b2 in bonds):
                        return 'O.co2'
        return 'O.2' if any(b.order == 2.0 for b in bonds) else 'O.3'
    if z == 16:
        n_o = sum(1 for b in bonds
                  if mol.atoms[b.other(idx)].atomic_num == 8
                  and b.order == 2.0)
        if n_o >= 2:
            return 'S.O2'
        if n_o == 1:
            return 'S.O'
        return 'S.2' if any(b.order == 2.0 for b in bonds) else 'S.3'
    return {15: 'P.3', 9: 'F', 17: 'Cl', 35: 'Br', 53: 'I',
            1: 'H'}.get(z, 'Du')


def compute_all_sybyl(mol, indices=None) -> dict:
    """{atom index: sybyl type} (reference contact_fingerprints.py:241)."""
    n = mol.num_atoms if isinstance(mol, Molecule) else (
        mol.GetNumAtoms() if hasattr(mol, 'GetNumAtoms')
        else len(mol.atoms))
    idxs = range(n) if indices is None else indices
    return {int(i): sybyl_atom_type(mol, int(i)) for i in idxs}

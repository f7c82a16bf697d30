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
from deepchem_tpu.feat.base import ComplexFeaturizer, Featurizer
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


# ---------------------------------------------------------------------------
# Standalone noncovalent-interaction featurizers (reference
# feat/complex_featurizers/grid_featurizers.py: ChargeVoxelizer:44,
# SaltBridgeVoxelizer:136, CationPiVoxelizer:233, PiStackVoxelizer:331,
# HydrogenBondCounter:440, HydrogenBondVoxelizer:536).  Same
# (ligand, protein) datapoint contract as the classes above; partial
# charges come from the in-repo Gasteiger PEOE for bonded Molecules and
# from AtomShim.partial_charge for fragments (the reference gets both
# from RDKit ComputeGasteigerCharges).
# ---------------------------------------------------------------------------

#: reference grid_featurizers.py HBOND_DIST_BINS / HBOND_ANGLE_CUTOFFS
HBOND_DIST_BINS = [(2.2, 2.5), (2.5, 3.2), (3.2, 4.0)]
HBOND_ANGLE_CUTOFFS = [5., 50., 90.]


def _voxelize_atom_dict(coords, centroid, feature_dict, box_width,
                        voxel_width, nb_channel=1, dtype=np.float32):
    # dtype='float': fractional charges vanish in voxelize's default
    # int8 accumulator (the reference passes dtype="np.float16" here)
    return voxelize(convert_atom_to_voxel, coords - centroid,
                    box_width=box_width, voxel_width=voxel_width,
                    hash_function=None, feature_dict=feature_dict,
                    nb_channel=nb_channel, dtype='float').astype(dtype)


def _rings_of(mol) -> List[List[int]]:
    """Aromatic rings for pi featurizers; bond-less fragments have no
    perceivable rings and contribute none (documented divergence: the
    reference re-perceives protein bonds with RDKit)."""
    if isinstance(mol, Molecule):
        return [r for r in mol.rings()
                if all(mol.atoms[i].is_aromatic for i in r)]
    return []


def _partial_charges(mol) -> np.ndarray:
    """Gasteiger PEOE for bonded Molecules (H-folded, matching the
    H-stripped complex structures), AtomShim charges for fragments."""
    if isinstance(mol, Molecule):
        from deepchem_tpu.chem.gasteiger import compute_gasteiger_charges
        qh, qimp = compute_gasteiger_charges(mol)
        return qh + qimp
    return _charges(mol)


class ChargeVoxelizer(ComplexFeaturizer):
    """Voxelized partial charge of every atom in the complex
    (reference grid_featurizers.py ChargeVoxelizer:44): each atom's
    Gasteiger charge accumulates in the voxel containing it; output
    shape (edge, edge, edge, 1)."""

    def __init__(self, cutoff: float = 4.5, box_width: float = 16.0,
                 voxel_width: float = 1.0,
                 reduce_to_contacts: bool = True):
        self.cutoff = cutoff
        self.box_width = box_width
        self.voxel_width = voxel_width
        self.reduce_to_contacts = reduce_to_contacts

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        out = None
        for coords, mol in ((c1, m1), (c2, m2)):
            q = _partial_charges(mol)
            t = _voxelize_atom_dict(
                coords, centroid,
                {i: float(q[i]) for i in range(len(q))},
                self.box_width, self.voxel_width)
            out = t if out is None else out + t
        return out


class SaltBridgeVoxelizer(ComplexFeaturizer):
    """Voxelized salt-bridge counts (reference grid_featurizers.py
    SaltBridgeVoxelizer:136): oppositely-charged cross-fragment atom
    pairs within ``cutoff``; both endpoints' voxels are incremented
    (the reference's deliberate double count)."""

    def __init__(self, cutoff: float = 5.0, box_width: float = 16.0,
                 voxel_width: float = 1.0):
        self.cutoff = cutoff
        self.box_width = box_width
        self.voxel_width = voxel_width

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        from deepchem_tpu.utils.noncovalent_utils import \
            compute_salt_bridges
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        pairs = compute_salt_bridges(c1, _partial_charges(m1),
                                     c2, _partial_charges(m2),
                                     cutoff=self.cutoff)
        edge = int(self.box_width / self.voxel_width)
        t = np.zeros((edge, edge, edge, 1), dtype=np.float32)
        for coords, side in ((c1, 0), (c2, 1)):
            rel = coords - centroid
            for pair in pairs:
                idx = np.floor((rel[pair[side]] + self.box_width / 2.0)
                               / self.voxel_width).astype(int)
                if np.all(idx >= 0) and np.all(idx < edge):
                    t[idx[0], idx[1], idx[2], 0] += 1
        return t


class CationPiVoxelizer(ComplexFeaturizer):
    """Voxelized cation-pi interaction counts (reference
    grid_featurizers.py CationPiVoxelizer:233): cationic atoms
    (Gasteiger charge > 0.3 or formal charge > 0) of one fragment
    within ``cutoff`` of the other fragment's aromatic-ring centers,
    with the ring-normal/center-to-cation angle within
    ``angle_cutoff``; deposited at the cation's voxel."""

    def __init__(self, cutoff: float = 6.5, angle_cutoff: float = 30.0,
                 box_width: float = 16.0, voxel_width: float = 1.0):
        self.cutoff = cutoff
        self.angle_cutoff = angle_cutoff
        self.box_width = box_width
        self.voxel_width = voxel_width

    def _cations(self, mol, coords) -> List[int]:
        q = _partial_charges(mol)
        return [int(i) for i in np.nonzero(q > 0.3)[0]]

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        from deepchem_tpu.utils.noncovalent_utils import (
            compute_ring_center, compute_ring_normal)
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        edge = int(self.box_width / self.voxel_width)
        t = np.zeros((edge, edge, edge, 1), dtype=np.float32)
        sides = ((c1, m1, c2, m2), (c2, m2, c1, m1))
        for ring_coords, ring_mol, cat_coords, cat_mol in sides:
            rings = _rings_of(ring_mol)
            cations = self._cations(cat_mol, cat_coords)
            if not rings or not cations:
                continue
            rel = cat_coords - centroid
            for r in rings:
                center = compute_ring_center(ring_coords, r)
                normal = compute_ring_normal(ring_coords, r)
                for i in cations:
                    v = cat_coords[i] - center
                    dist = np.linalg.norm(v)
                    if dist >= self.cutoff or dist < 1e-6:
                        continue
                    cosang = abs(np.dot(normal, v) /
                                 (np.linalg.norm(normal) * dist))
                    ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
                    if ang < self.angle_cutoff:
                        idx = np.floor(
                            (rel[i] + self.box_width / 2.0)
                            / self.voxel_width).astype(int)
                        if np.all(idx >= 0) and np.all(idx < edge):
                            t[idx[0], idx[1], idx[2], 0] += 1
        return t


class PiStackVoxelizer(ComplexFeaturizer):
    """Voxelized pi-stacking counts (reference grid_featurizers.py
    PiStackVoxelizer:331): 2 channels — parallel stacks and T-shaped
    stacks between cross-fragment aromatic rings; every ring atom's
    voxel is incremented."""

    def __init__(self, cutoff: float = 4.4, angle_cutoff: float = 30.0,
                 box_width: float = 16.0, voxel_width: float = 1.0):
        self.cutoff = cutoff
        self.angle_cutoff = angle_cutoff
        self.box_width = box_width
        self.voxel_width = voxel_width

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        from deepchem_tpu.utils.noncovalent_utils import (
            compute_ring_center, compute_ring_normal, is_pi_parallel,
            is_pi_t)
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        edge = int(self.box_width / self.voxel_width)
        t = np.zeros((edge, edge, edge, 2), dtype=np.float32)
        rings1, rings2 = _rings_of(m1), _rings_of(m2)
        geo1 = [(compute_ring_center(c1, r), compute_ring_normal(c1, r))
                for r in rings1]
        geo2 = [(compute_ring_center(c2, r), compute_ring_normal(c2, r))
                for r in rings2]
        for (r1, (ctr1, n1)) in zip(rings1, geo1):
            for (r2, (ctr2, n2)) in zip(rings2, geo2):
                if is_pi_parallel(ctr1, n1, ctr2, n2,
                                  dist_cutoff=self.cutoff,
                                  angle_cutoff=self.angle_cutoff):
                    ch = 0
                elif is_pi_t(ctr1, n1, ctr2, n2,
                             dist_cutoff=self.cutoff + 1.1,
                             angle_cutoff=self.angle_cutoff):
                    ch = 1
                else:
                    continue
                for coords, ring in ((c1, r1), (c2, r2)):
                    rel = coords - centroid
                    for i in ring:
                        idx = np.floor(
                            (rel[i] + self.box_width / 2.0)
                            / self.voxel_width).astype(int)
                        if np.all(idx >= 0) and np.all(idx < edge):
                            t[idx[0], idx[1], idx[2], ch] += 1
        return t


def _hbond_pairs_binned(c1, m1, c2, m2, distance_bins
                        ) -> List[List[tuple]]:
    """Cross-fragment N/O donor-acceptor pairs per distance bin
    (reference compute_hydrogen_bonds; the angle criterion needs
    explicit hydrogens, which H-stripped complex structures lack —
    the reference's own loader strips them too)."""
    e1, e2 = _elements(m1), _elements(m2)
    polar1 = [i for i, e in enumerate(e1) if e in ('N', 'O')]
    polar2 = [j for j, e in enumerate(e2) if e in ('N', 'O')]
    out: List[List[tuple]] = [[] for _ in distance_bins]
    for i in polar1:
        if not polar2:
            break
        d = np.linalg.norm(c2[polar2] - c1[i], axis=1)
        for k, j in enumerate(polar2):
            for b, (lo, hi) in enumerate(distance_bins):
                if lo <= d[k] < hi:
                    out[b].append((int(i), int(j)))
    return out


class HydrogenBondCounter(ComplexFeaturizer):
    """Hydrogen-bond counts per distance bin (reference
    grid_featurizers.py HydrogenBondCounter:440): output shape
    ``(len(distance_bins),)``."""

    def __init__(self, cutoff: float = 4.5, distance_bins=None,
                 angle_cutoffs=None):
        self.cutoff = cutoff
        self.distance_bins = distance_bins or HBOND_DIST_BINS
        self.angle_cutoffs = angle_cutoffs or HBOND_ANGLE_CUTOFFS

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        binned = _hbond_pairs_binned(c1, m1, c2, m2, self.distance_bins)
        return np.array([len(b) for b in binned], dtype=np.float64)


class HydrogenBondVoxelizer(ComplexFeaturizer):
    """Voxelized hydrogen bonds (reference grid_featurizers.py
    HydrogenBondVoxelizer:536): one channel per distance bin; both
    endpoints' voxels are incremented."""

    def __init__(self, cutoff: float = 4.5, box_width: float = 16.0,
                 voxel_width: float = 1.0, distance_bins=None,
                 angle_cutoffs=None):
        self.cutoff = cutoff
        self.box_width = box_width
        self.voxel_width = voxel_width
        self.distance_bins = distance_bins or HBOND_DIST_BINS
        self.angle_cutoffs = angle_cutoffs or HBOND_ANGLE_CUTOFFS

    def _featurize(self, datapoint, **kwargs) -> np.ndarray:
        lig, prot = datapoint
        c1, m1 = _coords_and_mol(lig)
        c2, m2 = _coords_and_mol(prot)
        centroid = c1.mean(axis=0)
        binned = _hbond_pairs_binned(c1, m1, c2, m2, self.distance_bins)
        edge = int(self.box_width / self.voxel_width)
        t = np.zeros((edge, edge, edge, len(binned)), dtype=np.float32)
        for ch, pairs in enumerate(binned):
            for coords, side in ((c1, 0), (c2, 1)):
                rel = coords - centroid
                for pair in pairs:
                    idx = np.floor(
                        (rel[pair[side]] + self.box_width / 2.0)
                        / self.voxel_width).astype(int)
                    if np.all(idx >= 0) and np.all(idx < edge):
                        t[idx[0], idx[1], idx[2], ch] += 1
        return t


def compute_neighbor_list_dict(coords: np.ndarray,
                               neighbor_cutoff: float,
                               max_num_neighbors: Optional[int] = None,
                               periodic_box_size=None) -> dict:
    """{atom: [neighbor ids]} within ``neighbor_cutoff`` angstroms
    (reference complex_atomic_coordinates.py compute_neighbor_list,
    there via mdtraj).  Minimum-image convention when
    ``periodic_box_size`` is given; nearest-first truncation at
    ``max_num_neighbors``, like the reference."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    delta = coords[:, None, :] - coords[None, :, :]
    if periodic_box_size is not None:
        box = np.asarray(periodic_box_size, dtype=np.float64)
        delta -= np.round(delta / box) * box
    d = np.linalg.norm(delta, axis=-1)
    np.fill_diagonal(d, np.inf)
    out = {}
    for i in range(n):
        nbrs = np.nonzero(d[i] < neighbor_cutoff)[0]
        if max_num_neighbors is not None and \
                len(nbrs) > max_num_neighbors:
            nbrs = nbrs[np.argsort(d[i][nbrs])][:max_num_neighbors]
        out[i] = [int(j) for j in nbrs]
    return out


class NeighborListAtomicCoordinates(Featurizer):
    """(bohr coords, neighbor dict) for one molecule (reference
    complex_atomic_coordinates.py NeighborListAtomicCoordinates:50)."""

    def __init__(self, max_num_neighbors: Optional[int] = None,
                 neighbor_cutoff: float = 4.0,
                 periodic_box_size=None):
        if neighbor_cutoff <= 0:
            raise ValueError('neighbor_cutoff must be positive value.')
        if max_num_neighbors is not None and (
                not isinstance(max_num_neighbors, int)
                or max_num_neighbors <= 0):
            raise ValueError(
                'max_num_neighbors must be positive integer.')
        self.max_num_neighbors = max_num_neighbors
        self.neighbor_cutoff = neighbor_cutoff
        self.periodic_box_size = periodic_box_size
        self.dtype = object

    def _featurize(self, datapoint, **kwargs):
        coords, _ = _coords_and_mol(datapoint)
        neighbor_list = compute_neighbor_list_dict(
            coords, self.neighbor_cutoff, self.max_num_neighbors,
            self.periodic_box_size)
        bohr_coords = coords / 0.52917721092
        return (bohr_coords, neighbor_list)


class NeighborListComplexAtomicCoordinates(ComplexFeaturizer):
    """(merged coords, neighbor dict) for a (ligand, protein) complex
    (reference NeighborListComplexAtomicCoordinates:102)."""

    def __init__(self, max_num_neighbors: Optional[int] = None,
                 neighbor_cutoff: float = 4.0):
        if neighbor_cutoff <= 0:
            raise ValueError('neighbor_cutoff must be positive value.')
        if max_num_neighbors is not None and (
                not isinstance(max_num_neighbors, int)
                or max_num_neighbors <= 0):
            raise ValueError(
                'max_num_neighbors must be positive integer.')
        self.max_num_neighbors = max_num_neighbors
        self.neighbor_cutoff = neighbor_cutoff
        self.dtype = object

    def _featurize(self, datapoint, **kwargs):
        lig, prot = datapoint
        c1, _ = _coords_and_mol(lig)
        c2, _ = _coords_and_mol(prot)
        system_coords = np.concatenate([c1, c2], axis=0)
        system_neighbor_list = compute_neighbor_list_dict(
            system_coords, self.neighbor_cutoff,
            self.max_num_neighbors, None)
        return (system_coords, system_neighbor_list)


def load_pdb_residues(path: str) -> Tuple[np.ndarray, List[str]]:
    """(coords, residue names) from a PDB file's ATOM/HETATM records
    (the reference gets residue names via mdtraj,
    binding_pocket_features.py:119)."""
    coords, residues = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(('ATOM', 'HETATM')):
                try:
                    coords.append((float(line[30:38]),
                                   float(line[38:46]),
                                   float(line[46:54])))
                except ValueError:
                    continue
                residues.append(line[17:20].strip().upper())
    return np.asarray(coords, dtype=np.float64), residues


class BindingPocketFeaturizer(Featurizer):
    """Counts of each standard residue type inside each binding pocket
    (reference feat/binding_pocket_features.py:47): output shape
    ``(len(pockets), n_features)``.

    ``featurize(protein_file, pockets)`` takes a PDB path and a list of
    :class:`deepchem_tpu.dock.CoordinateBox` pockets (the output of a
    ``BindingPocketFinder``).
    """

    residues = [
        'ALA', 'ARG', 'ASN', 'ASP', 'CYS', 'GLN', 'GLU', 'GLY', 'HIS',
        'ILE', 'LEU', 'LYS', 'MET', 'PHE', 'PRO', 'PYL', 'SER', 'SEC',
        'THR', 'TRP', 'TYR', 'VAL', 'ASX', 'GLX'
    ]

    n_features = len(residues)

    def featurize(self, protein_file: str, pockets) -> np.ndarray:  # type: ignore[override]
        coords, res_names = load_pdb_residues(protein_file)
        n_pockets = len(pockets)
        n_residues = len(self.residues)
        res_map = {r: i for i, r in enumerate(self.residues)}
        all_features = np.zeros((n_pockets, n_residues))
        for pocket_num, pocket in enumerate(pockets):
            inside = [(pt[0], pt[1], pt[2]) in pocket for pt in coords]
            for k in np.nonzero(inside)[0]:
                r = res_names[k]
                if r in res_map:
                    all_features[pocket_num, res_map[r]] += 1
                else:
                    logger.info(
                        'Warning: Non-standard residue in PDB file')
        return all_features

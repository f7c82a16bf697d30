"""Voxelization utilities (reference deepchem/utils/voxel_utils.py:
convert_atom_to_voxel, voxelize)."""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def convert_atom_to_voxel(coordinates: np.ndarray, atom_index: int,
                          box_width: float,
                          voxel_width: float) -> np.ndarray:
    """Atom coordinates -> voxel indices (reference
    convert_atom_to_voxel)."""
    coords = np.asarray(coordinates)[atom_index]
    idx = np.floor((coords + box_width / 2.0) / voxel_width).astype(int)
    if np.any(idx < 0) or np.any(idx >= box_width / voxel_width):
        logger.warning('atom %d outside voxel box', atom_index)
    return np.asarray([idx])


def convert_atom_pair_to_voxel(coordinates_tuple, atom_index_pair,
                               box_width: float,
                               voxel_width: float) -> np.ndarray:
    """(reference convert_atom_pair_to_voxel)"""
    c1 = convert_atom_to_voxel(coordinates_tuple[0], atom_index_pair[0],
                               box_width, voxel_width)
    c2 = convert_atom_to_voxel(coordinates_tuple[1], atom_index_pair[1],
                               box_width, voxel_width)
    return np.concatenate([c1, c2], axis=0)


def voxelize(get_voxels: Callable, coordinates, box_width: float = 16.0,
             voxel_width: float = 1.0, hash_function=None,
             feature_dict=None, feature_list=None,
             nb_channel: int = 16, dtype: str = 'int') -> np.ndarray:
    """Materialize a voxel feature grid (reference voxelize)."""
    voxels_per_edge = int(box_width / voxel_width)
    if dtype == 'int':
        feature_tensor = np.zeros(
            (voxels_per_edge, voxels_per_edge, voxels_per_edge,
             nb_channel), dtype=np.int8)
    else:
        feature_tensor = np.zeros(
            (voxels_per_edge, voxels_per_edge, voxels_per_edge,
             nb_channel), dtype=np.float16)
    if feature_dict is not None:
        for key, features in feature_dict.items():
            voxels = get_voxels(coordinates, key, box_width, voxel_width)
            for voxel in voxels:
                if np.all(voxel >= 0) and \
                        np.all(voxel < voxels_per_edge):
                    if hash_function is not None:
                        feature_tensor[voxel[0], voxel[1], voxel[2],
                                       hash_function(features,
                                                     nb_channel)] += 1
                    else:
                        feature_tensor[voxel[0], voxel[1],
                                       voxel[2], 0] += features
    elif feature_list is not None:
        for key in feature_list:
            voxels = get_voxels(coordinates, key, box_width, voxel_width)
            for voxel in voxels:
                if np.all(voxel >= 0) and \
                        np.all(voxel < voxels_per_edge):
                    feature_tensor[voxel[0], voxel[1], voxel[2], 0] += 1
    return feature_tensor


def _pi_stack_atom_counts(mol1, mol2, dist_cutoff: float = 4.4,
                          angle_cutoff: float = 30.0):
    """Per-atom pi-stacking contact counts between two molecules ->
    (mol1_t, mol1_parallel, mol2_t, mol2_parallel) dicts.  Needs bonded
    chem Molecules with conformers for ring perception; bond-less
    fragments contribute empty dicts."""
    from collections import Counter
    from deepchem_tpu.utils.rdkit_utils import (compute_ring_center,
                                                compute_ring_normal)
    from deepchem_tpu.utils.noncovalent_utils import (is_pi_parallel,
                                                      is_pi_t)
    out = [Counter(), Counter(), Counter(), Counter()]

    def aromatic_rings(mol):
        if not hasattr(mol, 'rings'):
            return []
        return [r for r in mol.rings()
                if all(mol.atoms[i].is_aromatic for i in r)]

    r1 = aromatic_rings(mol1)
    r2 = aromatic_rings(mol2)
    for ring1 in r1:
        c1 = compute_ring_center(mol1, ring1)
        n1 = compute_ring_normal(mol1, ring1)
        for ring2 in r2:
            c2 = compute_ring_center(mol2, ring2)
            n2 = compute_ring_normal(mol2, ring2)
            if is_pi_parallel(c1, n1, c2, n2, dist_cutoff=dist_cutoff,
                              angle_cutoff=angle_cutoff):
                for a in ring1:
                    out[1][int(a)] += 1
                for a in ring2:
                    out[3][int(a)] += 1
            elif is_pi_t(c1, n1, c2, n2, angle_cutoff=angle_cutoff):
                for a in ring1:
                    out[0][int(a)] += 1
                for a in ring2:
                    out[2][int(a)] += 1
    return tuple(dict(c) for c in out)


def voxelize_pi_stack(prot_xyz, prot_rdk, lig_xyz, lig_rdk, distances,
                      pi_stack_dist_cutoff, pi_stack_angle_cutoff,
                      box_width, voxel_width):
    """Voxel grids of parallel / T-shaped pi-stacking contacts
    (reference voxel_utils.py:166)."""
    (protein_pi_t, protein_pi_parallel, ligand_pi_t,
     ligand_pi_parallel) = _pi_stack_atom_counts(
         prot_rdk, lig_rdk, dist_cutoff=pi_stack_dist_cutoff,
         angle_cutoff=pi_stack_angle_cutoff)
    pi_parallel = voxelize(convert_atom_to_voxel, prot_xyz,
                           box_width=box_width, voxel_width=voxel_width,
                           feature_dict=protein_pi_parallel, nb_channel=1)
    pi_parallel += voxelize(convert_atom_to_voxel, lig_xyz,
                            box_width=box_width, voxel_width=voxel_width,
                            feature_dict=ligand_pi_parallel, nb_channel=1)
    pi_t = voxelize(convert_atom_to_voxel, prot_xyz,
                    box_width=box_width, voxel_width=voxel_width,
                    feature_dict=protein_pi_t, nb_channel=1)
    pi_t += voxelize(convert_atom_to_voxel, lig_xyz,
                     box_width=box_width, voxel_width=voxel_width,
                     feature_dict=ligand_pi_t, nb_channel=1)
    return [pi_parallel, pi_t]

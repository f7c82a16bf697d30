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

"""Crystal graph featurizers.

Redesigns of reference deepchem/feat/material_featurizers/
cgcnn_featurizer.py (CGCNNFeaturizer) and lcnn_featurizer.py.  Structures
are dicts {'lattice': 3x3, 'frac_coords': (N,3), 'species': [symbols]} or
pymatgen Structures; periodic neighbors are found over 3x3x3 image copies.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from deepchem_tpu.chem.mol import PERIODIC_TABLE
from deepchem_tpu.feat.base import Featurizer
from deepchem_tpu.feat.graph_data import GraphData


def _structure_arrays(datapoint):
    if hasattr(datapoint, 'lattice'):
        lattice = np.asarray(datapoint.lattice.matrix)
        frac = np.asarray(datapoint.frac_coords)
        zs = np.asarray([s.Z for s in datapoint.species])
    else:
        lattice = np.asarray(datapoint['lattice'], dtype=float)
        frac = np.asarray(datapoint['frac_coords'], dtype=float)
        zs = np.asarray([PERIODIC_TABLE[s] for s in datapoint['species']])
    return lattice, frac, zs


def periodic_neighbors(lattice: np.ndarray, frac: np.ndarray,
                       radius: float, max_neighbors: int):
    """Neighbor pairs within ``radius`` over 3x3x3 periodic images.

    Returns (src, dst, dist) arrays.
    """
    n = len(frac)
    cart = frac @ lattice
    shifts = np.array([(i, j, k) for i in (-1, 0, 1)
                       for j in (-1, 0, 1) for k in (-1, 0, 1)])
    src_all, dst_all, d_all = [], [], []
    images = (shifts @ lattice)[:, None, :] + cart[None, :, :]
    # images: [27, N, 3]; distances from each center atom
    for i in range(n):
        d = np.linalg.norm(images - cart[i], axis=-1)     # [27, N]
        d[13, i] = np.inf      # self at zero shift
        flat = d.reshape(-1)
        order = np.argsort(flat)
        picked = [oi for oi in order[:max_neighbors * 3]
                  if flat[oi] <= radius][:max_neighbors]
        for oi in picked:
            j = oi % n
            src_all.append(j)
            dst_all.append(i)
            d_all.append(flat[oi])
    return (np.asarray(src_all, dtype=np.int64),
            np.asarray(dst_all, dtype=np.int64),
            np.asarray(d_all, dtype=np.float32))


class CGCNNFeaturizer(Featurizer):
    """Crystal graph (reference cgcnn_featurizer.py): 92-dim atom one-hot
    embedding (atomic number bucket), gaussian-expanded distance edge
    features."""

    def __init__(self, radius: float = 8.0, max_neighbors: int = 12,
                 step: float = 0.2):
        self.radius = radius
        self.max_neighbors = max_neighbors
        self.step = step
        self.centers = np.arange(0, radius + self.step, self.step)

    def _featurize(self, datapoint, **kwargs) -> GraphData:
        lattice, frac, zs = _structure_arrays(datapoint)
        src, dst, d = periodic_neighbors(lattice, frac, self.radius,
                                         self.max_neighbors)
        node_feats = np.zeros((len(zs), 92), dtype=np.float32)
        for i, z in enumerate(zs):
            node_feats[i, min(int(z) - 1, 91)] = 1.0
        edge_feats = np.exp(
            -np.square(d[:, None] - self.centers) /
            (self.step ** 2)).astype(np.float32)
        ei = np.stack([src, dst])
        return GraphData(node_feats, ei, edge_feats)


class LCNNFeaturizer(Featurizer):
    """Lattice CNN featurizer for surface configurations (reference
    lcnn_featurizer.py, simplified): one-hot site occupancies + periodic
    neighbor graph."""

    def __init__(self, cutoff: float = 6.0, max_neighbors: int = 6,
                 n_occupancy: int = 3):
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors
        self.n_occupancy = n_occupancy

    def _featurize(self, datapoint, **kwargs) -> GraphData:
        lattice, frac, zs = _structure_arrays(datapoint)
        src, dst, d = periodic_neighbors(lattice, frac, self.cutoff,
                                         self.max_neighbors)
        occ = np.asarray(datapoint.get('occupancy',
                                       np.zeros(len(frac), dtype=int)) if
                         isinstance(datapoint, dict)
                         else np.zeros(len(frac), dtype=int))
        node_feats = np.eye(self.n_occupancy,
                            dtype=np.float32)[np.clip(
                                occ, 0, self.n_occupancy - 1)]
        ef = d[:, None].astype(np.float32)
        return GraphData(node_feats, np.stack([src, dst]), ef)

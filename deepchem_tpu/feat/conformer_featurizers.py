"""3D-aware graph featurizers: conformer graphs and equivariant graphs.

Redesigns of:
- RDKitConformerFeaturizer (reference feat/molecule_featurizers/
  conformer_featurizer.py:84) — GraphData with 3D positions in
  ``node_pos_features``; the reference embeds with RDKit ETKDGv2, here the
  in-repo distance-geometry embedder (utils/conformers.py) supplies
  coordinates when the molecule has none.
- EquivariantGraphFeaturizer (reference feat/molecule_featurizers/
  equivariant_graph_featurizer.py:17) — SE(3)-transformer inputs: node
  one-hots, displacement-vector edge features, one-hot-binned distance
  edge weights, positions.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

from deepchem_tpu.chem.mol import Molecule
from deepchem_tpu.feat.base import MolecularFeaturizer
from deepchem_tpu.feat.graph_data import GraphData
from deepchem_tpu.feat import feature_utils as fu

# full-precision periodic table slice used for one-hot node features
_EQ_ATOMS = [1, 6, 7, 8, 9, 16, 17]          # H C N O F S Cl


def _positions(mol: Molecule) -> np.ndarray:
    if mol.conformer is not None:
        return np.asarray(mol.conformer, dtype=np.float32)
    from deepchem_tpu.utils.conformers import embed_molecule_3d
    return np.asarray(embed_molecule_3d(mol), dtype=np.float32)


class RDKitConformerFeaturizer(MolecularFeaturizer):
    """GraphData with 3D coordinates (reference
    conformer_featurizer.py:84).  Node features: the full 30-dim
    MolGraphConv set; positions in ``node_pos_features``."""

    def __init__(self, num_conformers: int = 1):
        super().__init__()
        self.num_conformers = num_conformers

    def _featurize(self, mol: Molecule, **kwargs) -> GraphData:
        from deepchem_tpu.feat.molecule_featurizers import \
            MolGraphConvFeaturizer
        graph = MolGraphConvFeaturizer(use_edges=True)._featurize(mol)
        pos = _positions(mol)
        if self.num_conformers > 1:
            pos = np.concatenate([pos] * self.num_conformers, axis=0)
        return GraphData(graph.node_features, graph.edge_index,
                         graph.edge_features, node_pos_features=pos)


class EquivariantGraphFeaturizer(MolecularFeaturizer):
    """SE(3)-equivariant model inputs (reference
    equivariant_graph_featurizer.py:17)."""

    def __init__(self, fully_connected: bool = False,
                 weight_bins: Optional[List[float]] = None,
                 embeded: bool = False):
        super().__init__()
        self.fully_connected = fully_connected
        self.embeded = embeded
        self.weight_bins = (list(weight_bins) if weight_bins is not None
                            else [1.0, 2.0, 3.0, 4.0])

    def _node_features(self, mol: Molecule) -> np.ndarray:
        feats = []
        for a in mol.atoms:
            onehot = [float(a.atomic_num == z) for z in _EQ_ATOMS[1:]]
            feats.append(onehot + [float(a.atomic_num)])
        return np.asarray(feats, dtype=np.float32)

    def _discretize(self, dists: np.ndarray) -> np.ndarray:
        bins = np.digitize(dists, self.weight_bins)
        out = np.zeros((len(dists), len(self.weight_bins) + 1),
                       dtype=np.float32)
        out[np.arange(len(dists)), bins] = 1.0
        return out

    def _featurize(self, mol: Molecule, **kwargs) -> GraphData:
        pos = _positions(mol)
        nf = self._node_features(mol)
        src: List[int] = []
        dst: List[int] = []
        if self.fully_connected:
            n = mol.num_atoms
            for i in range(n):
                for j in range(n):
                    if i != j:
                        src.append(i)
                        dst.append(j)
        else:
            for b in mol.bonds:
                src += [b.a1, b.a2]
                dst += [b.a2, b.a1]
        src_a = np.asarray(src, dtype=np.int64)
        dst_a = np.asarray(dst, dtype=np.int64)
        disp = pos[dst_a] - pos[src_a] if len(src_a) else \
            np.zeros((0, 3), dtype=np.float32)
        dists = np.linalg.norm(disp, axis=-1) if len(src_a) else \
            np.zeros(0, dtype=np.float32)
        weights = self._discretize(dists)
        return GraphData(nf, np.stack([src_a, dst_a]),
                         edge_features=disp.astype(np.float32),
                         node_pos_features=pos,
                         edge_weights=weights)

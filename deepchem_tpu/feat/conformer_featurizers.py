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

    # OGB-style allowable-value tables (reference conformer_featurizer.py
    # allowable_features); 'misc' catches out-of-range values.
    ALLOWABLE = {
        'atomic_num': list(range(1, 119)) + ['misc'],
        'chirality': ['CHI_UNSPECIFIED', 'CHI_TETRAHEDRAL_CW',
                      'CHI_TETRAHEDRAL_CCW', 'CHI_OTHER'],
        'degree': list(range(11)) + ['misc'],
        'formal_charge': [-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, 'misc'],
        'numH': list(range(9)) + ['misc'],
        'radical_e': list(range(5)) + ['misc'],
        'hybridization': ['SP', 'SP2', 'SP3', 'SP3D', 'SP3D2', 'misc'],
        'is_aromatic': [False, True],
        'is_in_ring': [False, True],
        'bond_type': ['SINGLE', 'DOUBLE', 'TRIPLE', 'AROMATIC', 'misc'],
        'bond_stereo': ['STEREONONE', 'STEREOZ', 'STEREOE', 'STEREOCIS',
                        'STEREOTRANS', 'STEREOANY'],
        'is_conjugated': [False, True],
    }

    @staticmethod
    def _safe_index(table, value):
        try:
            return table.index(value)
        except ValueError:
            return len(table) - 1

    def __init__(self, num_conformers: int = 1):
        super().__init__()
        self.num_conformers = num_conformers

    def atom_to_feature_vector(self, atom) -> List[int]:
        """OGB-style index features for one atom (reference
        conformer_featurizer.py:121)."""
        chirality = ('CHI_UNSPECIFIED' if not atom.chirality else
                     'CHI_TETRAHEDRAL_CW' if atom.chirality == '@@' else
                     'CHI_TETRAHEDRAL_CCW')
        A, idx = self.ALLOWABLE, self._safe_index
        return [
            idx(A['atomic_num'], atom.atomic_num),
            idx(A['chirality'], chirality),
            idx(A['degree'], atom.degree + atom.total_hs),
            idx(A['formal_charge'], atom.formal_charge),
            idx(A['numH'], atom.total_hs),
            idx(A['radical_e'], atom.num_radical_electrons),
            idx(A['hybridization'], atom.hybridization.upper()),
            A['is_aromatic'].index(bool(atom.is_aromatic)),
            A['is_in_ring'].index(bool(atom.in_ring)),
        ]

    def bond_to_feature_vector(self, bond) -> List[int]:
        """OGB-style index features for one bond (reference
        conformer_featurizer.py:157)."""
        A, idx = self.ALLOWABLE, self._safe_index
        if bond.is_aromatic:
            btype = 'AROMATIC'
        else:
            btype = {1.0: 'SINGLE', 2.0: 'DOUBLE',
                     3.0: 'TRIPLE'}.get(float(bond.order), 'misc')
        stereo = {'': 'STEREONONE', 'cis': 'STEREOCIS',
                  'trans': 'STEREOTRANS'}.get(bond.stereo, 'STEREOANY')
        return [
            idx(A['bond_type'], btype),
            A['bond_stereo'].index(stereo),
            A['is_conjugated'].index(bool(bond.is_conjugated)),
        ]

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

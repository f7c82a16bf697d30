"""MolGAN graph-matrix featurizer (reference
deepchem/feat/molecule_featurizers/molgan_featurizer.py: GraphMatrix +
MolGanFeaturizer)."""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

from deepchem_tpu.chem import Molecule, mol_to_smiles
from deepchem_tpu.chem.mol import (Atom, BOND_AROMATIC, BOND_DOUBLE,
                                   BOND_SINGLE, BOND_TRIPLE)
from deepchem_tpu.feat.base import MolecularFeaturizer

logger = logging.getLogger(__name__)

# bond type channels: 0 = no bond
_BOND_CODES = {BOND_SINGLE: 1, BOND_DOUBLE: 2, BOND_TRIPLE: 3,
               BOND_AROMATIC: 4}
_CODE_TO_ORDER = {1: BOND_SINGLE, 2: BOND_DOUBLE, 3: BOND_TRIPLE,
                  4: BOND_AROMATIC}


class GraphMatrix:
    """Adjacency-tensor + node-label representation (reference
    molgan_featurizer.py GraphMatrix)."""

    def __init__(self, adjacency_matrix: np.ndarray,
                 node_features: np.ndarray):
        self.adjacency_matrix = adjacency_matrix
        self.node_features = node_features


class MolGanFeaturizer(MolecularFeaturizer):
    """(reference molgan_featurizer.py MolGanFeaturizer): molecules ->
    GraphMatrix and back (defeaturize)."""

    def __init__(self, max_atom_count: int = 9, kekulize: bool = True,
                 bond_labels: Optional[Sequence] = None,
                 atom_labels: Optional[Sequence[int]] = None):
        super().__init__()
        self.max_atom_count = max_atom_count
        self.kekulize = kekulize
        # atomic numbers; 0 = empty slot
        self.atom_labels = list(atom_labels) if atom_labels is not None \
            else [0, 6, 7, 8, 9]
        self.n_bond_types = 5         # none, single, double, triple, arom

    def _featurize(self, mol: Molecule, **kwargs) -> GraphMatrix:
        n = mol.num_atoms
        if n > self.max_atom_count:
            raise ValueError('molecule exceeds max_atom_count')
        A = np.zeros((self.max_atom_count, self.max_atom_count),
                     dtype=np.int32)
        for b in mol.bonds:
            code = _BOND_CODES.get(b.order, 1)
            A[b.a1, b.a2] = code
            A[b.a2, b.a1] = code
        X = np.zeros(self.max_atom_count, dtype=np.int32)
        for i, a in enumerate(mol.atoms):
            try:
                X[i] = self.atom_labels.index(a.atomic_num)
            except ValueError:
                raise ValueError(f'atom type {a.symbol} not in labels')
        adj = np.eye(self.n_bond_types, dtype=np.float32)[A]
        nodes = np.eye(len(self.atom_labels), dtype=np.float32)[X]
        return GraphMatrix(adj, nodes)

    def defeaturize(self, graphs, log_every_n: int = 1000) -> np.ndarray:
        """GraphMatrix -> Molecule (None on invalid) (reference
        molgan_featurizer.py defeaturize)."""
        if isinstance(graphs, GraphMatrix):
            graphs = [graphs]
        out = []
        for g in graphs:
            try:
                A = np.argmax(np.asarray(g.adjacency_matrix), axis=-1)
                X = np.argmax(np.asarray(g.node_features), axis=-1)
                mol = Molecule()
                idx_map = {}
                for i, label in enumerate(X):
                    z = self.atom_labels[int(label)]
                    if z > 0:
                        idx_map[i] = mol.add_atom(Atom(atomic_num=z))
                for i in range(len(X)):
                    for j in range(i + 1, len(X)):
                        code = int(A[i, j])
                        if code > 0 and i in idx_map and j in idx_map:
                            mol.add_bond(idx_map[i], idx_map[j],
                                         order=_CODE_TO_ORDER[code],
                                         is_aromatic=(code == 4))
                mol.finalize()
                if mol.num_atoms == 0:
                    out.append(None)
                else:
                    out.append(mol)
            except Exception as e:
                logger.debug('defeaturize failed: %s', e)
                out.append(None)
        arr = np.empty(len(out), dtype=object)
        for i, m in enumerate(out):
            arr[i] = m
        return arr

"""Grover graph batching utilities (reference
``deepchem/utils/grover.py``): BatchGroverGraph and
extract_grover_attributes.

The Grover MODEL in this framework batches its own inputs (packed dense
incidence layout, models/grover.py) — these utilities exist for
reference-API users who assemble Grover tensors themselves.  Arrays are
numpy (jnp-ready), not torch tensors."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from deepchem_tpu.feat.graph_data import BatchGraphData, GraphData


def _scopes_from_index(index: np.ndarray) -> List[Tuple[int, int]]:
    """(start, length) runs of a sorted membership index."""
    scopes = []
    if len(index) == 0:
        return scopes
    n_groups = int(index.max()) + 1
    for g in range(n_groups):
        where = np.nonzero(index == g)[0]
        scopes.append((int(where[0]) if len(where) else 0, len(where)))
    return scopes


def extract_grover_attributes(molgraph):
    """Batched Grover tensors from graphs (reference grover.py:278).

    Accepts a list of GroverFeaturizer GraphData objects or a
    BatchGraphData.  Returns (f_atoms, f_bonds, a2b, b2a, b2revb, a2a,
    a_scope, b_scope, fg_labels, additional_features)."""
    if isinstance(molgraph, (list, tuple, np.ndarray)):
        graphs = list(molgraph)
        fg_labels = (np.stack([g.fg_label for g in graphs])
                     if all(hasattr(g, 'fg_label') for g in graphs)
                     else np.zeros((len(graphs), 0), np.float32))
        additional = (np.stack([g.additional_features for g in graphs])
                      if all(hasattr(g, 'additional_features')
                             for g in graphs)
                      else np.zeros((len(graphs), 0), np.float32))
        batch = BatchGraphData(graphs)
    else:
        batch = molgraph
        fg_labels = getattr(batch, 'fg_labels',
                            np.zeros((batch.num_graphs, 0), np.float32))
        additional = getattr(batch, 'additional_features',
                             np.zeros((batch.num_graphs, 0), np.float32))
    f_atoms = np.asarray(batch.node_features, np.float32)
    f_bonds = np.asarray(batch.edge_features, np.float32)
    edge_index = np.asarray(batch.edge_index)
    graph_index = np.asarray(batch.graph_index)
    n_atoms = batch.num_nodes
    n_bonds = edge_index.shape[1]

    a_scope = _scopes_from_index(graph_index)
    bond_graph = graph_index[edge_index[0]] if n_bonds else \
        np.zeros(0, np.int32)
    b_scope = _scopes_from_index(bond_graph)

    # reverse-bond index: edge (u, v) -> index of (v, u)
    lookup = {(int(u), int(v)): k
              for k, (u, v) in enumerate(edge_index.T)}
    b2revb = np.array([lookup.get((int(v), int(u)), k)
                       for k, (u, v) in enumerate(edge_index.T)],
                      dtype=np.int64)
    b2a = edge_index[0].astype(np.int64)

    # incoming bonds per atom, padded with 0 (reference pads with the
    # ghost bond 0)
    incoming: List[List[int]] = [[] for _ in range(n_atoms)]
    for k in range(n_bonds):
        incoming[int(edge_index[1, k])].append(k)
    max_deg = max((len(x) for x in incoming), default=1) or 1
    a2b = np.zeros((n_atoms, max_deg), dtype=np.int64)
    for i, lst in enumerate(incoming):
        a2b[i, :len(lst)] = lst
    a2a = b2a[a2b]

    return (f_atoms, f_bonds, a2b, b2a, b2revb, a2a, a_scope, b_scope,
            np.asarray(fg_labels, np.float32),
            np.asarray(additional, np.float32))


class BatchGroverGraph:
    """Batch GroverFeaturizer graphs into joint Grover tensors
    (reference grover.py:14)."""

    def __init__(self, mol_graphs: Sequence[GraphData]):
        self.n_mols = len(mol_graphs)
        (self.f_atoms, self.f_bonds, self.a2b, self.b2a, self.b2revb,
         self.a2a, self.a_scope, self.b_scope, self.fg_labels,
         self.additional_features) = extract_grover_attributes(
             list(mol_graphs))
        self.n_atoms = len(self.f_atoms)
        self.n_bonds = len(self.b2a)
        self.atom_fdim = self.f_atoms.shape[1]
        self.bond_fdim = (self.f_bonds.shape[1]
                          if self.f_bonds.ndim == 2 else 0)

    def get_components(self):
        """The batched tensors, reference ordering (grover.py
        get_components)."""
        return (self.f_atoms, self.f_bonds, self.a2b, self.b2a,
                self.b2revb, self.a2a, self.a_scope, self.b_scope,
                self.fg_labels, self.additional_features)

"""COO graph containers with TPU-static batching.

Redesign of reference deepchem/feat/graph_data.py:6 (``GraphData``) and :318
(``BatchGraphData``).  The key TPU-first addition is :meth:`BatchGraphData.pad`
— ragged graph batches become fixed-shape arrays with validity masks so the
jitted train step sees a small, fixed set of shapes (SURVEY.md section 7,
"static shapes are the core design problem").  Degree-bucketed ConvMol
agglomeration (reference feat/mol_graphs.py:257) is intentionally NOT
replicated: one COO layout + segment ops serves all graph models on TPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class GraphData:
    """A single graph: node features + COO edges (reference graph_data.py:6).

    Attributes
    ----------
    node_features: np.ndarray, shape (num_nodes, num_node_features)
    edge_index: np.ndarray of int, shape (2, num_edges)
    edge_features: optional np.ndarray, shape (num_edges, num_edge_features)
    node_pos_features: optional np.ndarray, shape (num_nodes, 3)
    """

    def __init__(self, node_features: np.ndarray, edge_index: np.ndarray,
                 edge_features: Optional[np.ndarray] = None,
                 node_pos_features: Optional[np.ndarray] = None,
                 **kwargs):
        node_features = np.asarray(node_features)
        edge_index = np.asarray(edge_index, dtype=np.int64)
        if edge_index.ndim != 2 or edge_index.shape[0] != 2:
            raise ValueError('edge_index must have shape (2, num_edges)')
        if edge_index.size and edge_index.max() >= len(node_features):
            raise ValueError('edge_index refers to nonexistent node')
        if edge_features is not None:
            edge_features = np.asarray(edge_features)
            if len(edge_features) != edge_index.shape[1]:
                raise ValueError('edge_features length mismatch')
        self.node_features = node_features
        self.edge_index = edge_index
        self.edge_features = edge_features
        self.node_pos_features = node_pos_features
        self.kwargs = kwargs
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def num_nodes(self) -> int:
        return self.node_features.shape[0]

    @property
    def num_node_features(self) -> int:
        return self.node_features.shape[1]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    @property
    def num_edge_features(self) -> int:
        return 0 if self.edge_features is None \
            else self.edge_features.shape[1]

    def __repr__(self) -> str:
        return (f'GraphData(node_features={self.node_features.shape}, '
                f'edge_index={self.edge_index.shape}'
                + (f', edge_features={self.edge_features.shape}'
                   if self.edge_features is not None else '') + ')')

    def subgraph(self, nodes: Sequence[int]):
        """Induced subgraph; returns (GraphData, node_mapping) (reference
        graph_data.py:260)."""
        nodes = list(nodes)
        mapping = {old: new for new, old in enumerate(nodes)}
        keep_edges = []
        for e in range(self.num_edges):
            s, d = self.edge_index[0, e], self.edge_index[1, e]
            if s in mapping and d in mapping:
                keep_edges.append(e)
        ei = np.array([[mapping[self.edge_index[0, e]] for e in keep_edges],
                       [mapping[self.edge_index[1, e]] for e in keep_edges]],
                      dtype=np.int64).reshape(2, -1)
        ef = (self.edge_features[keep_edges]
              if self.edge_features is not None else None)
        return GraphData(self.node_features[nodes], ei, ef), mapping

    def to_networkx(self):
        """NetworkX DiGraph with node/edge feature attributes (analog of
        the reference's to_dgl_graph/to_pyg_graph interop,
        graph_data.py:132,166; dgl/pyg are not in this environment)."""
        import networkx as nx
        g = nx.DiGraph()
        for i in range(self.num_nodes):
            g.add_node(i, x=self.node_features[i])
        for e in range(self.num_edges):
            attrs = {}
            if self.edge_features is not None:
                attrs['edge_attr'] = self.edge_features[e]
            g.add_edge(int(self.edge_index[0, e]),
                       int(self.edge_index[1, e]), **attrs)
        return g

    def to_dgl_graph(self, self_loop: bool = False):
        """DGL interop (reference graph_data.py:166); requires dgl."""
        try:
            import dgl
            import torch
        except ImportError as e:
            raise ImportError(
                'to_dgl_graph requires dgl, which is not available in '
                'this environment; use to_networkx() or the COO arrays '
                'directly') from e
        src, dst = self.edge_index
        g = dgl.graph((torch.as_tensor(src), torch.as_tensor(dst)),
                      num_nodes=self.num_nodes)
        g.ndata['x'] = torch.as_tensor(self.node_features)
        if self.edge_features is not None:
            g.edata['edge_attr'] = torch.as_tensor(self.edge_features)
        if self_loop:
            g = dgl.add_self_loop(g)
        return g

    def to_pyg_graph(self):
        """PyTorch-Geometric interop (reference graph_data.py:132);
        requires torch_geometric."""
        try:
            import torch
            from torch_geometric.data import Data
        except ImportError as e:
            raise ImportError(
                'to_pyg_graph requires torch_geometric, which is not '
                'available in this environment; use to_networkx() or the '
                'COO arrays directly') from e
        return Data(
            x=torch.as_tensor(self.node_features),
            edge_index=torch.as_tensor(self.edge_index),
            edge_attr=(torch.as_tensor(self.edge_features)
                       if self.edge_features is not None else None),
            pos=(torch.as_tensor(self.node_pos_features)
                 if self.node_pos_features is not None else None))


class BatchGraphData(GraphData):
    """Disjoint-union batch of graphs (reference graph_data.py:318).

    Adds ``graph_index`` (node -> graph membership).
    """

    def __init__(self, graph_list: Sequence[GraphData]):
        node_features = np.concatenate(
            [g.node_features for g in graph_list], axis=0)
        offsets = np.cumsum([0] + [g.num_nodes for g in graph_list][:-1])
        edge_index = np.concatenate(
            [g.edge_index + off for g, off in zip(graph_list, offsets)],
            axis=1)
        if all(g.edge_features is not None for g in graph_list):
            edge_features = np.concatenate(
                [g.edge_features for g in graph_list], axis=0)
        else:
            edge_features = None
        if all(g.node_pos_features is not None for g in graph_list):
            node_pos = np.concatenate(
                [g.node_pos_features for g in graph_list], axis=0)
        else:
            node_pos = None
        self.graph_index = np.repeat(
            np.arange(len(graph_list)),
            [g.num_nodes for g in graph_list]).astype(np.int32)
        self.num_graphs = len(graph_list)
        super().__init__(node_features, edge_index, edge_features, node_pos)

    def pad(self, node_cap: int, edge_cap: int,
            num_graphs: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Produce fixed-shape arrays + masks for the jitted step.

        Padded nodes are assigned to an extra "ghost" graph slot
        (index num_graphs) and padded edges point at the last (padded) node,
        so segment reductions stay in-bounds; masks zero them out.
        """
        return pad_graph_batch(self, node_cap, edge_cap,
                               num_graphs or self.num_graphs)


def pad_graph_batch(batch: BatchGraphData, node_cap: int, edge_cap: int,
                    num_graphs: int) -> Dict[str, np.ndarray]:
    n, e = batch.num_nodes, batch.num_edges
    if n > node_cap or e > edge_cap:
        raise ValueError(
            f'batch ({n} nodes, {e} edges) exceeds caps '
            f'({node_cap}, {edge_cap}); raise caps or lower batch size')
    f = batch.num_node_features
    nf = np.zeros((node_cap, f), dtype=np.float32)
    nf[:n] = batch.node_features
    ei = np.full((2, edge_cap), node_cap - 1, dtype=np.int32)
    ei[:, :e] = batch.edge_index
    out: Dict[str, np.ndarray] = {
        'node_features': nf,
        'edge_index': ei,
        'node_mask': (np.arange(node_cap) < n).astype(np.float32),
        'edge_mask': (np.arange(edge_cap) < e).astype(np.float32),
        # ghost slot = num_graphs; reductions use num_graphs+1 segments
        'graph_index': np.concatenate([
            batch.graph_index,
            np.full(node_cap - n, num_graphs, dtype=np.int32)]),
        'num_graphs': np.int32(num_graphs),
    }
    if batch.edge_features is not None:
        ef = np.zeros((edge_cap, batch.num_edge_features), dtype=np.float32)
        ef[:e] = batch.edge_features
        out['edge_features'] = ef
    if batch.node_pos_features is not None:
        npf = np.zeros((node_cap, batch.node_pos_features.shape[1]),
                       dtype=np.float32)
        npf[:n] = batch.node_pos_features
        out['node_pos_features'] = npf
    return out


def bucket_caps(num_nodes: int, num_edges: int,
                node_quantum: int = 128,
                edge_quantum: int = 256) -> tuple:
    """Round (nodes, edges) up to bucket boundaries to bound the number of
    distinct compiled shapes (padding waste vs recompilation tradeoff,
    SURVEY.md section 7 'hard parts')."""
    def round_up(x, q):
        return max(q, ((x + q - 1) // q) * q)
    return round_up(num_nodes, node_quantum), round_up(num_edges, edge_quantum)


def graphs_to_padded_batch(graphs: Sequence[GraphData],
                           node_cap: Optional[int] = None,
                           edge_cap: Optional[int] = None,
                           num_graphs: Optional[int] = None
                           ) -> Dict[str, np.ndarray]:
    """One-call helper: list of GraphData -> padded static arrays."""
    batch = BatchGraphData(graphs)
    if node_cap is None or edge_cap is None:
        nc, ec = bucket_caps(batch.num_nodes + 1, batch.num_edges)
        node_cap = node_cap or nc
        edge_cap = edge_cap or ec
    return batch.pad(node_cap, edge_cap, num_graphs or len(graphs))


class WeightedDirectedGraphData(GraphData):
    """Graph with per-edge weights for polymer models (reference
    graph_data.py:538)."""

    def __init__(self, node_features, edge_index, edge_weights, **kwargs):
        self.edge_weights = np.asarray(edge_weights, dtype=np.float32)
        super().__init__(node_features, edge_index, **kwargs)

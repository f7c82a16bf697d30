"""Synthetic GraphData generator for tests (reference
deepchem/utils/fake_data_generator.py:10 FakeGraphGenerator)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from deepchem_tpu.feat.graph_data import GraphData


class FakeGraphGenerator:
    """Generate random molecular-like graphs.

    Parameters mirror the reference: node/edge feature sizes, average
    degree, and global label generation.
    """

    def __init__(self, min_nodes: int = 8, max_nodes: int = 10,
                 n_node_features: int = 5, avg_degree: int = 4,
                 n_edge_features: int = 3, n_classes: int = 2,
                 task: str = 'graph', z: int = 5, seed: Optional[int] = None):
        self.min_nodes = min_nodes
        self.max_nodes = max_nodes
        self.avg_degree = avg_degree
        self.n_node_features = n_node_features
        self.n_edge_features = n_edge_features
        self.n_classes = n_classes
        self.task = task
        self.z = z
        self.rng = np.random.RandomState(seed)

    def sample(self, n_graphs: int = 100):
        """Returns (list of GraphData, labels)."""
        graphs, labels = [], []
        for _ in range(n_graphs):
            n = self.rng.randint(self.min_nodes, self.max_nodes + 1)
            nf = self.rng.rand(n, self.n_node_features).astype(np.float32)
            n_edges = max(1, (n * self.avg_degree) // 2)
            src = self.rng.randint(0, n, n_edges)
            dst = self.rng.randint(0, n, n_edges)
            keep = src != dst
            src, dst = src[keep], dst[keep]
            if len(src) == 0:
                src, dst = np.array([0]), np.array([min(1, n - 1)])
            ei = np.stack([np.concatenate([src, dst]),
                           np.concatenate([dst, src])])
            ef = self.rng.rand(ei.shape[1],
                               self.n_edge_features).astype(np.float32)
            g = GraphData(nf, ei, ef)
            graphs.append(g)
            if self.task == 'graph':
                labels.append(self.rng.randint(0, self.n_classes))
            else:
                labels.append(self.rng.randint(0, self.n_classes, n))
        return graphs, np.asarray(labels, dtype=float)


def remove_self_loops(edge_index: np.ndarray) -> np.ndarray:
    """Drop i->i edges from a (2, E) edge index (reference
    fake_data_generator.py:152)."""
    edge_index = np.asarray(edge_index)
    mask = edge_index[0] != edge_index[1]
    return edge_index[:, mask]


def generate_edge_index(n_nodes: int, avg_degree: int,
                        remove_loops: bool = True) -> np.ndarray:
    """Random (2, n_nodes*avg_degree) edge index (reference
    fake_data_generator.py:128)."""
    edge_index = np.random.randint(0, n_nodes,
                                   size=(2, n_nodes * avg_degree))
    if remove_loops:
        edge_index = remove_self_loops(edge_index)
    return edge_index

"""MXMNet: multiplex molecular graph network for quantum properties
(reference deepchem/models/torch_models/mxmnet.py + MXMNet blocks in
torch_models/layers.py:4651-5989; featurizer MXMNetFeaturizer).

Compact TPU redesign: two interacting message-passing plexes —
local (covalent bonds) and global (radius graph over 3D coordinates) —
with gaussian radial basis edge features; cross-plex exchange each layer.
Molecules must carry conformers (SDF or utils.conformers embedding).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.chem import Molecule
from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.feat.base import MolecularFeaturizer
from deepchem_tpu.feat.graph_data import GraphData
from deepchem_tpu.models.graph_models import GraphModel, _gnn_loss_outputs
from deepchem_tpu.ops import graph_pool, segment_sum


class MXMNetFeaturizer(MolecularFeaturizer):
    """(reference mxmnet_featurizer.py): atomic numbers + 3D coords; the
    dual graphs are built in the model's batch prep (local = bonds,
    global = radius neighbors)."""

    def __init__(self, radius: float = 5.0, max_neighbors: int = 16):
        super().__init__()
        self.radius = radius
        self.max_neighbors = max_neighbors

    def _featurize(self, mol: Molecule, **kwargs) -> GraphData:
        if mol.conformer is None:
            from deepchem_tpu.utils.conformers import embed_molecule_3d
            coords = embed_molecule_3d(mol)
        else:
            coords = np.asarray(mol.conformer, dtype=np.float32)
        z = np.array([a.atomic_num for a in mol.atoms], dtype=np.int32)
        nf = np.eye(10, dtype=np.float32)[np.clip(z, 0, 9)]
        # local (bond) edges
        src, dst = [], []
        for b in mol.bonds:
            src += [b.a1, b.a2]
            dst += [b.a2, b.a1]
        ei = np.array([src, dst], dtype=np.int64).reshape(2, -1)
        # global radius edges
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        gsrc, gdst = [], []
        for i in range(len(z)):
            order = np.argsort(d[i])[:self.max_neighbors]
            for j in order:
                if d[i, j] <= self.radius:
                    gsrc.append(j)
                    gdst.append(i)
        g = GraphData(nf, ei,
                      node_pos_features=coords.astype(np.float32))
        setattr(g, 'global_edges', np.array([gsrc, gdst],
                                            dtype=np.int64).reshape(2, -1))
        g.kwargs['global_edges'] = g.global_edges
        return g


def _rbf(d, n_basis=16, cutoff=5.0):
    centers = jnp.linspace(0.0, cutoff, n_basis)
    return jnp.exp(-10.0 * jnp.square(d[:, None] - centers))


class _PlexLayer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, h, src, dst, dist, emask):
        n = h.shape[0]
        e = nn.Dense(self.dim)(_rbf(dist))
        z = jnp.concatenate(
            [jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0), e],
            axis=1)
        msg = nn.silu(nn.Dense(self.dim)(z)) * emask[:, None]
        agg = segment_sum(msg, dst, n)
        return nn.silu(h + nn.Dense(self.dim)(agg))


class _MXMNetModule(nn.Module):
    n_tasks: int
    dim: int
    n_layers: int
    num_graphs: int

    @nn.compact
    def __call__(self, nf, lsrc, ldst, gsrc, gdst, gidx, nmask,
                 lmask, gmask, pos, training: bool = False):
        lsrc = lsrc.astype(jnp.int32)
        ldst = ldst.astype(jnp.int32)
        gsrc = gsrc.astype(jnp.int32)
        gdst = gdst.astype(jnp.int32)
        h = nn.Dense(self.dim)(nf)
        ldist = jnp.linalg.norm(
            jnp.take(pos, lsrc, axis=0) - jnp.take(pos, ldst, axis=0)
            + 1e-9, axis=-1)
        gdist = jnp.linalg.norm(
            jnp.take(pos, gsrc, axis=0) - jnp.take(pos, gdst, axis=0)
            + 1e-9, axis=-1)
        outputs = 0.0
        for _ in range(self.n_layers):
            h_local = _PlexLayer(self.dim)(h, lsrc, ldst, ldist, lmask)
            h_global = _PlexLayer(self.dim)(h, gsrc, gdst, gdist, gmask)
            h = nn.silu(nn.Dense(self.dim)(
                jnp.concatenate([h_local, h_global], axis=1)))
            # per-layer output contribution (MXMNet-style deep supervision)
            outputs = outputs + nn.Dense(self.n_tasks)(h)
        per_atom = outputs * nmask[:, None]
        out = graph_pool(per_atom, gidx, self.num_graphs, nmask, 'sum')
        return out


class MXMNetModel(GraphModel):
    """(reference torch_models/mxmnet.py MXMNet)"""

    def __init__(self, n_tasks: int = 1, dim: int = 64,
                 n_layers: int = 3, batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = 'regression'
        self.n_classes = 2
        module = _MXMNetModule(n_tasks=n_tasks, dim=dim,
                               n_layers=n_layers, num_graphs=batch_size)
        loss, output_types = _gnn_loss_outputs('regression')
        kwargs.setdefault('data_parallel', False)
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1

    def _graph_inputs(self, X_b) -> List[np.ndarray]:
        graphs = list(X_b)
        from deepchem_tpu.feat.graph_data import BatchGraphData, \
            bucket_caps
        batch = BatchGraphData(graphs)
        # merge global edges with offsets
        offsets = np.cumsum([0] + [g.num_nodes for g in graphs][:-1])
        ge = np.concatenate(
            [np.asarray(g.global_edges) + off
             for g, off in zip(graphs, offsets)], axis=1) \
            if graphs else np.zeros((2, 0), np.int64)
        n_global = ge.shape[1]
        if self._fixed_caps is not None:
            # uniform-shape mode (fit_on_device/_fit_fast): the global
            # radius graph has ~2-3x the local edge count, so cap it at
            # 4x the local cap
            node_cap, ledge_cap = self._fixed_caps
            gedge_cap = 4 * ledge_cap
            if n_global > gedge_cap:
                raise ValueError(
                    f'global edges {n_global} exceed cap {gedge_cap}')
        else:
            node_cap, ledge_cap = bucket_caps(batch.num_nodes + 1,
                                              batch.num_edges,
                                              self.node_quantum,
                                              self.edge_quantum)
            _, gedge_cap = bucket_caps(1, max(n_global, 1),
                                       self.node_quantum,
                                       self.edge_quantum)
        d = batch.pad(node_cap, ledge_cap, num_graphs=self.batch_size)
        gsrc = np.full(gedge_cap, node_cap - 1, dtype=np.int32)
        gdst = np.full(gedge_cap, node_cap - 1, dtype=np.int32)
        gsrc[:n_global] = ge[0]
        gdst[:n_global] = ge[1]
        gmask = (np.arange(gedge_cap) < n_global).astype(np.float32)
        pos = np.zeros((node_cap, 3), dtype=np.float32)
        pos[:batch.num_nodes] = batch.node_pos_features
        return [d['node_features'], d['edge_index'][0],
                d['edge_index'][1], gsrc, gdst, d['graph_index'],
                d['node_mask'], d['edge_mask'], gmask, pos]

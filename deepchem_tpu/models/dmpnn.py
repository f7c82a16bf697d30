"""Directed MPNN / Chemprop (reference deepchem/models/torch_models/dmpnn.py
DMPNNModel + torch_models/layers.py:1261 DMPNNEncoderLayer; featurizer
feat/molecule_featurizers/dmpnn_featurizer.py).

Directed edge-message passing on the COO layout: the featurizer emits edge
pairs consecutively, so the reverse of edge e is e XOR 1 — message exclusion
of the reverse edge becomes one gather and a subtraction (no per-edge Python
bookkeeping like the reference's mapping arrays).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.graph_models import (GraphModel, _heads,
                                              _gnn_loss_outputs)
from deepchem_tpu.ops import graph_pool, segment_sum


class _DMPNNModule(nn.Module):
    n_tasks: int
    n_classes: int
    enc_hidden: int
    depth: int
    ffn_hidden: int
    ffn_layers: int
    dropout: float
    mode: str
    num_graphs: int

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 e_table=None, e_deg=None, ef=None,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        if ef is None and e_table is not None and \
                jnp.issubdtype(e_table.dtype, jnp.floating):
            # COO mode (uses_edge_table=False): edge features arrive in
            # the e_table position
            ef, e_table = e_table, None
        n = nf.shape[0]
        E = ef.shape[0]
        D = self.enc_hidden
        if e_table is not None:
            from deepchem_tpu.ops.nei_table import nei_sum_edges
            e_nbr_mask = (jnp.arange(e_table.shape[1], dtype=jnp.int32)
                          [None, :]
                          < e_deg.astype(jnp.int32)[:, None]
                          ).astype(nf.dtype)

            def edge_to_node(h):
                return nei_sum_edges(h, e_table, e_nbr_mask, edst, emask)
        else:
            def edge_to_node(h):
                return segment_sum(h * emask[:, None], edst, n)
        # initial directed-edge states from [x_src || e_feat]
        x_src = jnp.take(nf, esrc, axis=0)
        h0 = nn.relu(nn.Dense(D, use_bias=False)(
            jnp.concatenate([x_src, ef], axis=1)))
        W_h = nn.Dense(D, use_bias=False)
        # reverse edge index: featurizer emits (u->v, v->u) adjacent pairs
        rev = jnp.arange(E, dtype=jnp.int32) ^ 1
        h = h0
        for _ in range(self.depth - 1):
            # sum of edge states arriving at each node
            node_in = edge_to_node(h)
            # directed message: arrivals at src(e), minus the reverse edge
            m = jnp.take(node_in, esrc, axis=0) - jnp.take(h, rev, axis=0)
            h = nn.relu(h0 + W_h(m))
            if self.dropout > 0:
                h = nn.Dropout(self.dropout,
                               deterministic=not training)(h)
        # node embeddings from incoming edge states
        node_in = edge_to_node(h)
        z = nn.relu(nn.Dense(D)(jnp.concatenate([nf, node_in], axis=1)))
        g = graph_pool(z, gidx, self.num_graphs, nmask, 'sum')
        x = g
        for _ in range(self.ffn_layers):
            x = nn.relu(nn.Dense(self.ffn_hidden)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=not training)(x)
        return _heads(x, self.n_tasks, self.n_classes, self.mode, False,
                      training)


class DMPNNModel(GraphModel):
    """Chemprop D-MPNN (reference torch_models/dmpnn.py; featurizer
    MolGraphConvFeaturizer(use_edges=True) or DMPNNFeaturizer)."""

    uses_edge_features = True
    uses_edge_table = True

    def __init__(self, n_tasks: int = 1, mode: str = 'regression',
                 n_classes: int = 2, batch_size: int = 100,
                 enc_hidden: int = 300, depth: int = 3,
                 ffn_hidden: int = 300, ffn_layers: int = 3,
                 dropout_p: float = 0.0, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        from deepchem_tpu.models.graph_models import graph_dp_shards
        shards = graph_dp_shards(kwargs.get('data_parallel', True))
        if batch_size % shards:
            shards = 1
        module = _DMPNNModule(
            n_tasks=n_tasks, n_classes=n_classes, enc_hidden=enc_hidden,
            depth=depth, ffn_hidden=ffn_hidden, ffn_layers=ffn_layers,
            dropout=dropout_p, mode=mode,
            num_graphs=batch_size // shards)
        loss, output_types = _gnn_loss_outputs(mode)
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = shards

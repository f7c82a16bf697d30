"""InfoGraph / InfoGraphStar: mutual-information graph pretraining
(reference deepchem/models/torch_models/infograph.py InfoGraphModel /
InfoGraphStarModel).

Unsupervised: maximize MI between graph-level and node-level embeddings via
the JSD estimator (losses.GlobalMutualInformationLoss).  Semi-supervised
(Star): add a supervised head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.graph_models import (GraphModel, _gnn_loss_outputs,
                                              graph_dp_shards)
from deepchem_tpu.models.gnn_modular import ModularModel
from deepchem_tpu.models.graph_layers import GCNLayer
from deepchem_tpu.models.losses import GlobalMutualInformationLoss
from deepchem_tpu.ops import graph_pool, node_degrees


class _InfoGraphEncoder(nn.Module):
    dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, nf, esrc, edst, emask, deg):
        h = nf
        cat = []
        for _ in range(self.num_layers):
            h = GCNLayer(self.dim, activation=nn.relu)(
                h, esrc, edst, emask, deg)
            cat.append(h)
        return jnp.concatenate(cat, axis=1)      # node embeddings


class _InfoGraphModule(nn.Module):
    dim: int
    num_layers: int
    num_graphs: int
    n_tasks: int = 0                 # >0 adds a supervised head (Star)

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        deg = node_degrees(edst, nf.shape[0], emask)
        local = _InfoGraphEncoder(self.dim, self.num_layers)(
            nf, esrc, edst, emask, deg)
        global_emb = graph_pool(local, gidx, self.num_graphs, nmask,
                                'sum')
        # projection heads
        local_p = nn.Dense(self.dim)(nn.relu(nn.Dense(self.dim)(local)))
        global_p = nn.Dense(self.dim)(nn.relu(
            nn.Dense(self.dim)(global_emb)))
        if self.n_tasks > 0:
            pred = nn.Dense(self.n_tasks)(nn.relu(
                nn.Dense(self.dim)(global_emb)))
            return pred, global_p, local_p, gidx, nmask
        return global_p, global_p, local_p, gidx, nmask


class InfoGraphModel(ModularModel, GraphModel):
    """Unsupervised InfoGraph (reference torch_models/infograph.py).

    ``fit`` maximizes global-local MI; ``predict_embedding`` returns graph
    embeddings for downstream tasks.
    """

    def __init__(self, num_features: int = 30, embedding_dim: int = 64,
                 num_gc_layers: int = 3, batch_size: int = 100,
                 n_tasks: int = 0, mode: str = 'regression', **kwargs):
        self.n_tasks = max(n_tasks, 1)
        self.mode = mode
        self.n_classes = 2
        # MI loss needs the node->graph index; the module passes it
        # through as an output, so InfoGraph runs single-shard (no vmap
        # flattening of the index space)
        module = _InfoGraphModule(dim=embedding_dim,
                                  num_layers=num_gc_layers,
                                  num_graphs=batch_size, n_tasks=n_tasks)
        mi_loss = GlobalMutualInformationLoss()
        supervised = n_tasks > 0

        def loss_fn(outputs, labels, weights):
            pred, global_p, local_p, gidx, nmask = outputs
            mi = mi_loss(global_p, local_p,
                         jnp.minimum(gidx, global_p.shape[0] - 1),
                         node_mask=nmask)
            if supervised and labels and labels[0] is not None:
                sup = jnp.mean(jnp.square(pred - labels[0]))
                return mi + sup
            return mi
        kwargs['data_parallel'] = False
        super().__init__(module, loss_fn,
                         output_types=['prediction', 'embedding',
                                       'embedding', 'embedding',
                                       'embedding'],
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1

    def predict_embeddings(self, dataset):
        out = self.predict(dataset, output_types=['embedding'])
        return out[0] if isinstance(out, list) else out


class InfoGraphStarModel(InfoGraphModel):
    """Semi-supervised InfoGraph* (reference infograph.py
    InfoGraphStarModel)."""

    def __init__(self, num_features: int = 30, embedding_dim: int = 64,
                 n_tasks: int = 1, **kwargs):
        super().__init__(num_features=num_features,
                         embedding_dim=embedding_dim, n_tasks=n_tasks,
                         **kwargs)

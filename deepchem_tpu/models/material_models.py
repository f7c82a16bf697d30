"""Materials-science models: CGCNN, MEGNet, LCNN, ElemNet.

Redesigns of reference deepchem/models/torch_models/cgcnn.py (CGCNNModel),
megnet.py (MEGNetModel), lcnn.py (LCNN) on the padded COO layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.graph_models import (GraphModel, _heads,
                                              _gnn_loss_outputs,
                                              graph_dp_shards)
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy
from deepchem_tpu.ops import graph_pool, segment_sum


class CGCNNLayer(nn.Module):
    """Edge-gated crystal graph convolution (Xie & Grossman 2018;
    reference torch_models/cgcnn.py CGCNNLayer)."""
    hidden: int

    @nn.compact
    def __call__(self, h, esrc, edst, ef, emask):
        n = h.shape[0]
        z = jnp.concatenate([jnp.take(h, edst, axis=0),
                             jnp.take(h, esrc, axis=0), ef], axis=1)
        gate = nn.sigmoid(nn.Dense(self.hidden)(z))
        core = nn.softplus(nn.Dense(self.hidden)(z))
        msg = gate * core * emask[:, None]
        agg = segment_sum(msg, edst, n)
        return nn.softplus(h + agg)


class _CGCNNModule(nn.Module):
    n_tasks: int
    n_classes: int
    atom_fea_len: int
    n_conv: int
    h_fea_len: int
    mode: str
    num_graphs: int

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask, ef,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        h = nn.Dense(self.atom_fea_len)(nf)
        for _ in range(self.n_conv):
            h = CGCNNLayer(self.atom_fea_len)(h, esrc, edst, ef, emask)
        g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
        g = nn.softplus(nn.Dense(self.h_fea_len)(g))
        return _heads(g, self.n_tasks, self.n_classes, self.mode, False,
                      training)


class CGCNNModel(GraphModel):
    """Crystal Graph CNN (reference torch_models/cgcnn.py; featurizer
    CGCNNFeaturizer)."""

    uses_edge_features = True

    def __init__(self, n_tasks: int = 1, mode: str = 'regression',
                 n_classes: int = 2, atom_fea_len: int = 64,
                 n_conv: int = 3, h_fea_len: int = 128,
                 batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        shards = graph_dp_shards(kwargs.get('data_parallel', True))
        if batch_size % shards:
            shards = 1
        module = _CGCNNModule(
            n_tasks=n_tasks, n_classes=n_classes,
            atom_fea_len=atom_fea_len, n_conv=n_conv,
            h_fea_len=h_fea_len, mode=mode,
            num_graphs=batch_size // shards)
        loss, output_types = _gnn_loss_outputs(mode)
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = shards


class _MEGNetBlock(nn.Module):
    """MEGNet edge/node/global co-update (reference torch_models/megnet.py
    and layers GraphNetwork, torch_models/layers.py:1063)."""
    dim: int

    @nn.compact
    def __call__(self, h, e, u, esrc, edst, gidx, egidx, nmask, emask,
                 num_graphs):
        n = h.shape[0]
        # edge update: [h_src, h_dst, e, u_of_edge]
        u_e = jnp.take(u, egidx, axis=0)
        ze = jnp.concatenate([jnp.take(h, esrc, axis=0),
                              jnp.take(h, edst, axis=0), e, u_e], axis=1)
        e_new = nn.softplus(nn.Dense(self.dim)(
            nn.softplus(nn.Dense(self.dim * 2)(ze))))
        e_new = e_new * emask[:, None]
        # node update: [h, mean incoming e, u]
        e_agg = segment_sum(e_new, edst, n) / jnp.maximum(
            segment_sum(emask, edst, n), 1.0)[:, None]
        u_n = jnp.take(u, gidx, axis=0)
        zn = jnp.concatenate([h, e_agg, u_n], axis=1)
        h_new = nn.softplus(nn.Dense(self.dim)(
            nn.softplus(nn.Dense(self.dim * 2)(zn))))
        h_new = h_new * nmask[:, None]
        # global update: [mean h, mean e, u]
        h_mean = graph_pool(h_new, gidx, num_graphs + 1, nmask, 'mean')
        e_mean = segment_sum(e_new, egidx, num_graphs + 1) / jnp.maximum(
            segment_sum(emask, egidx, num_graphs + 1), 1.0)[:, None]
        zu = jnp.concatenate([h_mean[:u.shape[0]],
                              e_mean[:u.shape[0]], u], axis=1)
        u_new = nn.softplus(nn.Dense(self.dim)(
            nn.softplus(nn.Dense(self.dim * 2)(zu))))
        return h_new, e_new, u_new


class _MEGNetModule(nn.Module):
    n_tasks: int
    n_classes: int
    n_blocks: int
    dim: int
    mode: str
    num_graphs: int

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask, ef,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        egidx = jnp.take(gidx, edst, axis=0)
        h = nn.softplus(nn.Dense(self.dim)(nf))
        e = nn.softplus(nn.Dense(self.dim)(ef))
        u = jnp.zeros((self.num_graphs + 1, self.dim))
        for _ in range(self.n_blocks):
            h, e, u = _MEGNetBlock(self.dim)(
                h, e, u, esrc, edst, gidx, egidx, nmask, emask,
                self.num_graphs)
        g = jnp.concatenate([
            graph_pool(h, gidx, self.num_graphs, nmask, 'mean'),
            u[:self.num_graphs]], axis=1)
        g = nn.softplus(nn.Dense(self.dim)(g))
        return _heads(g, self.n_tasks, self.n_classes, self.mode, False,
                      training)


class MEGNetModel(GraphModel):
    """MatErials Graph Network (reference torch_models/megnet.py)."""

    uses_edge_features = True

    def __init__(self, n_tasks: int = 1, mode: str = 'regression',
                 n_classes: int = 2, n_blocks: int = 1, dim: int = 32,
                 batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        module = _MEGNetModule(n_tasks=n_tasks, n_classes=n_classes,
                               n_blocks=n_blocks, dim=dim, mode=mode,
                               num_graphs=batch_size)
        loss, output_types = _gnn_loss_outputs(mode)
        kwargs['data_parallel'] = False
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1


class LCNNModel(GraphModel):
    """Lattice CNN for adsorbate configurations (reference
    torch_models/lcnn.py), built on the CGCNN machinery."""

    uses_edge_features = True

    def __init__(self, n_tasks: int = 1, batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = 'regression'
        self.n_classes = 2
        module = _CGCNNModule(n_tasks=n_tasks, n_classes=2,
                              atom_fea_len=44, n_conv=2, h_fea_len=64,
                              mode='regression', num_graphs=batch_size)
        kwargs['data_parallel'] = False
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1


class _ElemNetModule(nn.Module):
    n_tasks: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        sizes = (1024, 1024, 1024, 1024, 512, 512, 512, 256, 256, 256,
                 128, 128, 128, 64, 64, 32)
        h = jnp.asarray(x, jnp.float32)
        for i, s in enumerate(sizes):
            h = nn.relu(nn.Dense(s)(h))
            if s in (1024, 512, 256) and i % 4 == 3:
                h = nn.Dropout(0.2, deterministic=not training)(h)
        return nn.Dense(self.n_tasks)(h)


class ElemNetModel(JaxModel):
    """17-layer ElemNet on fractional compositions (companion to
    ElemNetFeaturizer; reference material model family)."""

    def __init__(self, n_tasks: int = 1, batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = 'regression'
        module = _ElemNetModule(n_tasks=n_tasks)
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'

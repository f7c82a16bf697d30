"""Principal Neighbourhood Aggregation GNN (reference
deepchem/models/torch_models/pna_gnn.py PNA/PNAGNN and
utils/graph_utils.py aggregation/scaler helpers).

Multiple aggregators (mean/max/min/std) x degree scalers
(identity/amplification/attenuation) per message-passing layer.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.graph_models import (GraphModel, _heads,
                                              _gnn_loss_outputs)
from deepchem_tpu.ops import (graph_pool, node_degrees, segment_sum,
                              segment_max_sumgrad)


def aggregate_mean(msgs, edst, n, emask):
    s = segment_sum(msgs * emask[:, None], edst, n)
    c = segment_sum(emask, edst, n)
    return s / jnp.maximum(c, 1.0)[:, None]


def aggregate_max(msgs, edst, n, emask):
    return segment_max_sumgrad(msgs, edst, n, mask=emask)


def aggregate_min(msgs, edst, n, emask):
    return -segment_max_sumgrad(-msgs, edst, n, mask=emask)


def aggregate_std(msgs, edst, n, emask):
    mean = aggregate_mean(msgs, edst, n, emask)
    sq = aggregate_mean(jnp.square(msgs), edst, n, emask)
    return jnp.sqrt(jnp.maximum(sq - jnp.square(mean), 1e-6))


AGGREGATORS = {'mean': aggregate_mean, 'max': aggregate_max,
               'min': aggregate_min, 'std': aggregate_std}


def scale_identity(h, deg, avg_d):
    return h


def scale_amplification(h, deg, avg_d):
    return h * (jnp.log(deg + 1.0) / avg_d)[:, None]


def scale_attenuation(h, deg, avg_d):
    return h * (avg_d / jnp.log(deg + 2.0))[:, None]


SCALERS = {'identity': scale_identity,
           'amplification': scale_amplification,
           'attenuation': scale_attenuation}


class PNALayer(nn.Module):
    """(reference pna_gnn.py PNALayer)"""
    out_dim: int
    aggregators: Sequence[str] = ('mean', 'max', 'min', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')
    avg_d: float = 2.0

    @nn.compact
    def __call__(self, h, esrc, edst, emask, deg):
        n = h.shape[0]
        # edge messages from [h_src || h_dst]
        z = jnp.concatenate([jnp.take(h, esrc, axis=0),
                             jnp.take(h, edst, axis=0)], axis=1)
        msgs = nn.relu(nn.Dense(self.out_dim)(z))
        degf = deg.astype(h.dtype)
        feats = []
        for agg_name in self.aggregators:
            agg = AGGREGATORS[agg_name](msgs, edst, n, emask)
            for sc_name in self.scalers:
                feats.append(SCALERS[sc_name](agg, degf, self.avg_d))
        combined = jnp.concatenate([h] + feats, axis=1)
        out = nn.Dense(self.out_dim)(combined)
        return nn.relu(out)


class _PNAModule(nn.Module):
    n_tasks: int
    n_classes: int
    hidden_dim: int
    num_layers: int
    mode: str
    num_graphs: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    residual: bool = True

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        deg = node_degrees(edst, nf.shape[0], emask)
        h = nn.Dense(self.hidden_dim)(nf)
        for _ in range(self.num_layers):
            h_new = PNALayer(self.hidden_dim,
                             aggregators=tuple(self.aggregators),
                             scalers=tuple(self.scalers))(
                h, esrc, edst, emask, deg)
            h = h + h_new if self.residual else h_new
        g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
        g = nn.relu(nn.Dense(self.hidden_dim)(g))
        return _heads(g, self.n_tasks, self.n_classes, self.mode, False,
                      training)


class PNAModel(GraphModel):
    """(reference pna_gnn.py PNA)"""

    def __init__(self, n_tasks: int = 1, hidden_dim: int = 64,
                 num_layers: int = 3,
                 aggregators: Sequence[str] = ('mean', 'max', 'min',
                                               'std'),
                 scalers: Sequence[str] = ('identity', 'amplification',
                                           'attenuation'),
                 mode: str = 'regression', n_classes: int = 2,
                 batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        module = _PNAModule(n_tasks=n_tasks, n_classes=n_classes,
                            hidden_dim=hidden_dim, num_layers=num_layers,
                            mode=mode, num_graphs=batch_size,
                            aggregators=tuple(aggregators),
                            scalers=tuple(scalers))
        loss, output_types = _gnn_loss_outputs(mode)
        kwargs.setdefault('data_parallel', False)
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1


def aggregate_sum(msgs, edst, n, emask):
    """(reference utils/graph_utils.py aggregate_sum)"""
    return segment_sum(msgs * emask[:, None], edst, n)


def aggregate_var(msgs, edst, n, emask):
    """(reference utils/graph_utils.py aggregate_var)"""
    mean = aggregate_mean(msgs, edst, n, emask)
    sq = aggregate_mean(jnp.square(msgs), edst, n, emask)
    return jnp.maximum(sq - jnp.square(mean), 0.0)


def aggregate_moment(msgs, edst, n, emask, moment: int = 3):
    """Standardized n-th moment aggregation (reference
    utils/graph_utils.py aggregate_moment)."""
    mean = aggregate_mean(msgs, edst, n, emask)
    dev = msgs - mean[edst] * emask[:, None]
    m_n = aggregate_mean(dev ** moment, edst, n, emask)
    return jnp.sign(m_n) * jnp.abs(m_n + 1e-10) ** (1.0 / moment)

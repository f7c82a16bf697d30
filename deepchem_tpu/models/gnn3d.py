"""InfoMax3D: 2D/3D mutual-information pretraining (GraphMVP/3D-Infomax).

Redesign of reference deepchem/models/torch_models/gnn3d.py
(Net3DLayer:17, Net3D:158, InfoMax3DModular:354; Stark et al. 2022 "3D
Infomax improves GNNs for molecular property prediction"): a 2D PNA
encoder and a 3D distance-message encoder are trained to agree (NTXent
contrastive loss over the batch); the 2D encoder then serves downstream
property prediction without conformers.

TPU-first: both encoders run on the same padded COO batch in one jitted
step; pairwise-distance edge features come from the padded position
array, and the contrastive loss is a dense [B, B] similarity matmul.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.graph_models import (GraphModel, _heads,
                                              _gnn_loss_outputs)
from deepchem_tpu.models.gnn_modular import ModularModel
from deepchem_tpu.models.pna import PNALayer
from deepchem_tpu.ops import graph_pool, node_degrees, segment_sum


def fourier_encode_dist(d: jnp.ndarray, num_encodings: int = 4,
                        include_self: bool = True) -> jnp.ndarray:
    """Sinusoidal distance features (reference gnn3d.py
    fourier_encode_dist)."""
    scales = 2.0 ** jnp.arange(num_encodings)
    x = d[..., None] / scales
    out = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)
    if include_self:
        out = jnp.concatenate([out, d[..., None]], axis=-1)
    return out


class Net3DLayer(nn.Module):
    """Distance-conditioned message passing (reference gnn3d.py:17)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, h, ef, esrc, edst, emask):
        z = jnp.concatenate([jnp.take(h, esrc, axis=0),
                             jnp.take(h, edst, axis=0), ef], axis=-1)
        msg = nn.Dense(self.hidden_dim)(nn.silu(
            nn.Dense(self.hidden_dim)(z)))
        agg = segment_sum(msg * emask[:, None], edst, h.shape[0])
        upd = nn.Dense(self.hidden_dim)(nn.silu(
            nn.Dense(self.hidden_dim)(agg)))
        return h + upd                       # residual


class _Net3DEncoder(nn.Module):
    """3D encoder: node features + edge distances -> graph embedding
    (reference gnn3d.py:158 Net3D)."""
    hidden_dim: int
    num_layers: int
    fourier_encodings: int = 4
    readout: str = 'sum'

    @nn.compact
    def __call__(self, nf, pos, esrc, edst, gidx, nmask, emask,
                 num_graphs: int):
        d = jnp.linalg.norm(jnp.take(pos, esrc, axis=0)
                            - jnp.take(pos, edst, axis=0), axis=-1)
        ef = fourier_encode_dist(d, self.fourier_encodings)
        ef = nn.silu(nn.Dense(self.hidden_dim)(ef))
        h = nn.Dense(self.hidden_dim)(nf)
        for _ in range(self.num_layers):
            h = Net3DLayer(self.hidden_dim)(h, ef, esrc, edst, emask)
        g = graph_pool(h, gidx, num_graphs, nmask, self.readout)
        return nn.Dense(self.hidden_dim)(nn.silu(
            nn.Dense(self.hidden_dim)(g)))


class _PNA2DEncoder(nn.Module):
    hidden_dim: int
    num_layers: int
    aggregators: Sequence[str] = ('mean', 'max', 'min', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 num_graphs: int):
        deg = node_degrees(edst, nf.shape[0], emask)
        h = nn.Dense(self.hidden_dim)(nf)
        for _ in range(self.num_layers):
            h = h + PNALayer(self.hidden_dim,
                             aggregators=tuple(self.aggregators),
                             scalers=tuple(self.scalers))(
                h, esrc, edst, emask, deg)
        g = graph_pool(h, gidx, num_graphs, nmask, 'mean')
        return nn.Dense(self.hidden_dim)(nn.silu(
            nn.Dense(self.hidden_dim)(g)))


class _InfoMax3DModule(nn.Module):
    task: str                      # 'pretrain' | 'regression' | 'classification'
    n_tasks: int
    n_classes: int
    hidden_dim: int
    num_layers: int
    num_graphs: int
    fourier_encodings: int = 4

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask, pos,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        enc2d = _PNA2DEncoder(self.hidden_dim, self.num_layers,
                              name='encoder2d')
        emb2d = enc2d(nf, esrc, edst, gidx, nmask, emask,
                      self.num_graphs)
        if self.task == 'pretrain':
            emb3d = _Net3DEncoder(self.hidden_dim, self.num_layers,
                                  self.fourier_encodings,
                                  name='encoder3d')(
                nf, pos, esrc, edst, gidx, nmask, emask, self.num_graphs)
            return emb2d, emb3d
        h = nn.silu(nn.Dense(self.hidden_dim)(emb2d))
        return _heads(h, self.n_tasks, self.n_classes,
                      'classification' if self.task == 'classification'
                      else 'regression', False, training)


def ntxent_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray,
                temperature: float = 0.1) -> jnp.ndarray:
    """Normalized-temperature cross entropy between two views
    (the reference uses losses.NTXentMultiplePositives)."""
    a = emb_a / jnp.maximum(jnp.linalg.norm(emb_a, axis=1,
                                            keepdims=True), 1e-7)
    b = emb_b / jnp.maximum(jnp.linalg.norm(emb_b, axis=1,
                                            keepdims=True), 1e-7)
    logits = a @ b.T / temperature
    labels = jnp.arange(a.shape[0])
    # softmax cross entropy both directions
    shifted = logits - jax.lax.stop_gradient(
        logits.max(axis=1, keepdims=True))
    ll_ab = shifted[labels, labels] - jnp.log(
        jnp.exp(shifted).sum(axis=1) + 1e-9)
    shifted_t = logits.T - jax.lax.stop_gradient(
        logits.T.max(axis=1, keepdims=True))
    ll_ba = shifted_t[labels, labels] - jnp.log(
        jnp.exp(shifted_t).sum(axis=1) + 1e-9)
    return -0.5 * (ll_ab.mean() + ll_ba.mean())


class InfoMax3DModular(ModularModel, GraphModel):
    """2D/3D infomax pretraining + downstream finetuning (reference
    gnn3d.py:354 InfoMax3DModular; featurizer RDKitConformerFeaturizer).

    task='pretrain': fit() maximizes 2D/3D agreement (no labels needed).
    task='regression'/'classification': the 2D encoder + head trains
    supervised; use load_from_pretrained()/save to transfer the encoder.
    """

    uses_edge_features = False
    uses_positions = True

    def __init__(self, task: str = 'pretrain', n_tasks: int = 1,
                 hidden_dim: int = 64, num_layers: int = 3,
                 n_classes: int = 2, temperature: float = 0.1,
                 batch_size: int = 32, **kwargs):
        self.task = task
        self.n_tasks = n_tasks
        self.mode = ('classification' if task == 'classification'
                     else 'regression')
        self.n_classes = n_classes
        module = _InfoMax3DModule(
            task=task, n_tasks=n_tasks, n_classes=n_classes,
            hidden_dim=hidden_dim, num_layers=num_layers,
            num_graphs=batch_size)
        kwargs['data_parallel'] = False
        if task == 'pretrain':
            def loss_fn(outputs, labels, weights):
                return ntxent_loss(outputs[0], outputs[1], temperature)
            super().__init__(module, loss_fn,
                             output_types=['embedding', 'embedding'],
                             batch_size=batch_size, **kwargs)
        else:
            loss, output_types = _gnn_loss_outputs(self.mode)
            super().__init__(module, loss, output_types=output_types,
                             batch_size=batch_size, **kwargs)
        self._graph_shards = 1

    def predict_embeddings(self, dataset) -> np.ndarray:
        out = self.predict(dataset, output_types=['embedding'])
        return out[0] if isinstance(out, list) else out

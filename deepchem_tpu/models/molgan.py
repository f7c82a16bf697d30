"""MolGAN: implicit generative model for molecular graphs (reference
deepchem/models/molgan.py:11 BasicMolGANModel and torch port; layers
MolGAN* in models/layers.py:372-845).

Generator: noise -> (edge logits [A,A,B], node logits [A,T]) with gumbel
sampling.  Discriminator: relational graph convolutions over the dense
adjacency tensor -> graph-level score.  Trained as a WGAN.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.gan import WGAN


class _MolGanGenerator(nn.Module):
    vertices: int
    edges: int
    nodes: int
    dropout_rate: float = 0.0
    hidden: Sequence[int] = (128, 256, 512)

    @nn.compact
    def __call__(self, noise):
        x = noise
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h)(x))
        V = self.vertices
        e_logits = nn.Dense(V * V * self.edges)(x)
        e_logits = e_logits.reshape(-1, V, V, self.edges)
        e_logits = (e_logits + jnp.swapaxes(e_logits, 1, 2)) / 2.0
        n_logits = nn.Dense(V * self.nodes)(x).reshape(-1, V, self.nodes)
        edges = jax.nn.softmax(e_logits, axis=-1)
        nodes = jax.nn.softmax(n_logits, axis=-1)
        return edges, nodes


class _RelationalGCN(nn.Module):
    """Relational graph conv over dense adjacency channels (reference
    MolGANConvolutionLayer, models/layers.py:372)."""
    units: int

    @nn.compact
    def __call__(self, adj, nodes):
        # adj: [B, V, V, E]; nodes: [B, V, F]
        E = adj.shape[-1]
        msgs = []
        for e in range(1, E):            # channel 0 = no bond
            h = nn.Dense(self.units, use_bias=False)(nodes)
            msgs.append(jnp.einsum('bvw,bwf->bvf', adj[..., e], h))
        self_h = nn.Dense(self.units)(nodes)
        return jnp.tanh(self_h + sum(msgs))


class _MolGanDiscriminator(nn.Module):
    units: Sequence[int] = (64, 32)

    @nn.compact
    def __call__(self, adj, nodes):
        h = nodes
        for u in self.units:
            h = _RelationalGCN(u)(adj, h)
        # gated graph aggregation (MolGANAggregationLayer)
        i = nn.sigmoid(nn.Dense(64)(h))
        j = jnp.tanh(nn.Dense(64)(h))
        g = jnp.tanh(jnp.sum(i * j, axis=1))
        g = jnp.tanh(nn.Dense(32)(g))
        return nn.Dense(1)(g)[:, 0]


class BasicMolGANModel(WGAN):
    """(reference molgan.py:11 contract: vertices/edges/nodes dims,
    embedding_dim noise, fit_gan over GraphMatrix batches,
    predict_gan_generator -> GraphMatrix list)."""

    def __init__(self, edges: int = 5, vertices: int = 9, nodes: int = 5,
                 embedding_dim: int = 10, dropout_rate: float = 0.0,
                 **kwargs):
        self.edges = edges
        self.vertices = vertices
        self.nodes = nodes
        self.embedding_dim = embedding_dim
        self.dropout_rate = dropout_rate
        super().__init__(**kwargs)

    def get_noise_input_shape(self):
        return (self.embedding_dim,)

    def get_data_input_shapes(self):
        return [(self.vertices, self.vertices, self.edges),
                (self.vertices, self.nodes)]

    def create_generator(self):
        return _MolGanGenerator(vertices=self.vertices, edges=self.edges,
                                nodes=self.nodes,
                                dropout_rate=self.dropout_rate)

    def create_discriminator(self):
        return _MolGanDiscriminator()

    def predict_gan_generator(self, batch_size: int = 1,
                              noise_input=None, conditional_inputs=(),
                              generator_index: int = 0):
        """Sample GraphMatrix objects (reference molgan.py
        predict_gan_generator)."""
        import jax.random as jrandom
        if noise_input is not None:
            noise = jnp.asarray(np.asarray(noise_input, dtype=np.float32))
        else:
            noise = jrandom.normal(
                self._next_rng(), (batch_size, self.embedding_dim))
        if not self._built:
            self.gen_params = self.generator.init(
                {'params': self._next_rng()}, noise)
            self._built_gen_only = True
        edges, nodes = self.generator.apply(self.gen_params, noise)
        from deepchem_tpu.feat.molgan_featurizer import GraphMatrix
        out = []
        for e, n in zip(np.asarray(edges), np.asarray(nodes)):
            out.append(GraphMatrix(e, n))
        return out

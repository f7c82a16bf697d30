"""WeaveModel: atom/pair co-update network (reference
deepchem/models/graph_models.py:32 WeaveModel, layers WeaveLayer:2635 /
WeaveGather:2940 in models/layers.py).

TPU-first layout: dense per-graph blocks — atoms [B, A, F], pairs
[B, A, A, P] with masks, padded to a bucketed max-atom count.  The
reference's flat pair_split/atom_split bookkeeping disappears; masked dense
einsums use the MXU directly.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy
from deepchem_tpu.models.graph_layers import WeaveLayer, WeaveGather

try:  # round up atoms to a small set of buckets to bound recompiles
    from deepchem_tpu.feat.graph_data import bucket_caps
except ImportError:
    bucket_caps = None


def _round_up(x: int, q: int) -> int:
    return max(q, ((x + q - 1) // q) * q)


class _WeaveModule(nn.Module):
    n_tasks: int
    n_classes: int
    n_weave: int
    n_hidden: int
    n_graph_feat: int
    mode: str
    gaussian_expand: bool = True

    @nn.compact
    def __call__(self, atoms, pairs, atom_mask, pair_mask,
                 training: bool = False):
        a, p = atoms, pairs
        for i in range(self.n_weave):
            update_pair = i < self.n_weave - 1
            a, p = WeaveLayer(self.n_hidden, self.n_hidden, self.n_hidden,
                              update_pair=update_pair)(a, p, pair_mask)
        a = jnp.tanh(nn.Dense(self.n_graph_feat)(a))
        g = WeaveGather(gaussian_expand=self.gaussian_expand)(a, atom_mask)
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(g)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(g)


class WeaveModel(JaxModel):
    """Weave network (reference graph_models.py:32; featurizer
    WeaveFeaturizer)."""

    batch_axis_shardable = False
    atom_quantum = 16

    def __init__(self, n_tasks: int, n_atom_feat: int = 75,
                 n_pair_feat: int = 14, n_hidden: int = 50,
                 n_graph_feat: int = 128, n_weave: int = 2,
                 fully_connected_layer_sizes: Sequence[int] = (2000, 100),
                 mode: str = 'classification', n_classes: int = 2,
                 batch_size: int = 100, gaussian_expand: bool = True,
                 **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        self.n_pair_feat = n_pair_feat
        module = _WeaveModule(n_tasks=n_tasks, n_classes=n_classes,
                              n_weave=n_weave, n_hidden=n_hidden,
                              n_graph_feat=n_graph_feat, mode=mode,
                              gaussian_expand=gaussian_expand)
        if mode == 'classification':
            loss, output_types = SoftmaxCrossEntropy(), \
                ['prediction', 'loss']
        else:
            loss, output_types = L2Loss(), ['prediction']
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    def _weave_inputs(self, X_b) -> List[np.ndarray]:
        graphs = list(X_b)
        B = self.batch_size
        max_atoms = _round_up(max(g.num_nodes for g in graphs),
                              self.atom_quantum)
        F = graphs[0].num_node_features
        P = self.n_pair_feat
        atoms = np.zeros((B, max_atoms, F), dtype=np.float32)
        pairs = np.zeros((B, max_atoms, max_atoms, P), dtype=np.float32)
        amask = np.zeros((B, max_atoms), dtype=np.float32)
        pmask = np.zeros((B, max_atoms, max_atoms), dtype=np.float32)
        for i, g in enumerate(graphs):
            n = g.num_nodes
            atoms[i, :n] = g.node_features
            pairs[i, :n, :n] = g.pair_features.reshape(n, n, P)
            amask[i, :n] = 1.0
            pmask[i, :n, :n] = 1.0
        return [atoms, pairs, amask, pmask]

    def compute_features_on_batch(self, X_b) -> List[np.ndarray]:
        """Model input tensors for a batch of WeaveMol graphs (reference
        torch_models/weavemodel_pytorch.py:516).  TPU-first layout: instead
        of the reference's ragged COO pair lists, returns statically padded
        ``[atoms (B,A,F), pairs (B,A,A,P), atom_mask (B,A),
        pair_mask (B,A,A)]``."""
        return self._weave_inputs(X_b)

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=False):
                if len(X_b) < self.batch_size:
                    _, y_b, w_b, _ = pad_batch(self.batch_size,
                                               np.zeros(len(X_b)),
                                               y_b, w_b, None)
                if self.mode == 'classification' and y_b is not None \
                        and mode == 'fit':
                    from deepchem_tpu.metrics import to_one_hot
                    y_b = np.stack([to_one_hot(y_b[:, t], self.n_classes)
                                    for t in range(self.n_tasks)], axis=1)
                yield (self._weave_inputs(X_b), [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode


class _DTNNModule(nn.Module):
    """DTNN on Coulomb-matrix input (reference graph_models.py:405
    DTNNModel; layers models/layers.py:3144-3280)."""
    n_tasks: int
    n_embedding: int
    n_hidden: int
    n_steps: int
    n_distance: int
    distance_min: float
    distance_max: float
    output_activation: bool

    @nn.compact
    def __call__(self, coulomb, training: bool = False):
        # recover atomic numbers and distances from the Coulomb matrix
        # (diag = 0.5 z^2.4; offdiag = z_i z_j / d_ij)
        diag = jnp.diagonal(coulomb, axis1=1, axis2=2)
        z = jnp.power(jnp.maximum(2.0 * diag, 1e-12), 1.0 / 2.4)
        zi = jnp.round(z).astype(jnp.int32)
        mask = (zi > 0).astype(jnp.float32)
        zz = z[:, :, None] * z[:, None, :]
        d = zz / jnp.maximum(coulomb, 1e-9)
        pair_valid = (mask[:, :, None] * mask[:, None, :] *
                      (1.0 - jnp.eye(coulomb.shape[1])[None]))
        # gaussian distance expansion
        centers = jnp.linspace(self.distance_min, self.distance_max,
                               self.n_distance)
        width = (self.distance_max - self.distance_min) / self.n_distance
        dist_feat = jnp.exp(
            -0.5 * jnp.square((d[..., None] - centers) / width))
        dist_feat = dist_feat * pair_valid[..., None]
        from deepchem_tpu.models.graph_layers import (DTNNEmbedding,
                                                      DTNNStep)
        emb = DTNNEmbedding(self.n_embedding)(jnp.clip(zi, 0, 82))
        emb = emb * mask[..., None]
        for _ in range(self.n_steps):
            emb = DTNNStep(self.n_embedding, self.n_distance)(
                emb, dist_feat, mask)
            emb = emb * mask[..., None]
        h = jnp.tanh(nn.Dense(self.n_hidden)(emb))
        if self.output_activation:
            h = jnp.tanh(h)
        per_atom = nn.Dense(self.n_tasks)(h)      # [B, A, T]
        out = jnp.sum(per_atom * mask[..., None], axis=1)
        return out


class DTNNModel(JaxModel):
    """Deep Tensor Neural Network for quantum properties (reference
    graph_models.py:405; featurizer CoulombMatrix)."""

    batch_axis_shardable = True

    def __init__(self, n_tasks: int, n_embedding: int = 30,
                 n_hidden: int = 100, n_steps: int = 2,
                 n_distance: int = 100, distance_min: float = -1.0,
                 distance_max: float = 18.0,
                 output_activation: bool = True, mode: str = 'regression',
                 batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        module = _DTNNModule(
            n_tasks=n_tasks, n_embedding=n_embedding, n_hidden=n_hidden,
            n_steps=n_steps, n_distance=n_distance,
            distance_min=distance_min, distance_max=distance_max,
            output_activation=output_activation)
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)

    def compute_features_on_batch(self, X_b):
        """Recover (atom_number, distances, atom_mask) from a batch of
        Coulomb matrices (reference torch_models/dtnn.py
        compute_features_on_batch).  Host-side mirror of the recovery the
        jitted module performs on device (diag = 0.5 z^2.4,
        offdiag = z_i z_j / d_ij); returns statically padded arrays."""
        coulomb = np.asarray(X_b, dtype=np.float64)
        diag = np.diagonal(coulomb, axis1=1, axis2=2)
        z = np.power(np.maximum(2.0 * diag, 1e-12), 1.0 / 2.4)
        zi = np.round(z).astype(np.int32)
        mask = (zi > 0).astype(np.float32)
        zz = z[:, :, None] * z[:, None, :]
        d = zz / np.maximum(coulomb, 1e-9)
        np.einsum('bii->bi', d)[:] = 0.0
        pair_valid = (mask[:, :, None] * mask[:, None, :]
                      * (1.0 - np.eye(coulomb.shape[1])[None]))
        return zi, (d * pair_valid).astype(np.float32), mask

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

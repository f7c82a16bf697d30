"""Molecule Attention Transformer (reference
deepchem/models/torch_models/mat.py MATModel; layers MAT blocks
torch_models/layers.py:391-1062; featurizer
feat/molecule_featurizers/mat_featurizer.py MATFeaturizer).

Dense per-molecule layout [B, A, ...]: molecule-aware self-attention mixes
the scaled-dot-product weights with the adjacency matrix and an inverse
distance kernel.
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
from deepchem_tpu.feat import feature_utils as fu
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy


class MATEncoding:
    """(node_features, adjacency, distance) triple (reference
    mat_featurizer.py MATEncoding)."""

    def __init__(self, node_features, adjacency_matrix, distance_matrix):
        self.node_features = node_features
        self.adjacency_matrix = adjacency_matrix
        self.distance_matrix = distance_matrix


class MATFeaturizer(MolecularFeaturizer):
    """(reference mat_featurizer.py): atoms one-hot + a prepended dummy
    node with its own feature column (reference _add_dummy_node:133),
    adjacency, graph distances (3D distances when a conformer exists)."""

    def construct_mol(self, mol: Molecule) -> Molecule:
        """Input normalization hook (reference mat_featurizer.py
        construct_mol sanitizes/strips salts); our parser already
        finalizes perception, so this resolves SMILES strings and
        passes Molecules through."""
        if isinstance(mol, str):
            from deepchem_tpu.chem import mol_from_smiles
            parsed = mol_from_smiles(mol)
            if parsed is None:
                raise ValueError(f'unparseable SMILES {mol!r}')
            return parsed
        return mol

    def atom_features(self, atom) -> np.ndarray:
        """Per-atom MAT feature vector (reference mat_featurizer.py
        atom_features)."""
        return np.asarray(
            fu.one_hot_encode(atom.symbol,
                              ['B', 'Br', 'C', 'Cl', 'F', 'I', 'N',
                               'O', 'P', 'S', 'Se', 'Si'], True)
            + fu.one_hot_encode(atom.degree, [0, 1, 2, 3, 4, 5], False)
            + fu.one_hot_encode(atom.total_hs, [0, 1, 2, 3, 4], False)
            + fu.one_hot_encode(atom.formal_charge, [-1, 0, 1], True)
            + [float(atom.in_ring), float(atom.is_aromatic)],
            dtype=np.float32)

    def construct_node_features_matrix(self, mol: Molecule) -> np.ndarray:
        """Stacked atom features (reference mat_featurizer.py
        construct_node_features_matrix)."""
        return np.asarray([self.atom_features(a) for a in mol.atoms],
                          dtype=np.float32)

    def _featurize(self, mol: Molecule, **kwargs) -> MATEncoding:
        mol = self.construct_mol(mol)
        n = mol.num_atoms
        node = self.construct_node_features_matrix(mol)
        adj = np.zeros((n, n), dtype=np.float32)
        for b in mol.bonds:
            adj[b.a1, b.a2] = 1.0
            adj[b.a2, b.a1] = 1.0
        if mol.conformer is not None:
            xyz = np.asarray(mol.conformer)
            dist = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        else:
            from collections import deque
            dist = np.full((n, n), 1e6, dtype=np.float32)
            for i in range(n):
                dist[i, i] = 0
                dq = deque([i])
                while dq:
                    u = dq.popleft()
                    for v in mol.neighbors(u):
                        if dist[i, v] > dist[i, u] + 1:
                            dist[i, v] = dist[i, u] + 1
                            dq.append(v)
        # dummy node: dedicated first feature column, unconnected, far away
        nd = np.zeros((n + 1, node.shape[1] + 1), dtype=np.float32)
        nd[1:, 1:] = node
        nd[0, 0] = 1.0
        adj2 = np.zeros((n + 1, n + 1), dtype=np.float32)
        adj2[1:, 1:] = adj
        dist2 = np.full((n + 1, n + 1), 1e6, dtype=np.float32)
        dist2[1:, 1:] = dist
        return MATEncoding(nd, adj2, dist2.astype(np.float32))


class ScaleNorm(nn.Module):
    """Learnable-scale L2 normalization (reference torch layers.py
    ScaleNorm:391): ``x * sqrt(scale) / ||x||``."""
    scale: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        s = self.param('scale_param', lambda k: jnp.asarray(
            np.sqrt(self.scale), jnp.float32))
        # smooth norm: exact-zero rows (padding) would give NaN gradients
        # through jnp.linalg.norm
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)
                        + self.eps ** 2)
        return x * (s / norm)


class _MATAttention(nn.Module):
    dim: int
    n_heads: int
    lambda_attention: float
    lambda_distance: float
    dist_kernel: str = 'softmax'   # 'softmax' | 'exp' (reference :469)

    @nn.compact
    def __call__(self, x, adj, dist, mask):
        B, A, D = x.shape
        H = self.n_heads
        dh = self.dim // H
        q = nn.Dense(self.dim)(x).reshape(B, A, H, dh)
        k = nn.Dense(self.dim)(x).reshape(B, A, H, dh)
        v = nn.Dense(self.dim)(x).reshape(B, A, H, dh)
        logits = jnp.einsum('bihd,bjhd->bhij', q, k) / jnp.sqrt(dh)
        neg = -1e9
        m2 = mask[:, None, None, :] > 0
        logits = jnp.where(m2, logits, neg)
        att = jax.nn.softmax(logits, axis=-1)
        # molecule-aware mixing (reference MAT attention)
        adj_n = adj / jnp.maximum(
            adj.sum(axis=-1, keepdims=True), 1.0)
        if self.dist_kernel == 'exp':
            dist_k = jnp.where(m2[:, 0], jnp.exp(-dist), 0.0)
        else:
            dist_k = jax.nn.softmax(
                jnp.where(m2[:, 0], -dist[:, None, :, :].squeeze(1), neg),
                axis=-1)
        lam_a = self.lambda_attention
        lam_d = self.lambda_distance
        lam_adj = 1.0 - lam_a - lam_d
        mixed = (lam_a * att + lam_adj * adj_n[:, None, :, :]
                 + lam_d * dist_k[:, None, :, :])
        out = jnp.einsum('bhij,bjhd->bihd', mixed, v).reshape(B, A,
                                                              self.dim)
        return nn.Dense(self.dim)(out)


class _MATModule(nn.Module):
    n_tasks: int
    n_classes: int
    dim: int
    n_layers: int
    n_heads: int
    lambda_attention: float
    lambda_distance: float
    dropout: float
    mode: str
    dist_kernel: str = 'softmax'
    norm: str = 'layer'            # 'layer' | 'scale' (ScaleNorm)
    aggregation: str = 'mean'      # 'mean' | 'sum' | 'grover' (:959)

    @nn.compact
    def __call__(self, x, adj, dist, mask, training: bool = False):
        def make_norm():
            return (ScaleNorm(self.dim) if self.norm == 'scale'
                    else nn.LayerNorm())
        h = nn.Dense(self.dim)(x)   # MATEmbedding (reference :911)
        for _ in range(self.n_layers):
            a = _MATAttention(self.dim, self.n_heads,
                              self.lambda_attention,
                              self.lambda_distance,
                              self.dist_kernel)(
                make_norm()(h), adj, dist, mask)
            if self.dropout > 0:
                a = nn.Dropout(self.dropout,
                               deterministic=not training)(a)
            h = h + a
            f = nn.Dense(self.dim)(nn.gelu(nn.Dense(self.dim * 2)(
                make_norm()(h))))
            if self.dropout > 0:
                f = nn.Dropout(self.dropout,
                               deterministic=not training)(f)
            h = h + f
        h = make_norm()(h)
        # readout (reference MATGenerator:959 aggregation types)
        if self.aggregation == 'sum':
            g = jnp.sum(h * mask[..., None], axis=1)
        elif self.aggregation == 'grover':
            att = nn.Dense(4, use_bias=False, name='gen_att2')(
                jnp.tanh(nn.Dense(128, use_bias=False,
                                  name='gen_att1')(h)))   # (B, A, 4)
            att = jax.nn.softmax(
                jnp.where(mask[..., None] > 0, att, -1e9), axis=1)
            g = jnp.einsum('bak,bad->bkd', att, h).reshape(
                h.shape[0], -1)
        else:
            g = jnp.sum(h * mask[..., None], axis=1) / jnp.maximum(
                mask.sum(axis=1, keepdims=True), 1.0)
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(g)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(g)


class MATModel(JaxModel):
    """(reference torch_models/mat.py MATModel)"""

    batch_axis_shardable = False
    atom_quantum = 16

    def __init__(self, n_tasks: int = 1, dim: int = 64,
                 n_layers: int = 2, n_heads: int = 8,
                 lambda_attention: float = 0.33,
                 lambda_distance: float = 0.33, dropout_p: float = 0.0,
                 mode: str = 'regression', n_classes: int = 2,
                 dist_kernel: str = 'softmax', norm: str = 'layer',
                 aggregation_type: str = 'mean',
                 batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        module = _MATModule(
            n_tasks=n_tasks, n_classes=n_classes, dim=dim,
            n_layers=n_layers, n_heads=n_heads,
            lambda_attention=lambda_attention,
            lambda_distance=lambda_distance, dropout=dropout_p,
            mode=mode, dist_kernel=dist_kernel, norm=norm,
            aggregation=aggregation_type)
        if mode == 'classification':
            loss, output_types = SoftmaxCrossEntropy(), \
                ['prediction', 'loss']
        else:
            loss, output_types = L2Loss(), ['prediction']
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    @staticmethod
    def pad_array(array: np.ndarray, shape) -> np.ndarray:
        """Zero-pad an array to the given shape (reference
        torch_models/mat.py:323)."""
        result = np.zeros(shape=shape, dtype=np.asarray(array).dtype)
        result[tuple(slice(s) for s in np.asarray(array).shape)] = array
        return result

    def pad_sequence(self, sequence) -> np.ndarray:
        """Pad every array in a sequence to the largest shape and stack
        (reference torch_models/mat.py:344)."""
        shapes = np.stack([np.array(np.asarray(t).shape) for t in sequence])
        max_shape = tuple(np.max(shapes, axis=0))
        return np.stack([self.pad_array(t, max_shape) for t in sequence])

    def _mat_inputs(self, X_b) -> List[np.ndarray]:
        encs = list(X_b)
        B = self.batch_size
        q = self.atom_quantum
        max_atoms = max(len(e.node_features) for e in encs)
        A = max(q, ((max_atoms + q - 1) // q) * q)
        F = encs[0].node_features.shape[1]
        x = np.zeros((B, A, F), dtype=np.float32)
        adj = np.zeros((B, A, A), dtype=np.float32)
        dist = np.full((B, A, A), 1e6, dtype=np.float32)
        mask = np.zeros((B, A), dtype=np.float32)
        for i, e in enumerate(encs):
            n = len(e.node_features)
            x[i, :n] = e.node_features
            adj[i, :n, :n] = e.adjacency_matrix
            dist[i, :n, :n] = e.distance_matrix
            mask[i, :n] = 1.0
        return [x, adj, dist, mask]

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        from deepchem_tpu.metrics import to_one_hot
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=False):
                if len(X_b) < self.batch_size:
                    _, y_b, w_b, _ = pad_batch(self.batch_size,
                                               np.zeros(len(X_b)), y_b,
                                               w_b, None)
                if self.mode == 'classification' and y_b is not None \
                        and mode == 'fit':
                    y_b = np.stack([to_one_hot(y_b[:, t], self.n_classes)
                                    for t in range(self.n_tasks)],
                                   axis=1)
                yield (self._mat_inputs(X_b), [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

"""Atomic convolution model for protein-ligand binding (reference
deepchem/models/atomic_conv.py:20 AtomicConvModel, torch port
torch_models/acnn.py:12; layers AtomicConvolution models/layers.py:1830 and
NeighborList models/layers.py:1532).

TPU-first: neighbor lists are computed once on host (numpy cell lists) and
shipped as static [N, M] index arrays; the radial-symmetry-function stack is
a dense masked einsum over (atom, neighbor, radial) — no dynamic shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss


def compute_neighbor_list(coords: np.ndarray, cutoff: float = 12.0,
                          max_neighbors: int = 12) -> np.ndarray:
    """[N, 3] -> [N, max_neighbors] neighbor indices (self-padded).

    Reference NeighborList (models/layers.py:1532) builds cells on device;
    molecular systems here are small enough that a host-side O(N^2) pass
    vectorized in numpy is faster than any kernel launch.
    """
    coords = np.asarray(coords, dtype=np.float32)
    n = len(coords)
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    d[d > cutoff] = np.inf
    order = np.argsort(d, axis=1)[:, :max_neighbors]
    valid = np.take_along_axis(d, order, axis=1) < np.inf
    # invalid slots point at the atom itself (distance 0 -> masked later)
    out = np.where(valid, order, np.arange(n)[:, None])
    return out.astype(np.int32)


class AtomicConvolution(nn.Module):
    """Radial symmetry functions over neighbor distances (reference
    models/layers.py:1830).

    Output: [B, N, n_radial] features per atom.
    """
    radial_params: Sequence[Tuple[float, float, float]]  # (rc, rs, sigma)

    @nn.compact
    def __call__(self, coords, nbr_idx, nbr_mask):
        """coords [B,N,3]; nbr_idx [B,N,M] int; nbr_mask [B,N,M]."""
        B, N, M = nbr_idx.shape
        # gather neighbor coordinates: [B, N, M, 3]
        nbr_coords = jnp.take_along_axis(
            coords[:, None, :, :].repeat(N, axis=1),
            nbr_idx[..., None].repeat(3, axis=-1), axis=2)
        d = jnp.linalg.norm(coords[:, :, None, :] - nbr_coords + 1e-12,
                            axis=-1)
        feats = []
        for (rc, rs, sigma) in self.radial_params:
            fc = 0.5 * (jnp.cos(jnp.pi * d / rc) + 1.0) * (d <= rc)
            g = jnp.exp(-jnp.square(d - rs) / (sigma ** 2)) * fc
            feats.append(jnp.sum(g * nbr_mask, axis=-1))
        return jnp.stack(feats, axis=-1)      # [B, N, n_radial]


class _AtomicConvModule(nn.Module):
    n_tasks: int
    radial_params: Sequence[Tuple[float, float, float]]
    layer_sizes: Sequence[int]
    dropout: float

    @nn.compact
    def __call__(self, coords, nbr_idx, nbr_mask, atom_mask,
                 training: bool = False):
        feats = AtomicConvolution(self.radial_params)(
            coords, nbr_idx.astype(jnp.int32), nbr_mask)
        x = feats
        for size in self.layer_sizes:
            x = nn.relu(nn.Dense(size)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=not training)(x)
        per_atom = nn.Dense(self.n_tasks)(x)      # [B, N, T]
        return jnp.sum(per_atom * atom_mask[..., None], axis=1)


def default_radial_params() -> List[Tuple[float, float, float]]:
    """The reference's default radial grid (atomic_conv.py:20 defaults)."""
    out = []
    for rc in (12.0,):
        for rs in np.arange(0.0, 12.0, 2.0):
            out.append((rc, float(rs), 4.0))
    return out


class AtomicConvModel(JaxModel):
    """(reference atomic_conv.py:20).  X per sample: object array
    (coords [N,3], nbr_idx [N,M], atom_z [N]); y: binding energy."""

    batch_axis_shardable = True

    def __init__(self, n_tasks: int = 1,
                 radial_params: Optional[Sequence] = None,
                 layer_sizes: Sequence[int] = (32, 32, 16),
                 dropouts: float = 0.0, max_atoms: int = 100,
                 batch_size: int = 16, **kwargs):
        self.n_tasks = n_tasks
        self.max_atoms = max_atoms
        if radial_params is None:
            radial_params = default_radial_params()
        if isinstance(dropouts, (list, tuple)):
            dropouts = dropouts[0]
        module = _AtomicConvModule(
            n_tasks=n_tasks, radial_params=tuple(radial_params),
            layer_sizes=tuple(layer_sizes), dropout=dropouts)
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        A = self.max_atoms
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=pad_batches):
                B = len(X_b)
                M = None
                coords = np.zeros((B, A, 3), dtype=np.float32)
                masks = np.zeros((B, A), dtype=np.float32)
                nbrs = None
                nbr_masks = None
                for i, sample in enumerate(X_b):
                    c, nb, z = sample
                    n = min(len(c), A)
                    if M is None:
                        M = nb.shape[1]
                        nbrs = np.zeros((B, A, M), dtype=np.int32)
                        nbr_masks = np.zeros((B, A, M), dtype=np.float32)
                    coords[i, :n] = c[:n]
                    masks[i, :n] = 1.0
                    nbrs[i, :n] = np.clip(nb[:n], 0, A - 1)
                    nbr_masks[i, :n] = (nb[:n] != np.arange(n)[:, None])
                yield ([coords, nbrs, nbr_masks, masks], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'


class AtomicConvFeaturizer:
    """Minimal complex featurizer: molecules with conformers ->
    (coords, neighbor_list, atomic_numbers) triples (reference
    feat/complex_featurizers/complex_atomic_coordinates.py:148)."""

    def __init__(self, cutoff: float = 12.0, max_neighbors: int = 12):
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors

    def featurize(self, mols) -> np.ndarray:
        out = np.empty(len(mols), dtype=object)
        for i, mol in enumerate(mols):
            if mol is None or mol.conformer is None:
                out[i] = np.array([])
                continue
            coords = np.asarray(mol.conformer, dtype=np.float32)
            nbrs = compute_neighbor_list(coords, self.cutoff,
                                         self.max_neighbors)
            z = np.array([a.atomic_num for a in mol.atoms],
                         dtype=np.int32)
            out[i] = (coords, nbrs, z)
        return out


class ComplexNeighborListFragmentAtomicCoordinates(AtomicConvFeaturizer):
    """Alias kept for reference-API compatibility (reference
    complex_atomic_coordinates.py:317 deprecates this name in favor of
    AtomicConvFeaturizer)."""

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


def ani_symmetry_features(coords: jnp.ndarray, atomic_numbers: jnp.ndarray,
                          atom_mask: Optional[jnp.ndarray] = None,
                          atom_cases: Sequence[int] = (1, 6, 7, 8, 16),
                          radial_cutoff: float = 4.6,
                          angular_cutoff: float = 3.1,
                          radial_length: int = 32,
                          angular_length: int = 8,
                          radial_eta: float = 16.0,
                          angular_eta: float = 8.0,
                          zeta: float = 32.0) -> jnp.ndarray:
    """ANI-1 symmetry functions (Smith et al. 2017; reference TF layer
    ``ANIFeat``, models/layers.py:2185) as one jittable function.

    coords [N, 3] (angstrom), atomic_numbers [N] int, atom_mask [N]
    optional.  Returns [N, 1 + S*R + S*(S+1)/2 * R_a * A] features per
    atom: atomic number, per-species radial terms, per-species-pair
    angular terms.  All pair/triplet loops are dense masked tensor ops
    (MXU/VPU friendly; no data-dependent shapes).
    """
    n = coords.shape[0]
    z = atomic_numbers.astype(jnp.int32)
    mask = (jnp.ones(n) if atom_mask is None
            else atom_mask.astype(jnp.float32))
    species = jnp.stack([(z == s).astype(jnp.float32) * mask
                         for s in atom_cases], axis=-1)   # [N, S]
    d = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)         # [N, N]
    not_self = 1.0 - jnp.eye(n)
    pair_mask = not_self * mask[:, None] * mask[None, :]

    def fc(rr, rc):
        return jnp.where(rr < rc,
                         0.5 * jnp.cos(jnp.pi * rr / rc) + 0.5, 0.0)

    # radial: G_i[s, k] = sum_{j in s} exp(-eta (r_ij - Rs_k)^2) fc(r_ij)
    rs = jnp.linspace(0.5, radial_cutoff, radial_length)
    rad = jnp.exp(-radial_eta
                  * (r[:, :, None] - rs[None, None, :]) ** 2) \
        * (fc(r, radial_cutoff) * pair_mask)[:, :, None]   # [N, N, R]
    g_rad = jnp.einsum('ijk,js->isk', rad, species)        # [N, S, R]

    # angular: triplets (j, k) around i
    ars = jnp.linspace(0.5, angular_cutoff, angular_length)
    thetas = jnp.linspace(0.0, jnp.pi, angular_length)
    cos_ijk = jnp.einsum('ijA,ikA->ijk', d, d) / \
        jnp.maximum(r[:, :, None] * r[:, None, :], 1e-6)
    cos_ijk = jnp.clip(cos_ijk, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos_ijk)                            # [N, N, N]
    fpair = fc(r, angular_cutoff) * pair_mask              # [N, N]
    tri_mask = fpair[:, :, None] * fpair[:, None, :] * \
        (1.0 - jnp.eye(n))[None, :, :]
    ang_r = 0.5 * (r[:, :, None] + r[:, None, :])          # [N, N, N]
    # factorized angular basis: radial shells x angle shells
    shell = jnp.exp(-angular_eta
                    * (ang_r[..., None] - ars) ** 2)       # [N,N,N,Ra]
    angle = (2.0 ** (1.0 - zeta)) * \
        (1.0 + jnp.cos(theta[..., None] - thetas)) ** zeta  # [N,N,N,A]
    tri = shell[..., :, None] * angle[..., None, :] * \
        tri_mask[..., None, None]                          # [N,N,N,Ra,A]
    # species-pair sums (unordered pairs s1 <= s2)
    pair_feats = []
    S = len(atom_cases)
    for s1 in range(S):
        for s2 in range(s1, S):
            w = species[:, s1][None, :, None] * \
                species[:, s2][None, None, :]
            if s1 != s2:
                w = w + species[:, s2][None, :, None] * \
                    species[:, s1][None, None, :]
            g = jnp.einsum('ijkra,ijk->ira', tri, w * jnp.ones((n, 1, 1)))
            pair_feats.append(g.reshape(n, -1))
    out = jnp.concatenate(
        [z[:, None].astype(jnp.float32) * mask[:, None],
         g_rad.reshape(n, -1)] + pair_feats, axis=-1)
    return out

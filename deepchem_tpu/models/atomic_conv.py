"""Atomic convolution networks for protein-ligand binding affinity.

Reference: deepchem/models/atomic_conv.py:20 AtomicConvModel (Gomes et
al. 2017 ACNN), layers AtomicConvolution models/layers.py:1830 and
NeighborList models/layers.py:1532; featurizer
feat/complex_featurizers/complex_atomic_coordinates.py:148.

The model sees three "fragments" per complex — ligand (frag1), protein
(frag2), and the joined complex — each as (coords, neighbor indices,
neighbor atomic numbers, atomic numbers).  Per atom, an atom-type-
resolved radial symmetry expansion runs over spatial neighbors; the
flattened per-fragment features feed a dense head (the reference's
Keras graph, atomic_conv.py:118-210).

TPU-first design:
- neighbor lists are computed ONCE on host (vectorized numpy, no
  Python-per-atom loops unlike the reference's default_generator
  triple loop) and shipped as static [N, M] index arrays;
- the radial/type expansion is a dense masked einsum over
  (atom, neighbor, radial, type) — static shapes, no data-dependent
  control flow; padded neighbor slots carry Z=0 which matches no atom
  type and so vanish exactly as in the reference (Nbrs_Z zeros).
"""

from __future__ import annotations

import itertools
import logging
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss

logger = logging.getLogger(__name__)

#: reference atom_types default (atomic_conv.py:43): common biomolecular
#: elements; -1 buckets everything else
DEFAULT_ATOM_TYPES: Tuple[float, ...] = (
    6, 7., 8., 9., 11., 12., 15., 16., 17., 20., 25., 30., 35., 53., -1.)

#: reference radial grid (atomic_conv.py:47): cutoffs x means x width
DEFAULT_RADIAL: Tuple[Sequence[float], ...] = (
    tuple(np.arange(1.5, 12.1, 0.5)), (0.0, 4.0, 8.0), (0.4,))


def compute_neighbor_list(coords: np.ndarray, cutoff: float = 12.0,
                          max_neighbors: int = 12) -> np.ndarray:
    """[N, 3] -> [N, max_neighbors] neighbor indices (self-padded).

    Reference NeighborList (models/layers.py:1532) builds cells on
    device; molecular systems here are small enough that a host-side
    O(N^2) pass vectorized in numpy is faster than any kernel launch.
    """
    coords = np.asarray(coords, dtype=np.float32)
    n = len(coords)
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    d[d > cutoff] = np.inf
    m = min(max_neighbors, max(n - 1, 1))
    # argpartition + local sort of the m-smallest: O(N^2 + N m log m),
    # vs full-row argsort O(N^2 log N) — matters at protein scale
    part = np.argpartition(d, m - 1, axis=1)[:, :m]
    pd_ = np.take_along_axis(d, part, axis=1)
    loc = np.argsort(pd_, axis=1)
    order = np.take_along_axis(part, loc, axis=1)
    dist = np.take_along_axis(pd_, loc, axis=1)
    if m < max_neighbors:
        pad = np.full((n, max_neighbors - m), np.inf, dtype=d.dtype)
        order = np.concatenate(
            [order, np.zeros((n, max_neighbors - m), order.dtype)], 1)
        dist = np.concatenate([dist, pad], 1)
    valid = dist < np.inf
    # invalid slots point at the atom itself (distance 0 -> masked later)
    out = np.where(valid, order, np.arange(n)[:, None])
    return out.astype(np.int32), valid


def neighbor_dict(coords: np.ndarray, cutoff: float = 12.0,
                  max_neighbors: int = 12) -> dict:
    """Reference-format neighbor list: {atom: [neighbor ids]}
    (complex_atomic_coordinates.py get_cells/compute_neighbor_list)."""
    idx, valid = compute_neighbor_list(coords, cutoff, max_neighbors)
    return {i: list(idx[i][valid[i]]) for i in range(len(coords))}


class AtomicConvolution(nn.Module):
    """Atom-type-resolved radial symmetry functions (reference
    models/layers.py:1830).

    For each radial param k = (rc, rs, e) and atom type t:
    ``out[b, n, t, k] = sum_m exp(-e (d_bnm - rs)^2) fc(d_bnm; rc)
    [z_nbr == t]`` with the reference's cosine cutoff fc.  Padded
    neighbor slots have nbr_z = 0, matching no type.
    """
    radial_params: Sequence[Tuple[float, float, float]]
    atom_types: Sequence[float]

    @nn.compact
    def __call__(self, coords, nbr_idx, nbr_z):
        """coords [B,N,3]; nbr_idx [B,N,M] int; nbr_z [B,N,M]."""
        B, N, M = nbr_idx.shape

        def gather(c, idx):          # [N,3], [N,M] -> [N,M,3]
            return jnp.take(c, idx.reshape(-1),
                            axis=0).reshape(N, M, 3)
        nbr_coords = jax.vmap(gather)(coords,
                                      nbr_idx.astype(jnp.int32))
        delta = coords[:, :, None, :] - nbr_coords
        d = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)  # [B,N,M]
        rc = jnp.asarray([p[0] for p in self.radial_params])
        rs = jnp.asarray([p[1] for p in self.radial_params])
        e = jnp.asarray([p[2] for p in self.radial_params])
        dk = d[..., None]                                     # [B,N,M,1]
        fc = 0.5 * (jnp.cos(jnp.pi * dk / rc) + 1.0) * (dk <= rc)
        g = jnp.exp(-e * jnp.square(dk - rs)) * fc            # [B,N,M,K]
        types = jnp.asarray(self.atom_types)
        tmask = (nbr_z[..., None] == types).astype(g.dtype)   # [B,N,M,T]
        out = jnp.einsum('bnmk,bnmt->bntk', g, tmask)
        return out.reshape(B, N, -1)                          # [B,N,T*K]


class _ACNNModule(nn.Module):
    """The reference Keras graph (atomic_conv.py:118-210): three
    AtomicConvolutions -> flatten -> concat -> dense stack -> head."""
    n_tasks: int
    radial_params: Sequence[Tuple[float, float, float]]
    atom_types: Sequence[float]
    layer_sizes: Sequence[int]
    weight_init_stddevs: Sequence[float]
    bias_init_consts: Sequence[float]
    dropouts: Sequence[float]
    residual: bool = False

    @nn.compact
    def __call__(self, f1_x, f1_nbrs, f1_nbrs_z, f1_z,
                 f2_x, f2_nbrs, f2_nbrs_z, f2_z,
                 cx_x, cx_nbrs, cx_nbrs_z, cx_z,
                 training: bool = False):
        conv = AtomicConvolution(self.radial_params, self.atom_types)
        B = f1_x.shape[0]
        parts = [conv(f1_x, f1_nbrs, f1_nbrs_z).reshape(B, -1),
                 conv(f2_x, f2_nbrs, f2_nbrs_z).reshape(B, -1),
                 conv(cx_x, cx_nbrs, cx_nbrs_z).reshape(B, -1)]
        x = jnp.concatenate(parts, axis=-1)
        prev_size = x.shape[-1]
        # reference loop (atomic_conv.py:174-195) is pre-activation
        # residual; with relu (the default, idempotent) it is exactly
        # dense -> dropout -> [residual add] -> relu per layer
        for size, stddev, bias_const, dropout in zip(
                self.layer_sizes, self.weight_init_stddevs,
                self.bias_init_consts, self.dropouts):
            y = nn.Dense(
                size,
                kernel_init=nn.initializers.truncated_normal(stddev),
                bias_init=nn.initializers.constant(bias_const))(x)
            if dropout > 0:
                y = nn.Dropout(dropout, deterministic=not training)(y)
            if self.residual and prev_size == size:
                x = x + y
            else:
                x = y
            prev_size = size
            x = nn.relu(x)
        out = nn.Dense(
            self.n_tasks,
            kernel_init=nn.initializers.truncated_normal(
                self.weight_init_stddevs[-1]),
            bias_init=nn.initializers.constant(
                self.bias_init_consts[-1]))(x)
        return out                                           # [B, T]


def _as_list(v, n: int) -> List:
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * n


class AtomicConvModel(JaxModel):
    """(reference atomic_conv.py:20 signature + semantics).

    X per sample is the reference 9-tuple: (frag1_coords,
    frag1_nbr_list, frag1_z, frag2_coords, frag2_nbr_list, frag2_z,
    complex_coords, complex_nbr_list, complex_z); neighbor lists are
    {atom: [ids]} dicts (reference format) or [N, M] index arrays.
    """

    batch_axis_shardable = True

    def __init__(self, n_tasks: int = 1,
                 frag1_num_atoms: int = 70,
                 frag2_num_atoms: int = 634,
                 complex_num_atoms: int = 701,
                 max_num_neighbors: int = 12,
                 batch_size: int = 24,
                 atom_types: Sequence[float] = DEFAULT_ATOM_TYPES,
                 radial: Sequence[Sequence[float]] = DEFAULT_RADIAL,
                 layer_sizes: Sequence[int] = (32, 32, 16),
                 weight_init_stddevs=0.02,
                 bias_init_consts=1.0,
                 dropouts=0.0,
                 residual: bool = False,
                 learning_rate: float = 0.001, **kwargs):
        self.n_tasks = n_tasks
        self.frag1_num_atoms = frag1_num_atoms
        self.frag2_num_atoms = frag2_num_atoms
        self.complex_num_atoms = complex_num_atoms
        self.max_num_neighbors = max_num_neighbors
        self.atom_types = list(atom_types)
        n_layers = len(layer_sizes)
        radial_params = [tuple(t) for t in itertools.product(*radial)]
        module = _ACNNModule(
            n_tasks=n_tasks, radial_params=tuple(radial_params),
            atom_types=tuple(float(t) for t in atom_types),
            layer_sizes=tuple(layer_sizes),
            weight_init_stddevs=tuple(_as_list(weight_init_stddevs,
                                               n_layers)),
            bias_init_consts=tuple(_as_list(bias_init_consts, n_layers)),
            dropouts=tuple(_as_list(dropouts, n_layers)),
            residual=residual)
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size,
                         learning_rate=learning_rate, **kwargs)

    def _frag_arrays(self, samples, off: int, n_atoms: int):
        """(coords, nbr_list, z) columns -> padded batch arrays
        [B,N,3], [B,N,M], [B,N,M], [B,N] (vectorized reference
        default_generator, atomic_conv.py:216-302)."""
        B = len(samples)
        M = self.max_num_neighbors
        X = np.zeros((B, n_atoms, 3), np.float32)
        nbrs = np.zeros((B, n_atoms, M), np.int32)
        nbrs_z = np.zeros((B, n_atoms, M), np.float32)
        z_out = np.zeros((B, n_atoms), np.float32)
        allowed = np.asarray(self.atom_types)
        for i, s in enumerate(samples):
            coords = np.asarray(s[off], np.float32)
            z = np.asarray(s[off + 2], np.float32).copy()
            # replace_atom_types (atomic_conv.py:224): unknown z -> -1
            z[~np.isin(z, allowed)] = -1.
            n = min(len(coords), n_atoms)
            X[i, :n] = coords[:n]
            z_out[i, :n] = z[:n]
            nl = s[off + 1]
            if isinstance(nl, dict):
                for a, ids in nl.items():
                    if a >= n or not len(ids):
                        continue
                    ids = np.asarray(ids, np.int64)[:M]
                    nbrs[i, a, :len(ids)] = ids
                    nbrs_z[i, a, :len(ids)] = z[ids]
            else:
                arr = np.asarray(nl, np.int64)[:n, :M]
                valid = arr != np.arange(len(arr))[:, None]
                nbrs[i, :len(arr), :arr.shape[1]] = arr
                nbrs_z[i, :len(arr), :arr.shape[1]] = \
                    z[arr] * valid
        return X, nbrs, nbrs_z, z_out

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                inputs = []
                for off, n_atoms in ((0, self.frag1_num_atoms),
                                     (3, self.frag2_num_atoms),
                                     (6, self.complex_num_atoms)):
                    inputs.extend(self._frag_arrays(X_b, off, n_atoms))
                if y_b is not None:
                    y_b = np.reshape(y_b, (len(X_b), self.n_tasks))
                yield (inputs, [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'


# -- featurization ---------------------------------------------------------

_ELEMENT_Z = {
    'H': 1, 'C': 6, 'N': 7, 'O': 8, 'F': 9, 'Na': 11, 'Mg': 12, 'P': 15,
    'S': 16, 'Cl': 17, 'K': 19, 'Ca': 20, 'Mn': 25, 'Fe': 26, 'Co': 27,
    'Ni': 28, 'Cu': 29, 'Zn': 30, 'Br': 35, 'I': 53, 'Se': 34, 'B': 5,
    'Si': 14, 'As': 33, 'Cd': 48, 'Hg': 80, 'D': 1}


def pdb_atoms(source: Union[str, Sequence[str]]
              ) -> Tuple[np.ndarray, np.ndarray]:
    """PDB text (path or list of lines) -> (coords [N,3], z [N])."""
    if isinstance(source, str):
        with open(source) as f:
            lines = f.readlines()
    else:
        lines = list(source)
    coords, zs = [], []
    for line in lines:
        if not line.startswith(('ATOM', 'HETATM')):
            continue
        try:
            xyz = (float(line[30:38]), float(line[38:46]),
                   float(line[46:54]))
        except (ValueError, IndexError):
            continue
        elem = line[76:78].strip() if len(line) > 76 else ''
        if not elem:
            name = line[12:16].strip()
            elem = name[:2] if name[:2] in _ELEMENT_Z else name[:1]
        elem = elem.capitalize()
        z = _ELEMENT_Z.get(elem)
        if z is None:
            z = -1
        coords.append(xyz)
        zs.append(z)
    return (np.asarray(coords, np.float32),
            np.asarray(zs, np.int32))


class AtomicConvFeaturizer:
    """Complex featurizer producing the reference 9-tuple (reference
    feat/complex_featurizers/complex_atomic_coordinates.py:148
    AtomicConvFeaturizer semantics): per (ligand, protein) pair —
    fragment coordinates, neighbor dicts within ``neighbor_cutoff``,
    atomic numbers, plus the joined complex.

    Inputs may be PDB file paths or lists of PDB lines (the PDBBind
    processed dataframe stores line lists).  Complexes whose fragment
    sizes exceed the configured maxima are dropped with a log message
    (the reference's log-and-drop featurization contract).
    """

    def __init__(self, frag1_num_atoms: int = 70,
                 frag2_num_atoms: int = 634,
                 complex_num_atoms: int = 704,
                 max_num_neighbors: int = 12,
                 neighbor_cutoff: float = 12.0,
                 strip_hydrogens: bool = True):
        self.frag1_num_atoms = frag1_num_atoms
        self.frag2_num_atoms = frag2_num_atoms
        self.complex_num_atoms = complex_num_atoms
        self.max_num_neighbors = max_num_neighbors
        self.neighbor_cutoff = neighbor_cutoff
        self.strip_hydrogens = strip_hydrogens

    def _load(self, source):
        if isinstance(source, tuple) and len(source) == 2:
            coords, z = source          # pre-parsed
        else:
            coords, z = pdb_atoms(source)
        if self.strip_hydrogens and len(z):
            keep = z != 1
            coords, z = coords[keep], z[keep]
        return coords, z

    @staticmethod
    def get_Z_matrix(z, max_atoms: int) -> np.ndarray:
        """Atomic numbers zero-padded to max_atoms (reference
        complex_atomic_coordinates.py:259).  Accepts an atomic-number
        array or an object with GetAtoms()."""
        if hasattr(z, 'GetAtoms'):
            z = np.array([a.GetAtomicNum() for a in z.GetAtoms()])
        z = np.asarray(z)
        if len(z) > max_atoms:
            raise ValueError(
                'A molecule is larger than permitted by max_atoms. '
                'Increase max_atoms and try again.')
        out = np.zeros(max_atoms, dtype=z.dtype)
        out[:len(z)] = z
        return out

    def featurize_mol(self, coords, z, max_num_atoms: int):
        """One fragment -> (padded coords, neighbor dict, padded Z)
        (reference complex_atomic_coordinates.py:268)."""
        nbrs = neighbor_dict(np.asarray(coords), self.neighbor_cutoff,
                             self.max_num_neighbors)
        zp = self.get_Z_matrix(z, max_num_atoms)
        cp = np.zeros((max_num_atoms, 3))
        cp[:len(coords)] = coords
        return cp, nbrs, zp

    def _featurize(self, pair):
        lig, prot = pair
        lc, lz = self._load(lig)
        pc, pz = self._load(prot)
        if len(lc) == 0 or len(pc) == 0:
            raise ValueError('empty fragment')
        if len(lc) > self.frag1_num_atoms or \
                len(pc) > self.frag2_num_atoms or \
                len(lc) + len(pc) > self.complex_num_atoms:
            raise ValueError(
                f'fragment sizes ({len(lc)}, {len(pc)}) exceed '
                f'({self.frag1_num_atoms}, {self.frag2_num_atoms}, '
                f'{self.complex_num_atoms})')
        cc = np.concatenate([lc, pc])
        cz = np.concatenate([lz, pz])
        cut, M = self.neighbor_cutoff, self.max_num_neighbors
        return (lc, neighbor_dict(lc, cut, M), lz,
                pc, neighbor_dict(pc, cut, M), pz,
                cc, neighbor_dict(cc, cut, M), cz)

    def featurize(self, pairs) -> np.ndarray:
        out, kept = [], []
        for i, pair in enumerate(pairs):
            try:
                out.append(self._featurize(pair))
                kept.append(i)
            except Exception as e:
                logger.warning('Failed to featurize complex %d: %s',
                               i, e)
        arr = np.empty(len(out), dtype=object)
        for i, t in enumerate(out):
            arr[i] = t
        arr_kept = np.asarray(kept, dtype=np.int64)
        self.kept_indices = arr_kept
        return arr


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

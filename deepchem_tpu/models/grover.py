"""GROVER: graph representation transformer with self-supervised
pretraining (reference deepchem/models/torch_models/grover.py:261 +
grover_layers.py:16-940; featurizer feat/molecule_featurizers/
grover_featurizer.py; vocab builders feat/vocabulary_builders/
grover_vocab.py).

TPU-native implementation of the published GROVER architecture
(Rong et al., NeurIPS 2020): the dual node/edge GTransEncoder whose
attention heads are directed message-passing networks
(reference grover_layers.py GroverMPNEncoder:348, GroverAttentionHead:484,
GroverMTBlock:585, GroverTransEncoder:692), four cross-aggregated output
embeddings (atom_from_atom / atom_from_bond / bond_from_atom /
bond_from_bond), the atom/bond-context vocabulary + functional-group
pretraining heads (GroverAtomVocabPredictor:148, GroverBondVocabPredictor:89,
GroverFunctionalGroupPredictor:202, losses.py GroverPretrainLoss:765), and
the dual-branch finetune head (grover.py GroverFinetune:126).

TPU design notes:
- Two batch layouts share the same flax modules/params (equivalence
  pinned in tests/test_grover_packed.py):
  * ``packed=True`` (default): dense per-molecule layout — molecule i
    owns atom slots [i*A, (i+1)*A) and directed-bond slots [i*E,
    (i+1)*E), and every neighbor aggregation is a batched 0/1
    incidence MATMUL on the MXU (see _p_agg); the reverse bond of 2j
    is 2j+1, so rev() is a free pair-flip.  Measured 2.15x the flat
    layout's training throughput at GROVER-large pretrain scale
    (scripts/bench_grover_mfu.py).
  * ``packed=False``: the reference's flat padded neighbor-list
    aggregation (a2b/a2a with a ghost slot 0) — static-shape gathers,
    kept as the oracle and for degree-bounded memory at extreme graph
    sizes.
- Ghost/padding rows are explicitly re-masked after every affine transform
  so bias terms cannot leak into neighbor sums (the reference relies on
  bias=False to keep the ghost row zero).
- The reference's dynamic message-passing depth (dyMPN: depth resampled
  per forward pass, grover_layers.py:438-450) would force an XLA retrace
  per step; we instead resample the depth per EPOCH from the same
  truncated-normal when ``dynamic_depth='truncnorm'`` — one recompile per
  distinct depth (cached), same regularization intent.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.chem import Molecule
from deepchem_tpu.data import Dataset
from deepchem_tpu.feat.base import MolecularFeaturizer
from deepchem_tpu.feat.graph_data import GraphData, bucket_caps
from deepchem_tpu.feat import feature_utils as fu
from deepchem_tpu.models.graph_models import GraphModel, _gnn_loss_outputs
from deepchem_tpu.ops import graph_pool
from deepchem_tpu.parallel.tp import GROVER_TP_RULES

# a compact functional-group SMARTS-free detector set (predicate based)
_FG_CHECKS = [
    ('carboxylic_acid', lambda m: _has_group(m, 'C(=O)O')),
    ('amine', lambda m: any(a.atomic_num == 7 and a.total_hs >= 1
                            for a in m.atoms)),
    ('hydroxyl', lambda m: any(a.atomic_num == 8 and a.total_hs >= 1
                               for a in m.atoms)),
    ('carbonyl', lambda m: any(
        b.order == 2.0 and {m.atoms[b.a1].atomic_num,
                            m.atoms[b.a2].atomic_num} == {6, 8}
        for b in m.bonds)),
    ('aromatic_ring', lambda m: any(a.is_aromatic for a in m.atoms)),
    ('halogen', lambda m: any(a.atomic_num in (9, 17, 35, 53)
                              for a in m.atoms)),
    ('nitro', lambda m: any(
        a.atomic_num == 7 and sum(
            1 for b in m.atom_bonds(a.index)
            if m.atoms[b.other(a.index)].atomic_num == 8) >= 2
        for a in m.atoms)),
    ('sulfonyl', lambda m: any(a.atomic_num == 16 and a.degree >= 3
                               for a in m.atoms)),
    ('ether', lambda m: any(a.atomic_num == 8 and a.degree == 2
                            for a in m.atoms)),
    ('thiol', lambda m: any(a.atomic_num == 16 and a.total_hs >= 1
                            for a in m.atoms)),
]


def _has_group(mol: Molecule, pattern: str) -> bool:
    # carboxylic acid specific check
    for a in mol.atoms:
        if a.atomic_num != 6:
            continue
        os = [mol.atoms[b.other(a.index)] for b in mol.atom_bonds(a.index)
              if mol.atoms[b.other(a.index)].atomic_num == 8]
        orders = [b.order for b in mol.atom_bonds(a.index)
                  if mol.atoms[b.other(a.index)].atomic_num == 8]
        if len(os) >= 2 and 2.0 in orders:
            return True
    return False


class GroverAtomVocabularyBuilder:
    """Atom-context vocabulary (reference grover_vocab.py
    GroverAtomVocabularyBuilder): context = symbol + sorted neighbor
    (symbol, bond-order) multiset."""

    def __init__(self, max_size: Optional[int] = None):
        self.max_size = max_size
        self.stoi: Dict[str, int] = {'<other>': 0}

    @staticmethod
    def atom_to_vocab(mol: Molecule, atom) -> str:
        nbrs = collections.Counter()
        for b in mol.atom_bonds(atom.index):
            o = mol.atoms[b.other(atom.index)]
            nbrs[f'{o.symbol}-{b.type_name()}'] += 1
        ctx = '_'.join(f'{k}{v}' for k, v in sorted(nbrs.items()))
        return f'{atom.symbol}|{ctx}'

    def build(self, mols: Sequence[Molecule]) -> None:
        counter: collections.Counter = collections.Counter()
        for mol in mols:
            if mol is None:
                continue
            for a in mol.atoms:
                counter[self.atom_to_vocab(mol, a)] += 1
        for key, _ in counter.most_common(self.max_size):
            if key not in self.stoi:
                self.stoi[key] = len(self.stoi)

    @property
    def size(self) -> int:
        return len(self.stoi)

    def encode(self, mol: Molecule, atom) -> int:
        return self.stoi.get(self.atom_to_vocab(mol, atom), 0)

    def build_from_csv(self, csv_path: str,
                       smiles_field: str = 'smiles') -> None:
        """Build the vocabulary from a CSV of SMILES (reference
        grover_vocab.py build_from_csv)."""
        import pandas as pd
        from deepchem_tpu.chem import mol_from_smiles
        df = pd.read_csv(csv_path)
        self.build([m for m in (mol_from_smiles(s)
                                for s in df[smiles_field]) if m is not None])

    def save(self, fname: str) -> None:
        """Persist the vocabulary as JSON (reference grover_vocab.py
        save)."""
        import json
        with open(fname, 'w') as f:
            json.dump({'max_size': self.max_size, 'stoi': self.stoi}, f)

    @classmethod
    def load(cls, fname: str) -> 'GroverAtomVocabularyBuilder':
        """Reload a saved vocabulary (reference grover_vocab.py load)."""
        import json
        with open(fname) as f:
            data = json.load(f)
        obj = cls(max_size=data.get('max_size'))
        obj.stoi = {k: int(v) for k, v in data['stoi'].items()}
        return obj


class GroverBondVocabularyBuilder(GroverAtomVocabularyBuilder):
    """Bond-context vocabulary (reference grover_vocab.py)."""

    @staticmethod
    def bond_to_vocab(mol: Molecule, bond) -> str:
        a1, a2 = sorted([mol.atoms[bond.a1].symbol,
                         mol.atoms[bond.a2].symbol])
        return f'{a1}-{bond.type_name()}-{a2}'

    def build(self, mols: Sequence[Molecule]) -> None:
        counter: collections.Counter = collections.Counter()
        for mol in mols:
            if mol is None:
                continue
            for b in mol.bonds:
                counter[self.bond_to_vocab(mol, b)] += 1
        for key, _ in counter.most_common(self.max_size):
            if key not in self.stoi:
                self.stoi[key] = len(self.stoi)

    def encode_bond(self, mol: Molecule, bond) -> int:
        return self.stoi.get(self.bond_to_vocab(mol, bond), 0)


class GroverFeaturizer(MolecularFeaturizer):
    """(reference grover_featurizer.py): GraphData with atom/bond vocab
    labels, functional-group fingerprint, and optional additional
    molecule-level features from ``features_generator`` attached."""

    def __init__(self, features_generator=None,
                 atom_vocab: Optional[GroverAtomVocabularyBuilder] = None,
                 bond_vocab: Optional[GroverBondVocabularyBuilder] = None):
        super().__init__()
        self.features_generator = features_generator
        self.atom_vocab = atom_vocab
        self.bond_vocab = bond_vocab

    def _featurize(self, mol: Molecule, **kwargs) -> GraphData:
        feats = np.stack([fu.atom_features_75(a, mol)
                          for a in mol.atoms])
        src, dst, ef = [], [], []
        for b in mol.bonds:
            src += [b.a1, b.a2]
            dst += [b.a2, b.a1]
            bf = fu.get_bond_type_one_hot(b) + [
                float(b.is_conjugated), float(b.in_ring)]
            ef += [bf, bf]
        ei = np.array([src, dst], dtype=np.int64).reshape(2, -1)
        kwargs2 = {}
        if self.atom_vocab is not None:
            kwargs2['atom_vocab_label'] = np.array(
                [self.atom_vocab.encode(mol, a) for a in mol.atoms],
                dtype=np.int32)
        if self.bond_vocab is not None:
            bl = []
            for b in mol.bonds:
                v = self.bond_vocab.encode_bond(mol, b)
                bl += [v, v]
            kwargs2['bond_vocab_label'] = np.array(bl, dtype=np.int32)
        kwargs2['fg_label'] = np.array(
            [float(chk(mol)) for _, chk in _FG_CHECKS], dtype=np.float32)
        if self.features_generator is not None:
            kwargs2['additional_features'] = np.asarray(
                self.features_generator._featurize(mol),
                dtype=np.float32).reshape(-1)
        # single-atom molecules (e.g. methane) have no bonds; keep the
        # edge-feature width stable so batching still concatenates
        n_bond_feats = 6
        ef_arr = (np.asarray(ef, dtype=np.float32)
                  if ef else np.zeros((0, n_bond_feats), dtype=np.float32))
        return GraphData(feats, ei, ef_arr.reshape(ei.shape[1], -1)
                         if ef else ef_arr, **kwargs2)


# ---------------------------------------------------------------------------
# GTransEncoder (reference grover_layers.py, rebuilt on padded neighbor
# lists with explicit ghost-row masking)
# ---------------------------------------------------------------------------

def _nei_sum(messages: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """sum_j messages[index[i, j]] — the reference's
    _select_neighbor_and_aggregate (grover_layers.py:320) as a static-shape
    gather + reduce (TPU-friendly: no scatter)."""
    return jnp.take(messages, index, axis=0).sum(axis=1)


# The default VJP of a gather is a scatter-add, which this backend runs
# ~3x slower than the forward gather (measured: 2.5ms fwd vs 7.3ms bwd
# for (6145, 9, 1024) f32) — and the training step of the GROVER encoder
# is dominated by these.  The graph structure lets both backward passes
# be pure gathers instead:
#
# - undirected neighbor lists (a2a) are their own transpose: atom a'
#   is gathered by exactly its neighbors, so grad = _nei_sum(g, a2a).
# - each directed bond appears in exactly one atom's incoming list
#   (a2b), namely its destination dst(b) = b2a[b2revb[b]], so
#   grad[b] = g[dst(b)] — a row gather.
#
# Both rely on the encoder's masking invariant (ghost row 0 is zeroed
# after every MPN step), which kills the spurious cotangents at the
# padding slots.

@jax.custom_vjp
def _nei_sum_sym(messages: jnp.ndarray, a2a: jnp.ndarray) -> jnp.ndarray:
    return _slot_gather_sum(messages, a2a, axis=0)


def _nei_sum_sym_fwd(messages, a2a):
    return _nei_sum_sym(messages, a2a), a2a


def _nei_sum_sym_bwd(a2a, g):
    return _slot_gather_sum(g, a2a, axis=0), None


_nei_sum_sym.defvjp(_nei_sum_sym_fwd, _nei_sum_sym_bwd)


@jax.custom_vjp
def _nei_sum_bonds(messages: jnp.ndarray, a2b: jnp.ndarray,
                   rev_dst: jnp.ndarray) -> jnp.ndarray:
    return _slot_gather_sum(messages, a2b, axis=0)


def _nei_sum_bonds_fwd(messages, a2b, rev_dst):
    return _nei_sum_bonds(messages, a2b, rev_dst), (a2b, rev_dst)


def _nei_sum_bonds_bwd(res, g):
    _, rev_dst = res
    return jnp.take(g, rev_dst, axis=0), None, None


_nei_sum_bonds.defvjp(_nei_sum_bonds_fwd, _nei_sum_bonds_bwd)


class _GroverMPN(nn.Module):
    """Directed message-passing encoder (reference GroverMPNEncoder:348).

    atom_messages=True: messages live on atoms, neighbors via a2a.
    atom_messages=False: messages live on directed bonds, neighbors via
    a2b; the DMPNN-style update subtracts the reverse-bond message.
    """
    hidden: int
    depth: int
    atom_messages: bool
    input_layer: str = 'none'      # 'fc' | 'none'
    dropout: float = 0.0
    bias: bool = False
    packed: bool = False           # dense per-molecule incidences

    @nn.compact
    def __call__(self, messages, a2nei, b2a, b2revb, mask,
                 training: bool = False):
        if self.input_layer == 'fc':
            messages = nn.relu(
                nn.Dense(self.hidden, use_bias=self.bias,
                         name='W_i')(messages))
        messages = messages * mask[:, None]
        W_h = nn.Dense(self.hidden, use_bias=self.bias, name='W_h')
        if not self.atom_messages and not self.packed:
            # dst(b): the one atom whose incoming list holds bond b —
            # makes the neighbor-sum backward a gather (see _nei_sum_bonds)
            rev_dst = jnp.take(b2a, b2revb)
        for _ in range(self.depth - 1):
            if self.packed:
                if self.atom_messages:
                    messages = _p_agg(messages, a2nei)
                else:
                    messages = _p_agg(_p_agg(messages, a2nei), b2a) \
                        - _p_rev(messages)
            elif self.atom_messages:
                messages = _nei_sum_sym(messages, a2nei)
            else:
                nei_message = _nei_sum_bonds(messages, a2nei, rev_dst)
                # directed update: sum over incoming bonds of the source
                # atom, minus the reverse bond's own message
                # (grover_layers.py:463-470)
                rev = jnp.take(messages, b2revb, axis=0)
                messages = jnp.take(nei_message, b2a, axis=0) - rev
            messages = nn.relu(W_h(messages))
            messages = nn.Dropout(self.dropout,
                                  deterministic=not training)(messages)
            messages = messages * mask[:, None]
        return messages


def _slot_gather_sum(x: jnp.ndarray, idx: jnp.ndarray,
                     axis: int) -> jnp.ndarray:
    """sum_j take(x, idx[:, j], axis) as an unrolled accumulation.

    Equivalent to ``jnp.take(x, idx, axis).sum(...)`` but XLA will not
    fuse that gather into its reduction here — it materializes the
    (..., N, K, H) neighbor tensor (4.5 GB at grouped pretrain scale,
    measured OOM).  K is tiny (max_neighbors=8), so K fused gather+add
    steps bound the temp at one (..., N, H) array."""
    out = jnp.take(x, idx[:, 0], axis=axis)
    for j in range(1, idx.shape[1]):
        out = out + jnp.take(x, idx[:, j], axis=axis)
    return out


@jax.custom_vjp
def _nei_sum_sym_g(messages: jnp.ndarray, a2a: jnp.ndarray) -> jnp.ndarray:
    """Grouped (G, N, H) variant of _nei_sum_sym (same transpose trick)."""
    return _slot_gather_sum(messages, a2a, axis=1)


def _nei_sum_sym_g_fwd(messages, a2a):
    return _nei_sum_sym_g(messages, a2a), a2a


def _nei_sum_sym_g_bwd(a2a, g):
    return _slot_gather_sum(g, a2a, axis=1), None


_nei_sum_sym_g.defvjp(_nei_sum_sym_g_fwd, _nei_sum_sym_g_bwd)


@jax.custom_vjp
def _nei_sum_bonds_g(messages: jnp.ndarray, a2b: jnp.ndarray,
                     rev_dst: jnp.ndarray) -> jnp.ndarray:
    """Grouped (G, E, H) variant of _nei_sum_bonds."""
    return _slot_gather_sum(messages, a2b, axis=1)


def _nei_sum_bonds_g_fwd(messages, a2b, rev_dst):
    return _nei_sum_bonds_g(messages, a2b, rev_dst), (a2b, rev_dst)


def _nei_sum_bonds_g_bwd(res, g):
    _, rev_dst = res
    return jnp.take(g, rev_dst, axis=1), None, None


_nei_sum_bonds_g.defvjp(_nei_sum_bonds_g_fwd, _nei_sum_bonds_g_bwd)


# ---------------------------------------------------------------------------
# Packed (dense per-molecule) aggregation: every neighbor sum is a batched
# incidence MATMUL instead of a slot-unrolled gather.  Nodes live at
# flat index b*A + a (uniform per-molecule padding), so all dense/
# attention/norm code is unchanged; only the aggregation ops reshape to
# (B, A, H), einsum against a dense 0/1 incidence, and reshape back.
# The reverse directed bond of 2i is 2i+1 (featurizer pair order), so
# rev() is a free pair-flip.  On TPU this moves the encoder's bandwidth
# hog from XLA gathers (~8x off HBM speed-of-light, measured) onto the
# MXU; backward passes are the transposed einsums, so no custom VJPs.
# ---------------------------------------------------------------------------

def _p_agg(x: jnp.ndarray, inc: jnp.ndarray) -> jnp.ndarray:
    """out[.., b*I + i, :] = sum_j inc[b, i, j] * x[.., b*J + j, :].

    inc (B, I, J) is any 0/1 incidence: atom adjacency (A, A), incoming
    -bond incidence (A, E), or source-atom one-hot (E, A).  Handles
    (N, H) and grouped (G, N, H) operands."""
    B, I, J = inc.shape
    inc = inc.astype(x.dtype)
    if x.ndim == 2:
        y = jnp.einsum('bij,bjh->bih', inc, x.reshape(B, J, -1))
        return y.reshape(B * I, x.shape[-1])
    G = x.shape[0]
    y = jnp.einsum('bij,gbjh->gbih', inc, x.reshape(G, B, J, -1))
    return y.reshape(G, B * I, x.shape[-1])


def _p_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse-bond pick: directed bonds are stored in (fwd, rev) pairs,
    so rev(2i) = 2i+1 — a static pair-flip, no gather at all."""
    if x.ndim == 2:
        n, h = x.shape
        return x.reshape(n // 2, 2, h)[:, ::-1].reshape(n, h)
    g, n, h = x.shape
    return x.reshape(g, n // 2, 2, h)[:, :, ::-1].reshape(g, n, h)


def _p_mean_readout(x: jnp.ndarray, mask: jnp.ndarray,
                    num_graphs: int) -> jnp.ndarray:
    """Masked mean over each molecule's slot block — the packed
    equivalent of graph_pool(..., 'mean'), scatter-free."""
    B = num_graphs
    xr = x.reshape(B, -1, x.shape[-1])
    m = mask.reshape(B, -1, 1).astype(x.dtype)
    return (xr * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


class _GroverGroupedMPN(nn.Module):
    """All of an MT block's per-head q/k/v MPN encoders fused into one
    grouped computation (semantically identical to 3*num_heads
    independent _GroverMPN(input_layer='none') encoders).

    Two structural wins over running them separately:
    - every encoder's FIRST iteration aggregates the same input ``f``
      with the same index tables, so that neighbor-sum (the bandwidth
      hog) is computed once and fanned out through one wide
      [H, G*H] matmul instead of G gathers + G matmuls;
    - later iterations batch the G message tensors into (G, N, H), one
      gather and one grouped einsum per iteration instead of G each.
    """
    groups: int                    # 3 * num_heads (q, k, v per head)
    hidden: int
    depth: int
    atom_messages: bool
    dropout: float = 0.0
    bias: bool = False
    #: dense per-molecule layout: a2nei is the (B, A, A) adjacency
    #: (atom messages) or (B, A, E) incoming-bond incidence (bond
    #: messages); b2a is the (B, E, A) source-atom one-hot; b2revb is
    #: ignored (pair-flip).  See the _p_agg section.
    packed: bool = False

    @nn.compact
    def __call__(self, f, a2nei, b2a, b2revb, mask, training: bool = False):
        # the grouped encoder runs (depth-1) matmul iterations: one
        # shared-aggregation iteration + (depth-2) batched ones.  The
        # per-head _GroverMPN it mirrors runs the same count only for
        # depth >= 2; depth <= 1 would silently diverge (ADVICE r2)
        if self.depth < 2:
            raise ValueError(
                f'_GroverGroupedMPN requires depth >= 2 (got '
                f'{self.depth}); the grouped and per-head encoders are '
                'only equivalent from depth 2')
        g, h = self.groups, self.hidden
        kernel = self.param(
            'W_h', nn.initializers.lecun_normal(batch_axis=(0,)),
            (g, h, h))
        bias = (self.param('b_h', nn.initializers.zeros, (g, 1, h))
                if self.bias else None)
        drop = nn.Dropout(self.dropout)

        def matmul(x):               # x: (N,H) shared or (G,N,H) grouped
            if x.ndim == 2:
                y = jnp.einsum('nh,ghe->gne', x, kernel)
            else:
                y = jnp.einsum('gnh,ghe->gne', x, kernel)
            if bias is not None:
                y = y + bias
            return nn.relu(y)

        msg0 = f * mask[:, None]
        if self.packed:
            if self.atom_messages:
                def aggregate(x):
                    return _p_agg(x, a2nei)
            else:
                def aggregate(x):
                    return _p_agg(_p_agg(x, a2nei), b2a) - _p_rev(x)
        elif self.atom_messages:
            def aggregate(x):
                return (_nei_sum_sym if x.ndim == 2
                        else _nei_sum_sym_g)(x, a2nei)
        else:
            rev_dst = jnp.take(b2a, b2revb)

            def aggregate(x):
                if x.ndim == 2:
                    nei = _nei_sum_bonds(x, a2nei, rev_dst)
                    return jnp.take(nei, b2a, axis=0) \
                        - jnp.take(x, b2revb, axis=0)
                nei = _nei_sum_bonds_g(x, a2nei, rev_dst)
                return jnp.take(nei, b2a, axis=1) \
                    - jnp.take(x, b2revb, axis=1)
        x = matmul(aggregate(msg0))                      # (G, N, H)
        x = drop(x, deterministic=not training)
        x = x * mask[None, :, None]
        for _ in range(self.depth - 2):
            x = matmul(aggregate(x))
            x = drop(x, deterministic=not training)
            x = x * mask[None, :, None]
        return x


class _TinySeqAttention(nn.Module):
    """Multi-head attention over a tiny sequence axis (the per-node
    stack of num_heads MPN outputs), laid out TPU-natively.

    flax's MultiHeadDotProductAttention materializes f32[N, h, S, S]
    score tensors; with S = num_heads = 8 the trailing (8, 8) tile pads
    16x under XLA's (8, 128) layout — 768 MB of padding per tensor at
    pretrain scale (measured OOM at 512 mols x hidden 1024).  Here the
    large N axis rides in the minor dimension instead, so scores are
    (h, S, S, N) and pad ~1.0x.  Same math as flax MHA (q/k/v/out
    projections, 1/sqrt(head_dim) scaling, softmax over keys).
    """
    num_heads: int
    qkv_features: int
    out_features: int
    dropout_rate: float = 0.0

    #: nodes per attention chunk; bounds the padded score temp to
    #: chunk*h*S*128 floats (~134 MB at the default) regardless of N
    chunk: int = 4096

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        n, s, _ = q.shape
        nh = self.num_heads
        hd = self.qkv_features // nh

        def proj(name, x):
            return nn.DenseGeneral((nh, hd), axis=-1, name=name)(x)
        qh = proj('query', q) * jnp.asarray(1.0 / np.sqrt(hd), q.dtype)
        kh = proj('key', k)
        vh = proj('value', v)                       # (N, S, nh, hd)
        drop = nn.Dropout(self.dropout_rate) \
            if self.dropout_rate > 0.0 else None
        rng = (self.make_rng('dropout')
               if drop is not None and not deterministic else None)

        def attend(args):
            qc, kc, vc, key = args
            scores = jnp.einsum('nsad,ntad->nast', qc, kc)
            w = jax.nn.softmax(scores, axis=-1)     # over keys t
            if drop is not None and key is not None:
                w = drop(w, deterministic=False, rng=key)
            return jnp.einsum('nast,ntad->nsad', w, vc)

        if n <= self.chunk:
            o = attend((qh, kh, vh, rng))
        else:
            # the (S, S) score matrix pads 16x under the TPU's (8, 128)
            # tiling; chunking over N bounds that temp while the MPN/FFN
            # matmuls (which carry ~99% of the FLOPs) stay whole
            pad = (-n) % self.chunk
            def pad_chunks(x):
                x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                return x.reshape((-1, self.chunk) + x.shape[1:])
            keys = (jax.random.split(rng, (n + pad) // self.chunk)
                    if rng is not None else
                    jnp.zeros(((n + pad) // self.chunk, 2), jnp.uint32))
            o = jax.lax.map(
                lambda a: attend((a[0], a[1], a[2],
                                  a[3] if rng is not None else None)),
                (pad_chunks(qh), pad_chunks(kh), pad_chunks(vh), keys))
            o = o.reshape((-1,) + o.shape[2:])[:n]
        o = o.reshape(n, s, nh * hd)
        return nn.DenseGeneral(self.out_features, axis=-1, name='out')(o)


class _GroverMTBlock(nn.Module):
    """Message-passing multi-head transformer block (reference
    GroverMTBlock:585): each attention head derives q/k/v from three
    independent MPN encoders (GroverAttentionHead:484); attention runs over
    the length-num_heads head axis per node/bond."""
    hidden: int
    num_heads: int
    depth: int
    atom_messages: bool
    dropout: float = 0.0
    bias: bool = False
    res_connection: bool = True
    transform_input: bool = False   # static: first block projects features
    packed: bool = False
    remat_qkv: bool = True

    @nn.compact
    def __call__(self, f, a2nei, b2a, b2revb, mask, training: bool = False):
        if self.transform_input:
            f = nn.Dense(self.hidden, use_bias=self.bias, name='W_i')(f)
            f = nn.LayerNorm(name='input_norm')(nn.relu(f))
            f = nn.Dropout(self.dropout, deterministic=not training)(f)
            f = f * mask[:, None]
        # one grouped MPN computes all heads' q/k/v encoders (see
        # _GroverGroupedMPN: shared first aggregation + batched
        # iterations), rematerialized so the per-depth neighbor gathers
        # are recomputed in backward instead of saved (40 GB -> fits at
        # pretrain scale).  training is static (dropout determinism).
        MPN = (nn.remat(_GroverGroupedMPN, static_argnums=(6,))
               if self.remat_qkv else _GroverGroupedMPN)
        nh = self.num_heads
        qkv = MPN(3 * nh, self.hidden, self.depth, self.atom_messages,
                  self.dropout, self.bias, packed=self.packed,
                  name='qkv_mpn')(f, a2nei, b2a, b2revb, mask, training)
        # (3*nh, N, H) -> three (N, nh, H)
        q = qkv[:nh].transpose(1, 0, 2)
        k = qkv[nh:2 * nh].transpose(1, 0, 2)
        v = qkv[2 * nh:].transpose(1, 0, 2)
        x = _TinySeqAttention(
            num_heads=self.num_heads, qkv_features=self.hidden,
            out_features=self.hidden, dropout_rate=self.dropout,
            name='attn')(q, k, v, deterministic=not training)
        x = x.reshape(x.shape[0], -1)                     # (N, heads*H)
        x = nn.Dense(self.hidden, use_bias=self.bias, name='W_o')(x)
        if self.res_connection:
            # SublayerConnection: x_in + dropout(norm(out))
            # (reference torch layers.py:777-793)
            x = f + nn.Dropout(self.dropout, deterministic=not training)(
                nn.LayerNorm(name='res_norm')(x))
        return x * mask[:, None]


class _PositionwiseFFN(nn.Module):
    """(reference torch layers.py PositionwiseFeedForward, n_layers=2)."""
    d_hidden: int
    d_output: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.d_hidden, name='ff1')(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(
            nn.relu(x))
        return nn.Dense(self.d_output, name='ff2')(x)


class GroverTransEncoder(nn.Module):
    """The dual node/edge GROVER encoder (reference GroverTransEncoder:692).

    Returns the four embeddings (atom_from_atom, atom_from_bond,
    bond_from_atom, bond_from_bond)."""
    hidden: int
    node_fdim: int
    edge_fdim: int
    depth: int = 3
    num_mt_block: int = 2
    num_heads: int = 4
    dropout: float = 0.0
    bias: bool = False
    res_connection: bool = True
    #: packed=True swaps the flat index tables for dense per-molecule
    #: incidences: a2b -> (B, A, E) incoming-bond incidence, b2a ->
    #: (B, E, A) source-atom one-hot, a2a -> (B, A, A) adjacency,
    #: b2revb -> ignored (bonds stored in (fwd, rev) pairs)
    packed: bool = False
    #: 'auto' | 'both' | 'qkv' | 'block' | 'none' — which remat levels
    #: to apply.  'auto': double remat at large flat scale (the gather
    #: recompute that motivated it is cheap to redo), single qkv-level
    #: remat at large packed scale (matmul recompute is not; measured
    #: in scripts/bench_grover_mfu.py), nothing at small scale where
    #: remat costs 35% step time for no memory need.
    remat: str = 'auto'

    @nn.compact
    def __call__(self, f_atoms, f_bonds, a2b, b2a, b2revb, a2a,
                 nmask, emask, training: bool = False):
        node_h, edge_h = f_atoms, f_bonds
        # block-level remat on top of the qkv_mpn-level one: only block
        # inputs are saved for backward, everything else recomputes.
        # Shapes are static under jit, so this is a compile-time
        # decision (see the ``remat`` field).
        mode = self.remat
        if mode == 'auto':
            size = f_atoms.shape[0] * self.hidden
            if size < 2 ** 22:
                # small scale: qkv-level only; measured faster than no
                # remat here (35.4 vs 39.8 ms/step at base scale —
                # less live memory schedules better)
                mode = 'qkv'
            elif self.packed:
                # packed pretrain scale: no remat fits HBM up to the
                # 256-mol x hidden-1024 benchmark scale and is 25%
                # faster than qkv-remat (no matmul recompute); keep the
                # single-level fallback beyond that (measured in
                # scripts/bench_grover_mfu.py packed-remat)
                mode = 'none' if size < 2 ** 23 else 'qkv'
            else:
                mode = 'both'      # flat: gather recompute is cheap
        remat_block = mode in ('both', 'block')
        remat_qkv = mode in ('both', 'qkv')
        if remat_block:
            _GroverMTBlock = nn.remat(globals()['_GroverMTBlock'],
                                      static_argnums=(6,))
        else:
            _GroverMTBlock = globals()['_GroverMTBlock']
        for i in range(self.num_mt_block):
            node_h = _GroverMTBlock(
                self.hidden, self.num_heads, self.depth,
                atom_messages=True, dropout=self.dropout, bias=self.bias,
                res_connection=self.res_connection,
                transform_input=(i == 0), packed=self.packed,
                remat_qkv=remat_qkv,
                name=f'node_block{i}')(node_h, a2a, b2a, b2revb, nmask,
                                       training)
            edge_h = _GroverMTBlock(
                self.hidden, self.num_heads, self.depth,
                atom_messages=False, dropout=self.dropout, bias=self.bias,
                res_connection=self.res_connection,
                transform_input=(i == 0), packed=self.packed,
                remat_qkv=remat_qkv,
                name=f'edge_block{i}')(edge_h, a2b, b2a, b2revb, emask,
                                       training)

        def sublayer(x, name):
            # SublayerConnection(None, x): dropout(norm(x))
            return nn.Dropout(self.dropout, deterministic=not training)(
                nn.LayerNorm(name=f'{name}_norm')(x))

        # --- to-atom outputs (grover_layers.py:858-869)
        if self.packed:
            nei_atoms = _p_agg(node_h, a2a)
            nei_bonds = _p_agg(edge_h, a2b)
        else:
            nei_atoms = _nei_sum_sym(node_h, a2a)
            rev_dst = jnp.take(b2a, b2revb)
            nei_bonds = _nei_sum_bonds(edge_h, a2b, rev_dst)
        aa = jnp.concatenate([f_atoms, nei_atoms], axis=1)
        atom_from_atom = sublayer(
            _PositionwiseFFN(self.hidden * 4, self.hidden, self.dropout,
                             name='ffn_atom_from_atom')(aa, training),
            'atom_from_atom') * nmask[:, None]
        ab = jnp.concatenate([f_atoms, nei_bonds], axis=1)
        atom_from_bond = sublayer(
            _PositionwiseFFN(self.hidden * 4, self.hidden, self.dropout,
                             name='ffn_atom_from_bond')(ab, training),
            'atom_from_bond') * nmask[:, None]

        # --- to-bond outputs (grover_layers.py:870-886)
        # atom -> bond: neighbors are the bond's source atom plus that
        # atom's neighbors, minus the atom at the reverse end
        if self.packed:
            # pick at src of the self+neighborhood sum; the atom at the
            # reverse end is this bond's dst = transpose(a2b) pick
            agg = _p_agg(node_h + _p_agg(node_h, a2a), b2a) \
                - _p_agg(node_h, a2b.transpose(0, 2, 1))
        else:
            atom_list_for_bond = jnp.concatenate(
                [b2a[:, None], jnp.take(a2a, b2a, axis=0)], axis=1)
            agg = _nei_sum(node_h, atom_list_for_bond) \
                - jnp.take(node_h, jnp.take(b2a, b2revb), axis=0)
        ba = jnp.concatenate([f_bonds, agg], axis=1)
        bond_from_atom = sublayer(
            _PositionwiseFFN(self.hidden * 4, self.hidden, self.dropout,
                             name='ffn_bond_from_atom')(ba, training),
            'bond_from_atom') * emask[:, None]
        # bond -> bond: incoming bonds of the source atom minus reverse
        if self.packed:
            agg2 = _p_agg(_p_agg(edge_h, a2b), b2a) - _p_rev(edge_h)
        else:
            bond_list_for_bond = jnp.take(a2b, b2a, axis=0)
            agg2 = _nei_sum(edge_h, bond_list_for_bond) \
                - jnp.take(edge_h, b2revb, axis=0)
        bb = jnp.concatenate([f_bonds, agg2], axis=1)
        bond_from_bond = sublayer(
            _PositionwiseFFN(self.hidden * 4, self.hidden, self.dropout,
                             name='ffn_bond_from_bond')(bb, training),
            'bond_from_bond') * emask[:, None]
        return atom_from_atom, atom_from_bond, bond_from_atom, bond_from_bond


class _GroverPretrainModule(nn.Module):
    """Pretrain heads over the four encoder embeddings (reference
    GroverPretrain grover.py:20 + predictors grover_layers.py:89-289)."""
    hidden: int
    node_fdim: int
    edge_fdim: int
    depth: int
    num_mt_block: int
    num_heads: int
    dropout: float
    atom_vocab_size: int
    bond_vocab_size: int
    n_fg: int
    num_graphs: int
    packed: bool = False
    remat: str = 'auto'

    @nn.compact
    def __call__(self, f_atoms, f_bonds, a2b, b2a, b2revb, a2a, gidx,
                 nmask, emask, addf, training: bool = False):
        emb = GroverTransEncoder(
            self.hidden, self.node_fdim, self.edge_fdim, self.depth,
            self.num_mt_block, self.num_heads, self.dropout,
            packed=self.packed, remat=self.remat,
            name='encoder')(f_atoms, f_bonds, a2b, b2a, b2revb, a2a,
                            nmask, emask, training)
        atom_from_atom, atom_from_bond, bond_from_atom, bond_from_bond = emb
        # atom-vocab predictors (one per source branch)
        av_atom = jax.nn.log_softmax(
            nn.Dense(self.atom_vocab_size,
                     name='av_head_atom')(atom_from_atom), axis=-1)
        av_bond = jax.nn.log_softmax(
            nn.Dense(self.atom_vocab_size,
                     name='av_head_bond')(atom_from_bond), axis=-1)

        # bond-vocab predictors: forward + reverse directed-bond linear
        # (reference GroverBondVocabPredictor:127 pairs even/odd ids; here
        # every directed bond pairs with its b2revb partner)
        def bond_vocab(emb_b, name):
            fwd = nn.Dense(self.bond_vocab_size, name=f'{name}_fwd')(emb_b)
            rev_emb = (_p_rev(emb_b) if self.packed
                       else jnp.take(emb_b, b2revb, axis=0))
            rev = nn.Dense(self.bond_vocab_size, name=f'{name}_rev')(
                rev_emb)
            return jax.nn.log_softmax(fwd + rev, axis=-1)
        bv_atom = bond_vocab(bond_from_atom, 'bv_head_atom')
        bv_bond = bond_vocab(bond_from_bond, 'bv_head_bond')

        # functional-group predictors over mean readouts of all four
        def fg(emb_x, idx, mask, name):
            if self.packed:
                g = _p_mean_readout(emb_x, mask, self.num_graphs)
            else:
                g = graph_pool(emb_x, idx, self.num_graphs, mask, 'mean')
            return nn.Dense(self.n_fg, name=name)(g)
        egidx = None if self.packed else jnp.take(gidx, b2a)
        fg_aa = fg(atom_from_atom, gidx, nmask, 'fg_head_atom_from_atom')
        fg_ab = fg(atom_from_bond, gidx, nmask, 'fg_head_atom_from_bond')
        fg_ba = fg(bond_from_atom, egidx, emask, 'fg_head_bond_from_atom')
        fg_bb = fg(bond_from_bond, egidx, emask, 'fg_head_bond_from_bond')
        return av_atom, av_bond, bv_atom, bv_bond, fg_aa, fg_ab, fg_ba, fg_bb


class _GroverFinetuneModule(nn.Module):
    """Dual-branch finetune head (reference GroverFinetune grover.py:126):
    mean readouts of atom_from_atom / atom_from_bond, optional additional
    molecule features, per-branch FFN, shared linear output head."""
    hidden: int
    node_fdim: int
    edge_fdim: int
    depth: int
    num_mt_block: int
    num_heads: int
    dropout: float
    mode: str                      # 'classification' | 'regression'
    n_tasks: int
    n_classes: int
    num_graphs: int
    ffn_hidden: int = 128
    packed: bool = False
    remat: str = 'auto'

    @nn.compact
    def __call__(self, f_atoms, f_bonds, a2b, b2a, b2revb, a2a, gidx,
                 nmask, emask, addf, training: bool = False):
        emb = GroverTransEncoder(
            self.hidden, self.node_fdim, self.edge_fdim, self.depth,
            self.num_mt_block, self.num_heads, self.dropout,
            packed=self.packed, remat=self.remat,
            name='encoder')(f_atoms, f_bonds, a2b, b2a, b2revb, a2a,
                            nmask, emask, training)
        atom_from_atom, atom_from_bond = emb[0], emb[1]
        if self.packed:
            g_atom = _p_mean_readout(atom_from_atom, nmask,
                                     self.num_graphs)
            g_bond = _p_mean_readout(atom_from_bond, nmask,
                                     self.num_graphs)
        else:
            g_atom = graph_pool(atom_from_atom, gidx, self.num_graphs,
                                nmask, 'mean')
            g_bond = graph_pool(atom_from_bond, gidx, self.num_graphs,
                                nmask, 'mean')
        g_atom = jnp.concatenate([g_atom, addf], axis=1)
        g_bond = jnp.concatenate([g_bond, addf], axis=1)
        drop = nn.Dropout(self.dropout, deterministic=not training)
        h_atom = nn.Dense(self.ffn_hidden,
                          name='mol_atom_from_atom_ffn')(drop(g_atom))
        h_bond = nn.Dense(self.ffn_hidden,
                          name='mol_atom_from_bond_ffn')(drop(g_bond))
        out_dim = (self.n_tasks * self.n_classes
                   if self.mode == 'classification' else self.n_tasks)
        head = nn.Dense(out_dim, name='output_head')
        # per-branch predictions (supervised during training; the combined
        # prediction averages the branch activations as the reference does)
        la = head(h_atom)
        lb = head(h_bond)
        if self.mode == 'classification':
            combined = head((jax.nn.sigmoid(h_atom)
                             + jax.nn.sigmoid(h_bond)) / 2)
            logits = combined.reshape(-1, self.n_tasks, self.n_classes)
            probs = jax.nn.softmax(logits, axis=-1)
            la = la.reshape(-1, self.n_tasks, self.n_classes)
            lb = lb.reshape(-1, self.n_tasks, self.n_classes)
            return probs, logits, la, lb
        combined = head((h_atom + h_bond) / 2)
        return combined, la, lb


class GroverModel(GraphModel):
    """(reference torch_models/grover.py:261 GroverModel contract: task
    'pretraining'/'finetuning', atom/bond vocabs, component-wise transfer
    via save_components/load_components)."""

    uses_edge_features = True
    component_scopes = {'encoder': ['encoder'],
                        'heads': ['head', 'ffn_out', 'mol_atom_from']}
    #: one-switch tensor parallelism (distribute(tensor_parallel=k)):
    #: Megatron column/row pairing over the attention blocks' flax-MHA
    #: q/k/v (heads column-split) and out (heads row-split) kernels
    tp_rules = GROVER_TP_RULES
    #: static width of the padded incoming-neighbor lists (molecular
    #: graphs have max degree ~6; one static width avoids recompiles)
    max_neighbors = 8
    #: per-molecule padding quanta for the packed dense layout
    mol_node_quantum = 8
    mol_edge_quantum = 16

    def __init__(self, node_fdim: int = 75, edge_fdim: int = 6,
                 hidden_size: int = 64, depth: int = 2,
                 num_mt_block: int = 1, num_heads: int = 4,
                 dropout: float = 0.0, ffn_hidden_size: int = 128,
                 task: str = 'finetuning',
                 mode: str = 'regression', n_tasks: int = 1,
                 n_classes: int = 2, features_dim: int = 0,
                 atom_vocab: Optional[GroverAtomVocabularyBuilder] = None,
                 bond_vocab: Optional[GroverBondVocabularyBuilder] = None,
                 batch_size: int = 32, dist_coff: float = 0.1,
                 num_layers: Optional[int] = None, packed: bool = True,
                 **kwargs):
        self.packed = packed
        self.n_tasks = n_tasks
        self.n_classes = n_classes
        self.task = task
        self.mode = mode
        self.atom_vocab = atom_vocab
        self.bond_vocab = bond_vocab
        self.node_fdim = node_fdim
        self.edge_fdim = edge_fdim
        self.features_dim = features_dim
        self.dist_coff = dist_coff
        if num_layers is not None:      # back-compat alias
            num_mt_block = num_layers
        av = atom_vocab.size if atom_vocab is not None else 1
        bv = bond_vocab.size if bond_vocab is not None else 1
        pretrain = task in ('pretraining', 'pretrain')
        common = dict(hidden=hidden_size, node_fdim=node_fdim,
                      edge_fdim=edge_fdim, depth=depth,
                      num_mt_block=num_mt_block, num_heads=num_heads,
                      dropout=dropout, num_graphs=batch_size,
                      packed=packed)
        if pretrain:
            module = _GroverPretrainModule(
                atom_vocab_size=av, bond_vocab_size=bv,
                n_fg=len(_FG_CHECKS), **common)
            dist = dist_coff

            def loss_fn(outputs, labels, weights):
                (av_a, av_b, bv_a, bv_b,
                 fg_aa, fg_ab, fg_ba, fg_bb) = outputs
                av_lab, bv_lab, fg_lab, nmask2, emask2 = labels

                def masked_nll(logp, lab, mask):
                    nll = -jnp.take_along_axis(
                        logp, lab.astype(jnp.int32)[:, None], axis=-1)[:, 0]
                    return jnp.sum(nll * mask) / jnp.maximum(mask.sum(),
                                                             1.0)
                la = masked_nll(av_a, av_lab, nmask2) \
                    + masked_nll(av_b, av_lab, nmask2)
                lb = masked_nll(bv_a, bv_lab, emask2) \
                    + masked_nll(bv_b, bv_lab, emask2)

                def bce(logits, lab):
                    return jnp.mean(
                        jnp.maximum(logits, 0) - logits * lab
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
                lf = bce(fg_aa, fg_lab) + bce(fg_ab, fg_lab) \
                    + bce(fg_ba, fg_lab) + bce(fg_bb, fg_lab)

                def mmse(a, b, mask):
                    d = jnp.mean((a - b) ** 2, axis=-1)
                    return jnp.sum(d * mask) / jnp.maximum(mask.sum(), 1.0)
                ld = mmse(av_a, av_b, nmask2) + mmse(bv_a, bv_b, emask2) \
                    + jnp.mean((jax.nn.sigmoid(fg_aa)
                                - jax.nn.sigmoid(fg_ab)) ** 2) \
                    + jnp.mean((jax.nn.sigmoid(fg_ba)
                                - jax.nn.sigmoid(fg_bb)) ** 2)
                return la + lb + lf + dist * ld
            output_types = ['embedding'] * 8
        else:
            module = _GroverFinetuneModule(
                mode=mode, n_tasks=n_tasks, n_classes=n_classes,
                ffn_hidden=ffn_hidden_size, **common)
            base_loss, _ = _gnn_loss_outputs(mode)
            dist = dist_coff

            def _weighted(losses, weights):
                w = weights[0] if weights else jnp.ones(())
                if w.ndim < losses.ndim:
                    w = jnp.reshape(w, w.shape
                                    + (1,) * (losses.ndim - w.ndim))
                elif w.ndim > losses.ndim:
                    w = jnp.mean(w, axis=tuple(range(losses.ndim, w.ndim)))
                return jnp.sum(losses * w) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(w, losses.shape)), 1e-8)

            # dual-branch supervision + branch-consistency distance
            # (reference grover.py _finetuning_loss:681)
            if mode == 'classification':
                def loss_fn(outputs, labels, weights):
                    probs, logits, la, lb = outputs
                    l1 = _weighted(base_loss(la, labels[0]), weights)
                    l2 = _weighted(base_loss(lb, labels[0]), weights)
                    return l1 + l2 + dist * jnp.mean((la - lb) ** 2)
                output_types = ['prediction', 'loss', 'embedding',
                                'embedding']
            else:
                def loss_fn(outputs, labels, weights):
                    y, ya, yb = outputs
                    l1 = _weighted(base_loss(ya, labels[0]), weights)
                    l2 = _weighted(base_loss(yb, labels[0]), weights)
                    return l1 + l2 + dist * jnp.mean((ya - yb) ** 2)
                output_types = ['prediction', 'embedding', 'embedding']
        kwargs.setdefault('data_parallel', False)
        super().__init__(module, loss_fn, output_types=output_types,
                         batch_size=batch_size, **kwargs)
        self._graph_shards = 1

    # ModularModel-style component transfer
    from deepchem_tpu.models.gnn_modular import ModularModel as _MM
    freeze_components = _MM.freeze_components
    unfreeze_components = _MM.unfreeze_components
    _transform_gradients = _MM._transform_gradients
    _apply_freeze_mask = _MM._apply_freeze_mask
    save_components = _MM.save_components
    load_components = _MM.load_components
    build_components = _MM.build_components
    build_model = _MM.build_model
    loss_func = _MM.loss_func
    components = _MM.components

    @staticmethod
    def atom_vocab_random_mask(atom_vocab, smiles,
                               percent: float = 0.15,
                               seed: Optional[int] = None):
        """Per-atom vocabulary labels with 15% random masking — the
        atom-vocab pretraining target (reference torch grover.py:750:
        masked positions carry the vocab id, the rest 0)."""
        from deepchem_tpu.chem import mol_from_smiles
        rng = np.random.RandomState(seed)
        vocab_label: List[int] = []
        for smi in smiles:
            mol = mol_from_smiles(str(smi))
            n = mol.num_atoms
            mlabel = [0] * n
            n_mask = int(np.ceil(n * percent))
            for p in rng.permutation(n)[:n_mask]:
                mlabel[int(p)] = atom_vocab.stoi.get(
                    type(atom_vocab).atom_to_vocab(mol, mol.atoms[int(p)]),
                    0)
            vocab_label.extend(mlabel)
        return vocab_label

    @staticmethod
    def bond_vocab_random_mask(bond_vocab, smiles,
                               percent: float = 0.15,
                               seed: Optional[int] = None):
        """Per-bond vocabulary labels with 15% random masking (reference
        torch grover.py:798)."""
        from deepchem_tpu.chem import mol_from_smiles
        rng = np.random.RandomState(seed)
        vocab_label: List[int] = []
        for smi in smiles:
            mol = mol_from_smiles(str(smi))
            bonds = list(mol.bonds)
            n = len(bonds)
            mlabel = [0] * n
            n_mask = max(1, int(np.ceil(n * percent))) if n else 0
            for p in rng.permutation(n)[:n_mask]:
                mlabel[int(p)] = bond_vocab.stoi.get(
                    type(bond_vocab).bond_to_vocab(mol, bonds[int(p)]), 0)
            vocab_label.extend(mlabel)
        return vocab_label

    def get_loss_func(self):
        """The configured loss callable (reference torch grover.py
        get_loss_func)."""
        return self._loss

    # -- grover batch assembly (reference utils/grover.py BatchGroverGraph,
    # rebuilt two ways: a flat ghost-slot layout with static neighbor
    # lists, and the packed dense per-molecule layout where every
    # aggregation is an incidence matmul; see the _p_agg section) --------
    def _graph_inputs(self, X_b) -> List[np.ndarray]:
        if self.packed:
            return self._graph_inputs_packed(X_b)
        return self._graph_inputs_flat(X_b)

    def _graph_inputs_packed(self, X_b) -> List[np.ndarray]:
        graphs = list(X_b)
        B = self.batch_size
        if self._fixed_caps is not None:
            A, E = self._fixed_caps
        else:
            A, E = self._packed_caps(
                max((g.num_nodes for g in graphs), default=1),
                max((g.num_edges for g in graphs), default=0))
        nf, ef = self.node_fdim, self.edge_fdim
        f_atoms = np.zeros((B * A, nf), np.float32)
        f_bonds = np.zeros((B * E, nf + ef), np.float32)
        adj = np.zeros((B, A, A), np.float32)
        inc = np.zeros((B, A, E), np.float32)
        src_oh = np.zeros((B, E, A), np.float32)
        gidx = np.repeat(np.arange(B, dtype=np.int32), A)
        nmask = np.zeros(B * A, np.float32)
        emask = np.zeros(B * E, np.float32)
        addf = np.zeros((B, max(self.features_dim, 1)), np.float32)
        for i, g in enumerate(graphs):
            n, e = g.num_nodes, g.num_edges
            f_atoms[i * A:i * A + n] = g.node_features[:, :nf]
            nmask[i * A:i * A + n] = 1.0
            if e:
                s = g.edge_index[0]
                d = g.edge_index[1]
                efeat = (g.edge_features[:, :ef]
                         if g.edge_features is not None
                         else np.zeros((e, ef), np.float32))
                f_bonds[i * E:i * E + e, :nf] = g.node_features[s, :nf]
                f_bonds[i * E:i * E + e, nf:] = efeat
                adj[i, d, s] = 1.0
                inc[i, d, np.arange(e)] = 1.0
                src_oh[i, np.arange(e), s] = 1.0
                emask[i * E:i * E + e] = 1.0
            af = getattr(g, 'additional_features', None)
            if af is not None and self.features_dim:
                addf[i, :len(af)] = af[:self.features_dim]
        # b2revb slot unused when packed (bonds are (fwd, rev) pairs)
        dummy = np.zeros(1, np.int32)
        return [f_atoms, f_bonds, inc, src_oh, dummy, adj, gidx, nmask,
                emask, addf]

    def _packed_caps(self, max_nodes: int, max_edges: int
                     ) -> Tuple[int, int]:
        """Per-molecule (atom, directed-bond) caps rounded to quanta —
        the edge cap stays even so rev() can pair-flip."""
        return bucket_caps(max(max_nodes, 1), max(max_edges, 1),
                           self.mol_node_quantum, self.mol_edge_quantum)

    def _graph_inputs_flat(self, X_b) -> List[np.ndarray]:
        graphs = list(X_b)
        n_nodes = sum(g.num_nodes for g in graphs) + 1
        n_edges = sum(g.num_edges for g in graphs) + 1
        if self._fixed_caps is not None:
            node_cap, edge_cap = self._fixed_caps
        else:
            node_cap, edge_cap = bucket_caps(
                n_nodes, n_edges, self.node_quantum, self.edge_quantum)
        MAX_NB = self.max_neighbors
        nf = self.node_fdim
        ef = self.edge_fdim
        f_atoms = np.zeros((node_cap, nf), np.float32)
        f_bonds = np.zeros((edge_cap, nf + ef), np.float32)
        a2b = np.zeros((node_cap, MAX_NB), np.int32)
        b2a = np.zeros(edge_cap, np.int32)
        b2revb = np.zeros(edge_cap, np.int32)
        gidx = np.zeros(node_cap, np.int32)
        nmask = np.zeros(node_cap, np.float32)
        emask = np.zeros(edge_cap, np.float32)
        addf = np.zeros((self.batch_size, max(self.features_dim, 1)),
                        np.float32)
        na, ne = 1, 1     # slot 0 = ghost
        for i, g in enumerate(graphs):
            n, e = g.num_nodes, g.num_edges
            f_atoms[na:na + n] = g.node_features[:, :nf]
            gidx[na:na + n] = i
            nmask[na:na + n] = 1.0
            if e:
                src = g.edge_index[0] + na
                dst = g.edge_index[1] + na
                efeat = (g.edge_features[:, :ef]
                         if g.edge_features is not None
                         else np.zeros((e, ef), np.float32))
                f_bonds[ne:ne + e, :nf] = f_atoms[src]
                f_bonds[ne:ne + e, nf:] = efeat
                b2a[ne:ne + e] = src
                # featurizer emits directed bonds in (fwd, rev) pairs
                pair = np.arange(e)
                b2revb[ne:ne + e] = (pair ^ 1) + ne
                emask[ne:ne + e] = 1.0
                counts = np.zeros(node_cap, np.int32)
                for j in range(e):
                    a = dst[j]
                    c = counts[a]
                    if c < MAX_NB:
                        a2b[a, c] = ne + j
                        counts[a] += 1
            af = getattr(g, 'additional_features', None)
            if af is not None and self.features_dim:
                addf[i, :len(af)] = af[:self.features_dim]
            na += n
            ne += e
        a2a = b2a[a2b]    # source atoms of incoming bonds
        return [f_atoms, f_bonds, a2b, b2a, b2revb, a2a.astype(np.int32),
                gidx, nmask, emask, addf]

    def _collect_uniform_batches(self, dataset: Dataset,
                                 deterministic: bool = True):
        max_nodes = max_edges = 1
        for (X_b, _, _, _) in dataset.iterbatches(
                batch_size=self.batch_size, deterministic=True,
                pad_batches=False):
            if self.packed:     # per-molecule caps, not per-batch sums
                max_nodes = max(max_nodes,
                                max(g.num_nodes for g in X_b))
                max_edges = max(max_edges,
                                max(g.num_edges for g in X_b))
            else:
                max_nodes = max(max_nodes,
                                sum(g.num_nodes for g in X_b) + 1)
                max_edges = max(max_edges,
                                sum(g.num_edges for g in X_b) + 1)
        if self.packed:
            self._fixed_caps = self._packed_caps(max_nodes, max_edges)
        else:
            self._fixed_caps = bucket_caps(max_nodes, max_edges,
                                           self.node_quantum,
                                           self.edge_quantum)
        try:
            out = []
            for batch in self.default_generator(
                    dataset, epochs=1, deterministic=deterministic,
                    pad_batches=True):
                out.append(self._prepare_batch(batch))
            return out
        finally:
            self._fixed_caps = None

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        pretrain = self.task in ('pretraining', 'pretrain')
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=False):
                inputs = self._graph_inputs(X_b)
                if not pretrain:
                    n = len(X_b)
                    if y_b is not None and self.mode == 'classification' \
                            and mode == 'fit':
                        from deepchem_tpu.metrics import to_one_hot
                        y_b = np.stack([
                            to_one_hot(y_b[:, t], self.n_classes)
                            for t in range(self.n_tasks)], axis=1)
                    if y_b is not None and n < self.batch_size:
                        pad_y = np.zeros(
                            (self.batch_size - n,) + y_b.shape[1:],
                            y_b.dtype)
                        y_b = np.concatenate([y_b, pad_y])
                        w_b = np.concatenate([
                            w_b, np.zeros((self.batch_size - n,)
                                          + w_b.shape[1:], w_b.dtype)]) \
                            if w_b is not None else None
                    yield (inputs, [y_b], [w_b])
                    continue
                node_cap = inputs[0].shape[0]
                edge_cap = inputs[1].shape[0]
                av = np.zeros(node_cap, dtype=np.int32)
                bv = np.zeros(edge_cap, dtype=np.int32)
                fg = np.zeros((self.batch_size, len(_FG_CHECKS)),
                              dtype=np.float32)
                if self.packed:     # labels at each molecule's slot base
                    A = node_cap // self.batch_size
                    E = edge_cap // self.batch_size
                pos_n, pos_e = 1, 1
                for i, g in enumerate(X_b):
                    n, e = g.num_nodes, g.num_edges
                    if self.packed:
                        pos_n, pos_e = i * A, i * E
                    if getattr(g, 'atom_vocab_label', None) is not None:
                        av[pos_n:pos_n + n] = g.atom_vocab_label
                    if getattr(g, 'bond_vocab_label', None) is not None:
                        bv[pos_e:pos_e + e] = g.bond_vocab_label
                    if getattr(g, 'fg_label', None) is not None:
                        fg[i] = g.fg_label
                    if not self.packed:
                        pos_n += n
                        pos_e += e
                yield (inputs, [av, bv, fg, inputs[7], inputs[8]],
                       [np.ones(1, np.float32)])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

"""GROVER: graph representation transformer with self-supervised
pretraining (reference deepchem/models/torch_models/grover.py:885 +
grover_layers.py:940; featurizer feat/molecule_featurizers/
grover_featurizer.py; vocab builders feat/vocabulary_builders/
grover_vocab.py).

Compact TPU redesign: a message-passing transformer (GNN attention over the
COO layout) with the reference's three pretraining signals — atom-context
vocabulary, bond-context vocabulary, functional-group multilabels — and a
supervised fine-tune mode.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.chem import Molecule
from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.feat.base import MolecularFeaturizer
from deepchem_tpu.feat.graph_data import GraphData
from deepchem_tpu.feat import feature_utils as fu
from deepchem_tpu.models.graph_models import GraphModel, _heads, \
    _gnn_loss_outputs
from deepchem_tpu.models.graph_layers import GATLayer
from deepchem_tpu.ops import graph_pool, node_degrees, segment_sum

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
    labels and functional-group fingerprint attached."""

    def __init__(self, features_generator=None,
                 atom_vocab: Optional[GroverAtomVocabularyBuilder] = None,
                 bond_vocab: Optional[GroverBondVocabularyBuilder] = None):
        super().__init__()
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
        # single-atom molecules (e.g. methane) have no bonds; keep the
        # edge-feature width stable so batching still concatenates
        n_bond_feats = 6
        ef_arr = (np.asarray(ef, dtype=np.float32)
                  if ef else np.zeros((0, n_bond_feats), dtype=np.float32))
        return GraphData(feats, ei, ef_arr.reshape(ei.shape[1], -1)
                         if ef else ef_arr, **kwargs2)


class _GroverEncoder(nn.Module):
    hidden: int
    n_layers: int
    n_heads: int

    @nn.compact
    def __call__(self, nf, esrc, edst, emask, deg):
        h = nn.Dense(self.hidden)(nf)
        for i in range(self.n_layers):
            a = GATLayer(self.hidden // self.n_heads,
                         n_heads=self.n_heads,
                         name=f'encoder_att{i}')(h, esrc, edst, emask,
                                                 deg)
            h = nn.LayerNorm()(h + a)
            f = nn.Dense(self.hidden, name=f'encoder_ff{i}b')(
                nn.gelu(nn.Dense(self.hidden * 2,
                                 name=f'encoder_ff{i}a')(h)))
            h = nn.LayerNorm()(h + f)
        return h


class _GroverModule(nn.Module):
    hidden: int
    n_layers: int
    n_heads: int
    task: str          # 'pretrain' | 'classification' | 'regression'
    n_tasks: int
    n_classes: int
    atom_vocab_size: int
    bond_vocab_size: int
    n_fg: int
    num_graphs: int

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask, ef,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        deg = node_degrees(edst, nf.shape[0], emask)
        h = _GroverEncoder(self.hidden, self.n_layers, self.n_heads)(
            nf, esrc, edst, emask, deg)
        if self.task == 'pretrain':
            atom_logits = nn.Dense(self.atom_vocab_size,
                                   name='atom_vocab_head')(h)
            edge_h = jnp.take(h, esrc, axis=0) + jnp.take(h, edst, axis=0)
            bond_logits = nn.Dense(self.bond_vocab_size,
                                   name='bond_vocab_head')(edge_h)
            g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
            fg_logits = nn.Dense(self.n_fg, name='fg_head')(g)
            return atom_logits, bond_logits, fg_logits
        g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
        g = nn.gelu(nn.Dense(self.hidden, name='head_dense')(g))
        return _heads(g, self.n_tasks, self.n_classes,
                      'classification' if self.task == 'classification'
                      else 'regression', False, training)


class GroverModel(GraphModel):
    """(reference torch_models/grover.py GroverModel contract: task
    'pretraining'/'finetuning', atom/bond vocabs, fine-tune after
    load_components)."""

    uses_edge_features = True
    component_scopes = {'encoder': ['encoder_'],
                        'heads': ['atom_vocab_head', 'bond_vocab_head',
                                  'fg_head', 'head']}

    def __init__(self, node_fdim: int = 75, edge_fdim: int = 6,
                 hidden_size: int = 64, num_layers: int = 2,
                 num_heads: int = 4, task: str = 'finetuning',
                 mode: str = 'regression', n_tasks: int = 1,
                 n_classes: int = 2,
                 atom_vocab: Optional[GroverAtomVocabularyBuilder] = None,
                 bond_vocab: Optional[GroverBondVocabularyBuilder] = None,
                 batch_size: int = 32, **kwargs):
        self.n_tasks = n_tasks
        self.n_classes = n_classes
        self.task = task
        self.mode = mode
        self.atom_vocab = atom_vocab
        self.bond_vocab = bond_vocab
        av = atom_vocab.size if atom_vocab is not None else 1
        bv = bond_vocab.size if bond_vocab is not None else 1
        internal_task = 'pretrain' if task in ('pretraining',
                                               'pretrain') else mode
        module = _GroverModule(
            hidden=hidden_size, n_layers=num_layers, n_heads=num_heads,
            task=internal_task, n_tasks=n_tasks, n_classes=n_classes,
            atom_vocab_size=av, bond_vocab_size=bv,
            n_fg=len(_FG_CHECKS), num_graphs=batch_size)
        if internal_task == 'pretrain':
            def loss_fn(outputs, labels, weights):
                atom_logits, bond_logits, fg_logits = outputs
                av_lab, bv_lab, fg_lab, nmask2, emask2 = labels
                logp = jax.nn.log_softmax(atom_logits, -1)
                nll_a = -jnp.take_along_axis(
                    logp, av_lab.astype(jnp.int32)[:, None],
                    axis=-1)[:, 0]
                la = jnp.sum(nll_a * nmask2) / jnp.maximum(
                    nmask2.sum(), 1.0)
                logp_b = jax.nn.log_softmax(bond_logits, -1)
                nll_b = -jnp.take_along_axis(
                    logp_b, bv_lab.astype(jnp.int32)[:, None],
                    axis=-1)[:, 0]
                lb = jnp.sum(nll_b * emask2) / jnp.maximum(
                    emask2.sum(), 1.0)
                from deepchem_tpu.models.losses import \
                    SigmoidCrossEntropy
                lf = jnp.mean(SigmoidCrossEntropy()(fg_logits, fg_lab))
                return la + lb + lf
            output_types = ['embedding', 'embedding', 'embedding']
        else:
            loss_fn, output_types = _gnn_loss_outputs(mode)
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

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        if self.task not in ('pretraining', 'pretrain'):
            yield from super().default_generator(
                dataset, epochs, mode, deterministic, pad_batches)
            return
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=False):
                inputs = self._graph_inputs(X_b)
                node_cap = inputs[0].shape[0]
                edge_cap = inputs[1].shape[0]
                av = np.zeros(node_cap, dtype=np.int32)
                bv = np.zeros(edge_cap, dtype=np.int32)
                fg = np.zeros((self.batch_size, len(_FG_CHECKS)),
                              dtype=np.float32)
                pos_n = pos_e = 0
                for i, g in enumerate(X_b):
                    n, e = g.num_nodes, g.num_edges
                    if getattr(g, 'atom_vocab_label', None) is not None:
                        av[pos_n:pos_n + n] = g.atom_vocab_label
                    if getattr(g, 'bond_vocab_label', None) is not None:
                        bv[pos_e:pos_e + e] = g.bond_vocab_label
                    if getattr(g, 'fg_label', None) is not None:
                        fg[i] = g.fg_label
                    pos_n += n
                    pos_e += e
                yield (inputs, [av, bv, fg, inputs[4], inputs[5]],
                       [np.ones(1, np.float32)])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

"""Modular GNN pretraining (reference deepchem/models/torch_models/gnn.py
GNNModular, 1169 LoC: SNAP-style pretraining tasks — node/edge masking,
edge prediction, Deep Graph Infomax, context prediction — then supervised
fine-tuning) and the ModularTorchModel pattern (reference
torch_models/modular.py:15: build_components, component freeze/unfreeze,
component-wise checkpoints).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.models.graph_models import GraphModel, _gnn_loss_outputs
from deepchem_tpu.models.graph_layers import GCNLayer
from deepchem_tpu.models.losses import (DeepGraphInfomaxLoss,
                                        EdgePredictionLoss,
                                        GraphNodeMaskingLoss)
from deepchem_tpu.ops import graph_pool, node_degrees, segment_sum

logger = logging.getLogger(__name__)


class ModularModel:
    """Mixin implementing the ModularTorchModel contract (reference
    modular.py:15): named components with freeze/unfreeze and per-component
    checkpointing on a flax param tree."""

    #: maps component name -> top-level param scope prefixes
    component_scopes: Dict[str, Sequence[str]] = {}
    _frozen: set

    def build_components(self) -> Dict[str, dict]:
        """Named components of the assembled model (reference
        modular.py:76 returns a dict of torch modules; in this engine a
        component IS a named flax scope, so the equivalent state is the
        per-component parameter subtrees).  ``component_scopes`` groups
        scopes under logical names; without it every top-level scope is
        its own component."""
        if getattr(self, 'params', None) is None:
            return {}
        tree = self.params['params']
        if self.component_scopes:
            return {name: {p: tree[p] for p in prefixes if p in tree}
                    for name, prefixes in self.component_scopes.items()}
        return dict(tree)

    @property
    def components(self) -> Dict[str, dict]:
        """(reference modular.py components attribute)"""
        return self.build_components()

    def build_model(self):
        """The assembled model (reference modular.py:84).  The flax
        module already composes every component."""
        return self.module

    def loss_func(self, inputs, labels, weights):
        """Batch loss through the assembled model (reference
        modular.py:102 hook).  Default: the engine's configured loss over
        a forward pass; pretraining subclasses configure their own loss
        at construction instead of overriding this."""
        import jax as _jax
        outputs = self._forward(self.params, [jnp.asarray(x)
                                              for x in inputs],
                                training=False, rng=None)
        labels = [jnp.asarray(x) for x in labels]
        weights = [jnp.asarray(x) for x in weights]
        return self._compute_loss(outputs, labels, weights)

    def freeze_components(self, names: Sequence[str]) -> None:
        """(reference modular.py:109)"""
        self._frozen = getattr(self, '_frozen', set()) | set(names)
        self._train_step_fn = None

    def unfreeze_components(self, names: Sequence[str]) -> None:
        """(reference modular.py:123)"""
        self._frozen = getattr(self, '_frozen', set()) - set(names)
        self._train_step_fn = None

    def _transform_gradients(self, grads):
        return self._apply_freeze_mask(grads)

    def _apply_freeze_mask(self, grads):
        frozen = getattr(self, '_frozen', set())
        if not frozen:
            return grads
        prefixes = []
        for name in frozen:
            prefixes += list(self.component_scopes.get(name, [name]))

        def mask(path, leaf):
            key = '/'.join(str(getattr(p, 'key', p)) for p in path)
            if any(pref in key for pref in prefixes):
                return jnp.zeros_like(leaf)
            return leaf
        return jax.tree_util.tree_map_with_path(mask, grads)

    def save_components(self, model_dir: Optional[str] = None) -> None:
        """Component-wise checkpoint (reference modular.py:332)."""
        model_dir = model_dir or self.model_dir
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, 'components.pkl'), 'wb') as f:
            pickle.dump(jax.tree.map(np.asarray, self.params), f)

    def load_components(self, model_dir: Optional[str] = None,
                        components: Optional[Sequence[str]] = None) -> None:
        model_dir = model_dir or self.model_dir
        with open(os.path.join(model_dir, 'components.pkl'), 'rb') as f:
            saved = pickle.load(f)
        if components is None:
            self.params = jax.tree.map(jnp.asarray, saved)
            return
        prefixes = []
        for name in components:
            prefixes += list(self.component_scopes.get(name, [name]))
        flat_saved = jax.tree_util.tree_flatten_with_path(saved)[0]
        flat_cur, treedef = jax.tree_util.tree_flatten_with_path(
            self.params)
        saved_map = {'/'.join(str(getattr(p, 'key', p)) for p in path): v
                     for path, v in flat_saved}
        leaves = []
        for path, leaf in flat_cur:
            key = '/'.join(str(getattr(p, 'key', p)) for p in path)
            if any(pref in key for pref in prefixes) and key in saved_map:
                leaves.append(jnp.asarray(saved_map[key]))
            else:
                leaves.append(leaf)
        self.params = jax.tree_util.tree_unflatten(treedef, leaves)


class _GNNModularModule(nn.Module):
    emb_dim: int
    num_layers: int
    num_graphs: int
    task: str                 # 'edge_pred' | 'mask_nodes' | 'infomax' |
    #                           'regression' | 'classification'
    n_tasks: int
    n_classes: int
    node_feature_dim: int

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 training: bool = False):
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        deg = node_degrees(edst, nf.shape[0], emask)
        h = nf
        for i in range(self.num_layers):
            h = GCNLayer(self.emb_dim, activation=nn.relu,
                         name=f'encoder_gcn{i}')(h, esrc, edst, emask,
                                                 deg)
        if self.task == 'edge_pred':
            # positive scores for real edges; negatives from shifted pairs
            pos = jnp.sum(jnp.take(h, esrc, axis=0) *
                          jnp.take(h, edst, axis=0), axis=1)
            neg_dst = jnp.roll(edst, 7)
            neg = jnp.sum(jnp.take(h, esrc, axis=0) *
                          jnp.take(h, neg_dst, axis=0), axis=1)
            return pos, neg, emask
        if self.task == 'mask_nodes':
            logits = nn.Dense(self.node_feature_dim,
                              name='node_decoder')(h)
            return (logits,)
        if self.task == 'infomax':
            g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
            summary = nn.sigmoid(nn.Dense(self.emb_dim,
                                          name='infomax_head')(g))
            pos = jnp.sum(h * jnp.take(
                jnp.concatenate([summary,
                                 jnp.zeros((1, self.emb_dim))], axis=0),
                jnp.minimum(gidx, self.num_graphs), axis=0), axis=1)
            perm_summary = jnp.roll(summary, 1, axis=0)
            neg = jnp.sum(h * jnp.take(
                jnp.concatenate([perm_summary,
                                 jnp.zeros((1, self.emb_dim))], axis=0),
                jnp.minimum(gidx, self.num_graphs), axis=0), axis=1)
            return pos, neg, nmask
        # supervised head
        g = graph_pool(h, gidx, self.num_graphs, nmask, 'mean')
        if self.task == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes,
                              name='head')(g)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks, name='head')(g)


class GNNModular(ModularModel, GraphModel):
    """SNAP pretraining framework (reference torch_models/gnn.py
    GNNModular): task in {'edge_pred', 'mask_nodes', 'infomax',
    'regression', 'classification'}.  The encoder component transfers
    between tasks via load_components/freeze_components."""

    component_scopes = {'encoder': ['encoder_'],
                        'head': ['head', 'node_decoder', 'infomax_head']}

    def __init__(self, gnn_type: str = 'gcn', num_layers: int = 3,
                 emb_dim: int = 64, task: str = 'edge_pred',
                 n_tasks: int = 1, n_classes: int = 2,
                 node_feature_dim: int = 30, batch_size: int = 100,
                 mode: Optional[str] = None, **kwargs):
        self.n_tasks = n_tasks
        self.n_classes = n_classes
        self.task = task
        self.mode = mode or ('classification'
                             if task == 'classification'
                             else 'regression')
        module = _GNNModularModule(
            emb_dim=emb_dim, num_layers=num_layers,
            num_graphs=batch_size, task=task, n_tasks=n_tasks,
            n_classes=n_classes, node_feature_dim=node_feature_dim)
        if task == 'edge_pred':
            def loss_fn(outputs, labels, weights):
                pos, neg, emask2 = outputs
                from deepchem_tpu.models.losses import \
                    SigmoidCrossEntropy
                sce = SigmoidCrossEntropy()
                lp = sce(pos, jnp.ones_like(pos)) * emask2
                ln = sce(neg, jnp.zeros_like(neg)) * emask2
                denom = jnp.maximum(emask2.sum(), 1.0)
                return (lp.sum() + ln.sum()) / (2 * denom)
            output_types = ['embedding', 'embedding', 'embedding']
        elif task == 'mask_nodes':
            def loss_fn(outputs, labels, weights):
                # reconstruct node features from embeddings (MSE form of
                # attribute masking)
                logits = outputs[0]
                target = labels[0]
                return jnp.mean(jnp.square(logits - target))
            output_types = ['prediction']
        elif task == 'infomax':
            def loss_fn(outputs, labels, weights):
                pos, neg, nmask2 = outputs
                from deepchem_tpu.models.losses import \
                    SigmoidCrossEntropy
                sce = SigmoidCrossEntropy()
                lp = sce(pos, jnp.ones_like(pos)) * nmask2
                ln = sce(neg, jnp.zeros_like(neg)) * nmask2
                denom = jnp.maximum(nmask2.sum(), 1.0)
                return (lp.sum() + ln.sum()) / (2 * denom)
            output_types = ['embedding', 'embedding', 'embedding']
        else:
            loss_fn, output_types = _gnn_loss_outputs(self.mode)
        kwargs.setdefault('data_parallel', False)
        super(ModularModel, self).__init__(
            module, loss_fn, output_types=output_types,
            batch_size=batch_size, **kwargs)
        self._graph_shards = 1

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        if self.task not in ('mask_nodes',):
            yield from super().default_generator(
                dataset, epochs, mode, deterministic, pad_batches)
            return
        # mask_nodes: labels are the original node features; 15% of nodes
        # are zeroed in the input
        rng = np.random.RandomState(0)
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=False):
                inputs = self._graph_inputs(X_b)
                nf = inputs[0].copy()
                target = nf.copy()
                mask = rng.rand(len(nf)) < 0.15
                nf[mask] = 0.0
                inputs[0] = nf
                yield (inputs, [target],
                       [np.ones((len(nf), 1), np.float32)])

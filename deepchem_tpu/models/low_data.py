"""One-shot / low-data learning (matching networks over graph encoders).

Redesign of the reference's low-data stack:
- AttnLSTMEmbedding   (reference deepchem/models/layers.py:1038)
- IterRefLSTMEmbedding(reference deepchem/models/layers.py:1136)
- episode sampling     (reference deepchem/data/supports.py)
- the SupportGraphClassifier harness from the legacy low-data benchmark
  (reference molnet/run_benchmark_low_data.py — dead TF1 code in the
  reference; re-built here as a working jitted trainer).

TPU-first: every episode has a fixed (n_pos, n_neg, n_test) shape and
graphs are padded to fixed node/edge caps, so the whole episode step —
encode support, encode queries, attention refinement, matching-network
prediction, loss, grads — is ONE jitted computation with static shapes.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from deepchem_tpu.data import Dataset, NumpyDataset
from deepchem_tpu.data.supports import (EpisodeGenerator, SupportGenerator,
                                        get_task_dataset)
from deepchem_tpu.feat.graph_data import BatchGraphData, bucket_caps
from deepchem_tpu.models.graph_layers import GCNLayer
from deepchem_tpu.ops import graph_pool, node_degrees

logger = logging.getLogger(__name__)


def cosine_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Row-wise cosine similarity matrix [n_x, n_y]."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-7)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-7)
    return xn @ yn.T


class AttnLSTMEmbedding(nn.Module):
    """Matching-networks attention LSTM (Vinyals 2016; reference
    layers.py:1038): refines TEST embeddings by attending over the
    support set through a shared LSTM cell for ``max_depth`` steps."""
    n_feat: int
    max_depth: int = 3

    @nn.compact
    def __call__(self, x, xp):
        cell = nn.LSTMCell(self.n_feat)
        q = jnp.zeros_like(x)
        carry = (jnp.zeros((x.shape[0], self.n_feat), x.dtype),
                 jnp.zeros((x.shape[0], self.n_feat), x.dtype))
        for _ in range(self.max_depth):
            a = jax.nn.softmax(cosine_dist(x + q, xp), axis=-1)
            r = a @ xp
            carry, q = cell(carry, jnp.concatenate([q, r], axis=1))
        return x + q, xp


class IterRefLSTMEmbedding(nn.Module):
    """Iterative-refinement LSTM (reference layers.py:1136): refines
    BOTH test and support embeddings from each other."""
    n_feat: int
    max_depth: int = 3

    @nn.compact
    def __call__(self, x, xp):
        support_cell = nn.LSTMCell(self.n_feat, name='support_lstm')
        test_cell = nn.LSTMCell(self.n_feat, name='test_lstm')
        n_test, n_support = x.shape[0], xp.shape[0]
        p = jnp.zeros_like(x)
        q = jnp.zeros_like(xp)
        z = xp
        s_carry = (jnp.zeros((n_support, self.n_feat), x.dtype),) * 2
        t_carry = (jnp.zeros((n_test, self.n_feat), x.dtype),) * 2
        for _ in range(self.max_depth):
            a = jax.nn.softmax(cosine_dist(z + q, xp), axis=-1)
            r = a @ xp
            x_a = jax.nn.softmax(cosine_dist(x + p, z), axis=-1)
            s = x_a @ z
            s_carry, q = support_cell(
                s_carry, jnp.concatenate([q, r], axis=1))
            t_carry, p = test_cell(
                t_carry, jnp.concatenate([p, s], axis=1))
            z = r
        return x + p, xp + q


class _GraphEncoder(nn.Module):
    """Small GCN encoder: padded COO graph batch -> [num_graphs, n_feat].
    ``num_graphs`` is a static call arg so one shared instance can encode
    support and query batches of different sizes."""
    n_feat: int
    layer_sizes: Sequence[int]

    @nn.compact
    def __call__(self, nf, esrc, edst, gidx, nmask, emask,
                 num_graphs: int):
        x = nf
        esrc = esrc.astype(jnp.int32)
        edst = edst.astype(jnp.int32)
        deg = node_degrees(edst, x.shape[0], emask)
        for size in self.layer_sizes:
            x = GCNLayer(size, activation=nn.relu)(x, esrc, edst, emask,
                                                   deg)
        g = graph_pool(x, gidx, num_graphs, nmask, 'mean')
        return nn.tanh(nn.Dense(self.n_feat)(g))


class _FewShotModule(nn.Module):
    """Encode support + queries with a SHARED encoder, optionally refine
    with Attn/IterRef LSTM, then matching-network prediction
    p(y=1 | query) = sum_i softmax(cos(query, support))_i * y_i."""
    kind: str                     # 'siamese' | 'attn' | 'res'
    n_feat: int
    layer_sizes: Sequence[int]
    n_support: int
    n_test: int
    max_depth: int = 3

    @nn.compact
    def __call__(self, s_inputs, s_y, q_inputs):
        enc = _GraphEncoder(self.n_feat, tuple(self.layer_sizes),
                            name='encoder')
        xs = enc(*s_inputs, self.n_support)
        xq = enc(*q_inputs, self.n_test)
        if self.kind == 'attn':
            xq, xs = AttnLSTMEmbedding(self.n_feat, self.max_depth)(xq, xs)
        elif self.kind == 'res':
            xq, xs = IterRefLSTMEmbedding(self.n_feat,
                                          self.max_depth)(xq, xs)
        elif self.kind != 'siamese':
            raise ValueError(self.kind)
        a = jax.nn.softmax(cosine_dist(xq, xs), axis=-1)
        return a @ s_y                      # [n_test] P(positive)


class SupportGraphClassifier:
    """One-shot graph classifier trained on episodes (the working
    equivalent of the reference's legacy low-data harness,
    molnet/run_benchmark_low_data.py; models: 'siamese', 'attn', 'res').

    fit() samples (support, query) episodes across tasks with
    EpisodeGenerator; each step is one jitted computation.  predict/
    evaluate condition on a sampled support set per task, Matching
    Networks style (Vinyals 2016; Altae-Tran et al. 2017, the reference's
    one-shot paper).
    """

    def __init__(self, model: str = 'siamese', n_pos: int = 1,
                 n_neg: int = 9, n_test: int = 16, n_feat: int = 64,
                 layer_sizes: Sequence[int] = (64, 64),
                 max_depth: int = 3, learning_rate: float = 1e-3,
                 node_quantum: int = 128, edge_quantum: int = 256,
                 seed: int = 0):
        self.n_pos, self.n_neg, self.n_test = n_pos, n_neg, n_test
        self.n_support = n_pos + n_neg
        self.node_quantum = node_quantum
        self.edge_quantum = edge_quantum
        self.module = _FewShotModule(
            kind=model, n_feat=n_feat, layer_sizes=tuple(layer_sizes),
            n_support=self.n_support, n_test=n_test, max_depth=max_depth)
        self.optimizer = optax.adam(learning_rate)
        self.params = None
        self.opt_state = None
        self._rng = jax.random.PRNGKey(seed)
        self._step_fn = None
        self._caps = None

    # ---------------- packing ----------------

    def _dataset_caps(self, dataset: Dataset) -> Tuple[int, int]:
        sizes = [(g.num_nodes, g.num_edges) for g in dataset.X]
        max_n = max(s[0] for s in sizes)
        max_e = max(max(s[1], 1) for s in sizes)
        per = max(self.n_support, self.n_test)
        return bucket_caps(max_n * per + 1, max_e * per,
                           self.node_quantum, self.edge_quantum)

    def _pack(self, graphs: List, num_graphs: int) -> List[np.ndarray]:
        node_cap, edge_cap = self._caps
        d = BatchGraphData(list(graphs)).pad(node_cap, edge_cap,
                                             num_graphs=num_graphs)
        return [d['node_features'], d['edge_index'][0],
                d['edge_index'][1], d['graph_index'], d['node_mask'],
                d['edge_mask']]

    def _pack_episode(self, support: NumpyDataset, batch: NumpyDataset):
        s_in = self._pack(support.X, self.n_support)
        s_y = np.asarray(support.y, dtype=np.float32).reshape(-1)
        # pad/trim the query side to the fixed n_test slot count
        qX = list(batch.X)
        qy = np.asarray(batch.y, dtype=np.float32).reshape(-1)
        qw = np.ones(self.n_test, dtype=np.float32)
        if len(qX) < self.n_test:
            qw[len(qX):] = 0.0
            pad = self.n_test - len(qX)
            qX = qX + [qX[0]] * pad
            qy = np.concatenate([qy, np.zeros(pad, dtype=np.float32)])
        q_in = self._pack(qX[:self.n_test], self.n_test)
        return s_in, s_y, q_in, qy[:self.n_test], qw

    # ---------------- training ----------------

    def _build(self, sample_episode):
        s_in, s_y, q_in, q_y, q_w = sample_episode
        self._rng, init_rng = jax.random.split(self._rng)
        self.params = jax.jit(self.module.init)(init_rng, s_in, s_y, q_in)
        self.opt_state = self.optimizer.init(self.params)

        def loss_fn(params, s_in, s_y, q_in, q_y, q_w):
            p = self.module.apply(params, s_in, s_y, q_in)
            p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            ll = -(q_y * jnp.log(p) + (1.0 - q_y) * jnp.log(1.0 - p))
            return jnp.sum(ll * q_w) / jnp.maximum(jnp.sum(q_w), 1.0)

        def step(params, opt_state, s_in, s_y, q_in, q_y, q_w):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, s_in, s_y, q_in, q_y, q_w)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            return optax.apply_updates(params, updates), opt_state, loss
        self._step_fn = jax.jit(step, donate_argnums=(0, 1))
        self._predict_fn = jax.jit(
            lambda params, s_in, s_y, q_in:
            self.module.apply(params, s_in, s_y, q_in))

    def fit(self, dataset: Dataset, nb_epochs: int = 1,
            n_episodes_per_epoch: int = 100,
            log_every: int = 50) -> float:
        """Train on episodes sampled across the dataset's tasks."""
        if self._caps is None:
            self._caps = self._dataset_caps(dataset)
        loss = 0.0
        for epoch in range(nb_epochs):
            n_tasks = dataset.y.shape[1] if dataset.y.ndim > 1 else 1
            gen = EpisodeGenerator(
                dataset, self.n_pos, self.n_neg, self.n_test,
                max(1, n_episodes_per_epoch // max(n_tasks, 1)))
            for i, (task, support, batch) in enumerate(gen):
                ep = self._pack_episode(support, batch)
                if self.params is None:
                    self._build(ep)
                self.params, self.opt_state, l = self._step_fn(
                    self.params, self.opt_state, *ep)
                loss = float(l)
                if log_every and i % log_every == 0:
                    logger.info('epoch %d episode %d loss %.4f',
                                epoch, i, loss)
        return loss

    # ---------------- inference ----------------

    def predict_on_support(self, support: NumpyDataset,
                           test: Dataset) -> np.ndarray:
        """P(positive) for every test graph, conditioned on ``support``."""
        if self.params is None:
            raise ValueError('call fit() first')
        s_in = self._pack(support.X, self.n_support)
        s_y = np.asarray(support.y, dtype=np.float32).reshape(-1)
        preds = []
        X = list(test.X)
        for i in range(0, len(X), self.n_test):
            chunk = X[i:i + self.n_test]
            n = len(chunk)
            if n < self.n_test:
                chunk = chunk + [chunk[0]] * (self.n_test - n)
            q_in = self._pack(chunk, self.n_test)
            p = self._predict_fn(self.params, s_in, s_y, q_in)
            preds.append(np.asarray(p)[:n])
        return np.concatenate(preds)

    def evaluate(self, dataset: Dataset, metric, n_pos: Optional[int]
                 = None, n_neg: Optional[int] = None,
                 n_trials: int = 10) -> Tuple[dict, dict]:
        """Reference low-data protocol: for each sampled (task, support),
        score predictions on the task's remaining examples; returns
        (mean, std) of the metric per task."""
        n_pos = n_pos or self.n_pos
        n_neg = n_neg or self.n_neg
        if self._caps is None:
            self._caps = self._dataset_caps(dataset)
        task_scores: dict = {}
        for task, support in SupportGenerator(dataset, n_pos, n_neg,
                                              n_trials):
            task_ds = get_task_dataset(dataset, task)
            support_ids = set(support.ids)
            keep = [i for i, d in enumerate(task_ds.ids)
                    if d not in support_ids]
            rest = NumpyDataset(task_ds.X[keep], task_ds.y[keep],
                                task_ds.w[keep], task_ds.ids[keep])
            y_pred = self.predict_on_support(support, rest)
            y_true = np.asarray(rest.y).reshape(-1)
            if len(np.unique(y_true)) < 2:
                continue
            score = metric.metric(y_true, y_pred) \
                if hasattr(metric, 'metric') else metric(y_true, y_pred)
            task_scores.setdefault(task, []).append(float(score))
        means = {t: float(np.mean(s)) for t, s in task_scores.items()}
        stds = {t: float(np.std(s)) for t, s in task_scores.items()}
        return means, stds

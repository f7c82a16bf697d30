"""Influence Relevance Voting classifier (reference deepchem/models/IRV.py:84
MultitaskIRVClassifier; featurized by trans.IRVTransformer).

Input layout per task: [sim_1..sim_K, y_1..y_K] (2K features per task,
concatenated across tasks).  The model learns a logistic influence gate
V = w1*sim + w2*rank and relevance vote y_i * V_i.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import SigmoidCrossEntropy


class _IRVModule(nn.Module):
    n_tasks: int
    K: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        K, T = self.K, self.n_tasks
        W = self.param('W', nn.initializers.constant(
            np.concatenate([np.ones(1), np.ones(1)])), (2,))
        b = self.param('b', nn.initializers.zeros, (1,))
        b2 = self.param('b2', nn.initializers.zeros, (1,))
        x = x.reshape(-1, T, 2 * K)
        sims = x[:, :, :K]
        ys = x[:, :, K:]
        ranks = jnp.arange(1, K + 1, dtype=jnp.float32)
        # influence gate per neighbor
        V = W[0] * sims + W[1] * jnp.exp(-ranks)[None, None, :] + b[0]
        relevance = jnp.sum(jax.nn.sigmoid(V) * (2.0 * ys - 1.0), axis=2)
        logits = relevance + b2[0]
        probs = jax.nn.sigmoid(logits)
        preds = jnp.stack([1.0 - probs, probs], axis=2)
        return preds, logits


class MultitaskIRVClassifier(JaxModel):
    """(reference IRV.py:84).  Use with IRVTransformer-ed datasets."""

    def __init__(self, n_tasks: int, K: int = 10, batch_size: int = 50,
                 **kwargs):
        self.n_tasks = n_tasks
        self.K = K
        self.n_classes = 2
        module = _IRVModule(n_tasks=n_tasks, K=K)
        super().__init__(module, SigmoidCrossEntropy(),
                         output_types=['prediction', 'loss'],
                         batch_size=batch_size, **kwargs)

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'classification'


IRVClassifier = MultitaskIRVClassifier

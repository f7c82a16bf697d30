"""Loss functions (single JAX implementation set).

Redesign of reference deepchem/models/losses.py (1553 LoC, 25 classes).  The
reference keeps per-backend `_compute_tf_loss`/`_create_pytorch_loss` pairs;
here there is ONE engine, so each Loss implements ``_compute(output, labels)``
returning per-sample losses (the harness applies weights and reduces).
Shapes follow the reference convention: output/labels are broadcast-aligned
with a possibly-extra trailing dimension squeezed (losses.py:33ff).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _make_shapes_consistent(output: jnp.ndarray,
                            labels: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """Match reference losses.py:7 _make_tf_shapes_consistent semantics."""
    if output.ndim == labels.ndim:
        return output, labels
    if output.ndim == labels.ndim + 1 and output.shape[-1] == 1:
        return jnp.squeeze(output, -1), labels
    if labels.ndim == output.ndim + 1 and labels.shape[-1] == 1:
        return output, jnp.squeeze(labels, -1)
    return output, labels


class Loss:
    """Base class (reference losses.py:28)."""

    def _compute(self, output: jnp.ndarray,
                 labels: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, output, labels):
        return self._compute(jnp.asarray(output), jnp.asarray(labels))

    # API-compat shim: the reference exposes _create_pytorch_loss etc.; here
    # one creator returns the jax callable.
    def _create_jax_loss(self) -> Callable:
        return self.__call__


class L1Loss(Loss):
    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        return jnp.abs(output - labels)


class L2Loss(Loss):
    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        return jnp.square(output - labels)


class HuberLoss(Loss):
    def __init__(self, delta: float = 1.0):
        self.delta = delta

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        d = jnp.abs(output - labels)
        return jnp.where(d <= self.delta, 0.5 * d * d,
                         self.delta * (d - 0.5 * self.delta))


class HingeLoss(Loss):
    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        return jnp.maximum(0.0, 1.0 - labels * output)


class SquaredHingeLoss(Loss):
    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        return jnp.square(jnp.maximum(0.0, 1.0 - labels * output))


class PoissonLoss(Loss):
    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        return jnp.mean(output - labels * jnp.log(output + 1e-8))


class BinaryCrossEntropy(Loss):
    """Labels/outputs are probabilities (reference losses.py:163)."""

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        eps = 1e-7
        p = jnp.clip(output, eps, 1 - eps)
        return -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))


class CategoricalCrossEntropy(Loss):
    """Probabilities over the last axis (reference losses.py:197)."""

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        eps = 1e-7
        return -jnp.sum(labels * jnp.log(jnp.clip(output, eps, 1.0)),
                        axis=-1)


class SigmoidCrossEntropy(Loss):
    """Logits (reference losses.py:230)."""

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        # numerically stable: max(x,0) - x*z + log(1+exp(-|x|))
        x, z = output, labels
        return jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


class SoftmaxCrossEntropy(Loss):
    """Logits over the last axis, one-hot labels (reference
    losses.py:263)."""

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        logp = jax.nn.log_softmax(output, axis=-1)
        return -jnp.sum(labels * logp, axis=-1)


class SparseSoftmaxCrossEntropy(Loss):
    """Logits + integer labels (reference losses.py:285)."""

    def _compute(self, output, labels):
        if labels.ndim == output.ndim and labels.shape[-1] == 1:
            labels = jnp.squeeze(labels, -1)
        labels = labels.astype(jnp.int32)
        logp = jax.nn.log_softmax(output, axis=-1)
        return -jnp.take_along_axis(logp, labels[..., None],
                                    axis=-1)[..., 0]


class VAE_ELBO(Loss):
    """KL(q||N(0,1)) + reconstruction BCE (reference losses.py:299).

    __call__(output=[mu, logvar, x_hat], labels=x)
    """

    def _compute_elbo(self, mu, logvar, x_hat, x, kl_scale=1.0):
        kl = VAE_KLDivergence()._compute_kl(mu, logvar)
        rec = jnp.mean(BinaryCrossEntropy()._compute(x_hat, x),
                       axis=tuple(range(1, x.ndim)))
        return kl_scale * kl + rec

    def __call__(self, output, labels):
        mu, logvar, x_hat = output
        return self._compute_elbo(jnp.asarray(mu), jnp.asarray(logvar),
                                  jnp.asarray(x_hat), jnp.asarray(labels))

    def _compute(self, output, labels):
        return self.__call__(output, labels)


class VAE_KLDivergence(Loss):
    """(reference losses.py:361)"""

    def _compute_kl(self, mu, logvar):
        return 0.5 * jnp.sum(
            jnp.square(mu) + jnp.exp(logvar) - 1.0 - logvar, axis=-1)

    def __call__(self, output, labels):
        mu, logvar = output
        return self._compute_kl(jnp.asarray(mu), jnp.asarray(logvar))

    def _compute(self, output, labels):
        return self.__call__(output, labels)


class ShannonEntropy(Loss):
    """Entropy of Bernoulli outputs (reference losses.py:419)."""

    def _compute(self, output, labels):
        eps = 1e-7
        p = jnp.clip(output, eps, 1 - eps)
        return jnp.mean(-(p * jnp.log(p) + (1 - p) * jnp.log(1 - p)),
                        axis=-1) / jnp.log(2.0)


class GlobalMutualInformationLoss(Loss):
    """InfoGraph global-MI JSD loss (reference losses.py:471)."""

    def __call__(self, global_enc, local_enc, batch_graph_index,
                 node_mask=None):
        # positive pairs: node belongs to graph; negatives: all others
        sim = local_enc @ global_enc.T            # (num_nodes, num_graphs)
        num_graphs = global_enc.shape[0]
        pos_mask = jax.nn.one_hot(batch_graph_index, num_graphs)
        neg_mask = 1.0 - pos_mask
        if node_mask is not None:
            pos_mask = pos_mask * node_mask[:, None]
            neg_mask = neg_mask * node_mask[:, None]
        e_pos = jnp.sum(-jax.nn.softplus(-sim) * pos_mask) \
            / jnp.maximum(pos_mask.sum(), 1.0)
        e_neg = jnp.sum(jax.nn.softplus(sim) * neg_mask) \
            / jnp.maximum(neg_mask.sum(), 1.0)
        return e_neg - e_pos

    def _compute(self, output, labels):
        raise NotImplementedError('call with (global, local, graph_index)')


class LocalMutualInformationLoss(GlobalMutualInformationLoss):
    """(reference losses.py:546) same JSD estimator on local patches."""


class GroverPretrainLoss(Loss):
    """Atom/bond vocab + functional-group multi-label loss (reference
    losses.py:765)."""

    def __call__(self, atom_vocab_logits, bond_vocab_logits, fg_logits,
                 atom_vocab_labels, bond_vocab_labels, fg_labels):
        av = SparseSoftmaxCrossEntropy()(atom_vocab_logits,
                                         atom_vocab_labels).mean()
        bv = SparseSoftmaxCrossEntropy()(bond_vocab_logits,
                                         bond_vocab_labels).mean()
        fg = SigmoidCrossEntropy()(fg_logits, fg_labels).mean()
        return av + bv + fg

    def _compute(self, output, labels):
        raise NotImplementedError


class EdgePredictionLoss(Loss):
    """Link-prediction BCE on positive/negative edge scores (reference
    losses.py:912)."""

    def __call__(self, pos_scores, neg_scores):
        pos = SigmoidCrossEntropy()(pos_scores, jnp.ones_like(pos_scores))
        neg = SigmoidCrossEntropy()(neg_scores, jnp.zeros_like(neg_scores))
        return jnp.mean(pos) + jnp.mean(neg)

    def _compute(self, output, labels):
        return self.__call__(output, labels)


class GraphNodeMaskingLoss(Loss):
    """Masked-node attribute prediction (reference losses.py:979)."""

    def __call__(self, node_logits, masked_labels):
        return SparseSoftmaxCrossEntropy()(node_logits, masked_labels).mean()

    def _compute(self, output, labels):
        return self.__call__(output, labels)


class GraphEdgeMaskingLoss(GraphNodeMaskingLoss):
    """(reference losses.py:1051)"""


class DeepGraphInfomaxLoss(Loss):
    """DGI discriminator BCE (reference losses.py:1115)."""

    def __call__(self, pos_scores, neg_scores):
        return EdgePredictionLoss()(pos_scores, neg_scores)

    def _compute(self, output, labels):
        return self.__call__(output, labels)


class GraphContextPredLoss(Loss):
    """Context prediction with negative sampling (reference
    losses.py:1171)."""

    def __call__(self, substruct_rep, context_rep, neg_context_rep):
        pos = jnp.sum(substruct_rep * context_rep, axis=-1)
        neg = jnp.sum(substruct_rep * neg_context_rep, axis=-1)
        return (SigmoidCrossEntropy()(pos, jnp.ones_like(pos)).mean()
                + SigmoidCrossEntropy()(neg, jnp.zeros_like(neg)).mean())

    def _compute(self, output, labels):
        raise NotImplementedError


class DensityProfileLoss(Loss):
    """Integrated squared error over a grid (reference losses.py:1266)."""

    def __init__(self, grid_volumes=None):
        self.grid_volumes = grid_volumes

    def _compute(self, output, labels):
        output, labels = _make_shapes_consistent(output, labels)
        sq = jnp.square(output - labels)
        if self.grid_volumes is not None:
            sq = sq * self.grid_volumes
        return jnp.sum(sq, axis=tuple(range(1, sq.ndim)))


class NTXentMultiplePositives(Loss):
    """NT-Xent contrastive loss with multiple positives (reference
    losses.py:1319)."""

    def __init__(self, temperature: float = 0.5):
        self.temperature = temperature

    def __call__(self, z1, z2):
        z1 = z1 / (jnp.linalg.norm(z1, axis=-1, keepdims=True) + 1e-8)
        z2 = z2 / (jnp.linalg.norm(z2, axis=-1, keepdims=True) + 1e-8)
        n = z1.shape[0]
        z = jnp.concatenate([z1, z2], axis=0)
        sim = z @ z.T / self.temperature
        mask = 1.0 - jnp.eye(2 * n)
        sim = sim - 1e9 * jnp.eye(2 * n)
        pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
        logp = jax.nn.log_softmax(sim, axis=-1)
        return -jnp.take_along_axis(logp, pos_idx[:, None], axis=-1).mean()

    def _compute(self, output, labels):
        return self.__call__(output, labels)

"""ScScore synthetic-complexity model (reference
deepchem/models/scscore.py:10 ScScoreModel).

Siamese MLP trained on (precursor, product) reaction pairs with a hinge loss
encouraging score(product) > score(precursor); scores map to [1, 5].
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.jax_model import JaxModel


class _ScScoreNet(nn.Module):
    layer_sizes: Sequence[int]
    dropout: float
    score_scale: float = 5.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        for size in self.layer_sizes:
            x = nn.relu(nn.Dense(size)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=not training)(x)
        s = nn.sigmoid(nn.Dense(1)(x))
        return 1.0 + (self.score_scale - 1.0) * s


class _ScScoreModule(nn.Module):
    layer_sizes: Sequence[int]
    dropout: float

    @nn.compact
    def __call__(self, x1, x2=None, training: bool = False):
        net = _ScScoreNet(self.layer_sizes, self.dropout)
        s1 = net(x1, training)
        if x2 is None:
            return s1
        s2 = net(x2, training)
        return s1, s2


class ScScoreModel(JaxModel):
    """(reference scscore.py:10).  X is a pair of fingerprints stacked on
    axis 1: shape (batch, 2, n_features); sample i encodes
    (easier molecule, harder molecule)."""

    def __init__(self, n_features: int = 1024,
                 layer_sizes: Sequence[int] = (300, 300, 300),
                 dropouts: float = 0.0, score_scale: float = 5.0,
                 batch_size: int = 100, **kwargs):
        self.n_features = n_features
        if isinstance(dropouts, (list, tuple)):
            dropouts = dropouts[0]
        module = _ScScoreModule(layer_sizes=tuple(layer_sizes),
                                dropout=dropouts)

        def hinge_loss(outputs, labels, weights):
            s1, s2 = outputs[0], outputs[1]
            # want s2 > s1: hinge on the difference
            return jnp.mean(nn.relu(1.0 - (s2 - s1)))
        super().__init__(module, hinge_loss,
                         output_types=['prediction', 'prediction'],
                         batch_size=batch_size, **kwargs)

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                X_b = np.asarray(X_b, dtype=np.float32)
                if X_b.ndim == 3 and X_b.shape[1] == 2:
                    yield ([X_b[:, 0], X_b[:, 1]], [y_b], [w_b])
                else:
                    yield ([X_b], [y_b], [w_b])

    def predict_mols(self, fingerprints: np.ndarray) -> np.ndarray:
        """Score single molecules."""
        fn = self._get_predict_fn(training=False)
        if not self._built:
            self.build([jnp.asarray(fingerprints[:1]),
                        jnp.asarray(fingerprints[:1])])
        out = self.module.apply(self.params, jnp.asarray(
            np.asarray(fingerprints, dtype=np.float32)), None,
            training=False)
        return np.asarray(out)

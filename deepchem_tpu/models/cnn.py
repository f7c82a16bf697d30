"""Generic 1/2/3-D CNN model (reference deepchem/models/torch_models/cnn.py
CNN/CNNModule: stacked convs + optional residual, mode cls/reg/uncertainty).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy


class _CNNModule(nn.Module):
    n_tasks: int
    n_classes: int
    dims: int
    layer_filters: Sequence[int]
    kernel_size: int
    dense_layer_size: int
    dropout: float
    mode: str
    residual: bool
    pool_type: str
    uncertainty: bool

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == self.dims + 1:     # add channel dim
            x = x[..., None]
        prev_filters = x.shape[-1]
        for i, f in enumerate(self.layer_filters):
            k = (self.kernel_size,) * self.dims
            y = nn.Conv(f, kernel_size=k, padding='SAME')(x)
            y = nn.relu(y)
            if self.residual and y.shape[-1] == x.shape[-1]:
                y = y + x
            if self.dropout > 0:
                y = nn.Dropout(self.dropout,
                               deterministic=not training)(y)
            x = y
        if self.pool_type == 'average':
            x = jnp.mean(x, axis=tuple(range(1, self.dims + 1)))
        else:
            x = jnp.max(x, axis=tuple(range(1, self.dims + 1)))
        x = nn.relu(nn.Dense(self.dense_layer_size)(x))
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(x)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        out = nn.Dense(self.n_tasks)(x)
        if self.uncertainty:
            log_var = nn.Dense(self.n_tasks)(x)
            return out, jnp.exp(log_var), out, log_var
        return out


class CNN(JaxModel):
    """N-dimensional CNN (reference torch_models/cnn.py)."""

    def __init__(self, n_tasks: int, n_features: int, dims: int,
                 layer_filters: Sequence[int] = (100,),
                 kernel_size: int = 5, weight_init_stddevs=0.02,
                 dense_layer_size: int = 1000, dropouts=0.5,
                 mode: str = 'classification', n_classes: int = 2,
                 uncertainty: bool = False, residual: bool = False,
                 padding: str = 'valid', pool_type: str = 'max',
                 batch_size: int = 100, **kwargs):
        if dims not in (1, 2, 3):
            raise ValueError('dims must be 1, 2, or 3')
        self.n_tasks = n_tasks
        self.n_features = n_features
        self.mode = mode
        self.n_classes = n_classes
        if isinstance(dropouts, (list, tuple)):
            dropouts = dropouts[0]
        if uncertainty:
            if mode != 'regression':
                raise ValueError('uncertainty requires regression')
            if dropouts == 0:
                raise ValueError('uncertainty requires dropout')
        module = _CNNModule(
            n_tasks=n_tasks, n_classes=n_classes, dims=dims,
            layer_filters=tuple(layer_filters), kernel_size=kernel_size,
            dense_layer_size=dense_layer_size, dropout=dropouts,
            mode=mode, residual=residual, pool_type=pool_type,
            uncertainty=uncertainty)
        if mode == 'classification':
            loss: Any = SoftmaxCrossEntropy()
            output_types = ['prediction', 'loss']
        elif uncertainty:
            def loss(outputs, labels, weights):
                y, var, _, log_var = outputs
                losses = jnp.square(labels[0] - y) / jnp.maximum(
                    var, 1e-8) + log_var
                w = weights[0]
                if w.ndim < losses.ndim:
                    w = w[..., None]
                return jnp.sum(losses * w) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(w, losses.shape)), 1e-8)
            output_types = ['prediction', 'variance', 'loss', 'loss']
        else:
            loss = L2Loss()
            output_types = ['prediction']
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    def default_generator(self, dataset, epochs=1, mode='fit',
                          deterministic=True, pad_batches=True):
        from deepchem_tpu.metrics import to_one_hot
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                if self.mode == 'classification' and y_b is not None \
                        and mode == 'fit':
                    y_b = np.stack([to_one_hot(y_b[:, t], self.n_classes)
                                    for t in range(self.n_tasks)], axis=1)
                yield ([X_b], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode


CNNModel = CNN

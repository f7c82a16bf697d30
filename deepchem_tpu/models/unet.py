"""UNet and InceptionV3 image models (reference
deepchem/models/torch_models/unet.py UNetModel and inceptionv3.py
InceptionV3Model)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import BinaryCrossEntropy, L2Loss, \
    SoftmaxCrossEntropy


class _DoubleConv(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.ch, (3, 3), padding='SAME')(x))
        x = nn.relu(nn.Conv(self.ch, (3, 3), padding='SAME')(x))
        return x


class _UNetModule(nn.Module):
    in_channels: int = 3
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        d1 = _DoubleConv(64)(x)
        p1 = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = _DoubleConv(128)(p1)
        p2 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = _DoubleConv(256)(p2)
        p3 = nn.max_pool(d3, (2, 2), strides=(2, 2))
        b = _DoubleConv(512)(p3)
        u3 = nn.ConvTranspose(256, (2, 2), strides=(2, 2))(b)
        u3 = _DoubleConv(256)(jnp.concatenate([u3, d3], axis=-1))
        u2 = nn.ConvTranspose(128, (2, 2), strides=(2, 2))(u3)
        u2 = _DoubleConv(128)(jnp.concatenate([u2, d2], axis=-1))
        u1 = nn.ConvTranspose(64, (2, 2), strides=(2, 2))(u2)
        u1 = _DoubleConv(64)(jnp.concatenate([u1, d1], axis=-1))
        out = nn.Conv(self.out_channels, (1, 1))(u1)
        return nn.sigmoid(out)


class UNetModel(JaxModel):
    """Image segmentation UNet (reference torch_models/unet.py)."""

    def __init__(self, in_channels: int = 3, out_channels: int = 1,
                 batch_size: int = 8, **kwargs):
        module = _UNetModule(in_channels=in_channels,
                             out_channels=out_channels)
        super().__init__(module, BinaryCrossEntropy(),
                         output_types=['prediction'],
                         batch_size=batch_size, **kwargs)
        self.n_tasks = out_channels
        self.mode = 'segmentation'

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode


class _InceptionBlockA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = nn.relu(nn.Conv(64, (1, 1))(x))
        b2 = nn.relu(nn.Conv(48, (1, 1))(x))
        b2 = nn.relu(nn.Conv(64, (5, 5), padding='SAME')(b2))
        b3 = nn.relu(nn.Conv(64, (1, 1))(x))
        b3 = nn.relu(nn.Conv(96, (3, 3), padding='SAME')(b3))
        b3 = nn.relu(nn.Conv(96, (3, 3), padding='SAME')(b3))
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding='SAME')
        b4 = nn.relu(nn.Conv(self.pool_features, (1, 1))(b4))
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _InceptionV3Module(nn.Module):
    n_tasks: int
    n_classes: int
    mode: str

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2))(x))
        x = nn.relu(nn.Conv(32, (3, 3))(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding='SAME')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(80, (1, 1))(x))
        x = nn.relu(nn.Conv(192, (3, 3))(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _InceptionBlockA(32)(x)
        x = _InceptionBlockA(64)(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(x)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(x)


class InceptionV3Model(JaxModel):
    """InceptionV3-style image classifier (reference
    torch_models/inceptionv3.py; stem + inception-A blocks)."""

    def __init__(self, n_tasks: int = 1, n_classes: int = 2,
                 mode: str = 'classification', batch_size: int = 16,
                 **kwargs):
        self.n_tasks = n_tasks
        self.n_classes = n_classes
        self.mode = mode
        module = _InceptionV3Module(n_tasks=n_tasks, n_classes=n_classes,
                                    mode=mode)
        if mode == 'classification':
            loss, output_types = SoftmaxCrossEntropy(), \
                ['prediction', 'loss']
        else:
            loss, output_types = L2Loss(), ['prediction']
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
                yield ([np.asarray(X_b, dtype=np.float32)], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

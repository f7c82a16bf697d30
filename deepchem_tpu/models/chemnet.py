"""ChemNet models: Smiles2Vec and ChemCeption (reference
deepchem/models/chemnet_models.py:33,192 and chemnet_layers.py).

Smiles2Vec: char embedding -> 1D conv -> stacked BiGRU -> heads.
ChemCeption: inception-style 2D CNN over SMILES images.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy


class _BiGRU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(features=self.features))(x)
        bwd = nn.RNN(nn.GRUCell(features=self.features),
                     reverse=True, keep_order=True)(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class _Smiles2VecModule(nn.Module):
    n_tasks: int
    n_classes: int
    char_to_idx_size: int
    embedding_dim: int
    filters: int
    kernel_size: int
    strides: int
    rnn_sizes: Sequence[int]
    use_conv: bool
    mode: str

    @nn.compact
    def __call__(self, tokens, training: bool = False):
        x = nn.Embed(self.char_to_idx_size, self.embedding_dim)(
            tokens.astype(jnp.int32))
        if self.use_conv:
            x = nn.relu(nn.Conv(self.filters,
                                kernel_size=(self.kernel_size,),
                                strides=(self.strides,))(x))
        for size in self.rnn_sizes:
            x = _BiGRU(size)(x)
        x = jnp.mean(x, axis=1)
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(x)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(x)


class Smiles2Vec(JaxModel):
    """(reference chemnet_models.py:33; featurizer SmilesToSeq)"""

    def __init__(self, char_to_idx: Dict[str, int], n_tasks: int = 10,
                 max_seq_len: int = 270, embedding_dim: int = 50,
                 n_classes: int = 2, use_bidir: bool = True,
                 use_conv: bool = True, filters: int = 192,
                 kernel_size: int = 3, strides: int = 1,
                 rnn_sizes: Sequence[int] = (224, 384),
                 mode: str = 'regression', batch_size: int = 100,
                 **kwargs):
        self.char_to_idx = char_to_idx
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        module = _Smiles2VecModule(
            n_tasks=n_tasks, n_classes=n_classes,
            char_to_idx_size=len(char_to_idx) + 1,
            embedding_dim=embedding_dim, filters=filters,
            kernel_size=kernel_size, strides=strides,
            rnn_sizes=tuple(rnn_sizes), use_conv=use_conv, mode=mode)
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
                yield ([np.asarray(X_b, dtype=np.int32)], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode


Smiles2VecModel = Smiles2Vec


class _InceptionBlock(nn.Module):
    """Inception-resnet style block (reference chemnet_layers.py
    InceptionResnetA/B/C simplified to a shared shape)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        b1 = nn.relu(nn.Conv(self.filters, (1, 1))(x))
        b2 = nn.relu(nn.Conv(self.filters, (1, 1))(x))
        b2 = nn.relu(nn.Conv(self.filters, (3, 3), padding='SAME')(b2))
        b3 = nn.relu(nn.Conv(self.filters, (1, 1))(x))
        b3 = nn.relu(nn.Conv(self.filters, (3, 3), padding='SAME')(b3))
        b3 = nn.relu(nn.Conv(self.filters, (3, 3), padding='SAME')(b3))
        mixed = jnp.concatenate([b1, b2, b3], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1))(mixed)
        return nn.relu(x + up)


class _ChemCeptionModule(nn.Module):
    n_tasks: int
    n_classes: int
    base_filters: int
    mode: str

    @nn.compact
    def __call__(self, img, training: bool = False):
        x = jnp.asarray(img, jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        x = nn.relu(nn.Conv(self.base_filters, (4, 4), strides=(2, 2))(x))
        for _ in range(3):
            x = _InceptionBlock(self.base_filters)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for _ in range(3):
            x = _InceptionBlock(self.base_filters * 2)(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(x)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(x)


class ChemCeption(JaxModel):
    """(reference chemnet_models.py:192; featurizer SmilesToImage)"""

    def __init__(self, img_spec: str = 'std', img_size: int = 80,
                 base_filters: int = 16, inception_blocks=None,
                 n_tasks: int = 10, n_classes: int = 2,
                 augment: bool = False, mode: str = 'regression',
                 batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.mode = mode
        self.n_classes = n_classes
        module = _ChemCeptionModule(n_tasks=n_tasks, n_classes=n_classes,
                                    base_filters=base_filters, mode=mode)
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


ChemCeptionModel = ChemCeption

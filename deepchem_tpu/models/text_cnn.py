"""TextCNN over SMILES strings (reference deepchem/models/text_cnn.py:54
TextCNNModel; torch port torch_models/text_cnn.py).

Character embedding -> parallel 1-D convolutions of multiple kernel sizes ->
max-over-time pooling -> highway -> task heads.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset, pad_batch
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy

# reference text_cnn.py default filter spec
DEFAULT_KERNEL_SIZES = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 20]
DEFAULT_NUM_FILTERS = [100, 200, 200, 200, 200, 100, 100, 100, 100, 100,
                       160, 160]


class _Highway(nn.Module):
    """Highway layer (reference models/layers.py:2559)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.relu(nn.Dense(d)(x))
        t = nn.sigmoid(nn.Dense(d, bias_init=nn.initializers.constant(
            -1.0))(x))
        return h * t + x * (1 - t)


class _TextCNNModule(nn.Module):
    n_tasks: int
    n_classes: int
    vocab_size: int
    n_embedding: int
    kernel_sizes: Sequence[int]
    num_filters: Sequence[int]
    dropout: float
    mode: str

    @nn.compact
    def __call__(self, tokens, training: bool = False):
        tokens = tokens.astype(jnp.int32)
        emb = nn.Embed(self.vocab_size, self.n_embedding)(tokens)
        pooled = []
        for ks, nf in zip(self.kernel_sizes, self.num_filters):
            c = nn.Conv(nf, kernel_size=(ks,), padding='SAME')(emb)
            c = nn.relu(c)
            pooled.append(jnp.max(c, axis=1))
        x = jnp.concatenate(pooled, axis=1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.relu(nn.Dense(200)(x))
        x = _Highway()(x)
        if self.mode == 'classification':
            logits = nn.Dense(self.n_tasks * self.n_classes)(x)
            logits = logits.reshape(-1, self.n_tasks, self.n_classes)
            return jax.nn.softmax(logits, -1), logits
        return nn.Dense(self.n_tasks)(x)


class TextCNNModel(JaxModel):
    """SMILES-string CNN (reference text_cnn.py:54).

    Like the reference, ``build_char_dict(dataset)`` derives the vocabulary
    from the dataset ids/X; sequences are clipped/padded to ``seq_length``.
    """

    def __init__(self, n_tasks: int, char_dict: Dict[str, int],
                 seq_length: int, n_embedding: int = 75,
                 kernel_sizes: Sequence[int] = tuple(DEFAULT_KERNEL_SIZES),
                 num_filters: Sequence[int] = tuple(DEFAULT_NUM_FILTERS),
                 dropout: float = 0.25, mode: str = 'classification',
                 n_classes: int = 2, batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.char_dict = dict(char_dict)
        self.seq_length = int(seq_length)
        self.mode = mode
        self.n_classes = n_classes
        module = _TextCNNModule(
            n_tasks=n_tasks, n_classes=n_classes,
            vocab_size=max(char_dict.values()) + 1,
            n_embedding=n_embedding, kernel_sizes=tuple(kernel_sizes),
            num_filters=tuple(num_filters), dropout=dropout, mode=mode)
        if mode == 'classification':
            loss, output_types = SoftmaxCrossEntropy(), \
                ['prediction', 'loss']
        else:
            loss, output_types = L2Loss(), ['prediction']
        super().__init__(module, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    @staticmethod
    def build_char_dict(dataset: Dataset, default_dict: Optional[Dict] =
                        None) -> (dict, int):
        """Vocabulary from dataset SMILES ids (reference
        text_cnn.py:171 build_char_dict)."""
        smiles = [str(s) for s in dataset.ids]
        chars = set()
        for s in smiles:
            chars.update(s)
        char_dict = {'<pad>': 0}
        for c in sorted(chars):
            char_dict[c] = len(char_dict)
        max_len = int(max((len(s) for s in smiles), default=1) * 1.2)
        return char_dict, max_len

    @staticmethod
    def convert_bytes_to_char(s):
        return s

    def smiles_to_seq(self, smiles: str) -> np.ndarray:
        seq = [self.char_dict.get(c, 0) for c in smiles[:self.seq_length]]
        seq += [0] * (self.seq_length - len(seq))
        return np.array(seq, dtype=np.int32)

    def smiles_to_seq_batch(self, ids_b) -> np.ndarray:
        return np.stack([self.smiles_to_seq(str(s)) for s in ids_b])

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                if self.mode == 'classification' and y_b is not None \
                        and mode == 'fit':
                    from deepchem_tpu.metrics import to_one_hot
                    y_b = np.stack([to_one_hot(y_b[:, t], self.n_classes)
                                    for t in range(self.n_tasks)], axis=1)
                # tokens come from the ids (SMILES strings)
                tokens = self.smiles_to_seq_batch(ids_b)
                yield ([tokens], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.mode

"""Progressive multitask networks (reference
deepchem/models/progressive_multitask.py:14,262 and the torch port
torch_models/progressive_multitask.py).

One column of layers per task; task t's layer i receives lateral adapter
connections from the (frozen-by-gradient-stop) activations of tasks < t.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import L2Loss, SoftmaxCrossEntropy


class _ProgressiveModule(nn.Module):
    n_tasks: int
    n_outputs: int             # n_classes for cls, 1 for reg
    layer_sizes: Sequence[int]
    alpha_init_stddev: float
    dropout: float
    classification: bool

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        # per-task columns with lateral connections
        acts = []           # acts[t][i]: activation of task t layer i
        outputs = []
        for t in range(self.n_tasks):
            h = x
            task_acts = []
            for i, size in enumerate(self.layer_sizes):
                z = nn.Dense(size, name=f'task{t}_dense{i}')(h)
                if t > 0 and i > 0:
                    # adapter over previous tasks' layer i-1 activations
                    prev = jnp.concatenate(
                        [jax.lax.stop_gradient(acts[s][i - 1])
                         for s in range(t)], axis=1)
                    alpha = self.param(
                        f'task{t}_alpha{i}',
                        nn.initializers.normal(self.alpha_init_stddev),
                        (1,))
                    a = nn.relu(nn.Dense(
                        size, name=f'task{t}_adapter{i}')(alpha * prev))
                    z = z + nn.Dense(size, use_bias=False,
                                     name=f'task{t}_lateral{i}')(a)
                h = nn.relu(z)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout,
                                   deterministic=not training)(h)
                task_acts.append(h)
            acts.append(task_acts)
            outputs.append(nn.Dense(self.n_outputs,
                                    name=f'task{t}_out')(h))
        out = jnp.stack(outputs, axis=1)     # [B, T, n_outputs]
        if self.classification:
            return jax.nn.softmax(out, -1), out
        return out[:, :, 0]


class ProgressiveMultitaskClassifier(JaxModel):
    """(reference progressive_multitask.py:262)"""

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (1000,),
                 alpha_init_stddevs: float = 0.02,
                 dropouts: float = 0.5, n_classes: int = 2,
                 batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        self.n_classes = n_classes
        if isinstance(alpha_init_stddevs, (list, tuple)):
            alpha_init_stddevs = alpha_init_stddevs[0]
        if isinstance(dropouts, (list, tuple)):
            dropouts = dropouts[0]
        module = _ProgressiveModule(
            n_tasks=n_tasks, n_outputs=n_classes,
            layer_sizes=tuple(layer_sizes),
            alpha_init_stddev=alpha_init_stddevs, dropout=dropouts,
            classification=True)
        super().__init__(module, SoftmaxCrossEntropy(),
                         output_types=['prediction', 'loss'],
                         batch_size=batch_size, **kwargs)

    def default_generator(self, dataset, epochs=1, mode='fit',
                          deterministic=True, pad_batches=True):
        from deepchem_tpu.metrics import to_one_hot
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=pad_batches):
                if y_b is not None and mode == 'fit':
                    y_b = np.stack([to_one_hot(y_b[:, t], self.n_classes)
                                    for t in range(self.n_tasks)], axis=1)
                yield ([X_b], [y_b], [w_b])

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'classification'


class ProgressiveMultitaskRegressor(JaxModel):
    """(reference progressive_multitask.py:14)"""

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (1000,),
                 alpha_init_stddevs: float = 0.02,
                 dropouts: float = 0.5, batch_size: int = 100, **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        if isinstance(alpha_init_stddevs, (list, tuple)):
            alpha_init_stddevs = alpha_init_stddevs[0]
        if isinstance(dropouts, (list, tuple)):
            dropouts = dropouts[0]
        module = _ProgressiveModule(
            n_tasks=n_tasks, n_outputs=1, layer_sizes=tuple(layer_sizes),
            alpha_init_stddev=alpha_init_stddevs, dropout=dropouts,
            classification=False)
        super().__init__(module, L2Loss(), output_types=['prediction'],
                         batch_size=batch_size, **kwargs)

    def fit_task(self, dataset: Dataset, task: int, nb_epoch: int = 10,
                 **kwargs) -> float:
        """Train on a single task (reference progressive_multitask.py:466,
        called by the reference's fit() to train columns sequentially).
        The jitted module keeps every column resident, so single-task
        training is expressed as loss masking: the sample weights of all
        other tasks are zeroed, which stops their gradients exactly —
        lateral alpha connections still read (frozen-by-zero-grad) earlier
        columns, matching the progressive-network recipe."""
        def gen():
            for inputs, labels, weights in self.default_generator(
                    dataset, epochs=nb_epoch, **kwargs):
                w = np.array(weights[0], copy=True)
                if w.ndim > 1 and w.shape[1] == self.n_tasks:
                    mask = np.zeros_like(w)
                    mask[:, task] = 1.0
                    w = w * mask
                yield inputs, labels, [w]
        return self.fit_generator(gen())

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'

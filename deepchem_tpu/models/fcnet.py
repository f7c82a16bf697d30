"""Fully-connected multitask networks (fingerprint MLPs).

Redesign of reference deepchem/models/torch_models/fcnet.py:21
(MultitaskClassifier), :188 (MultitaskRegressor), :396
(MultitaskFitTransformRegressor) and models/robust_multitask.py:15,208 as
flax modules on the single JAX engine.  These are the 'tf'/'tf_robust'
baseline models of BASELINE.md.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models import losses as losses_mod
from deepchem_tpu.models.losses import (SoftmaxCrossEntropy, L2Loss, Loss)


def _activation(name) -> Callable:
    if callable(name):
        return name
    return {'relu': nn.relu, 'tanh': jnp.tanh, 'sigmoid': nn.sigmoid,
            'gelu': nn.gelu, 'elu': nn.elu, 'selu': nn.selu,
            'leaky_relu': nn.leaky_relu,
            'linear': lambda x: x}[str(name).lower()]


class _MLPTrunk(nn.Module):
    """Shared MLP trunk with per-layer dropout.

    With ``residual=True`` the trunk composes PRE-activation residual
    blocks (reference fcnet.py:127-144: y = dense(act(x)) + x whenever
    consecutive widths match, final activation after the loop) — the
    form that trains deep fingerprint MLPs."""
    layer_sizes: Sequence[int]
    dropouts: Sequence[float]
    activation_fns: Sequence[Callable]
    weight_init_stddevs: Sequence[float]
    bias_init_consts: Sequence[float]
    use_kfac: bool = False    # KFACDense curvature probes (models/kfac.py)
    residual: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        dense_cls = _kfac_dense() if self.use_kfac else nn.Dense

        def dense(i, size, h):
            return dense_cls(
                size,
                kernel_init=nn.initializers.truncated_normal(
                    self.weight_init_stddevs[i]),
                bias_init=nn.initializers.constant(
                    self.bias_init_consts[i]))(h)

        if self.residual:
            prev_size = x.shape[-1]
            next_act = None
            for i, size in enumerate(self.layer_sizes):
                y = x if next_act is None else next_act(x)
                y = dense(i, size, y)
                if self.dropouts[i] > 0:
                    y = nn.Dropout(self.dropouts[i],
                                   deterministic=not training)(y)
                if prev_size == size:
                    y = x + y
                x = y
                prev_size = size
                next_act = self.activation_fns[i]
            if next_act is not None:
                x = next_act(x)
            return x
        for i, size in enumerate(self.layer_sizes):
            x = dense(i, size, x)
            x = self.activation_fns[i](x)
            if self.dropouts[i] > 0:
                x = nn.Dropout(self.dropouts[i],
                               deterministic=not training)(x)
        return x


def _kfac_dense():
    from deepchem_tpu.models.kfac import KFACDense
    return KFACDense


def _per_layer(value, n: int) -> List:
    if isinstance(value, (list, tuple)):
        assert len(value) == n
        return list(value)
    return [value] * n


class _MultitaskClassifierModule(nn.Module):
    n_tasks: int
    n_classes: int
    layer_sizes: Sequence[int]
    dropouts: Sequence[float]
    activation_fns: Sequence[Callable]
    weight_init_stddevs: Sequence[float]
    bias_init_consts: Sequence[float]
    use_kfac: bool = False
    residual: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        x = _MLPTrunk(self.layer_sizes, self.dropouts, self.activation_fns,
                      self.weight_init_stddevs, self.bias_init_consts,
                      self.use_kfac, self.residual)(x, training)
        logits = nn.Dense(self.n_tasks * self.n_classes,
                          name='output_head')(x)
        logits = logits.reshape(-1, self.n_tasks, self.n_classes)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, logits


class MultitaskClassifier(JaxModel):
    """ECFP MLP classifier — the 'tf' baseline (reference fcnet.py:21).

    Examples
    --------
    >>> import numpy as np
    >>> from deepchem_tpu.data import NumpyDataset
    >>> from deepchem_tpu.models import MultitaskClassifier
    >>> rng = np.random.RandomState(0)
    >>> X = rng.randn(40, 8).astype(np.float32)
    >>> ds = NumpyDataset(X, (X[:, :1] > 0).astype(np.float32))
    >>> model = MultitaskClassifier(n_tasks=1, n_features=8,
    ...                             layer_sizes=[8], batch_size=10)
    >>> loss = model.fit(ds, nb_epoch=12, checkpoint_interval=0)
    >>> probs = model.predict(ds)
    >>> probs.shape                    # (N, tasks, classes)
    (40, 1, 2)
    >>> bool(np.allclose(probs.sum(axis=-1), 1.0, atol=1e-5))
    True
    """

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (1000,),
                 weight_init_stddevs: Union[float, Sequence[float]] = 0.02,
                 bias_init_consts: Union[float, Sequence[float]] = 1.0,
                 weight_decay_penalty: float = 0.0,
                 weight_decay_penalty_type: str = 'l2',
                 dropouts: Union[float, Sequence[float]] = 0.5,
                 activation_fns: Union[Any, Sequence] = 'relu',
                 n_classes: int = 2, use_kfac: bool = False,
                 residual: bool = False, **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        self.n_classes = n_classes
        n = len(layer_sizes)
        module = _MultitaskClassifierModule(
            n_tasks=n_tasks, n_classes=n_classes,
            layer_sizes=tuple(layer_sizes),
            dropouts=tuple(_per_layer(dropouts, n)),
            activation_fns=tuple(_activation(a)
                                 for a in _per_layer(activation_fns, n)),
            weight_init_stddevs=tuple(_per_layer(weight_init_stddevs, n)),
            bias_init_consts=tuple(_per_layer(bias_init_consts, n)),
            use_kfac=use_kfac, residual=residual)
        loss: Loss = SoftmaxCrossEntropy()
        if weight_decay_penalty != 0.0:
            kwargs.setdefault('regularization_loss',
                              _weight_decay_regularizer(
                                  weight_decay_penalty,
                                  weight_decay_penalty_type))
        super().__init__(module, loss,
                         output_types=['prediction', 'loss'], **kwargs)
        self._head_scopes = ('output_head',)

    def default_generator(self, dataset, epochs=1, mode='fit',
                          deterministic=True, pad_batches=True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=pad_batches):
                if y_b is not None and mode == 'fit':
                    from deepchem_tpu.metrics import to_one_hot
                    y_b = np.stack([
                        to_one_hot(y_b[:, t], self.n_classes)
                        for t in range(self.n_tasks)], axis=1)
                yield ([X_b], [y_b], [w_b])

    def get_num_tasks(self) -> int:
        return self.n_tasks

    def get_task_type(self) -> str:
        return 'classification'


class _MultitaskRegressorModule(nn.Module):
    n_tasks: int
    layer_sizes: Sequence[int]
    dropouts: Sequence[float]
    activation_fns: Sequence[Callable]
    weight_init_stddevs: Sequence[float]
    bias_init_consts: Sequence[float]
    uncertainty: bool = False
    use_kfac: bool = False
    residual: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        x = _MLPTrunk(self.layer_sizes, self.dropouts, self.activation_fns,
                      self.weight_init_stddevs, self.bias_init_consts,
                      self.use_kfac, self.residual)(x, training)
        y = nn.Dense(self.n_tasks, name='output_head')(x)
        if self.uncertainty:
            log_var = nn.Dense(self.n_tasks, name='uncertainty_head')(x)
            var = jnp.exp(log_var)
            return y, var, y, log_var
        return y


class MultitaskRegressor(JaxModel):
    """ECFP MLP regressor — the 'tf_regression' baseline (reference
    fcnet.py:188)."""

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (1000,),
                 weight_init_stddevs: Union[float, Sequence[float]] = 0.02,
                 bias_init_consts: Union[float, Sequence[float]] = 1.0,
                 weight_decay_penalty: float = 0.0,
                 weight_decay_penalty_type: str = 'l2',
                 dropouts: Union[float, Sequence[float]] = 0.5,
                 activation_fns: Union[Any, Sequence] = 'relu',
                 uncertainty: bool = False, use_kfac: bool = False,
                 residual: bool = False, **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        self.uncertainty = uncertainty
        n = len(layer_sizes)
        dropouts_l = _per_layer(dropouts, n)
        if uncertainty and all(d == 0.0 for d in dropouts_l):
            raise ValueError(
                'uncertainty requires dropout on some layer')
        module = _MultitaskRegressorModule(
            n_tasks=n_tasks, layer_sizes=tuple(layer_sizes),
            dropouts=tuple(dropouts_l),
            activation_fns=tuple(_activation(a)
                                 for a in _per_layer(activation_fns, n)),
            weight_init_stddevs=tuple(_per_layer(weight_init_stddevs, n)),
            bias_init_consts=tuple(_per_layer(bias_init_consts, n)),
            uncertainty=uncertainty, use_kfac=use_kfac,
            residual=residual)
        if uncertainty:
            def loss(outputs, labels, weights):
                y, var, _, log_var = outputs
                diff = labels[0] - y
                losses = diff * diff / jnp.maximum(var, 1e-8) + log_var
                w = weights[0]
                if w.ndim < losses.ndim:
                    w = w[..., None]
                return jnp.sum(losses * w) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(w, losses.shape)), 1e-8)
            output_types = ['prediction', 'variance', 'loss', 'loss']
        else:
            loss = L2Loss()
            output_types = ['prediction']
        if weight_decay_penalty != 0.0:
            kwargs.setdefault('regularization_loss',
                              _weight_decay_regularizer(
                                  weight_decay_penalty,
                                  weight_decay_penalty_type))
        super().__init__(module, loss, output_types=output_types, **kwargs)
        self._head_scopes = ('output_head', 'uncertainty_head')

    def get_num_tasks(self) -> int:
        return self.n_tasks

    def get_task_type(self) -> str:
        return 'regression'


class MultitaskFitTransformRegressor(MultitaskRegressor):
    """Regressor that applies fit-transformers to X per batch (reference
    fcnet.py:396)."""

    def __init__(self, n_tasks: int, n_features,
                 fit_transformers: Sequence = (), **kwargs):
        self.fit_transformers = list(fit_transformers)
        if isinstance(n_features, (list, tuple)):
            # reference passes [n_feat, 1] style shapes
            n_features = int(np.prod(n_features))
        # infer transformed feature count from a probe
        if self.fit_transformers:
            probe = np.zeros((2, n_features))
            for t in self.fit_transformers:
                probe, _, _, _ = t.transform_array(probe, None, None, None)
            n_features = probe.shape[1]
        super().__init__(n_tasks, n_features, **kwargs)

    def default_generator(self, dataset, epochs=1, mode='fit',
                          deterministic=True, pad_batches=True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic, pad_batches=pad_batches):
                X_t = np.asarray(X_b, dtype=float)
                if X_t.ndim > 2:
                    X_t = X_t.reshape(len(X_t), -1)
                for t in self.fit_transformers:
                    X_t, _, _, _ = t.transform_array(X_t, None, None, None)
                yield ([X_t], [y_b], [w_b])


def _weight_decay_regularizer(penalty: float, penalty_type: str):
    """L1/L2 parameter penalty over the MLP-trunk Dense kernels, matching
    the reference's ``regularization_loss`` closure (reference fcnet.py:153:
    ``penalty * sum(|w|)`` or ``penalty * sum(w**2)`` over hidden-layer
    weights, biases and output layer excluded)."""
    if penalty_type not in ('l1', 'l2'):
        raise ValueError(
            f'unsupported weight_decay_penalty_type {penalty_type!r}; '
            "expected 'l1' or 'l2'")

    def reg(params):
        total = jnp.zeros(())
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            keys = [getattr(p, 'key', None) for p in path]
            if keys and keys[-1] == 'kernel' \
                    and any(isinstance(k, str) and k.startswith('_MLPTrunk')
                            for k in keys):
                total = total + (jnp.abs(leaf).sum() if penalty_type == 'l1'
                                 else jnp.square(leaf).sum())
        return penalty * total
    return reg


class _RobustMultitaskModule(nn.Module):
    """Shared trunk + per-task bypass heads (reference
    robust_multitask.py:15)."""
    n_tasks: int
    n_outputs_per_task: int
    layer_sizes: Sequence[int]
    bypass_layer_sizes: Sequence[int]
    dropouts: Sequence[float]
    bypass_dropouts: Sequence[float]
    classification: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = jnp.asarray(x, jnp.float32)
        shared = x
        for i, size in enumerate(self.layer_sizes):
            shared = nn.Dense(size, kernel_init=nn.initializers.
                              truncated_normal(0.02))(shared)
            shared = nn.relu(shared)
            if self.dropouts[i] > 0:
                shared = nn.Dropout(self.dropouts[i],
                                    deterministic=not training)(shared)
        outs = []
        for t in range(self.n_tasks):
            bypass = x
            for j, size in enumerate(self.bypass_layer_sizes):
                bypass = nn.Dense(size, kernel_init=nn.initializers.
                                  truncated_normal(0.02))(bypass)
                bypass = nn.relu(bypass)
                if self.bypass_dropouts[j] > 0:
                    bypass = nn.Dropout(
                        self.bypass_dropouts[j],
                        deterministic=not training)(bypass)
            combined = jnp.concatenate([shared, bypass], axis=1)
            outs.append(nn.Dense(self.n_outputs_per_task)(combined))
        out = jnp.stack(outs, axis=1)    # (batch, n_tasks, n_out)
        if self.classification:
            return jax.nn.softmax(out, axis=-1), out
        return out[:, :, 0]


class RobustMultitaskClassifier(JaxModel):
    """(reference robust_multitask.py:15) — the 'tf_robust' baseline."""

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (500,),
                 bypass_layer_sizes: Sequence[int] = (100,),
                 dropouts: Union[float, Sequence[float]] = 0.5,
                 bypass_dropouts: Union[float, Sequence[float]] = 0.5,
                 n_classes: int = 2, **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        self.n_classes = n_classes
        module = _RobustMultitaskModule(
            n_tasks=n_tasks, n_outputs_per_task=n_classes,
            layer_sizes=tuple(layer_sizes),
            bypass_layer_sizes=tuple(bypass_layer_sizes),
            dropouts=tuple(_per_layer(dropouts, len(layer_sizes))),
            bypass_dropouts=tuple(_per_layer(bypass_dropouts,
                                             len(bypass_layer_sizes))),
            classification=True)
        super().__init__(module, SoftmaxCrossEntropy(),
                         output_types=['prediction', 'loss'], **kwargs)

    default_generator = MultitaskClassifier.default_generator

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'classification'


class RobustMultitaskRegressor(JaxModel):
    """(reference robust_multitask.py:208)"""

    def __init__(self, n_tasks: int, n_features: int,
                 layer_sizes: Sequence[int] = (500,),
                 bypass_layer_sizes: Sequence[int] = (100,),
                 dropouts: Union[float, Sequence[float]] = 0.5,
                 bypass_dropouts: Union[float, Sequence[float]] = 0.5,
                 **kwargs):
        self.n_tasks = n_tasks
        self.n_features = n_features
        module = _RobustMultitaskModule(
            n_tasks=n_tasks, n_outputs_per_task=1,
            layer_sizes=tuple(layer_sizes),
            bypass_layer_sizes=tuple(bypass_layer_sizes),
            dropouts=tuple(_per_layer(dropouts, len(layer_sizes))),
            bypass_dropouts=tuple(_per_layer(bypass_dropouts,
                                             len(bypass_layer_sizes))),
            classification=False)
        super().__init__(module, L2Loss(),
                         output_types=['prediction'], **kwargs)

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'

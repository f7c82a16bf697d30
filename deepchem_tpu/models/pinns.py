"""Physics-informed neural networks (reference
deepchem/models/jax_models/pinns_model.py PINNModel).

JAX-native: the PDE residual is expressed directly with jax.grad of the
network inside the loss — no tape machinery.  The user provides
``gradient_fn(forward, inputs) -> residual`` penalized alongside optional
data supervision.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset
from deepchem_tpu.models.jax_model import JaxModel


class _MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = jnp.asarray(x, jnp.float32)
        for s in self.hidden:
            h = jnp.tanh(nn.Dense(s)(h))
        return nn.Dense(self.out_dim)(h)


class PINNModel(JaxModel):
    """(reference pinns_model.py contract: forward_fn + gradient_fn
    physics residual + boundary data).

    Parameters
    ----------
    pde_residual: f(u_fn, x) -> residual array, where u_fn(x) evaluates
        the network at collocation points x (use jax.grad/jacfwd inside).
    physics_weight: weight of the residual term vs the data term.
    """

    def __init__(self, module: Optional[nn.Module] = None,
                 hidden: Sequence[int] = (64, 64),
                 out_dim: int = 1,
                 pde_residual: Optional[Callable] = None,
                 physics_weight: float = 1.0,
                 collocation_points: Optional[np.ndarray] = None,
                 batch_size: int = 128, **kwargs):
        if module is None:
            module = _MLP(hidden=tuple(hidden), out_dim=out_dim)
        self.pde_residual = pde_residual
        self.physics_weight = physics_weight
        self.collocation = (jnp.asarray(collocation_points,
                                        dtype=jnp.float32)
                            if collocation_points is not None else None)
        model_self = self

        def loss_fn(outputs, labels, weights):
            data_loss = 0.0
            if labels and labels[0] is not None:
                w = weights[0] if weights else 1.0
                diff = jnp.square(outputs[0] - labels[0])
                data_loss = jnp.sum(diff * w) / jnp.maximum(
                    jnp.sum(jnp.broadcast_to(w, diff.shape)), 1e-8)
            phys_loss = 0.0
            if model_self.pde_residual is not None and \
                    model_self.collocation is not None:
                def u_fn(x):
                    return model_self.module.apply(
                        model_self._loss_params, x, training=False)
                res = model_self.pde_residual(u_fn,
                                              model_self.collocation)
                phys_loss = jnp.mean(jnp.square(res))
            return data_loss + model_self.physics_weight * phys_loss
        super().__init__(module, loss_fn, output_types=['prediction'],
                         batch_size=batch_size, **kwargs)
        self.n_tasks = out_dim
        self.mode = 'regression'

    # expose current params to the residual closure during tracing
    def _compute_loss(self, outputs, labels, weights):
        return self._loss(outputs, labels, weights)

    def _forward(self, params, inputs, training, rng):
        self._loss_params = params
        return super()._forward(params, inputs, training, rng)

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return 'regression'

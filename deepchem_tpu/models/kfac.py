"""K-FAC: Kronecker-factored approximate curvature optimizer
(reference deepchem/models/torch_models/kfac_optimizer.py:1-490,
Martens & Grosse 2015).

TPU-native design: instead of torch forward/backward hooks, curvature
probes ride flax's functional variable system —

- :class:`KFACDense` sows its INPUT activations into a ``'kfac'``
  collection and adds a zero "perturbation" to its pre-activation output,
  so ``grad(loss, perturbation)`` equals the per-example output gradient.
- The K-FAC train step (``make_kfac_step``) differentiates the loss with
  respect to params AND perturbations in one backward pass, forms the
  Kronecker factors A = E[a aᵀ] (homogeneous coordinate folds the bias in)
  and G = E[g gᵀ], EMA-smooths them, and preconditions each layer's
  gradient by A⁻¹ ∇W G⁻¹ with pi-scaled Tikhonov damping and the
  reference's KL-clip trust region (kfac_optimizer.py kl_clip).
- Everything is one jitted step: the factor solves are small dense
  ``jnp.linalg.solve`` calls that XLA fuses alongside the backward pass.

Parameters not owned by a KFACDense layer fall back to SGD+momentum
(exactly the reference's treatment of non Linear/Conv modules).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from deepchem_tpu.models.optimizers import (Optimizer,
                                            LearningRateSchedule, _lr)


class KFACDense(nn.Module):
    """Dense layer exposing K-FAC curvature probes.

    Drop-in for ``nn.Dense`` inside models that opt into K-FAC: sows input
    activations (collection 'kfac') and perturbs the pre-activation output
    (collection 'perturbations').  Both are inert no-ops during ordinary
    apply/predict calls."""
    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        self.sow('kfac', 'a', x, reduce_fn=lambda prev, new: new)
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=self.kernel_init,
                     bias_init=self.bias_init, name='inner')(x)
        return self.perturb('d', y)


class KFAC(Optimizer):
    """(reference torch_models/kfac_optimizer.py:1 KFACOptimizer).

    Block-diagonal Kronecker-factored natural-gradient preconditioning for
    :class:`KFACDense` layers; SGD+momentum elsewhere.  Used through the
    standard harness: ``MultitaskClassifier(..., use_kfac=True,
    optimizer=KFAC(learning_rate=...))``.
    """

    def __init__(self, learning_rate=0.001, momentum: float = 0.9,
                 stat_decay: float = 0.95, damping: float = 0.001,
                 kl_clip: float = 0.001, weight_decay: float = 0.0):
        super().__init__(learning_rate)
        self.momentum = momentum
        self.stat_decay = stat_decay
        self.damping = damping
        self.kl_clip = kl_clip
        self.weight_decay = weight_decay

    def _create_optax_optimizer(self):
        # fallback transformation (also covers non-KFACDense params)
        chain = []
        if self.weight_decay:
            chain.append(optax.add_decayed_weights(self.weight_decay))
        chain += [optax.trace(decay=self.momentum),
                  optax.scale_by_learning_rate(_lr(self.learning_rate))]
        return optax.chain(*chain)

    def _wrap_opt_state(self, base_state, params, pert):
        """Attach Kronecker-factor EMA state for every perturbed layer."""
        if pert is None:
            return base_state
        factors = {}
        for key, (din, dout) in _kfac_layers(params, pert).items():
            factors[key] = {
                'A': jnp.zeros((din + 1, din + 1), jnp.float32),
                'G': jnp.zeros((dout, dout), jnp.float32),
            }
        return {'base': base_state, 'factors': factors,
                'step': jnp.zeros((), jnp.int32)}


def _path_key(path) -> str:
    return '/'.join(str(getattr(p, 'key', p)) for p in path)


def _kfac_layers(params, pert) -> Dict[str, Tuple[int, int]]:
    """Map layer scope key -> (fan_in, fan_out) for every perturbed
    KFACDense (kernel lives at <scope>/inner/kernel under 'params')."""
    kernels = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _path_key(path)
        if key.endswith('/inner/kernel'):
            scope = key[:-len('/inner/kernel')]
            if scope.startswith('params/'):
                scope = scope[len('params/'):]
            kernels[scope] = (leaf.shape[0], leaf.shape[1])
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(pert)[0]:
        key = _path_key(path)
        if key.endswith('/d'):
            scope = key[:-len('/d')]
            if scope in kernels:
                out[scope] = kernels[scope]
    return out


def make_kfac_step(model):
    """Build the jitted K-FAC train step for a JaxModel whose module
    contains KFACDense layers (model._kfac_pert is the zero perturbation
    pytree captured at build time)."""
    opt: KFAC = model.optimizer
    base = model._optax
    pert0 = model._kfac_pert
    lr_fn = (opt.learning_rate._create_optax_schedule()
             if isinstance(opt.learning_rate, LearningRateSchedule)
             else (lambda t: opt.learning_rate))
    stat_decay = opt.stat_decay
    sqrt_damp = float(np.sqrt(opt.damping))
    kl_clip = opt.kl_clip

    def step(params, opt_state, rng, inputs, labels, weights):
        rngs = {c: jax.random.fold_in(rng, i)
                for i, c in enumerate(model._rng_collections)}

        def loss_fn(p, pert):
            var = dict(p)
            var['perturbations'] = pert
            outputs, mut = model.module.apply(
                var, *inputs, training=True, rngs=rngs, mutable=['kfac'])
            outputs = (list(outputs) if isinstance(outputs, (list, tuple))
                       else [outputs])
            loss = model._compute_loss(outputs, labels, weights)
            if model.regularization_loss is not None:
                loss = loss + model.regularization_loss(p)
            return loss, mut['kfac']

        (loss, acts), (gp, gd) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, pert0)

        factors = opt_state['factors']
        t = opt_state['step'] + 1
        corr = 1.0 - stat_decay ** t.astype(jnp.float32)

        flat_a = {_path_key(p)[:-len('/a')]: v
                  for p, v in jax.tree_util.tree_flatten_with_path(
                      acts)[0] if _path_key(p).endswith('/a')}
        flat_d = {_path_key(p)[:-len('/d')]: v
                  for p, v in jax.tree_util.tree_flatten_with_path(
                      gd)[0] if _path_key(p).endswith('/d')}

        # flatten param grads for in-place preconditioning
        gp_paths, gp_tree = jax.tree_util.tree_flatten_with_path(gp)
        gp_map = {_path_key(p): (i, v)
                  for i, (p, v) in enumerate(gp_paths)}
        gp_leaves = [v for _, v in gp_paths]

        lr = lr_fn(t)
        new_factors = {}
        precond: Dict[str, Tuple] = {}
        vg_sum = jnp.zeros(())
        for scope, fstate in factors.items():
            a = flat_a[scope]
            d = flat_d[scope]
            a = a.reshape(-1, a.shape[-1])
            d = d.reshape(-1, d.shape[-1])
            B = a.shape[0]
            a_ext = jnp.concatenate(
                [a, jnp.ones((B, 1), a.dtype)], axis=1)
            A_new = (a_ext.T @ a_ext) / B
            # loss is a batch mean, so per-example grads are B*d
            G_new = (d.T @ d) * B
            A = stat_decay * fstate['A'] + (1 - stat_decay) * A_new
            G = stat_decay * fstate['G'] + (1 - stat_decay) * G_new
            new_factors[scope] = {'A': A, 'G': G}
            A_hat = A / corr
            G_hat = G / corr
            # pi-scaled Tikhonov damping (Martens & Grosse sec. 6.3)
            pi = jnp.sqrt(
                (jnp.trace(A_hat) / A_hat.shape[0])
                / jnp.maximum(jnp.trace(G_hat) / G_hat.shape[0], 1e-12))
            pi = jnp.clip(pi, 1e-3, 1e3)
            Ad = A_hat + pi * sqrt_damp * jnp.eye(A_hat.shape[0])
            Gd = G_hat + (sqrt_damp / pi) * jnp.eye(G_hat.shape[0])
            kkey = f'params/{scope}/inner/kernel'
            bkey = f'params/{scope}/inner/bias'
            gk = gp_map[kkey][1]
            gb = (gp_map[bkey][1] if bkey in gp_map
                  else jnp.zeros(gk.shape[1], gk.dtype))
            grad_ext = jnp.concatenate([gk, gb[None, :]], axis=0)
            V = jnp.linalg.solve(Ad, grad_ext)
            V = jnp.linalg.solve(Gd, V.T).T
            vg_sum = vg_sum + jnp.sum(V * grad_ext) * lr ** 2
            precond[scope] = (kkey, bkey, V)
        # KL-clip trust region (reference kfac_optimizer.py kl_clip)
        nu = jnp.minimum(
            1.0, jnp.sqrt(kl_clip / jnp.maximum(vg_sum, 1e-12)))
        for scope, (kkey, bkey, V) in precond.items():
            gk_i = gp_map[kkey][0]
            gp_leaves[gk_i] = V[:-1] * nu
            if bkey in gp_map:
                gp_leaves[gp_map[bkey][0]] = V[-1] * nu
        gp2 = jax.tree_util.tree_unflatten(gp_tree, gp_leaves)

        updates, base_state = base.update(gp2, opt_state['base'], params)
        params = optax.apply_updates(params, updates)
        return params, {'base': base_state, 'factors': new_factors,
                        'step': t}, loss

    return jax.jit(step, donate_argnums=(0, 1))

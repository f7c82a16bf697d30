"""Proximal Policy Optimization (reference deepchem/rl/ppo.py:46 PPO: clipped
surrogate objective, multiple optimization epochs per rollout batch).

The reference's thread-pool rollout workers (ppo.py:411) are replaced by
sequential rollouts + one jitted minibatch update.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepchem_tpu.rl.a2c import A2C

logger = logging.getLogger(__name__)


class PPO(A2C):
    """(reference ppo.py:46 contract)"""

    def __init__(self, env, policy, max_rollout_length: int = 20,
                 optimization_rollouts: int = 8,
                 optimization_epochs: int = 4,
                 batch_size: int = 64,
                 clipping_width: float = 0.2,
                 discount_factor: float = 0.99,
                 advantage_lambda: float = 0.98,
                 value_weight: float = 1.0,
                 entropy_weight: float = 0.01,
                 optimizer=None, model_dir: Optional[str] = None,
                 seed: int = 0, use_hindsight: bool = False):
        super().__init__(env, policy, max_rollout_length, discount_factor,
                         advantage_lambda, value_weight, entropy_weight,
                         optimizer, model_dir, seed,
                         use_hindsight=use_hindsight)
        self.optimization_rollouts = optimization_rollouts
        self.optimization_epochs = optimization_epochs
        self.batch_size = batch_size
        self.clipping_width = clipping_width

    def _make_update(self):
        ppo = self

        def update(params, opt_state, states, actions, discounted_rewards,
                   advantages, old_logp):
            def loss_fn(p):
                outputs = ppo._forward(p, states)
                probs = outputs[ppo._policy.output_names.index(
                    'action_prob')]
                values = outputs[ppo._policy.output_names.index(
                    'value')][:, 0]
                logp = jnp.log(jnp.clip(probs, 1e-10, 1.0))
                chosen = jnp.take_along_axis(
                    logp, actions[:, None], axis=1)[:, 0]
                ratio = jnp.exp(chosen - old_logp)
                clipped = jnp.clip(ratio, 1 - ppo.clipping_width,
                                   1 + ppo.clipping_width)
                policy_loss = -jnp.mean(jnp.minimum(
                    ratio * advantages, clipped * advantages))
                value_loss = jnp.mean(
                    jnp.square(discounted_rewards - values))
                entropy = -jnp.mean(jnp.sum(probs * logp, axis=1))
                return (policy_loss + ppo.value_weight * value_loss
                        - ppo.entropy_weight * entropy)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = ppo._optax.update(grads, opt_state,
                                                   params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        return jax.jit(update)

    def fit(self, total_steps: int, max_checkpoints_to_keep: int = 5,
            checkpoint_interval: int = 600,
            restore: bool = False) -> None:
        if restore:
            self.restore()
        self._env.reset()
        if self._params is None:
            self._build(self._env.state)
        if self._update_fn is None:
            self._update_fn = self._make_update()
        steps = 0
        while steps < total_steps:
            all_s, all_a, all_r, all_adv = [], [], [], []
            for _ in range(self.optimization_rollouts):
                s, a, r, adv = self.create_rollout()
                all_s.append(s)
                all_a.append(a)
                all_r.append(r)
                all_adv.append(adv)
                steps += len(s)
                if self.use_hindsight:
                    hs = self.hindsight_rollout(s, a)
                    if hs is not None:
                        all_s.append(hs[0])
                        all_a.append(hs[1])
                        all_r.append(hs[2])
                        all_adv.append(hs[3])
            S = np.concatenate(all_s)
            A = np.concatenate(all_a)
            R = np.concatenate(all_r)
            ADV = np.concatenate(all_adv)
            ADV = (ADV - ADV.mean()) / (ADV.std() + 1e-8)
            # old log-probs frozen before updating
            probs = self.predict(S)[
                self._policy.output_names.index('action_prob')]
            old_logp = np.log(np.clip(
                probs[np.arange(len(A)), A], 1e-10, 1.0))
            n = len(S)
            for _ in range(self.optimization_epochs):
                perm = np.random.permutation(n)
                for start in range(0, n, self.batch_size):
                    idx = perm[start:start + self.batch_size]
                    if len(idx) < 2:
                        continue
                    self._params, self._opt_state, _ = self._update_fn(
                        self._params, self._opt_state,
                        jnp.asarray(S[idx]), jnp.asarray(A[idx]),
                        jnp.asarray(R[idx]), jnp.asarray(ADV[idx]),
                        jnp.asarray(old_logp[idx]))
        self.save_checkpoint(max_checkpoints_to_keep)

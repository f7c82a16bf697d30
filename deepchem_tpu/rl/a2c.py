"""Advantage Actor-Critic (reference deepchem/rl/a2c.py:73 A2C: GAE
advantages, entropy bonus, value loss; torch port rl/torch_rl/torch_a2c.py).

TPU-first: rollouts step the (Python) environment on host; the update is one
jitted step over the whole rollout.  The reference's A3C thread pool
(ppo.py:411-style workers) is replaced by sequential rollouts — JAX's async
dispatch overlaps env stepping with device compute.
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepchem_tpu.rl.core import Environment, Policy
from deepchem_tpu.models.optimizers import Adam

logger = logging.getLogger(__name__)


class A2C:
    """(reference a2c.py:73 contract: fit/predict/select_action/restore)"""

    def __init__(self, env: Environment, policy: Policy,
                 max_rollout_length: int = 20,
                 discount_factor: float = 0.99,
                 advantage_lambda: float = 0.98,
                 value_weight: float = 1.0,
                 entropy_weight: float = 0.01,
                 optimizer=None, model_dir: Optional[str] = None,
                 seed: int = 0, use_hindsight: bool = False):
        self._env = env
        self._policy = policy
        self.max_rollout_length = max_rollout_length
        self.discount_factor = discount_factor
        self.advantage_lambda = advantage_lambda
        self.value_weight = value_weight
        self.entropy_weight = entropy_weight
        self.use_hindsight = use_hindsight
        self.continuous = env.n_actions is None
        if model_dir is None:
            import tempfile
            model_dir = tempfile.mkdtemp()
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir
        self._rng = jax.random.PRNGKey(seed)
        self._module = policy.create_model()
        self._optax = (optimizer or Adam(
            learning_rate=0.001))._create_optax_optimizer()
        self._params = None
        self._opt_state = None
        self._update_fn = None

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _build(self, state) -> None:
        s = jnp.asarray(np.asarray([state], dtype=np.float32))
        self._params = self._module.init({'params': self._next_rng()}, s)
        self._opt_state = self._optax.init(self._params)

    def _forward(self, params, states):
        out = self._module.apply(params, states)
        return out if isinstance(out, (list, tuple)) else [out]

    def _make_update(self):
        a2c = self

        def update(params, opt_state, states, actions, discounted_rewards,
                   advantages):
            def loss_fn(p):
                outputs = a2c._forward(p, states)
                probs = outputs[a2c._policy.output_names.index(
                    'action_prob')]
                values = outputs[a2c._policy.output_names.index(
                    'value')][:, 0]
                logp = jnp.log(jnp.clip(probs, 1e-10, 1.0))
                chosen = jnp.take_along_axis(
                    logp, actions[:, None], axis=1)[:, 0]
                policy_loss = -jnp.mean(chosen * advantages)
                value_loss = jnp.mean(
                    jnp.square(discounted_rewards - values))
                entropy = -jnp.mean(jnp.sum(probs * logp, axis=1))
                return (policy_loss + a2c.value_weight * value_loss
                        - a2c.entropy_weight * entropy)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = a2c._optax.update(grads, opt_state,
                                                   params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        return jax.jit(update)

    def create_rollout(self) -> Tuple[np.ndarray, np.ndarray,
                                      np.ndarray, np.ndarray]:
        """Generate one rollout (reference a2c.py create_rollout)."""
        env = self._env
        states, actions, rewards = [], [], []
        if env.state is None or env.terminated:
            env.reset()
        for _ in range(self.max_rollout_length):
            state = np.asarray(env.state, dtype=np.float32)
            states.append(state)
            probs = self.predict(state[None])[0][0]
            probs = np.clip(np.nan_to_num(probs), 1e-8, 1.0)
            probs = probs / probs.sum()
            action = int(np.random.choice(len(probs), p=probs))
            actions.append(action)
            rewards.append(env.step(action))
            if env.terminated:
                break
        # bootstrap value
        if env.terminated:
            final_value = 0.0
            env.reset()
        else:
            out = self.predict(np.asarray(env.state,
                                          dtype=np.float32)[None])
            final_value = float(out[self._policy.output_names.index(
                'value')][0, 0])
        states_np = np.stack(states)
        values = self.predict(states_np)[
            self._policy.output_names.index('value')][:, 0]
        rewards = np.asarray(rewards, dtype=np.float32)
        discounted, advantages = self._gae(rewards, values, final_value)
        return (states_np, np.asarray(actions, dtype=np.int32),
                discounted, advantages)

    def _gae(self, rewards: np.ndarray, values: np.ndarray,
             final_value: float) -> Tuple[np.ndarray, np.ndarray]:
        """Generalized Advantage Estimation over one rollout."""
        T = len(rewards)
        advantages = np.zeros(T, dtype=np.float32)
        discounted = np.zeros(T, dtype=np.float32)
        next_value = final_value
        gae = 0.0
        ret = final_value
        for t in reversed(range(T)):
            delta = rewards[t] + self.discount_factor * next_value \
                - values[t]
            gae = delta + self.discount_factor * self.advantage_lambda \
                * gae
            advantages[t] = gae
            ret = rewards[t] + self.discount_factor * ret
            discounted[t] = ret
            next_value = values[t]
        return discounted, advantages

    def hindsight_rollout(self, states: np.ndarray, actions: np.ndarray
                          ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                              np.ndarray, np.ndarray]]:
        """Re-label a rollout with its final state as the goal (HER).

        Implements Hindsight Experience Replay (Andrychowicz et al. 2017;
        reference a2c.py:108,253,492): the environment must define
        ``apply_hindsight(states, actions, goal) -> (new_states, rewards)``
        rewriting the rollout as if ``goal`` (here: the last visited state)
        had been the target.  The rewritten rollout necessarily reaches its
        goal, so sparse-reward tasks see a reward signal every update.
        Returns the same 4-tuple as :meth:`create_rollout`, or ``None``
        when the rewritten rollout is empty.
        """
        new_states, rewards = self._env.apply_hindsight(
            list(states), list(np.asarray(actions)), states[-1])
        if len(rewards) == 0:
            return None
        states_np = np.stack(
            [np.asarray(s, dtype=np.float32) for s in new_states])
        states_np = states_np[:len(rewards)]
        values = self.predict(states_np)[
            self._policy.output_names.index('value')][:, 0]
        rewards = np.asarray(rewards, dtype=np.float32)
        # the hindsight rollout terminates at its (achieved) goal
        discounted, advantages = self._gae(rewards, values, 0.0)
        return (states_np,
                np.asarray(actions[:len(rewards)], dtype=np.int32),
                discounted, advantages)

    def fit(self, total_steps: int,
            max_checkpoints_to_keep: int = 5,
            checkpoint_interval: int = 600,
            restore: bool = False) -> None:
        """(reference a2c.py fit)"""
        if restore:
            self.restore()
        self._env.reset()
        if self._params is None:
            self._build(self._env.state)
        if self._update_fn is None:
            self._update_fn = self._make_update()
        steps = 0
        while steps < total_steps:
            states, actions, discounted, advantages = self.create_rollout()
            steps += len(states)
            self._params, self._opt_state, loss = self._update_fn(
                self._params, self._opt_state,
                jnp.asarray(states), jnp.asarray(actions),
                jnp.asarray(discounted), jnp.asarray(advantages))
            if self.use_hindsight:
                hs = self.hindsight_rollout(states, actions)
                if hs is not None:
                    h_s, h_a, h_d, h_adv = hs
                    self._params, self._opt_state, _ = self._update_fn(
                        self._params, self._opt_state,
                        jnp.asarray(h_s), jnp.asarray(h_a),
                        jnp.asarray(h_d), jnp.asarray(h_adv))
        self.save_checkpoint(max_checkpoints_to_keep)

    def predict(self, states: np.ndarray) -> List[np.ndarray]:
        """(reference a2c.py predict)"""
        if self._params is None:
            self._build(states[0])
        outputs = self._forward(self._params, jnp.asarray(
            np.asarray(states, dtype=np.float32)))
        return [np.asarray(o) for o in outputs]

    def select_action(self, state, deterministic: bool = False) -> int:
        """(reference a2c.py select_action)"""
        probs = self.predict(np.asarray(state, dtype=np.float32)[None])[
            self._policy.output_names.index('action_prob')][0]
        if deterministic:
            return int(np.argmax(probs))
        probs = np.clip(np.nan_to_num(probs), 1e-8, 1.0)
        probs = probs / probs.sum()
        return int(np.random.choice(len(probs), p=probs))

    def save_checkpoint(self, max_checkpoints_to_keep: int = 5) -> None:
        with open(os.path.join(self.model_dir, 'rl_checkpoint.pkl'),
                  'wb') as f:
            pickle.dump({'params': jax.tree.map(np.asarray, self._params)},
                        f)

    def get_checkpoints(self) -> List[str]:
        """Paths of saved checkpoints in model_dir (reference a2c.py
        get_checkpoints delegates to the internal harness)."""
        path = os.path.join(self.model_dir, 'rl_checkpoint.pkl')
        return [path] if os.path.exists(path) else []

    def restore(self) -> None:
        path = os.path.join(self.model_dir, 'rl_checkpoint.pkl')
        if not os.path.exists(path):
            raise ValueError('no checkpoint found')
        with open(path, 'rb') as f:
            data = pickle.load(f)
        self._params = jax.tree.map(jnp.asarray, data['params'])
        self._opt_state = self._optax.init(self._params)

"""RL depth: PPO learning + checkpoint/restore + rollout mechanics
(VERDICT r2 item 6 — PPO previously had zero direct tests)."""

import numpy as np
import pytest

import flax.linen as nn


class _BanditEnv:
    def __init__(self, horizon=5):
        self._state = np.ones(2, dtype=np.float32)
        self._terminated = False
        self.state_shape = (2,)
        self.n_actions = 2
        self.action_shape = None
        self.steps = 0
        self.horizon = horizon

    @property
    def state(self):
        return self._state

    @property
    def terminated(self):
        return self._terminated

    def reset(self):
        self._state = np.ones(2, dtype=np.float32)
        self._terminated = False
        self.steps = 0

    def step(self, action):
        self.steps += 1
        if self.steps >= self.horizon:
            self._terminated = True
        return 1.0 if action == 1 else 0.0


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(16)(x))
        return nn.softmax(nn.Dense(2)(h)), nn.Dense(1)(h)


def _policy():
    from deepchem_tpu.rl import Policy

    class BanditPolicy(Policy):
        def __init__(self):
            super().__init__(['action_prob', 'value'])

        def create_model(self, **kwargs):
            return _Net()
    return BanditPolicy()


def test_ppo_learns_bandit():
    from deepchem_tpu.rl import PPO
    np.random.seed(11)
    ppo = PPO(_BanditEnv(), _policy(), max_rollout_length=5,
              optimization_rollouts=4, optimization_epochs=2,
              batch_size=16)
    ppo.fit(400, checkpoint_interval=0)
    probs = ppo.predict(np.ones((1, 2), dtype=np.float32))[0][0]
    assert probs[1] > 0.6


def test_ppo_clipping_width_respected():
    from deepchem_tpu.rl import PPO
    ppo = PPO(_BanditEnv(), _policy(), clipping_width=0.3)
    assert ppo.clipping_width == 0.3
    assert ppo.optimization_epochs == 4        # reference default


def test_a2c_checkpoint_restore(tmp_path):
    from deepchem_tpu.rl import A2C
    np.random.seed(3)
    a2c = A2C(_BanditEnv(), _policy(), max_rollout_length=5,
              model_dir=str(tmp_path))
    a2c.fit(120, checkpoint_interval=60)
    p1 = a2c.predict(np.ones((1, 2), dtype=np.float32))[0][0]
    a2c2 = A2C(_BanditEnv(), _policy(), max_rollout_length=5,
               model_dir=str(tmp_path))
    a2c2.restore()
    p2 = a2c2.predict(np.ones((1, 2), dtype=np.float32))[0][0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5)


def test_a2c_value_prediction_shape():
    from deepchem_tpu.rl import A2C
    a2c = A2C(_BanditEnv(), _policy(), max_rollout_length=5)
    a2c.fit(10, checkpoint_interval=0)
    out = a2c.predict(np.ones((3, 2), dtype=np.float32))
    probs, values = out[0], out[1]
    assert np.asarray(probs).shape == (3, 2)
    assert np.asarray(values).reshape(-1).shape == (3,)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0,
                               rtol=1e-5)

"""RL abstractions (reference deepchem/rl/__init__.py:9 Environment,
:148 GymEnvironment, :178 Policy)."""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np


class Environment:
    """An environment an agent interacts with (reference rl/__init__.py:9).

    Subclasses implement ``step(action)`` and ``reset``; attributes
    ``state``, ``terminated`` are maintained by the subclass.
    """

    def __init__(self, state_shape, n_actions: Optional[int] = None,
                 state_dtype=None, action_shape=None):
        self._state_shape = state_shape
        self._n_actions = n_actions
        self._action_shape = action_shape
        self._state: Any = None
        self._terminated = False
        if state_dtype is None:
            # list-of-shapes states get one dtype per component
            # (reference rl/__init__.py:57)
            if (state_shape and hasattr(state_shape[0], '__len__')
                    and not isinstance(state_shape[0], (str, bytes))):
                self._state_dtype = [np.float32] * len(state_shape)
            else:
                self._state_dtype = np.float32
        else:
            self._state_dtype = state_dtype

    @property
    def state_dtype(self):
        """dtype (or list of dtypes) of the state arrays (reference
        rl/__init__.py:31)."""
        return self._state_dtype

    @property
    def state(self):
        return self._state

    @property
    def terminated(self) -> bool:
        return self._terminated

    @property
    def state_shape(self):
        return self._state_shape

    @property
    def n_actions(self):
        return self._n_actions

    @property
    def action_shape(self):
        return self._action_shape

    def reset(self) -> None:
        raise NotImplementedError

    def step(self, action) -> float:
        raise NotImplementedError


class GymEnvironment(Environment):
    """Wrap an OpenAI Gym environment (reference rl/__init__.py:148)."""

    def __init__(self, name: str):
        import gym
        self.env = gym.make(name)
        self.name = name
        space = self.env.action_space
        if hasattr(space, 'n'):
            super().__init__(self.env.observation_space.shape, space.n)
        else:
            super().__init__(self.env.observation_space.shape,
                             action_shape=space.shape)

    def reset(self) -> None:
        out = self.env.reset()
        self._state = out[0] if isinstance(out, tuple) else out
        self._terminated = False

    def step(self, action) -> float:
        out = self.env.step(action)
        if len(out) == 5:
            state, reward, terminated, truncated, _ = out
            self._terminated = terminated or truncated
        else:
            state, reward, self._terminated, _ = out
        self._state = state
        return float(reward)


class Policy:
    """Maps states to (action_prob, value, ...) outputs (reference
    rl/__init__.py:178).

    Subclasses implement ``create_model(**kwargs) -> flax Module`` whose
    ``__call__(state)`` returns outputs aligned with ``output_names``
    ('action_prob', 'value', and optionally recurrent states).
    """

    def __init__(self, output_names: Sequence[str],
                 rnn_initial_states: Sequence = ()):
        self.output_names = list(output_names)
        self.rnn_initial_states = list(rnn_initial_states)

    def create_model(self, **kwargs):
        raise NotImplementedError

"""Reinforcement learning (reference deepchem/rl/__init__.py:9,148,178
Environment/GymEnvironment/Policy; a2c.py:73; ppo.py:46)."""

from deepchem_tpu.rl.core import Environment, GymEnvironment, Policy
from deepchem_tpu.rl.a2c import A2C
from deepchem_tpu.rl.ppo import PPO
from deepchem_tpu.rl import envs

__all__ = ['Environment', 'GymEnvironment', 'Policy', 'A2C', 'PPO', 'envs']

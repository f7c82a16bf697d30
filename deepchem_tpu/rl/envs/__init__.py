"""Bundled RL environments (reference deepchem/rl/envs/tictactoe.py)."""

from deepchem_tpu.rl.envs.tictactoe import TicTacToeEnvironment

__all__ = ['TicTacToeEnvironment']

"""Tic-tac-toe vs. a random opponent (reference rl/envs/tictactoe.py:7).

The agent plays X on a 3x3 board against a uniformly random O player; the
state is one (3, 3, 2) float32 plane pair (channel 0 = X stones, channel 1 =
O stones) matching this framework's single-array state convention (the
reference wraps the same array in a one-element list).  Reward schedule
follows the reference: illegal move -3 (and the game ends), loss -3, draw
+5, win +10, and +0.1 for every move that does not lose.

Note: the reference's column-win check (`tictactoe.py:84`,
``self._state[0][:][i]``) indexes rows twice — ``a[:][i]`` is ``a[i]`` — so
it never actually detects column wins.  This implementation checks rows,
columns, and both diagonals with one vectorized line-sum table, which is the
intended game, not the reference's accidental behavior.
"""

from __future__ import annotations

import random

import numpy as np

from deepchem_tpu.rl.core import Environment

# (8, 3, 2) index table: rows 0-2, columns 3-5, the two diagonals
_LINES = np.array(
    [[(i, j) for j in range(3)] for i in range(3)] +
    [[(i, j) for i in range(3)] for j in range(3)] +
    [[(0, 0), (1, 1), (2, 2)], [(0, 2), (1, 1), (2, 0)]])


class TicTacToeEnvironment(Environment):
    """Play tic-tac-toe against a randomly acting opponent."""

    X = np.array([1.0, 0.0], dtype=np.float32)
    O = np.array([0.0, 1.0], dtype=np.float32)  # noqa: E741
    EMPTY = np.array([0.0, 0.0], dtype=np.float32)

    ILLEGAL_MOVE_PENALTY = -3.0
    LOSS_PENALTY = -3.0
    NOT_LOSS = 0.1
    DRAW_REWARD = 5.0
    WIN_REWARD = 10.0

    def __init__(self):
        super().__init__((3, 3, 2), 9)
        self.reset()

    def reset(self) -> None:
        self._terminated = False
        self._state = np.zeros((3, 3, 2), dtype=np.float32)
        # randomize who goes first (reference tictactoe.py:34)
        if random.randint(0, 1) == 1:
            r, c = self.get_O_move()
            self._state[r, c] = self.O

    def step(self, action: int) -> float:
        self._state = self._state.copy()
        row, col = divmod(int(action), 3)

        if self._state[row, col].any():           # occupied square
            self._terminated = True
            return self.ILLEGAL_MOVE_PENALTY

        self._state[row, col] = self.X
        if self.check_winner(self.X):
            self._terminated = True
            return self.WIN_REWARD
        if self.game_over():
            self._terminated = True
            return self.DRAW_REWARD

        r, c = self.get_O_move()
        self._state[r, c] = self.O
        if self.check_winner(self.O):
            self._terminated = True
            return self.LOSS_PENALTY
        if self.game_over():
            self._terminated = True
            return self.DRAW_REWARD
        return self.NOT_LOSS

    def get_O_move(self):
        """A uniformly random empty square for the opponent."""
        empty = np.argwhere(~self._state.any(axis=2))
        r, c = empty[random.randrange(len(empty))]
        return int(r), int(c)

    def check_winner(self, player: np.ndarray) -> bool:
        """True if ``player`` owns any full row, column, or diagonal."""
        channel = int(player[1])                  # 0 for X, 1 for O
        board = self._state[..., channel]
        sums = board[_LINES[..., 0], _LINES[..., 1]].sum(axis=1)
        return bool((sums == 3).any())

    def game_over(self) -> bool:
        """True when no empty square remains."""
        return bool(self._state.any(axis=2).all())

    def display(self) -> str:
        out = []
        for row in range(3):
            line = ''
            for col in range(3):
                cell = self._state[row, col]
                line += 'X' if cell[0] else ('O' if cell[1] else '_')
            out.append(line)
        return '\n'.join(out) + '\n'

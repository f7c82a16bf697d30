"""Metropolis-Hastings MCMC sampler for electron positions (reference
deepchem/utils/electron_sampler.py ElectronSampler).

JAX redesign: the whole chain update is one jitted step (propose -> accept)
vmapped over walkers; the reference loops in numpy.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class ElectronSampler:
    """Simultaneous-move MH sampler over electron configurations.

    f(x) must return psi^2 (or any unnormalized density) for a batch of
    configurations x: [batch, n_electrons, 3].
    """

    def __init__(self, central_value: np.ndarray, f: Callable,
                 seed: int = 0, batch_no: int = 10, steps: int = 10,
                 std: float = 0.2):
        self.central_value = np.asarray(central_value, dtype=np.float32)
        self.f = f
        self.batch_no = batch_no
        self.steps = steps
        self.std = std
        self._rng = jax.random.PRNGKey(seed)
        self.x: Optional[jnp.ndarray] = None
        self._step_fn = None

    def _next(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def harmonic_mean(self, y: np.ndarray) -> np.ndarray:
        """Harmonic-mean electron-nucleus distance, used to scale the
        asymmetric proposal stddev (reference electron_sampler.py:112).
        y: [batch, n_elec, 1, 3] -> [batch, n_elec, 1, 1]."""
        diff = np.asarray(y) - self.central_value
        distance = np.linalg.norm(diff, axis=-1, keepdims=True)
        return 1.0 / np.mean(1.0 / distance, axis=-2, keepdims=True)

    @staticmethod
    def log_prob_gaussian(y: np.ndarray, mu: np.ndarray,
                          sigma: np.ndarray) -> np.ndarray:
        """Per-batch gaussian log-density (reference
        electron_sampler.py:130)."""
        y = np.asarray(y)
        sigma = np.broadcast_to(np.asarray(sigma, dtype=float),
                                y.shape[:-1] + (1,))
        numer = np.sum(-0.5 * ((y - mu) ** 2) / (sigma ** 2),
                       axis=(1, 2, 3))
        denom = y.shape[-1] * np.sum(np.log(sigma), axis=(1, 2, 3))
        return numer - denom

    def electron_update(self, lp1: np.ndarray, lp2: np.ndarray,
                        move_prob: np.ndarray, ratio: np.ndarray,
                        x2: np.ndarray) -> np.ndarray:
        """Metropolis accept/reject + state update (reference
        electron_sampler.py:181): accepted batches take the proposed
        configuration and its log-probability."""
        cond = np.asarray(move_prob) < np.asarray(ratio)
        x = np.asarray(self.x)
        self.x = jnp.asarray(np.where(cond[:, None, None], x2, x))
        if not hasattr(self, 'num_accept'):
            self.num_accept = 0
        self.num_accept += int(np.sum(cond))
        return np.where(cond, lp2, lp1)

    def gauss_initialize_position(self, no_sample: np.ndarray,
                                  stddev: float = 0.02) -> jnp.ndarray:
        """Initialize walkers around nuclei (reference
        electron_sampler.py gauss_initialize_position).

        no_sample: per-nucleus electron counts, shape [n_nuclei, 1].
        """
        counts = np.asarray(no_sample).reshape(-1).astype(int)
        centers = np.repeat(self.central_value, counts, axis=0)
        n_elec = centers.shape[0]
        noise = jax.random.normal(
            self._next(), (self.batch_no, n_elec, 3)) * stddev
        self.x = jnp.asarray(centers)[None] + noise
        return self.x

    def _make_step(self):
        f = self.f
        std = self.std

        def one_step(x, rng):
            k1, k2 = jax.random.split(rng)
            prop = x + jax.random.normal(k1, x.shape) * std
            p_old = f(x)
            p_new = f(prop)
            ratio = p_new / jnp.maximum(p_old, 1e-30)
            u = jax.random.uniform(k2, ratio.shape)
            accept = (u < ratio)
            x_new = jnp.where(accept[:, None, None], prop, x)
            return x_new, jnp.mean(accept.astype(jnp.float32))
        return jax.jit(one_step)

    def move(self, stddev: Optional[float] = None) -> float:
        """Run ``steps`` MH updates; returns mean acceptance."""
        if stddev is not None:
            self.std = stddev
            self._step_fn = None
        if self._step_fn is None:
            self._step_fn = self._make_step()
        acc = 0.0
        for _ in range(self.steps):
            self.x, a = self._step_fn(self.x, self._next())
            acc += float(a)
        return acc / self.steps

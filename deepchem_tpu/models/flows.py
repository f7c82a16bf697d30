"""Normalizing flows (reference deepchem/models/torch_models/flows.py:881 LoC
— Affine, MaskedAffineFlow (RealNVP), ActNorm, ClampExp, NormalizingFlow,
NormalizingFlowModel; also models/normalizing_flows.py TF variant).

Flows are flax modules with ``forward(x) -> (z, logdet)`` and
``inverse(z) -> (x, logdet)``; the model trains by maximum likelihood under
a standard-normal base distribution.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.data import Dataset, NumpyDataset
from deepchem_tpu.models.jax_model import JaxModel


class Affine(nn.Module):
    """Learned elementwise affine z = x*exp(s) + t (reference flows.py
    Affine)."""
    dim: int

    @nn.compact
    def __call__(self, x, inverse: bool = False):
        s = self.param('log_scale', nn.initializers.zeros, (self.dim,))
        t = self.param('shift', nn.initializers.zeros, (self.dim,))
        if not inverse:
            z = x * jnp.exp(s) + t
            logdet = jnp.full(x.shape[:1], jnp.sum(s))
            return z, logdet
        xr = (x - t) * jnp.exp(-s)
        return xr, jnp.full(x.shape[:1], -jnp.sum(s))


class ActNorm(nn.Module):
    """Activation normalization (reference flows.py ActNorm; data-dependent
    init approximated by zeros-init)."""
    dim: int

    @nn.compact
    def __call__(self, x, inverse: bool = False):
        s = self.param('log_scale', nn.initializers.zeros, (self.dim,))
        b = self.param('bias', nn.initializers.zeros, (self.dim,))
        if not inverse:
            return x * jnp.exp(s) + b, jnp.full(x.shape[:1], jnp.sum(s))
        return (x - b) * jnp.exp(-s), jnp.full(x.shape[:1], -jnp.sum(s))


class MaskedAffineFlow(nn.Module):
    """RealNVP coupling layer (reference flows.py MaskedAffineFlow and
    torch_models/layers.py:1721 RealNVPLayer)."""
    dim: int
    mask_parity: int = 0
    hidden: int = 64

    def setup(self):
        mask = np.arange(self.dim) % 2 == self.mask_parity
        self._mask = jnp.asarray(mask.astype(np.float32))
        self.s_net = nn.Sequential([
            nn.Dense(self.hidden), nn.relu,
            nn.Dense(self.hidden), nn.relu,
            nn.Dense(self.dim), jnp.tanh])
        self.t_net = nn.Sequential([
            nn.Dense(self.hidden), nn.relu,
            nn.Dense(self.hidden), nn.relu,
            nn.Dense(self.dim)])

    def __call__(self, x, inverse: bool = False):
        m = self._mask
        xm = x * m
        s = self.s_net(xm) * (1 - m)
        t = self.t_net(xm) * (1 - m)
        if not inverse:
            z = xm + (1 - m) * (x * jnp.exp(s) + t)
            return z, jnp.sum(s, axis=-1)
        xr = xm + (1 - m) * ((x - t) * jnp.exp(-s))
        return xr, -jnp.sum(s, axis=-1)


class ClampExp(nn.Module):
    """Clamped exponential nonlinearity flow (reference flows.py
    ClampExp)."""
    clamp: float = 1.0

    @nn.compact
    def __call__(self, x, inverse: bool = False):
        # elementwise monotonic map; logdet = sum log|f'(x)|
        if not inverse:
            z = jnp.minimum(jnp.exp(x), self.clamp * jnp.ones_like(x))
            ld = jnp.sum(jnp.where(jnp.exp(x) < self.clamp, x,
                                   -jnp.inf * 0.0), axis=-1)
            return z, ld
        xr = jnp.log(jnp.clip(x, 1e-12, self.clamp))
        return xr, -jnp.sum(xr, axis=-1)


class NormalizingFlow(nn.Module):
    """A stack of flow layers (reference flows.py NormalizingFlow)."""
    dim: int
    n_layers: int = 4
    hidden: int = 64

    def setup(self):
        self.flows = [MaskedAffineFlow(self.dim, i % 2, self.hidden)
                      for i in range(self.n_layers)]
        self.actnorms = [ActNorm(self.dim) for _ in range(self.n_layers)]

    def forward(self, x):
        logdet = jnp.zeros(x.shape[:1])
        for an, f in zip(self.actnorms, self.flows):
            x, ld = an(x)
            logdet += ld
            x, ld = f(x)
            logdet += ld
        return x, logdet

    def inverse(self, z):
        logdet = jnp.zeros(z.shape[:1])
        for an, f in zip(reversed(self.actnorms), reversed(self.flows)):
            z, ld = f(z, inverse=True)
            logdet += ld
            z, ld = an(z, inverse=True)
            logdet += ld
        return z, logdet

    def __call__(self, x, training: bool = False):
        z, logdet = self.forward(jnp.asarray(x, jnp.float32))
        # negative log likelihood under N(0, I)
        log_prob = -0.5 * jnp.sum(z * z, axis=-1) \
            - 0.5 * self.dim * jnp.log(2 * jnp.pi) + logdet
        return log_prob

    def log_prob(self, x):
        """Log-likelihood of x under the flow (reference torch
        normalizing_flows_pytorch.py NormalizingFlow.log_prob); apply
        with ``module.apply(params, x, method='log_prob')``."""
        return self(x)

    def sample(self, num_samples: int, rng):
        """Draw samples and their log-likelihoods by inverting the flow
        on base-normal draws (reference normalizing_flows_pytorch.py
        NormalizingFlow.sample)."""
        z = jax.random.normal(rng, (num_samples, self.dim))
        base_lp = (-0.5 * jnp.sum(z * z, axis=-1)
                   - 0.5 * self.dim * jnp.log(2 * jnp.pi))
        x, logdet = self.inverse(z)
        return x, base_lp - logdet


class NormalizingFlowModel(JaxModel):
    """Train a flow by maximum likelihood (reference flows.py
    NormalizingFlowModel / normalizing_flows.py:72)."""

    def __init__(self, dim: int, n_layers: int = 4, hidden: int = 64,
                 batch_size: int = 100, **kwargs):
        self.dim = dim
        module = NormalizingFlow(dim=dim, n_layers=n_layers,
                                 hidden=hidden)

        def nll_loss(outputs, labels, weights):
            return -jnp.mean(outputs[0])
        super().__init__(module, nll_loss, output_types=['prediction'],
                         batch_size=batch_size, **kwargs)

    def log_prob(self, X: np.ndarray) -> np.ndarray:
        """Log-likelihood of samples."""
        ds = NumpyDataset(np.asarray(X, dtype=np.float32))
        return self.predict(ds)

    def create_nll(self, input) -> float:
        """Negative log-likelihood of a batch (reference
        normalizing_flows.py:155)."""
        return float(-np.mean(self.log_prob(np.asarray(input))))

    def sample(self, n: int, seed: int = 0) -> np.ndarray:
        """Draw samples by inverting the flow on base-normal draws."""
        if not self._built:
            self.build([jnp.zeros((1, self.dim))])
        z = jax.random.normal(jax.random.PRNGKey(seed), (n, self.dim))
        x, _ = self.module.apply(self.params, z, method='inverse')
        return np.asarray(x)

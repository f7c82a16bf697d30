"""Neural exchange-correlation functionals.

Redesign of reference deepchem/models/dft/nnxc.py:85 (NNLDA), :163 (NNPBE),
:271 (HybridXC): a flax MLP modulates (or mixes with) a classical
functional evaluated on the density grid.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.dft.functionals import lda_xc, pbe_xc


class NNLDA(nn.Module):
    """e_xc(rho) = NN(features(rho)) * e_lda(rho) (reference
    nnxc.py:85)."""
    hidden: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, rho):
        rho = jnp.maximum(rho, 1e-12)
        # scale-invariant input features
        feats = jnp.stack([jnp.log(rho)], axis=-1)
        h = feats
        for s in self.hidden:
            h = nn.tanh(nn.Dense(s)(h))
        mult = 1.0 + nn.Dense(1)(h)[..., 0]
        return mult * lda_xc(rho)


class NNPBE(nn.Module):
    """e_xc(rho, sigma) = NN(rho, s) * e_pbe(rho, sigma) (reference
    nnxc.py:163)."""
    hidden: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, rho, sigma):
        rho = jnp.maximum(rho, 1e-12)
        sigma = jnp.maximum(sigma, 0.0)
        kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
        s = jnp.sqrt(sigma) / jnp.maximum(2.0 * kf * rho, 1e-12)
        feats = jnp.stack([jnp.log(rho), s], axis=-1)
        h = feats
        for sz in self.hidden:
            h = nn.tanh(nn.Dense(sz)(h))
        mult = 1.0 + nn.Dense(1)(h)[..., 0]
        return mult * pbe_xc(rho, sigma)


class HybridXC(nn.Module):
    """a * classical + (1-a) * neural blend (reference nnxc.py:271)."""
    nnxc: nn.Module
    aweight0: float = 0.0

    @nn.compact
    def __call__(self, rho, sigma=None):
        a = nn.sigmoid(self.param(
            'aweight', nn.initializers.constant(self.aweight0), ()))
        classical = lda_xc(rho) if sigma is None else pbe_xc(rho, sigma)
        neural = (self.nnxc(rho) if sigma is None
                  else self.nnxc(rho, sigma))
        return a * classical + (1.0 - a) * neural

"""Autodock Vina scoring terms (reference deepchem/dock/pose_scoring.py:7-203)
implemented with jax.numpy so scoring batches run on TPU (the reference is
plain numpy)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def pairwise_distances(coords1, coords2):
    """(N, 3) x (M, 3) -> (N, M) distances (reference pose_scoring.py:7)."""
    c1 = jnp.asarray(coords1)
    c2 = jnp.asarray(coords2)
    d = c1[:, None, :] - c2[None, :, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))


def cutoff_filter(d, x, cutoff: float = 8.0):
    """Zero out interactions beyond the cutoff (reference :32)."""
    return jnp.where(d < cutoff, x, jnp.zeros_like(x))


def vina_nonlinearity(c, w: float, Nrot: int):
    """g(c) = c / (1 + w*Nrot) (reference :48)."""
    return c / (1 + w * Nrot)


def vina_repulsion(d):
    """d^2 for d < 0 else 0 (reference :67)."""
    return jnp.where(d < 0, d * d, jnp.zeros_like(d))


def vina_hydrophobic(d):
    """Piecewise linear 1.5->0 (reference :85)."""
    return jnp.where(d < 0.5, jnp.ones_like(d),
                     jnp.where(d < 1.5, 1.5 - d, jnp.zeros_like(d)))


def vina_hbond(d):
    """Piecewise linear -0.7->0 (reference :105)."""
    return jnp.where(d < -0.7, jnp.ones_like(d),
                     jnp.where(d < 0, -d / 0.7, jnp.zeros_like(d)))


def vina_gaussian_first(d):
    """exp(-(d/0.5)^2) (reference :125)."""
    return jnp.exp(-jnp.square(d / 0.5))


def vina_gaussian_second(d):
    """exp(-((d-3)/2)^2) (reference :145)."""
    return jnp.exp(-jnp.square((d - 3.0) / 2.0))


def vina_gaussian(d, offset: float = 0.0, width: float = 0.5):
    return jnp.exp(-jnp.square((d - offset) / width))


def vina_energy_term(coords1, coords2, weights, wrot: float,
                     Nrot: int) -> float:
    """Full Vina free-energy estimate (reference :165 vina_energy_term).

    weights: 5 term coefficients [gauss1, gauss2, repulsion, hydrophobic,
    hbond].
    """
    d = pairwise_distances(coords1, coords2)
    terms = (weights[0] * vina_gaussian_first(d)
             + weights[1] * vina_gaussian_second(d)
             + weights[2] * vina_repulsion(d)
             + weights[3] * vina_hydrophobic(d)
             + weights[4] * vina_hbond(d))
    c = jnp.sum(cutoff_filter(d, terms))
    return vina_nonlinearity(c, wrot, Nrot)

"""Numerically-safe operations (reference deepchem/utils/safeops_utils.py:
safe pow/norm/division/exp for the DFT stack) in jax.numpy."""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def safepow(a, p, eps: float = EPS):
    """(reference safeops_utils.safepow) pow with clamped base."""
    return jnp.power(jnp.maximum(a, eps), p)


def safenorm(a, axis=-1, eps: float = EPS):
    """Norm with gradient-safe sqrt (reference safeops_utils.safenorm)."""
    return jnp.sqrt(jnp.sum(a * a, axis=axis) + eps)


def safenormalize(a, axis=-1, eps: float = EPS):
    """(reference safeops_utils.safenormalize)"""
    return a / safenorm(a, axis=axis, eps=eps)[..., None]


def safediv(num, denom, eps: float = EPS):
    return num / jnp.where(jnp.abs(denom) > eps, denom,
                           jnp.sign(denom) * eps + (denom == 0) * eps)


def safe_exp(x, clip: float = 60.0):
    return jnp.exp(jnp.clip(x, -clip, clip))


def occnumber(a, n: int):
    """Occupation numbers summing to ``a`` over n orbitals (reference
    safeops_utils.occnumber)."""
    import numpy as np
    floor = int(a)
    occ = np.ones(n)
    occ[floor:] = 0.0
    if floor < n:
        occ[floor] = a - floor
    return jnp.asarray(occ)

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


def get_floor_and_ceil(aa):
    """(floor, ceil) pair of a float (reference
    safeops_utils.get_floor_and_ceil:256).

    >>> get_floor_and_ceil(2.5)
    (2, 3)
    """
    import math
    return (int(math.floor(aa)), int(math.ceil(aa)))


def safe_cdist(a, b, add_diag_eps: bool = False,
               diag_inf: bool = False, eps: float = EPS):
    """Pairwise L2 distances with a differentiation-safe zero guard
    (reference safeops_utils.safe_cdist:287): an epsilon is added on
    the diagonal (``add_diag_eps``) so the gradient at coincident
    points is finite; ``diag_inf`` sets the diagonal to +inf for
    neighbor searches.  a: (*, nr, nd), b: (*, nc, nd)."""
    d2 = jnp.sum(jnp.square(a[..., :, None, :] - b[..., None, :, :]),
                 axis=-1)
    if add_diag_eps:
        n = min(d2.shape[-2], d2.shape[-1])
        eye = jnp.zeros(d2.shape).at[..., jnp.arange(n),
                                     jnp.arange(n)].set(eps)
        d2 = d2 + eye
    d = jnp.sqrt(jnp.maximum(d2, eps * eps))
    if diag_inf:
        n = min(d.shape[-2], d.shape[-1])
        d = d.at[..., jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    return d


def safedenom(r, eps: float):
    """Replace zero elements with eps to avoid division by zero —
    used in CG/BiCGStab (reference safeops_utils.py:352)."""
    import jax.numpy as jnp
    r = jnp.asarray(r)
    return jnp.where(r == 0, jnp.asarray(eps, r.dtype), r)

"""SO(3) equivariance helpers (reference deepchem/utils/
equivariance_utils.py: spherical harmonics, Wigner-D, irrep utilities) in
jax.numpy.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def su2_generators(k: int) -> jnp.ndarray:
    """Generators of SU(2) in the (2k+1)-dim irrep (reference
    equivariance_utils.su2_generators)."""
    m = jnp.arange(-k, k)
    raising = jnp.diag(-jnp.sqrt(k * (k + 1) - m * (m + 1)), k=-1)
    m = jnp.arange(-k + 1, k + 1)
    lowering = jnp.diag(jnp.sqrt(k * (k + 1) - m * (m - 1)), k=1)
    m = jnp.arange(-k, k + 1)
    return jnp.stack([
        0.5 * (raising + lowering),
        jnp.diag(1j * m),
        -0.5j * (raising - lowering),
    ], axis=0)


def so3_generators(k: int) -> jnp.ndarray:
    """Real SO(3) generators via change of basis (reference
    equivariance_utils.so3_generators)."""
    X = su2_generators(k)
    Q = change_basis_real_to_complex(k)
    return jnp.real(jnp.einsum('ij,ajk,kl->ail', jnp.conj(Q.T), X, Q))


def change_basis_real_to_complex(k: int) -> jnp.ndarray:
    """(reference equivariance_utils.change_basis_real_to_complex)"""
    q = np.zeros((2 * k + 1, 2 * k + 1), dtype=np.complex128)
    for m in range(-k, 0):
        q[k + m, k + abs(m)] = 1 / np.sqrt(2)
        q[k + m, k - abs(m)] = -1j / np.sqrt(2)
    q[k, k] = 1
    for m in range(1, k + 1):
        q[k + m, k + abs(m)] = (-1) ** m / np.sqrt(2)
        q[k + m, k - abs(m)] = 1j * (-1) ** m / np.sqrt(2)
    return jnp.asarray((-1j) ** k * q)


def wigner_D(k: int, alpha, beta, gamma) -> jnp.ndarray:
    """Wigner-D matrix for ZYZ Euler angles (reference
    equivariance_utils.wigner_D)."""
    X = so3_generators(k)

    def expm(t, gen):
        return jax.scipy.linalg.expm(t * gen)
    return expm(jnp.asarray(alpha), X[1]) @ \
        expm(jnp.asarray(beta), X[0]) @ \
        expm(jnp.asarray(gamma), X[1])


def _legendre(l: int, m: int, x):
    """Associated Legendre P_l^m via recurrence (jax-friendly)."""
    pmm = jnp.ones_like(x)
    if m > 0:
        somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
        fact = 1.0
        for _ in range(m):
            pmm = -pmm * fact * somx2
            fact += 2.0
    if l == m:
        return pmm
    pmmp1 = x * (2 * m + 1) * pmm
    if l == m + 1:
        return pmmp1
    pll = pmmp1
    for ll in range(m + 2, l + 1):
        pll = ((2 * ll - 1) * x * pmmp1 - (ll + m - 1) * pmm) / (ll - m)
        pmm = pmmp1
        pmmp1 = pll
    return pll


def real_spherical_harmonics(l: int, xyz: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics Y_l^m for unit vectors xyz [N, 3] ->
    [N, 2l+1] (reference equivariance_utils spherical harmonic stack)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    ct = z / r
    phi = jnp.arctan2(y, x)
    out = []
    for m in range(-l, l + 1):
        am = abs(m)
        norm = math.sqrt((2 * l + 1) / (4 * math.pi) *
                         math.factorial(l - am) /
                         math.factorial(l + am))
        p = _legendre(l, am, ct)
        if m < 0:
            out.append(math.sqrt(2) * norm * p * jnp.sin(am * phi))
        elif m == 0:
            out.append(norm * p)
        else:
            out.append(math.sqrt(2) * norm * p * jnp.cos(am * phi))
    return jnp.stack(out, axis=-1)


def commutator(A, B):
    """[A, B] = AB - BA (reference equivariance_utils.py:341)."""
    import jax.numpy as jnp
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    return A @ B - B @ A

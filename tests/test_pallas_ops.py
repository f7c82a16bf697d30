"""Pallas kernel correctness vs XLA oracle (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepchem_tpu.ops.pallas_segment import (csr_segment_sum, edges_to_csr,
                                             fused_gather_segment_sum,
                                             csr_neighbor_sum_reference)
from deepchem_tpu.ops import gather_neighbors_sum


def _random_graph(n_nodes=32, n_edges=96, f=16, seed=0):
    rng = np.random.RandomState(seed)
    h = rng.rand(n_nodes, f).astype(np.float32)
    src = rng.randint(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.randint(0, n_nodes, n_edges).astype(np.int32)
    return h, src, dst


def test_edges_to_csr_roundtrip():
    _, src, dst = _random_graph()
    perm, row_ptr = edges_to_csr(dst, 32)
    sorted_dst = dst[perm]
    assert (np.diff(sorted_dst) >= 0).all()
    assert row_ptr[0] == 0 and row_ptr[-1] == len(dst)
    for i in range(32):
        assert row_ptr[i + 1] - row_ptr[i] == (dst == i).sum()


def test_csr_segment_sum_interpret():
    h, src, dst = _random_graph()
    perm, row_ptr = edges_to_csr(dst, 32)
    msgs = h[src][perm]
    out = csr_segment_sum(jnp.asarray(msgs), jnp.asarray(row_ptr), 32,
                          block_nodes=8, interpret=True)
    expected = gather_neighbors_sum(jnp.asarray(h), jnp.asarray(src),
                                    jnp.asarray(dst))
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_fused_gather_segment_sum_interpret():
    h, src, dst = _random_graph(n_nodes=64, n_edges=200, f=32, seed=1)
    perm, row_ptr = edges_to_csr(dst, 64)
    out = fused_gather_segment_sum(
        jnp.asarray(h), jnp.asarray(src[perm]), jnp.asarray(row_ptr), 64,
        block_nodes=8, interpret=True)
    expected = gather_neighbors_sum(jnp.asarray(h), jnp.asarray(src),
                                    jnp.asarray(dst))
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_csr_reference_oracle_agrees():
    h, src, dst = _random_graph(seed=2)
    perm, row_ptr = edges_to_csr(dst, 32)
    ref = csr_neighbor_sum_reference(jnp.asarray(h),
                                     jnp.asarray(src[perm]),
                                     jnp.asarray(row_ptr), 32)
    expected = gather_neighbors_sum(jnp.asarray(h), jnp.asarray(src),
                                    jnp.asarray(dst))
    assert np.allclose(np.asarray(ref), np.asarray(expected), atol=1e-5)


def test_empty_segments():
    # nodes with no incoming edges must produce zeros
    h = np.ones((16, 8), dtype=np.float32)
    dst = np.array([3, 3, 7], dtype=np.int32)
    src = np.array([0, 1, 2], dtype=np.int32)
    perm, row_ptr = edges_to_csr(dst, 16)
    out = np.asarray(fused_gather_segment_sum(
        jnp.asarray(h), jnp.asarray(src[perm]), jnp.asarray(row_ptr), 16,
        block_nodes=8, interpret=True))
    assert np.allclose(out[3], 2.0)
    assert np.allclose(out[7], 1.0)
    assert np.allclose(out[0], 0.0)
    assert np.allclose(out[15], 0.0)


def test_segment_max_sumgrad_matches_forward_and_grad():
    """segment_max_sumgrad must equal segment_max forward, and its grad
    must match the autodiff grad of the plain formulation (on CPU, where
    both are trustworthy)."""
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.ops import segment_max_sumgrad
    rng = np.random.RandomState(3)
    data = rng.rand(40, 6).astype(np.float32)
    seg = rng.randint(0, 10, 40).astype(np.int32)
    mask = (rng.rand(40) > 0.2).astype(np.float32)

    out = segment_max_sumgrad(jnp.asarray(data), jnp.asarray(seg), 10,
                              mask=jnp.asarray(mask))
    # plain oracle
    d = np.where(mask[:, None] > 0, data, -np.inf)
    expected = np.full((10, 6), -np.inf, dtype=np.float32)
    np.maximum.at(expected, seg, d)
    expected = np.where(np.isfinite(expected), expected, 0.0)
    assert np.allclose(np.asarray(out), expected, atol=1e-5)

    def f_new(x):
        return jnp.sum(jnp.tanh(segment_max_sumgrad(
            x, jnp.asarray(seg), 10, mask=jnp.asarray(mask))))

    def f_old(x):
        dd = jnp.where(jnp.asarray(mask)[:, None] > 0, x, -9e15)
        m = jax.ops.segment_max(dd, jnp.asarray(seg), num_segments=10)
        m = jnp.where(jnp.isfinite(m) & (m > -4.5e15), m, 0.0)
        return jnp.sum(jnp.tanh(m))

    g_new = np.asarray(jax.grad(f_new)(jnp.asarray(data)))
    g_old = np.asarray(jax.grad(f_old)(jnp.asarray(data)))
    assert np.allclose(g_new, g_old, atol=1e-4)

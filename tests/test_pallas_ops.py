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


class TestNeighborTableOps:
    """ops/nei_table.py vs the COO segment oracle: forward AND grad
    must match exactly on undirected molecular-style graphs."""

    def _random_graph(self, seed=0, n=50, extra=60, max_nb=10):
        import numpy as np
        rng = np.random.RandomState(seed)
        # undirected simple graph over nodes 1..n-1 (0 = ghost row)
        edges = set()
        for _ in range(extra):
            a, b = rng.randint(1, n, 2)
            if a != b and (a, b) not in edges and \
                    (b, a) not in edges and \
                    len([e for e in edges if a in e]) < max_nb - 1 and \
                    len([e for e in edges if b in e]) < max_nb - 1:
                edges.add((a, b))
        src, dst = [], []
        for a, b in edges:
            src += [a, b]
            dst += [b, a]
        return (np.array(src, np.int32), np.array(dst, np.int32), n)

    def test_nei_sum_matches_coo(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from deepchem_tpu.ops.nei_table import (build_neighbor_table,
                                                nei_sum)
        src, dst, n = self._random_graph()
        table, nbr_mask = build_neighbor_table(src, dst, n)
        rng = np.random.RandomState(1)
        h = rng.rand(n, 7).astype(np.float32)
        mask = np.ones((n, 1), np.float32)
        mask[0] = 0.0

        def f_table(h):
            return jnp.sum(jnp.sin(
                nei_sum(h * mask, jnp.asarray(table),
                        jnp.asarray(nbr_mask)) * mask) ** 2)

        def f_coo(h):
            agg = jax.ops.segment_sum(
                jnp.take(h * mask, src, axis=0), jnp.asarray(dst),
                num_segments=n)
            return jnp.sum(jnp.sin(agg * mask) ** 2)
        np.testing.assert_allclose(f_table(jnp.asarray(h)),
                                   f_coo(jnp.asarray(h)), rtol=1e-6)
        g1 = jax.grad(f_table)(jnp.asarray(h))
        g2 = jax.grad(f_coo)(jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

    def test_nei_max_incl_self_matches_coo(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from deepchem_tpu.ops.nei_table import (build_neighbor_table,
                                                nei_max_incl_self)
        from deepchem_tpu.ops import segment_max_sumgrad  # noqa: F401
        src, dst, n = self._random_graph(seed=3)
        table, nbr_mask = build_neighbor_table(src, dst, n)
        rng = np.random.RandomState(2)
        h = rng.rand(n, 5).astype(np.float32)
        h[0] = 0.0
        mask = np.ones((n, 1), np.float32)
        mask[0] = 0.0

        def f_table(h):
            out = nei_max_incl_self(h * mask, jnp.asarray(table),
                                    jnp.asarray(nbr_mask))
            return jnp.sum(jnp.cos(out * mask))

        def f_coo(h):
            hm = h * mask
            cand = jnp.take(hm, src, axis=0)
            agg = jax.ops.segment_max(cand, jnp.asarray(dst),
                                      num_segments=n)
            agg = jnp.where(jnp.isfinite(agg), agg, -9e15)
            out = jnp.maximum(hm, agg)
            return jnp.sum(jnp.cos(out * mask))
        np.testing.assert_allclose(f_table(jnp.asarray(h)),
                                   f_coo(jnp.asarray(h)), rtol=1e-6)
        g1 = jax.grad(f_table)(jnp.asarray(h))
        g2 = jax.grad(f_coo)(jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

    def test_nei_gather_grad_matches_plain_take(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from deepchem_tpu.ops.nei_table import (build_neighbor_table,
                                                build_rev_slot,
                                                nei_gather)
        src, dst, n = self._random_graph(seed=7)
        table, nbr_mask = build_neighbor_table(src, dst, n)
        rev_slot = build_rev_slot(table, nbr_mask)
        # reverse-slot consistency: table[table[i,j], rev_slot[i,j]] == i
        for i in range(n):
            for j in range(table.shape[1]):
                if nbr_mask[i, j] > 0:
                    assert table[table[i, j], rev_slot[i, j]] == i
        rng = np.random.RandomState(5)
        h = rng.rand(n, 6).astype(np.float32)
        t, rs, m = (jnp.asarray(table), jnp.asarray(rev_slot),
                    jnp.asarray(nbr_mask))
        w = jnp.asarray(rng.rand(n, table.shape[1], 6).astype(np.float32))

        def f_custom(h):
            return jnp.sum(jnp.sin(nei_gather(h, t, rs, m) * w))

        def f_plain(h):
            out = jnp.take(h, t, axis=0) * m[..., None]
            return jnp.sum(jnp.sin(out * w))
        np.testing.assert_allclose(f_custom(jnp.asarray(h)),
                                   f_plain(jnp.asarray(h)), rtol=1e-6)
        g1 = jax.grad(f_custom)(jnp.asarray(h))
        g2 = jax.grad(f_plain)(jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

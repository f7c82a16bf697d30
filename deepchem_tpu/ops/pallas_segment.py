"""Pallas TPU kernels for the graph message-passing hot path.

The graph models' inner loop is gather(h, src) -> segment_sum by dst
(reference GraphConv semantics, deepchem/models/layers.py:202; outsourced to
TF unsorted_segment ops / DGL CUDA kernels in the reference).  XLA lowers
this to gather + scatter-add; these kernels instead consume a CSR layout
(edges sorted by destination + row pointers) so the reduction is a purely
sequential accumulation per node — no scatter conflicts, VMEM-resident
accumulator, one pass over the edge array.

The XLA implementations in deepchem_tpu/ops/segment.py remain the
correctness oracle; kernels are validated against them in
tests/test_pallas_ops.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def edges_to_csr(edge_dst: np.ndarray, num_nodes: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: sort edge ids by destination; return (perm, row_ptr).

    ``perm`` reorders edge-parallel arrays into CSR order; ``row_ptr`` has
    num_nodes+1 entries.  Computed once per padded batch in the data
    pipeline (cheap, numpy).
    """
    edge_dst = np.asarray(edge_dst)
    perm = np.argsort(edge_dst, kind='stable').astype(np.int32)
    counts = np.bincount(edge_dst, minlength=num_nodes)
    row_ptr = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(counts[:num_nodes], out=row_ptr[1:])
    return perm, row_ptr


def _csr_segment_sum_kernel(row_ptr_ref, msgs_ref, out_ref):
    """One grid step handles a block of BN nodes; for each node accumulate
    its CSR edge range from the (sorted) message array."""
    i = pl.program_id(0)
    bn = out_ref.shape[0]

    def node_body(k, _):
        node = i * bn + k
        start = row_ptr_ref[node]
        end = row_ptr_ref[node + 1]

        def edge_body(e, acc):
            return acc + msgs_ref[e, :]
        acc0 = jnp.zeros((msgs_ref.shape[1],), dtype=out_ref.dtype)
        acc = jax.lax.fori_loop(start, end, edge_body, acc0)
        out_ref[k, :] = acc
        return 0
    jax.lax.fori_loop(0, bn, node_body, 0)


@functools.partial(jax.jit, static_argnames=('num_nodes', 'block_nodes',
                                             'interpret'))
def csr_segment_sum(msgs: jnp.ndarray, row_ptr: jnp.ndarray,
                    num_nodes: int, block_nodes: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """segment_sum of CSR-sorted messages.

    msgs: [E, F] float32, already permuted into CSR (dst-sorted) order.
    row_ptr: [num_nodes+1] int32.
    Returns [num_nodes, F].
    """
    E, F = msgs.shape
    bn = block_nodes
    assert num_nodes % bn == 0, 'num_nodes must be divisible by block'
    grid = (num_nodes // bn,)
    return pl.pallas_call(
        _csr_segment_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, F), msgs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bn, F), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(row_ptr, msgs)


def _fused_gather_segment_kernel(row_ptr_ref, src_ref, h_ref, out_ref):
    """Fused gather+reduce: for each node, sum h[src[e]] over its CSR edge
    range — the message array is never materialized."""
    i = pl.program_id(0)
    bn = out_ref.shape[0]

    def node_body(k, _):
        node = i * bn + k
        start = row_ptr_ref[node]
        end = row_ptr_ref[node + 1]

        def edge_body(e, acc):
            s = src_ref[e]
            return acc + h_ref[s, :]
        acc0 = jnp.zeros((h_ref.shape[1],), dtype=out_ref.dtype)
        acc = jax.lax.fori_loop(start, end, edge_body, acc0)
        out_ref[k, :] = acc
        return 0
    jax.lax.fori_loop(0, bn, node_body, 0)


@functools.partial(jax.jit, static_argnames=('num_nodes', 'block_nodes',
                                             'interpret'))
def fused_gather_segment_sum(node_feats: jnp.ndarray,
                             edge_src_sorted: jnp.ndarray,
                             row_ptr: jnp.ndarray, num_nodes: int,
                             block_nodes: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """sum_{j in N(i)} h[j] with edges pre-sorted by destination.

    node_feats: [N, F]; edge_src_sorted: [E] int32 (CSR order);
    row_ptr: [N+1] int32.  Returns [num_nodes, F].
    """
    N, F = node_feats.shape
    bn = block_nodes
    assert num_nodes % bn == 0
    grid = (num_nodes // bn,)
    return pl.pallas_call(
        _fused_gather_segment_kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, F), node_feats.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,     # row_ptr and src indices
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bn, F), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(row_ptr, edge_src_sorted, node_feats)


def csr_neighbor_sum_reference(node_feats, edge_src_sorted, row_ptr,
                               num_nodes):
    """Pure-XLA oracle with identical CSR inputs."""
    msgs = jnp.take(node_feats, edge_src_sorted, axis=0)
    seg_ids = jnp.searchsorted(
        row_ptr[1:], jnp.arange(msgs.shape[0]), side='right')
    return jax.ops.segment_sum(msgs, seg_ids, num_segments=num_nodes)


# ----------------------------------------------------------- softmax

def _csr_segment_softmax_kernel(row_ptr_ref, logits_ref, out_ref):
    """Fused per-segment softmax over CSR edge ranges: max, sum-exp, and
    normalized write in one kernel — replaces XLA's scatter-max + gather
    + scatter-add + gather chain (SURVEY §7 segment-softmax; consumed by
    GAT/AttentiveFP/PAGTN attention, reference DGL edge_softmax)."""
    i = pl.program_id(0)
    block = _SOFTMAX_BLOCK_NODES
    H = logits_ref.shape[1]

    def node_body(k, _):
        node = i * block + k
        start = row_ptr_ref[node]
        end = row_ptr_ref[node + 1]

        def max_body(e, m):
            return jnp.maximum(m, logits_ref[e, :])
        m = jax.lax.fori_loop(start, end, max_body,
                              jnp.full((H,), -jnp.inf,
                                       dtype=logits_ref.dtype))
        m = jnp.where(jnp.isfinite(m), m, 0.0)

        def sum_body(e, s):
            return s + jnp.exp(logits_ref[e, :] - m)
        s = jax.lax.fori_loop(start, end, sum_body,
                              jnp.zeros((H,), dtype=logits_ref.dtype))
        s = jnp.maximum(s, 1e-16)

        def write_body(e, _):
            out_ref[e, :] = jnp.exp(logits_ref[e, :] - m) / s
            return 0
        jax.lax.fori_loop(start, end, write_body, 0)
        return 0
    jax.lax.fori_loop(0, block, node_body, 0)


_SOFTMAX_BLOCK_NODES = 8


@functools.partial(jax.jit, static_argnames=('num_nodes', 'interpret'))
def _csr_segment_softmax_impl(logits: jnp.ndarray, row_ptr: jnp.ndarray,
                              num_nodes: int,
                              interpret: bool = False) -> jnp.ndarray:
    E, H = logits.shape
    bn = _SOFTMAX_BLOCK_NODES
    assert num_nodes % bn == 0, 'num_nodes must be divisible by 8'
    # the output is written at dynamic per-node offsets, so it stays an
    # unblocked VMEM array; the sequential TPU grid makes the disjoint
    # range writes safe.  Rows not covered by any node range (dst >=
    # num_nodes) are zero-initialized below via input_output_aliasing of
    # a zeros array — simpler: require row_ptr[num_nodes] == E.
    return pl.pallas_call(
        _csr_segment_softmax_kernel,
        out_shape=jax.ShapeDtypeStruct((E, H), logits.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_nodes // bn,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(row_ptr, logits)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def csr_segment_softmax(logits: jnp.ndarray, row_ptr: jnp.ndarray,
                        num_nodes: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Per-segment softmax of CSR-sorted logits.

    logits: [E, H] float32 in CSR (dst-sorted) order; row_ptr:
    [num_nodes+1] int32 with ``row_ptr[num_nodes] == E`` (every edge
    belongs to a segment).  Returns [E, H] attention weights summing to
    1 within each non-empty segment.  The backward pass is the standard
    softmax VJP dx = y * (dy - sum_seg(y*dy)) computed with one XLA
    segment-sum (the forward's two scatters are what the kernel
    eliminates).
    """
    return _csr_segment_softmax_impl(logits, row_ptr, num_nodes,
                                     interpret=interpret)


def _csr_softmax_fwd(logits, row_ptr, num_nodes, interpret):
    y = _csr_segment_softmax_impl(logits, row_ptr, num_nodes,
                                  interpret=interpret)
    return y, (y, row_ptr)


def _csr_softmax_bwd(num_nodes, interpret, res, dy):
    y, row_ptr = res
    E = y.shape[0]
    seg = jnp.searchsorted(row_ptr[1:], jnp.arange(E, dtype=jnp.int32),
                           side='right')
    t = jax.ops.segment_sum(y * dy, seg, num_segments=num_nodes)
    dx = y * (dy - jnp.take(t, seg, axis=0))
    return dx, None


csr_segment_softmax.defvjp(_csr_softmax_fwd, _csr_softmax_bwd)


def csr_segment_softmax_reference(logits, row_ptr, num_nodes):
    """Pure-XLA oracle with identical CSR inputs (the ops.segment
    implementation, re-derived on searchsorted segment ids)."""
    from deepchem_tpu.ops.segment import segment_softmax
    E = logits.shape[0]
    seg = jnp.searchsorted(row_ptr[1:], jnp.arange(E, dtype=jnp.int32),
                           side='right')
    return segment_softmax(logits, seg, num_nodes)

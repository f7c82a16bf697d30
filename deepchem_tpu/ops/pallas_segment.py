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

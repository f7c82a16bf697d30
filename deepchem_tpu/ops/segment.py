"""Graph segment operations — the compute substrate for all graph models.

The reference outsources these to TF gathers/unsorted_segment ops
(reference deepchem/models/layers.py:151-364 GraphConv/GraphPool/GraphGather)
or DGL/PyG CUDA kernels.  Here they are XLA primitives over the padded COO
batch layout (see deepchem_tpu/feat/graph_data.py): ``jnp.take`` gathers +
``jax.ops.segment_*`` reductions, which XLA fuses and tiles for TPU.  A
Pallas fused gather->segment kernel can be swapped in for the hot paths
(deepchem_tpu/ops/pallas_segment.py) — these implementations remain the
correctness oracle.

Padding convention: ghost nodes have mask 0 and belong to ghost graph slot
``num_graphs``; ghost edges point at the last node.  All reductions stay
in-bounds; masks zero the garbage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -9e15


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int,
                empty_value: float = 0.0) -> jnp.ndarray:
    out = jax.ops.segment_max(data, segment_ids,
                              num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, empty_value)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    counts = segment_sum(ones, segment_ids, num_segments)
    return s / jnp.maximum(counts, 1.0)[..., None] if data.ndim > 1 \
        else s / jnp.maximum(counts, 1.0)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Numerically-stable softmax within segments (GAT/AttentiveFP
    attention; reference uses DGL's edge_softmax)."""
    if mask is not None:
        m = mask if mask.ndim == logits.ndim else \
            mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
        logits = jnp.where(m > 0, logits, NEG)
    # stop_gradient: the max shift cancels mathematically, and the
    # scatter-max backward miscompiles on the experimental TPU backend
    seg_max = jax.lax.stop_gradient(jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments))
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        m = mask if mask.ndim == exp.ndim else \
            mask.reshape(mask.shape + (1,) * (exp.ndim - mask.ndim))
        exp = exp * m
    denom = jax.ops.segment_sum(exp, segment_ids,
                                num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)


# fused Pallas kernel VMEM budget: [E, H<=128] buffers are lane-padded to
# 128, so E*128*4 bytes each; 32768 edges measured safe on v5e, 65536 OOMs
_CSR_SOFTMAX_MAX_EDGES = 32768
# below this the op-level win (1.35-2.7x isolated) is eaten end-to-end by
# fusion breakage: the kernel is a custom call, so the logits producer and
# attention consumer can no longer fuse through it, and the [E, H] buffer
# round-trips lane-padded to 128.  Measured end-to-end on v5e
# (fit_on_device, 5-layer PAGTN): H=1/E=2048 0.61x, H=8/E~8k 0.88x —
# while COMPILE time drops 6-20x (243s -> 38s), a real win on this
# tunneled backend where XLA's scatter chains inflate compilation.
_CSR_SOFTMAX_MIN_EDGES = 16384
_CSR_SOFTMAX_MIN_WIDTH = 8


def _csr_softmax_eligible(shape: Tuple[int, ...], dtype,
                          mode: Optional[str] = None) -> bool:
    """Dispatch predicate for the fused kernel (unit-tested directly).

    mode: None reads DEEPCHEM_TPU_CSR_SOFTMAX ('auto' default / 'on' /
    'off').  'on' skips the shape heuristics (for compile-time-bound
    sessions); hard requirements (TPU backend, f32, VMEM envelope)
    always hold.
    """
    import os
    mode = mode or os.environ.get('DEEPCHEM_TPU_CSR_SOFTMAX', 'auto')
    E = shape[0]
    hard_ok = (jax.default_backend() == 'tpu'
               and dtype == jnp.float32
               and len(shape) in (1, 2)
               and (len(shape) == 1 or shape[1] <= 128)
               and E <= _CSR_SOFTMAX_MAX_EDGES)
    if not hard_ok or mode == 'off':
        return False
    if mode == 'on':
        return True
    return (len(shape) == 2 and shape[1] >= _CSR_SOFTMAX_MIN_WIDTH
            and E >= _CSR_SOFTMAX_MIN_EDGES)


def segment_softmax_sorted(logits: jnp.ndarray,
                           segment_ids_sorted: jnp.ndarray,
                           num_segments: int,
                           mask: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """:func:`segment_softmax` for segment ids in NON-DECREASING order.

    On TPU this can dispatch to the fused Pallas CSR kernel
    (ops/pallas_segment.py csr_segment_softmax) — one VMEM pass replaces
    XLA's scatter-max + gather + scatter-add + gather chain, measured
    1.35-2.70x faster ISOLATED across GAT/AttentiveFP/PAGTN batch shapes
    on v5e (scripts/bench_pallas_softmax.py).  End-to-end the custom
    call breaks XLA fusion, so by default ('auto') the kernel engages
    only in the wide regime (E >= 16384, H >= 8) where the isolated win
    clears the fusion cost; DEEPCHEM_TPU_CSR_SOFTMAX=on forces it
    everywhere (6-20x faster compiles on the tunneled backend, ~12%
    slower steps at molecular shapes), =off disables.  Falls back to the
    XLA oracle whenever ineligible.  Callers must guarantee sortedness
    (the graph models sort edges by destination at batch packing);
    results are garbage otherwise.
    """
    E = logits.shape[0]
    if not _csr_softmax_eligible(logits.shape, logits.dtype):
        return segment_softmax(logits, segment_ids_sorted, num_segments,
                               mask)
    from deepchem_tpu.ops.pallas_segment import csr_segment_softmax
    squeeze = logits.ndim == 1
    l = logits[:, None] if squeeze else logits
    m = None
    if mask is not None:
        m = mask if mask.ndim == l.ndim else \
            mask.reshape(mask.shape + (1,) * (l.ndim - mask.ndim))
        l = jnp.where(m > 0, l, NEG)
    # row_ptr from the sorted ids; segment count rounded up to the
    # kernel's node-block multiple (tail segments are empty)
    n_pad = ((num_segments + 7) // 8) * 8
    row_ptr = jnp.searchsorted(
        segment_ids_sorted,
        jnp.arange(n_pad + 1, dtype=segment_ids_sorted.dtype),
        side='left').astype(jnp.int32)
    row_ptr = jnp.minimum(row_ptr, E)
    y = csr_segment_softmax(l, row_ptr, n_pad)
    if m is not None:
        y = y * m
    return y[:, 0] if squeeze else y


def gather_neighbors_sum(node_feats: jnp.ndarray, edge_src: jnp.ndarray,
                         edge_dst: jnp.ndarray,
                         edge_mask: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """sum_{j in N(i)} h_j for every node i — the message-passing core
    (reference GraphConv semantics, models/layers.py:202)."""
    msgs = jnp.take(node_feats, edge_src, axis=0)
    if edge_mask is not None:
        msgs = msgs * edge_mask[:, None]
    return segment_sum(msgs, edge_dst, node_feats.shape[0])


def segment_max_sumgrad(data: jnp.ndarray, segment_ids: jnp.ndarray,
                        num_segments: int,
                        mask: Optional[jnp.ndarray] = None,
                        empty_value: float = 0.0) -> jnp.ndarray:
    """segment_max whose BACKWARD routes through segment_sum.

    Forward: per-segment max over valid rows (ties average — equal values
    anyway).  Backward: gradient flows to the argmax rows via a
    segment_sum of an argmax-selection mask.  Motivation: the scatter-max
    gradient miscompiles (1e5x blowups) on the experimental TPU backend
    used in this build, while scatter-add gradients are exact; this
    formulation is also the standard numerically-robust maxpool trick.
    """
    d = data
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (d.ndim - mask.ndim))
        d = jnp.where(m > 0, d, NEG)
    mx = jax.lax.stop_gradient(
        jax.ops.segment_max(d, segment_ids, num_segments=num_segments))
    mx = jnp.where(jnp.isfinite(mx) & (mx > NEG / 2), mx, empty_value)
    sel = (d >= jnp.take(mx, segment_ids, axis=0)).astype(data.dtype)
    if mask is not None:
        sel = sel * m
    num = jax.ops.segment_sum(data * sel, segment_ids,
                              num_segments=num_segments)
    den = jax.lax.stop_gradient(jax.ops.segment_sum(
        sel, segment_ids, num_segments=num_segments))
    out = num / jnp.maximum(den, 1.0)
    return jnp.where(den > 0, out, empty_value)


def gather_neighbors_max(node_feats: jnp.ndarray, edge_src: jnp.ndarray,
                         edge_dst: jnp.ndarray,
                         edge_mask: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """max over neighbors (reference GraphPool, models/layers.py:256)."""
    msgs = jnp.take(node_feats, edge_src, axis=0)
    return segment_max_sumgrad(msgs, edge_dst, node_feats.shape[0],
                               mask=edge_mask)


def graph_pool(node_feats: jnp.ndarray, graph_index: jnp.ndarray,
               num_graphs: int, node_mask: Optional[jnp.ndarray] = None,
               mode: str = 'sum') -> jnp.ndarray:
    """Per-graph readout over nodes (reference GraphGather segment ops,
    models/layers.py:344-364).  ``num_graphs`` EXCLUDES the ghost slot; the
    returned array has num_graphs rows."""
    feats = node_feats
    if node_mask is not None and mode in ('sum', 'mean'):
        feats = feats * node_mask[:, None]
    if mode == 'sum':
        out = segment_sum(feats, graph_index, num_graphs + 1)
    elif mode == 'mean':
        s = segment_sum(feats, graph_index, num_graphs + 1)
        ones = node_mask if node_mask is not None \
            else jnp.ones(feats.shape[0], feats.dtype)
        counts = segment_sum(ones, graph_index, num_graphs + 1)
        out = s / jnp.maximum(counts, 1.0)[:, None]
    elif mode == 'max':
        out = segment_max_sumgrad(feats, graph_index, num_graphs + 1,
                                  mask=node_mask)
    else:
        raise ValueError(f'bad pool mode {mode}')
    return out[:num_graphs]


def node_degrees(edge_dst: jnp.ndarray, num_nodes: int,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    ones = jnp.ones(edge_dst.shape[0], jnp.float32) if edge_mask is None \
        else edge_mask.astype(jnp.float32)
    return segment_sum(ones, edge_dst, num_nodes).astype(jnp.int32)

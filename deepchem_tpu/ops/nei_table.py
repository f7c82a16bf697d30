"""Padded neighbor-table aggregation with gather-transpose VJPs.

The COO substrate (ops/segment.py) lowers neighbor aggregation to
gather + scatter-add; on this backend a scatter costs ~3x the
equivalent gather (measured: 429us fwd / 619us grad for (13k, 64) at
tox21 batch-256 scale, vs ~300us for the layer matmul).  For
UNDIRECTED molecular graphs the padded neighbor table (N, K) is its
own transpose — node m appears in exactly its neighbors' rows — so
both directions of both sum and max aggregation can be pure gathers:

- sum:  out[i] = sum_j M[i,j] h[t[i,j]]
        grad[m] = sum_j M[m,j] g[t[m,j]]           (same masked gather)
- max:  out[i] = max over self and masked slots
        grad[m] = self-win indicator + sum_j M[m,j] g[t[m,j]] *
        (winner[t[m,j]] == m), with winner[i] the argmax source node
        saved from the forward.

``nbr_mask`` marks real slots; padding slots may hold any index (their
contribution is masked, so no ghost-row convention is required —
unlike the GROVER encoder's specialised copies in models/grover.py,
which use a zeroed ghost row 0 instead of a mask).

First used by GraphConvModel (the benchmark flagship).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG = -9e15


def build_neighbor_table(edge_src: np.ndarray, edge_dst: np.ndarray,
                         num_nodes: int, max_nb: int = 10
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """COO (both edge directions present) -> (table, nbr_mask).

    table[i, j] = j-th neighbor of i (0-padded); nbr_mask[i, j] = 1.0
    for real slots.  Vectorized (no Python loop over edges): sorts by
    destination and ranks within each group.

    Raises when any node's degree exceeds ``max_nb``: the table VJPs
    assume the table is complete (symmetric transpose / unique reverse
    slot), so silently dropping neighbors would make both the forward
    AND the backward wrong (ADVICE r2).  Organic chemistry tops out at
    degree 6; non-molecular graphs must raise ``max_neighbors``.
    """
    edge_src = np.asarray(edge_src, np.int64)
    edge_dst = np.asarray(edge_dst, np.int64)
    order = np.argsort(edge_dst, kind='stable')
    ds, ss = edge_dst[order], edge_src[order]
    counts = np.bincount(ds, minlength=num_nodes)
    max_deg = int(counts.max()) if len(counts) else 0
    if max_deg > max_nb:
        raise ValueError(
            f'node degree {max_deg} exceeds the neighbor-table capacity '
            f'max_nb={max_nb}; raise max_neighbors on the model (the '
            'table aggregation path cannot silently truncate — its '
            'gather-transpose gradients assume a complete table)')
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(ds)) - np.repeat(starts, counts)
    keep = pos < max_nb
    table = np.zeros((num_nodes, max_nb), np.int32)
    table[ds[keep], pos[keep]] = ss[keep]
    nbr_mask = (np.arange(max_nb)[None, :]
                < np.minimum(counts, max_nb)[:, None]).astype(np.float32)
    return table, nbr_mask


def _slot_sum(x: jnp.ndarray, table: jnp.ndarray,
              nbr_mask: jnp.ndarray) -> jnp.ndarray:
    out = jnp.take(x, table[:, 0], axis=0) * nbr_mask[:, 0:1]
    for j in range(1, table.shape[1]):
        out = out + jnp.take(x, table[:, j], axis=0) * \
            nbr_mask[:, j:j + 1]
    return out


@jax.custom_vjp
def nei_sum(h: jnp.ndarray, table: jnp.ndarray,
            nbr_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked sum over padded neighbors; symmetric-transpose backward."""
    return _slot_sum(h, table, nbr_mask)


def _nei_sum_fwd(h, table, nbr_mask):
    return _slot_sum(h, table, nbr_mask), (table, nbr_mask)


def _nei_sum_bwd(res, g):
    table, nbr_mask = res
    return _slot_sum(g, table, nbr_mask), None, None


nei_sum.defvjp(_nei_sum_fwd, _nei_sum_bwd)


@jax.custom_vjp
def nei_max_incl_self(h: jnp.ndarray, table: jnp.ndarray,
                      nbr_mask: jnp.ndarray) -> jnp.ndarray:
    """max over {self} U neighbors (Duvenaud GraphPool semantics,
    reference layers.py GraphPool:300), scatter-free in both passes."""
    out, _ = _nei_max_fwd_impl(h, table, nbr_mask)
    return out


def _nei_max_fwd_impl(h, table, nbr_mask):
    n = h.shape[0]
    self_idx = jnp.arange(n, dtype=table.dtype)
    best = h
    winner = jnp.broadcast_to(self_idx[:, None], h.shape)
    for j in range(table.shape[1]):
        idx_j = table[:, j]
        cand = jnp.take(h, idx_j, axis=0)
        cand = jnp.where(nbr_mask[:, j:j + 1] > 0, cand, NEG)
        take_it = cand > best
        best = jnp.where(take_it, cand, best)
        winner = jnp.where(take_it, idx_j[:, None], winner)
    return best, winner


def _nei_max_fwd(h, table, nbr_mask):
    out, winner = _nei_max_fwd_impl(h, table, nbr_mask)
    return out, (table, nbr_mask, winner)


def _nei_max_bwd(res, g):
    table, nbr_mask, winner = res
    n = g.shape[0]
    self_idx = jnp.arange(n, dtype=table.dtype)
    # self contribution: i won its own max
    grad = jnp.where(winner == self_idx[:, None], g, 0.0)
    # neighbor contributions: i's cotangent flows to m when m was i's
    # winner; by symmetry every i that could name m lives in m's row
    for j in range(table.shape[1]):
        idx_j = table[:, j]                       # (N,): m's j-th nbr i
        g_i = jnp.take(g, idx_j, axis=0)
        w_i = jnp.take(winner, idx_j, axis=0)     # i's winner
        hit = (w_i == self_idx[:, None]) & (nbr_mask[:, j:j + 1] > 0)
        grad = grad + jnp.where(hit, g_i, 0.0)
    return grad, None, None


nei_max_incl_self.defvjp(_nei_max_fwd, _nei_max_bwd)


def build_rev_slot(table: np.ndarray, nbr_mask: np.ndarray
                   ) -> np.ndarray:
    """rev_slot[i, j] = position of i in row table[i, j] (the slot its
    neighbor uses for the reverse direction).  Exists for every real
    slot of an undirected graph; 0 for padding slots (masked out).

    Vectorized: table[table] is (N, K, K); find where it equals i.
    Contract: simple undirected graph (each neighbor appears once per
    row) — molecular graphs always are; parallel edges would alias to
    one reverse slot and miscount the backward.
    """
    n, k = table.shape
    tt = table[table]                               # (N, K, K)
    hit = tt == np.arange(n)[:, None, None]
    rs = np.argmax(hit, axis=2).astype(np.int8)
    return np.where(nbr_mask > 0, rs, 0).astype(np.int8)


@jax.custom_vjp
def nei_gather(x: jnp.ndarray, table: jnp.ndarray,
               rev_slot: jnp.ndarray, nbr_mask: jnp.ndarray
               ) -> jnp.ndarray:
    """out[i, j] = x[table[i, j]] * nbr_mask[i, j] — the fundamental
    scatter-free neighbor primitive.

    Backward: the cotangent for node m is the sum over m's OWN slots of
    g at (neighbor, reverse-slot) — grad[m] = sum_j M[m,j] *
    g[t[m,j], rs[m,j]] — a pure gather via the precomputed reverse-slot
    table (build_rev_slot).  From this one primitive, attention layers
    (GAT/AttentiveFP) compose with zero scatters: per-slot logits,
    softmax over the K axis, weighted slot sums.
    """
    out = jnp.take(x, table, axis=0)
    m = nbr_mask.reshape(nbr_mask.shape + (1,) * (out.ndim - 2))
    return out * m


def _nei_gather_fwd(x, table, rev_slot, nbr_mask):
    return nei_gather(x, table, rev_slot, nbr_mask), \
        (table, rev_slot, nbr_mask)


def _nei_gather_bwd(res, g):
    table, rev_slot, nbr_mask = res
    k = table.shape[1]
    grad = None
    for j in range(k):
        # g[t[m,j], rs[m,j]] : gather rows then pick the slot
        rows = jnp.take(g, table[:, j], axis=0)         # (N, K, ...)
        picked = jnp.take_along_axis(
            rows, rev_slot[:, j].astype(jnp.int32).reshape(
                (-1, 1) + (1,) * (rows.ndim - 2)), axis=1)[:, 0]
        m = nbr_mask[:, j].reshape((-1,) + (1,) * (picked.ndim - 1))
        contrib = picked * m
        grad = contrib if grad is None else grad + contrib
    return grad, None, None, None


nei_gather.defvjp(_nei_gather_fwd, _nei_gather_bwd)


@jax.custom_vjp
def nei_sum_edges(h: jnp.ndarray, e_table: jnp.ndarray,
                  e_nbr_mask: jnp.ndarray, edst: jnp.ndarray,
                  emask: jnp.ndarray) -> jnp.ndarray:
    """Directed edge->node aggregation without scatters.

    out[v] = sum over v's incoming-edge slots of h[e_table[v, j]]
    (e_table holds EDGE ids, built with build_neighbor_table(
    arange(E)[real], edge_dst[real], ...)).  Each directed edge arrives
    at exactly one node, so the backward is the row gather
    grad_h[e] = g[edst[e]] * emask[e] — the D-MPNN / Chemprop
    counterpart of the undirected symmetric trick.
    """
    return _slot_sum(h, e_table, e_nbr_mask)


def _nei_sum_edges_fwd(h, e_table, e_nbr_mask, edst, emask):
    return _slot_sum(h, e_table, e_nbr_mask), (edst, emask)


def _nei_sum_edges_bwd(res, g):
    edst, emask = res
    grad = jnp.take(g, edst, axis=0) * emask[:, None]
    return grad, None, None, None, None


nei_sum_edges.defvjp(_nei_sum_edges_fwd, _nei_sum_edges_bwd)


@jax.custom_vjp
def take_src(carry: jnp.ndarray, esrc: jnp.ndarray,
             out_table: jnp.ndarray, out_mask: jnp.ndarray
             ) -> jnp.ndarray:
    """h[esrc[e]] (node -> edge broadcast) whose backward is a gather
    over each node's OUTGOING-edge-id table instead of a scatter:
    grad[v] = sum over v's outgoing slots of g[out_table[v, j]].
    out_table = build_neighbor_table(arange(E)[real], edge_src[real]).
    """
    return jnp.take(carry, esrc, axis=0)


def _take_src_fwd(carry, esrc, out_table, out_mask):
    return jnp.take(carry, esrc, axis=0), (out_table, out_mask)


def _take_src_bwd(res, g):
    out_table, out_mask = res
    return _slot_sum(g, out_table, out_mask), None, None, None


take_src.defvjp(_take_src_fwd, _take_src_bwd)

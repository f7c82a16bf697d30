"""Generic attention layers + Grover readout (reference
deepchem/models/torch_models/attention.py:10,61 and readout.py:11) as
flax modules.

These are the reference's public building blocks; the production
GROVER path in this framework uses the packed dense layout in
``models/grover.py`` (segment masks instead of Python scope lists) —
these classes exist for API parity and for user models that compose
them directly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ScaledDotProductAttention(nn.Module):
    """softmax(Q K^T / sqrt(d)) V (reference attention.py:10).

    Callable on (query, key, value[, mask]); returns (output,
    attention probabilities).  Masked positions (mask == 0) receive
    a -1e9 score, matching the reference's epsilon fill.
    """

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 dropout_rate: float = 0.0,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d_k = query.shape[-1]
        scores = jnp.matmul(query, jnp.swapaxes(key, -2, -1)) \
            / jnp.sqrt(jnp.asarray(d_k, dtype=query.dtype))
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        if dropout_rate > 0.0 and not deterministic:
            p_attn = nn.Dropout(rate=dropout_rate)(
                p_attn, deterministic=False)
        return jnp.matmul(p_attn, value), p_attn


class SelfAttention(nn.Module):
    """a = softmax(W2 tanh(W1 X^T)); y = a X (reference attention.py:61).

    Returns (embedding [out_features, in_features], attention matrix
    [out_features, n]).
    """
    in_features: int
    out_features: int
    hidden_size: int = 128

    @nn.compact
    def __call__(self, X: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w1 = self.param('w1', nn.initializers.xavier_normal(),
                        (self.hidden_size, self.in_features))
        w2 = self.param('w2', nn.initializers.xavier_normal(),
                        (self.out_features, self.hidden_size))
        x = jnp.tanh(jnp.matmul(w1, X.T))
        x = jnp.matmul(w2, x)
        attn = jax.nn.softmax(x, axis=-1)
        return jnp.matmul(attn, X), attn


class GroverReadout(nn.Module):
    """Scope-based graph readout (reference torch_models/readout.py:11):
    mean pooling or self-attention pooling of each graph's node/edge
    embedding block.

    ``__call__(embeddings, scope)`` with scope a list of
    ``(start, size)`` pairs returns one row per scope entry —
    ``in_features`` wide for 'mean', ``attn_out_size * in_features``
    for 'self_attention' (the reference flattens the attention
    output).  Empty scopes yield the zero vector.
    """
    rtype: str = 'mean'
    in_features: int = 128
    attn_hidden_size: int = 32
    attn_out_size: int = 32

    @nn.compact
    def __call__(self, graph_embeddings: jnp.ndarray,
                 scope: List) -> jnp.ndarray:
        if self.rtype == 'self_attention':
            attn = SelfAttention(in_features=self.in_features,
                                 out_features=self.attn_out_size,
                                 hidden_size=self.attn_hidden_size)
        rows = []
        for (a_start, a_size) in scope:
            if a_size == 0:
                width = self.in_features if self.rtype == 'mean' \
                    else self.attn_out_size * self.in_features
                rows.append(jnp.zeros(width,
                                      dtype=graph_embeddings.dtype))
                continue
            block = jax.lax.dynamic_slice_in_dim(
                graph_embeddings, a_start, a_size, axis=0) \
                if isinstance(a_start, jnp.ndarray) \
                else graph_embeddings[a_start:a_start + a_size]
            if self.rtype == 'self_attention':
                emb, _ = attn(block)
                rows.append(emb.reshape(-1))
            elif self.rtype == 'mean':
                rows.append(block.sum(axis=0) / a_size)
            else:
                raise ValueError(f'unknown readout type {self.rtype!r}')
        return jnp.stack(rows, axis=0)

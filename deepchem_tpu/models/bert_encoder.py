"""Native RoBERTa-class masked-LM encoder, TPU-first.

The reference's ChemBERTa path wraps HuggingFace (models/hf_models.py
both here and in the reference, torch_models/chemberta.py).  The HF
Flax encoder materializes [B, H, S, S] attention scores and runs its
softmax/layernorm chain at HBM bandwidth — measured 24.9% MFU on
v5e at ChemBERTa-77M scale while a plain bf16 matmul chain reaches 71%
(scripts/bench_chemberta_mfu.py).  This module is the framework-owned
encoder for the dense-transformer compute path:

- attention through the XLA einsum path by default: the r4 crossover
  probe (scripts/attn_crossover.py, v5e) measured einsum FASTER than
  the Pallas flash kernel at EVERY sequence length at this head
  config — 1.85x at S=128 (one 128-token block leaves the kernel's
  grid/DMA machinery nothing to amortize) growing to 4.7x at S=4096
  (13.2 vs 7.1 TF/s ... 76.5 vs 16.3 TF/s).  The flash kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) stays available
  via ``use_flash=True`` for memory-bound regimes where the [B,H,S,S]
  score materialization, not throughput, is the constraint;
- one computation ``dtype`` knob (bf16 activations, f32 params /
  softmax/layernorm accumulations — the mixed-precision recipe);
- weight-tied MLM head, RoBERTa parameterization (post-LN, gelu,
  learned positions with the +2 pad offset).

Used by scripts/bench_chemberta_mfu.py's 'native' arm and available to
hf_models-style pretraining without the HF dependency.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon') or \
            'TPU' in jax.devices()[0].device_kind
    except Exception:
        return False


def flash_or_xla_attention(q, k, v, mask: Optional[jnp.ndarray],
                           use_flash: Optional[bool] = None):
    """[B, S, H, D] q/k/v -> [B, S, H, D]; mask [B, S] (1 = keep).

    Default is the XLA einsum path with f32 softmax — measured faster
    than the Pallas flash kernel at every sequence length on v5e
    (scripts/attn_crossover.py: 1.85x at S=128 up to 4.7x at S=4096).
    Pass ``use_flash=True`` (TPU, mask-free only) when the S x S score
    materialization is the memory constraint."""
    B, S, H, D = q.shape
    scale = 1.0 / float(np.sqrt(D))
    if use_flash is None:
        use_flash = False
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=scale)
        return out.transpose(0, 2, 1, 3)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k) * scale
    if mask is not None:
        bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


class _EncoderLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dropout: float
    dtype: jnp.dtype
    ln_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        H = self.heads
        D = self.hidden // H
        B, S, _ = x.shape
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype,
                       name='qkv')(x)
        q, k, v = jnp.split(qkv.reshape(B, S, 3 * H, D), 3, axis=2)
        att = flash_or_xla_attention(q, k, v, mask)
        att = nn.Dense(self.hidden, dtype=self.dtype, name='out')(
            att.reshape(B, S, self.hidden))
        if self.dropout > 0:
            att = nn.Dropout(self.dropout,
                             deterministic=not training)(att)
        # post-LN (RoBERTa): f32 layernorm statistics by default
        # (ln_dtype=bf16 is the scripts/mfu_ablation.py experiment arm)
        x = nn.LayerNorm(dtype=self.ln_dtype, name='ln_att')(
            (x + att).astype(self.ln_dtype)).astype(self.dtype)
        h = nn.Dense(self.intermediate, dtype=self.dtype,
                     name='mlp_in')(x)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name='mlp_out')(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        x = nn.LayerNorm(dtype=self.ln_dtype, name='ln_mlp')(
            (x + h).astype(self.ln_dtype)).astype(self.dtype)
        return x


class BertEncoderMLM(nn.Module):
    """RoBERTa-architecture masked-LM model (native flax).

    Returns vocabulary logits [B, S, V] (f32).  ``remat`` wraps each
    layer in jax.checkpoint for memory-bound scales.
    """
    vocab_size: int
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 130
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ln_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 training: bool = False):
        B, S = input_ids.shape
        emb = nn.Embed(self.vocab_size, self.hidden,
                       dtype=self.dtype, name='tok_emb')
        x = emb(input_ids)
        pos = nn.Embed(self.max_positions, self.hidden,
                       dtype=self.dtype, name='pos_emb')(
            jnp.arange(S)[None, :] + 2)       # RoBERTa pad offset
        x = x + pos
        x = nn.LayerNorm(dtype=jnp.float32, name='ln_emb')(
            x.astype(jnp.float32)).astype(self.dtype)
        # pass attention_mask=None (not an all-ones array) to unlock
        # the flash kernel: a traced mask can't be inspected under jit
        mask = attention_mask
        Layer = _EncoderLayer
        if self.remat:
            Layer = nn.remat(_EncoderLayer, static_argnums=(3,))
        for i in range(self.layers):
            x = Layer(self.hidden, self.heads, self.intermediate,
                      self.dropout, self.dtype, self.ln_dtype,
                      name=f'layer_{i}')(x, mask, training)
        # MLM head: dense + gelu + LN + tied vocab projection
        h = nn.Dense(self.hidden, dtype=self.dtype, name='head_dense')(x)
        h = nn.gelu(h)
        h = nn.LayerNorm(dtype=jnp.float32, name='head_ln')(
            h.astype(jnp.float32)).astype(self.dtype)
        logits = emb.attend(h.astype(emb.embedding.dtype))
        bias = self.param('head_bias', nn.initializers.zeros,
                          (self.vocab_size,))
        return logits.astype(jnp.float32) + bias


def mlm_loss(logits, labels, label_mask=None):
    """Cross entropy over masked positions (f32)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if label_mask is None:
        return jnp.mean(nll)
    w = label_mask.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

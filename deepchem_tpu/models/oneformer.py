"""Native OneFormer-style universal image segmentation.

Reference: deepchem/models/torch_models/oneformer.py:20 (OneFormer), which
wraps transformers' ``AutoModelForUniversalSegmentation.from_config`` —
note the reference instantiates the architecture *from config with random
weights* (oneformer.py:143) and only supports the semantic task, so a
native random-init architecture with the same training surface is the
faithful TPU equivalent (there is no flax OneFormer in transformers and
no hub in this environment).

The architecture keeps OneFormer's three-part structure (Jain et al.
2022), sized for the framework's image datasets and redesigned
TPU-first:

- **backbone**: a conv pyramid producing stride-4/8/16/32 feature maps
  (stand-in for the Swin backbone — dense convs map straight onto the
  MXU, no window-shift gathers);
- **pixel decoder**: FPN-style top-down path emitting a per-pixel
  embedding at stride 4;
- **task-conditioned transformer decoder**: learnable object queries,
  conditioned on a learned task embedding (the reference encodes the
  task string "the task is semantic" with a text encoder; a per-task
  learned vector carries the same conditioning signal without a text
  tower), run through [cross-attention over pixel tokens -> self
  attention -> FFN] blocks using the XLA einsum attention path (the
  round-4 crossover measurement: einsum beats the Pallas flash kernel
  at every sequence length on this chip).

Heads produce per-query class logits (num_labels + 1 no-object slot)
and per-query mask embeddings; masks are one einsum against the pixel
embedding.  Semantic logits compose the two exactly like the
mask2former-style semantic post-processing —
``sem[k] = sum_q p(class=k | q) * sigmoid(mask_q)``.  Training follows
OneFormer's loss recipe (class CE + mask BCE + mask dice) with FIXED
query<->class matching for the semantic task: semantic ground truth is
one mask per class, so the Hungarian assignment (a host-side
``linear_sum_assignment`` that cannot live inside a jitted step)
degenerates to a permutation we pin, plus composed per-pixel CE tying
the ensemble together.  Composed CE alone was measured insufficient —
it under-constrains individual query masks and collapses to background.

Omitted relative to the full OneFormer recipe (documented, not hidden):
the query-text contrastive loss (needs the text tower) and the
instance/panoptic tasks — the reference raises for those too
(oneformer.py:31-33).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from deepchem_tpu.models.jax_model import JaxModel

TASKS = ('semantic', 'instance', 'panoptic')


class _ConvStage(nn.Module):
    ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding='SAME')(x)
        x = nn.gelu(nn.LayerNorm()(x))
        x = nn.Conv(self.ch, (3, 3), padding='SAME')(x)
        return nn.gelu(nn.LayerNorm()(x))


class _DecoderBlock(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, q, pix_tokens):
        # cross-attention: queries attend to pixel tokens
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name='cross')(
                nn.LayerNorm()(q), pix_tokens, pix_tokens)
        q = q + a
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name='self')(
                nn.LayerNorm()(q))
        q = q + a
        h = nn.Dense(4 * self.hidden)(nn.LayerNorm()(q))
        q = q + nn.Dense(self.hidden)(nn.gelu(h))
        return q


class _OneFormerModule(nn.Module):
    """Backbone + pixel decoder + task-conditioned query decoder."""
    num_labels: int
    num_queries: int = 32
    hidden: int = 128
    heads: int = 8
    dec_layers: int = 4
    n_tasks_vocab: int = len(TASKS)
    task_id: int = 0          # static per model, like the reference's
    #                           per-instance segmentation_task string

    @nn.compact
    def __call__(self, x, training: bool = False):
        task_id = self.task_id
        x = jnp.asarray(x, jnp.float32) / 255.0
        if x.ndim == 3:
            x = x[..., None]
        B = x.shape[0]
        # backbone pyramid: strides 4, 8, 16, 32
        c1 = _ConvStage(self.hidden // 4, stride=4, name='stem')(x)
        c2 = _ConvStage(self.hidden // 2, name='stage2')(c1)
        c3 = _ConvStage(self.hidden, name='stage3')(c2)
        c4 = _ConvStage(self.hidden, name='stage4')(c3)
        # pixel decoder: FPN top-down to stride 4
        p4 = nn.Conv(self.hidden, (1, 1), name='lat4')(c4)
        p3 = nn.Conv(self.hidden, (1, 1), name='lat3')(c3) + \
            jax.image.resize(p4, c3.shape[:3] + (self.hidden,), 'nearest')
        p2 = nn.Conv(self.hidden, (1, 1), name='lat2')(c2) + \
            jax.image.resize(p3, c2.shape[:3] + (self.hidden,), 'nearest')
        p1 = nn.Conv(self.hidden, (1, 1), name='lat1')(c1) + \
            jax.image.resize(p2, c1.shape[:3] + (self.hidden,), 'nearest')
        pixel_embed = nn.Conv(self.hidden, (3, 3), padding='SAME',
                              name='pixel_out')(p1)     # [B,H/4,W/4,C]
        # decoder tokens: the stride-16 map keeps the token count small
        toks = c3.reshape(B, -1, self.hidden)
        toks = toks + self.param(
            'pix_pos', nn.initializers.normal(0.02),
            (1, toks.shape[1], self.hidden))
        # task-conditioned learnable queries (reference: text-encoded
        # task string added to the query set)
        queries = self.param('queries', nn.initializers.normal(0.02),
                             (1, self.num_queries, self.hidden))
        task_emb = nn.Embed(self.n_tasks_vocab, self.hidden,
                            name='task_embed')(
                                jnp.full((B, 1), task_id, jnp.int32))
        q = jnp.tile(queries, (B, 1, 1)) + task_emb
        for i in range(self.dec_layers):
            q = _DecoderBlock(self.hidden, self.heads,
                              name=f'dec_{i}')(q, toks)
        q = nn.LayerNorm(name='dec_ln')(q)
        # heads: class logits (num_labels + no-object) and mask embeds
        class_logits = nn.Dense(self.num_labels + 1, name='class_head')(q)
        mask_embed = nn.LayerNorm(name='mask_ln')(
            nn.Dense(self.hidden, name='mask_head')(q))
        # 1/sqrt(C) keeps initial mask logits in sigmoid's linear range
        # (unscaled, the dot saturates at init and gradients die)
        masks = jnp.einsum('bqc,bhwc->bqhw', mask_embed,
                           nn.LayerNorm(name='pixel_ln')(pixel_embed))
        masks = masks / jnp.sqrt(jnp.asarray(self.hidden, jnp.float32))
        # semantic composition (mask2former semantic post-processing,
        # differentiable so it IS the training objective).  The query
        # sum is positive but unnormalized — log is monotone so argmax
        # is unchanged, and the loss renormalizes across classes; no
        # upper clip (clipping at 1.0 zeroes the gradient of whichever
        # class saturates first — measured background collapse).
        cls_prob = jax.nn.softmax(class_logits, axis=-1)[..., :-1]
        sem = jnp.einsum('bqk,bqhw->bhwk', cls_prob,
                         jax.nn.sigmoid(masks))
        sem_logits = jnp.log(sem + 1e-6)
        # [B,H/4,W/4,K] composed map + raw per-query heads for the loss
        return sem_logits, masks, class_logits


class OneFormer(JaxModel):
    """Universal segmentation with the reference's training surface
    (reference torch_models/oneformer.py:20): ``fit`` on an
    ImageDataset of (image [H,W,3], mask [H,W]) pairs, ``predict``
    returns full-resolution per-pixel label maps.

    Only the semantic task is supported — matching the reference, which
    raises for instance/panoptic (oneformer.py:31-33).  ``model_path``
    is accepted for signature parity but only shapes the error message:
    like the reference's ``from_config`` path, weights are random-init.
    """

    def __init__(self,
                 segmentation_task: str = 'semantic',
                 model_path: Optional[str] = None,
                 id2label: Optional[Dict[int, str]] = None,
                 num_queries: int = 32,
                 hidden: int = 128,
                 dec_layers: int = 4,
                 batch_size: int = 2,
                 **kwargs):
        if segmentation_task not in TASKS:
            raise ValueError(f'unknown task {segmentation_task!r}')
        if segmentation_task != 'semantic':
            raise ValueError(
                f'{segmentation_task} segmentation is not supported yet '
                '(reference oneformer.py:31-33 — semantic only)')
        self.segmentation_task = segmentation_task
        self.task = 'universal_segmentation'
        self.id2label = id2label or {0: 'unlabelled', 1: 'labelled'}
        self.label2id = {v: k for k, v in self.id2label.items()}
        self.num_labels = len(self.id2label)
        self._task_id = TASKS.index(segmentation_task)
        # fixed semantic matching supervises query k as class k
        num_queries = max(num_queries, self.num_labels)
        module = _OneFormerModule(num_labels=self.num_labels,
                                  num_queries=num_queries,
                                  hidden=hidden,
                                  dec_layers=dec_layers,
                                  task_id=self._task_id)

        K = self.num_labels

        def loss(outputs, labels, weights):
            # OneFormer's loss recipe (Jain et al. 2022 eq. 4: class CE
            # + mask BCE + mask dice), with FIXED query<->class matching
            # for the semantic task in place of Hungarian matching:
            # query k is supervised as class k's mask (semantic masks
            # are one-per-class, so the K-permutation is the only
            # matching freedom, and fixing it removes a host-side
            # linear_sum_assignment from the jitted step).  Composed
            # per-pixel CE on the semantic map ties the ensemble
            # together; extra queries beyond K stay free.
            sem_logits, masks, class_logits = outputs
            y = labels[0].astype(jnp.int32)      # [B,H,W]
            h, w = sem_logits.shape[1:3]
            # nearest-neighbor downsample of the target to stride 4
            y_small = jax.image.resize(y, (y.shape[0], h, w),
                                       'nearest').astype(jnp.int32)
            logp = jax.nn.log_softmax(sem_logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, y_small[..., None], axis=-1)[..., 0]
            onehot = jax.nn.one_hot(y_small, K)          # [B,h,w,K]
            # per-query supervision on the first K queries
            mK = masks[:, :K].transpose(0, 2, 3, 1)      # [B,h,w,K]
            bce = optax.sigmoid_binary_cross_entropy(mK, onehot)
            pm = jax.nn.sigmoid(mK)
            inter = jnp.sum(pm * onehot, axis=(1, 2))    # [B,K]
            denom = jnp.sum(pm + onehot, axis=(1, 2))
            dice = (2.0 * inter + 1.0) / (denom + 1.0)
            # class head: query k predicts class k (no-object for the
            # rest is left unsupervised — semantic task uses all K)
            cls_nll = -jnp.take_along_axis(
                jax.nn.log_softmax(class_logits[:, :K], -1),
                jnp.tile(jnp.arange(K)[None, :, None],
                         (class_logits.shape[0], 1, 1)), -1)
            return (jnp.mean(nll) + jnp.mean(bce) +
                    jnp.mean(1.0 - dice) + jnp.mean(cls_nll))

        super().__init__(module, loss,
                         output_types=['prediction', 'embedding',
                                       'embedding'],
                         batch_size=batch_size, **kwargs)

    def predict(self, dataset, transformers=(), output_types=None):
        """Full-resolution semantic maps [N, H, W] (reference
        post_process_semantic_segmentation surface)."""
        sem = super().predict(dataset, transformers, output_types)
        sem = np.asarray(sem)
        H, W = dataset.X.shape[1:3]
        up = jax.image.resize(
            jnp.asarray(sem), (sem.shape[0], H, W, sem.shape[-1]),
            'nearest')
        return np.asarray(jnp.argmax(up, axis=-1))

    def get_num_tasks(self):
        return self.num_labels

    def get_task_type(self):
        return self.task

"""HuggingFace transformer models on the JAX engine.

Redesign of reference deepchem/models/torch_models/hf_models.py:23
(HuggingFaceModel: MLM pretraining + sequence classification/regression
fine-tuning, fill_mask:545) and chemberta.py — using transformers' FLAX
model classes so the forward/backward runs natively on TPU instead of
wrapping torch modules.

Zero-egress note: ``from_pretrained`` hub downloads are unavailable in this
build environment; models are constructed from configs (random init) or
local checkpoints.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepchem_tpu.data import Dataset, NumpyDataset
from deepchem_tpu.models.jax_model import JaxModel
from deepchem_tpu.models.losses import (L2Loss, SoftmaxCrossEntropy,
                                        SparseSoftmaxCrossEntropy)

logger = logging.getLogger(__name__)


class _HFModuleAdapter:
    """Adapts a FlaxPreTrainedModel to the engine's module contract."""

    def __init__(self, hf_model, task: str):
        self.hf = hf_model
        self.task = task

    def init(self, rngs, *inputs, training: bool = False):
        return {'params': self.hf.params}

    def apply(self, params, input_ids, attention_mask, training=False,
              rngs=None):
        dropout_rng = rngs.get('dropout') if rngs else None
        out = self.hf(
            input_ids=input_ids.astype(jnp.int32),
            attention_mask=attention_mask.astype(jnp.int32),
            params=params['params'], dropout_rng=dropout_rng,
            train=bool(training))
        logits = out.logits
        if self.task == 'regression':
            return logits
        return jax.nn.softmax(logits, -1), logits


class HuggingFaceModel(JaxModel):
    """(reference hf_models.py:23 contract: fit/predict/fill_mask with an
    HF tokenizer + model; task in 'mlm', 'classification', 'regression')."""

    def __init__(self, model, tokenizer, task: str = 'classification',
                 mlm_probability: float = 0.15,
                 max_length: int = 128, n_tasks: int = 1,
                 batch_size: int = 16, **kwargs):
        self.hf_model = model
        self.tokenizer = tokenizer
        self.task = task
        self.mlm_probability = mlm_probability
        self.max_length = max_length
        self.n_tasks = n_tasks
        adapter = _HFModuleAdapter(model, task)
        if task == 'mlm':
            def loss(outputs, labels, weights):
                logits = outputs[1]
                target = labels[0].astype(jnp.int32)
                mask = (target >= 0).astype(jnp.float32)
                safe = jnp.maximum(target, 0)
                logp = jax.nn.log_softmax(logits, -1)
                nll = -jnp.take_along_axis(logp, safe[..., None],
                                           axis=-1)[..., 0]
                return jnp.sum(nll * mask) / jnp.maximum(mask.sum(), 1.0)
            output_types = ['prediction', 'loss']
        elif task == 'classification':
            def loss(outputs, labels, weights):
                logits = outputs[1]
                target = labels[0].astype(jnp.int32).reshape(-1)
                logp = jax.nn.log_softmax(logits, -1)
                nll = -jnp.take_along_axis(logp, target[:, None],
                                           axis=-1)[:, 0]
                w = weights[0].reshape(-1) if weights else 1.0
                return jnp.sum(nll * w) / jnp.maximum(
                    jnp.sum(w * jnp.ones_like(nll)), 1e-8)
            output_types = ['prediction', 'loss']
        else:
            loss = L2Loss()
            output_types = ['prediction']
        super().__init__(adapter, loss, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    def _tokenize(self, smiles: Sequence[str]) -> Tuple[np.ndarray,
                                                        np.ndarray]:
        out = self.tokenizer(list(smiles), truncation=True,
                             padding='max_length',
                             max_length=self.max_length,
                             return_tensors='np')
        return out['input_ids'], out['attention_mask']

    def _mask_tokens(self, input_ids: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Standard 15% BERT masking; labels -100 where not masked."""
        labels = input_ids.copy()
        special = np.isin(input_ids, [
            getattr(self.tokenizer, 'pad_token_id', 0) or 0,
            getattr(self.tokenizer, 'cls_token_id', -1) or -1,
            getattr(self.tokenizer, 'sep_token_id', -1) or -1])
        prob = np.random.rand(*input_ids.shape)
        masked = (prob < self.mlm_probability) & ~special
        labels[~masked] = -100
        out = input_ids.copy()
        mask_id = getattr(self.tokenizer, 'mask_token_id', None)
        if mask_id is None:
            mask_id = 0
        # 80% [MASK], 10% random, 10% keep
        r = np.random.rand(*input_ids.shape)
        out[masked & (r < 0.8)] = mask_id
        vocab = getattr(self.tokenizer, 'vocab_size', 100)
        rand_ids = np.random.randint(0, vocab, input_ids.shape)
        out[masked & (r >= 0.8) & (r < 0.9)] = \
            rand_ids[masked & (r >= 0.8) & (r < 0.9)]
        return out, labels

    def default_generator(self, dataset: Dataset, epochs: int = 1,
                          mode: str = 'fit', deterministic: bool = True,
                          pad_batches: bool = True):
        for epoch in range(epochs):
            for (X_b, y_b, w_b, ids_b) in dataset.iterbatches(
                    batch_size=self.batch_size,
                    deterministic=deterministic,
                    pad_batches=pad_batches):
                smiles = [str(s) for s in X_b]
                input_ids, attn = self._tokenize(smiles)
                if self.task == 'mlm' and mode == 'fit':
                    input_ids, labels = self._mask_tokens(input_ids)
                    yield ([input_ids, attn], [labels], [w_b])
                else:
                    yield ([input_ids, attn], [y_b], [w_b])

    def fill_mask(self, inputs: Sequence[str], top_k: int = 5):
        """Predict masked tokens (reference hf_models.py:545)."""
        input_ids, attn = self._tokenize(list(inputs))
        if not self._built:
            self.build([jnp.asarray(input_ids), jnp.asarray(attn)])
        outputs = self._forward(self.params,
                                [jnp.asarray(input_ids),
                                 jnp.asarray(attn)],
                                training=False, rng=None)
        logits = np.asarray(outputs[1])
        mask_id = self.tokenizer.mask_token_id
        results = []
        for row_ids, row_logits in zip(input_ids, logits):
            row_out = []
            for pos in np.nonzero(row_ids == mask_id)[0]:
                top = np.argsort(-row_logits[pos])[:top_k]
                row_out.append([
                    {'token': int(t),
                     'token_str': self.tokenizer.decode([int(t)]),
                     'score': float(jax.nn.softmax(
                         jnp.asarray(row_logits[pos]))[t])}
                    for t in top])
            results.append(row_out)
        return results

    def get_num_tasks(self):
        return self.n_tasks

    def get_task_type(self):
        return self.task


def _build_chemberta(task: str, n_tasks: int, vocab_size: int,
                     max_length: int, **config_kwargs):
    from transformers import (RobertaConfig,
                              FlaxRobertaForMaskedLM,
                              FlaxRobertaForSequenceClassification)
    config = RobertaConfig(
        vocab_size=vocab_size, max_position_embeddings=max_length + 2,
        num_attention_heads=config_kwargs.get('num_attention_heads', 12),
        num_hidden_layers=config_kwargs.get('num_hidden_layers', 6),
        hidden_size=config_kwargs.get('hidden_size', 768),
        intermediate_size=config_kwargs.get('intermediate_size', 3072),
        type_vocab_size=1,
        num_labels=(n_tasks if task == 'regression' else 2),
        problem_type=('regression' if task == 'regression' else
                      'single_label_classification'))
    if task == 'mlm':
        return FlaxRobertaForMaskedLM(config, seed=0)
    return FlaxRobertaForSequenceClassification(config, seed=0)


class Chemberta(HuggingFaceModel):
    """ChemBERTa (reference torch_models/chemberta.py): RoBERTa over SMILES
    with a SmilesTokenizer-compatible vocabulary.  Built from config in
    zero-egress environments; pass ``model=`` to use a local checkpoint."""

    def __init__(self, task: str = 'mlm', tokenizer=None,
                 n_tasks: int = 1, max_length: int = 128,
                 vocab_size: Optional[int] = None, model=None, **kwargs):
        if tokenizer is None:
            from deepchem_tpu.feat.tokenizers import SmilesTokenizer
            tokenizer = _SmilesTokenizerHFShim(SmilesTokenizer())
        if vocab_size is None:
            vocab_size = max(getattr(tokenizer, 'vocab_size', 600), 600)
        if model is None:
            model = _build_chemberta(task, n_tasks, vocab_size,
                                     max_length, **{
                                         k: v for k, v in kwargs.items()
                                         if k.startswith(('num_',
                                                          'hidden',
                                                          'intermediate'))})
        hf_kwargs = {k: v for k, v in kwargs.items()
                     if not k.startswith(('num_', 'hidden',
                                          'intermediate'))}
        super().__init__(model, tokenizer, task=task, n_tasks=n_tasks,
                         max_length=max_length, **hf_kwargs)


class _SmilesTokenizerHFShim:
    """Give the in-repo SmilesTokenizer the HF callable interface."""

    def __init__(self, tok):
        self.tok = tok
        self.mask_token_id = tok.vocab['[MASK]']
        self.pad_token_id = tok.vocab['[PAD]']
        self.cls_token_id = tok.vocab['[CLS]']
        self.sep_token_id = tok.vocab['[SEP]']

    @property
    def vocab_size(self):
        return max(self.tok.vocab_size, 600)

    def __call__(self, texts, truncation=True, padding='max_length',
                 max_length=128, return_tensors=None):
        if isinstance(texts, str):
            texts = [texts]
        ids = [self.tok.encode(t, max_length=max_length) for t in texts]
        arr = np.asarray(ids, dtype=np.int32)
        attn = (arr != self.pad_token_id).astype(np.int32)
        return {'input_ids': arr, 'attention_mask': attn}

    def decode(self, ids):
        return self.tok.decode(ids)


class MoLFormer(HuggingFaceModel):
    """MoLFormer-XL wrapper (reference torch_models/molformer.py:10):
    linear-attention chemical language model pretrained on ZINC+PubChem.

    The published checkpoint ('ibm/MoLFormer-XL-both-10pct') is
    hub-distributed custom code with no flax port; in this zero-egress
    build the class accepts a local ``model=`` adapter (any flax
    module with the HuggingFaceModel forward contract) and otherwise
    raises with the exact requirements.  ChemBERTa (`Chemberta`) is
    the in-repo runnable chemical-LM alternative.
    """

    def __init__(self, task: str = 'mlm', tokenizer=None,
                 n_tasks: int = 1, model=None, **kwargs):
        if model is None:
            raise ImportError(
                "MoLFormer needs the hub checkpoint "
                "'ibm/MoLFormer-XL-both-10pct' (custom linear-attention "
                "code, torch-only, trust_remote_code=True); this "
                "environment has no model hub.  Pass a local flax "
                "model= adapter, or use Chemberta for an in-repo "
                "chemical LM.")
        if tokenizer is None:
            from deepchem_tpu.feat.tokenizers import SmilesTokenizer
            tokenizer = _SmilesTokenizerHFShim(SmilesTokenizer())
        super().__init__(model, tokenizer, task=task, n_tasks=n_tasks,
                         **kwargs)


class OneFormer(HuggingFaceModel):
    """OneFormer universal image segmentation wrapper (reference
    torch_models/oneformer.py): hub-distributed torch-only
    architecture.  Accepts a local ``model=`` adapter; otherwise
    raises with the requirements (no hub in this environment, no flax
    port of OneFormer in transformers)."""

    def __init__(self, segmentation_task: str = 'semantic',
                 model_path: str = 'shi-labs/oneformer_ade20k_swin_tiny',
                 torch_dtype=None, n_tasks: int = 1, model=None,
                 tokenizer=None, **kwargs):
        if model is None:
            raise ImportError(
                f"OneFormer needs the hub checkpoint {model_path!r} "
                "(torch-only; transformers has no flax OneFormer); "
                "this environment has no model hub.  Pass a local "
                "flax model= adapter, or use UNetModel for in-repo "
                "image segmentation.")
        super().__init__(model, tokenizer, task='custom',
                         n_tasks=n_tasks, **kwargs)

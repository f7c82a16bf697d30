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
from deepchem_tpu.parallel.tp import HF_TP_RULES
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
    HF tokenizer + model; task in 'mlm', 'classification', 'regression').

    One-switch tensor parallelism: ``model.distribute(tensor_parallel=k)``
    applies the Megatron column/row pairing (parallel/tp.py HF_TP_RULES)
    to the transformers-Flax BERT/RoBERTa weights before fit/predict."""

    tp_rules = HF_TP_RULES

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


class _ProteinTokenizer:
    """Character-level amino-acid tokenizer with the ProtBERT conventions
    (space-separated residues, '[CLS] seq [SEP]' framing, ProtBERT vocab
    order).  Stands in for ``BertTokenizer.from_pretrained('Rostlab/
    prot_bert')`` in zero-egress environments."""

    SPECIALS = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]']
    AA = list('LAGVESIKRDTPNQFYMHCWXUBZO')

    def __init__(self):
        tokens = self.SPECIALS + self.AA
        self.vocab = {t: i for i, t in enumerate(tokens)}
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.pad_token_id = self.vocab['[PAD]']
        self.cls_token_id = self.vocab['[CLS]']
        self.sep_token_id = self.vocab['[SEP]']
        self.mask_token_id = self.vocab['[MASK]']
        self.mask_token = '[MASK]'

    @property
    def vocab_size(self):
        return len(self.vocab)

    def _encode_one(self, text: str, max_length: int) -> List[int]:
        text = text.replace(' ', '').upper()
        ids = [self.cls_token_id]
        i = 0
        while i < len(text) and len(ids) < max_length - 1:
            if text.startswith('[MASK]', i):
                ids.append(self.mask_token_id)
                i += len('[MASK]')
            else:
                ids.append(self.vocab.get(text[i], self.vocab['[UNK]']))
                i += 1
        ids.append(self.sep_token_id)
        ids += [self.pad_token_id] * (max_length - len(ids))
        return ids[:max_length]

    def __call__(self, texts, truncation=True, padding='max_length',
                 max_length=128, return_tensors=None):
        if isinstance(texts, str):
            texts = [texts]
        arr = np.asarray([self._encode_one(t, max_length) for t in texts],
                         dtype=np.int32)
        attn = (arr != self.pad_token_id).astype(np.int32)
        return {'input_ids': arr, 'attention_mask': attn}

    def decode(self, ids):
        out = []
        for i in np.asarray(ids).reshape(-1):
            tok = self.inv_vocab.get(int(i), '[UNK]')
            if tok not in ('[PAD]', '[CLS]', '[SEP]'):
                out.append(tok)
        return ''.join(out)


class _BertWithHeadAdapter:
    """FlaxBertModel + a custom flax classifier head over the pooled
    output — the 'FFN'/'custom' classifier modes of ProtBERT (reference
    prot_bert.py:110-118).  Param tree keeps the encoder under the
    'bert' scope so ``load_from_pretrained`` path-matching transfers
    MLM-pretrained encoders."""

    def __init__(self, bert, head_module):
        self.bert = bert
        self.head = head_module

    def init(self, rngs, *inputs, training: bool = False):
        input_ids, attn = inputs[0], inputs[1]
        out = self.bert(input_ids=jnp.asarray(input_ids,
                                              dtype=jnp.int32),
                        attention_mask=jnp.asarray(attn, dtype=jnp.int32),
                        params=self.bert.params, train=False)
        head_params = self.head.init(rngs, out.pooler_output)
        return {'params': {'bert': self.bert.params,
                           'head': head_params['params']}}

    def apply(self, params, input_ids, attention_mask, training=False,
              rngs=None):
        dropout_rng = rngs.get('dropout') if rngs else None
        out = self.bert(
            input_ids=input_ids.astype(jnp.int32),
            attention_mask=attention_mask.astype(jnp.int32),
            params=params['params']['bert'], dropout_rng=dropout_rng,
            train=bool(training))
        logits = self.head.apply({'params': params['params']['head']},
                                 out.pooler_output)
        return jax.nn.softmax(logits, -1), logits


class ProtBERT(HuggingFaceModel):
    """ProtBERT protein language model (reference torch_models/
    prot_bert.py:7): BERT over space-separated amino-acid sequences;
    supports 'mlm' pretraining and 'classification' with a LogReg, FFN,
    or custom head.

    Zero-egress: built random-init from a ``BertConfig`` with the in-repo
    amino-acid tokenizer by default (the published 'Rostlab/prot_bert'
    checkpoint is hub-only); pass ``model=`` for a local checkpoint.
    Size kwargs (num_hidden_layers/hidden_size/num_attention_heads/
    intermediate_size) shrink the architecture for tests."""

    def __init__(self, task: str = 'mlm', model_path: str =
                 'Rostlab/prot_bert', n_tasks: int = 1,
                 cls_name: str = 'LogReg', classifier_net=None,
                 n_classes: int = 2, tokenizer=None, model=None,
                 max_length: int = 128, **kwargs):
        import flax.linen as nn
        from transformers import (BertConfig, FlaxBertForMaskedLM,
                                  FlaxBertForSequenceClassification,
                                  FlaxBertModel)
        if tokenizer is None:
            tokenizer = _ProteinTokenizer()
        size = dict(
            hidden_size=kwargs.pop('hidden_size', 1024),
            num_hidden_layers=kwargs.pop('num_hidden_layers', 30),
            num_attention_heads=kwargs.pop('num_attention_heads', 16),
            intermediate_size=kwargs.pop('intermediate_size', 4096))
        config = BertConfig(vocab_size=tokenizer.vocab_size,
                            max_position_embeddings=max_length + 2,
                            num_labels=n_classes, **size)
        if task == 'mlm':
            if model is None:
                model = FlaxBertForMaskedLM(config, seed=0)
            super().__init__(model, tokenizer, task='mlm',
                             n_tasks=n_tasks, max_length=max_length,
                             **kwargs)
            return
        if task != 'classification':
            raise ValueError(f'Invalid task: {task}.')
        if cls_name == 'LogReg':
            if model is None:
                model = FlaxBertForSequenceClassification(config, seed=0)
            super().__init__(model, tokenizer, task='classification',
                             n_tasks=n_tasks, max_length=max_length,
                             **kwargs)
            return
        if cls_name == 'FFN':
            head = nn.Sequential([nn.Dense(512), nn.relu,
                                  nn.Dense(n_classes)])
        elif cls_name == 'custom':
            if classifier_net is None:
                raise ValueError(
                    "cls_name='custom' requires classifier_net=")
            head = classifier_net
        else:
            raise ValueError(f'Invalid classifier: {cls_name}.')
        bert = FlaxBertModel(config, seed=0) if model is None else model
        adapter = _BertWithHeadAdapter(bert, head)
        # skip HuggingFaceModel.__init__'s adapter construction: install
        # the head adapter with the classification loss directly
        self.hf_model = bert
        self.tokenizer = tokenizer
        self.task = 'classification'
        self.mlm_probability = 0.15
        self.max_length = max_length
        self.n_tasks = n_tasks

        def loss(outputs, labels, weights):
            logits = outputs[1]
            target = labels[0].astype(jnp.int32).reshape(-1)
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, target[:, None],
                                       axis=-1)[:, 0]
            w = weights[0].reshape(-1) if weights else 1.0
            return jnp.sum(nll * w) / jnp.maximum(
                jnp.sum(w * jnp.ones_like(nll)), 1e-8)

        JaxModel.__init__(self, adapter, loss,
                          output_types=['prediction', 'loss'],
                          batch_size=kwargs.pop('batch_size', 16),
                          **kwargs)


class DeepAbLLM(HuggingFaceModel):
    """Antibody redesign via masked-language-model mutagenesis (reference
    torch_models/antibody_modeling.py:7, extending Hie et al. 2023):
    mask a residue, rescore with the protein LM, propose substitutions.

    Architecture-agnostic like the reference: any model honoring the
    HuggingFaceModel forward contract works via ``model=``; the default
    is a random-init BERT-MLM over the in-repo amino-acid tokenizer
    (hub checkpoints are unavailable in this environment).
    ``is_esm_variant`` controls residue spacing when re-serializing
    sequences ('A M I N O' vs 'AMINO')."""

    def __init__(self, task: str = 'mlm',
                 model_path: str = 'Rostlab/prot_bert',
                 n_tasks: int = 1, is_esm_variant: bool = False,
                 config: Optional[Dict[Any, Any]] = None,
                 tokenizer=None, model=None, max_length: int = 128,
                 **kwargs):
        from transformers import BertConfig, FlaxBertForMaskedLM
        if tokenizer is None:
            tokenizer = _ProteinTokenizer()
        self.is_esm_variant = is_esm_variant
        if model is None:
            cfg_kwargs = dict(hidden_size=128, num_hidden_layers=2,
                              num_attention_heads=4,
                              intermediate_size=256)
            cfg_kwargs.update(config or {})
            bert_config = BertConfig(
                vocab_size=tokenizer.vocab_size,
                max_position_embeddings=max_length + 2, **cfg_kwargs)
            model = FlaxBertForMaskedLM(bert_config, seed=0)
        super().__init__(model, tokenizer, task=task, n_tasks=n_tasks,
                         max_length=max_length, **kwargs)

    def _mask_seq_pos(self, sequence: str, idx: int) -> str:
        """Replace the residue at ``idx`` with the mask token (reference
        antibody_modeling.py:167)."""
        if not isinstance(idx, int):
            raise TypeError(f'Index must be an int, got {type(idx)}')
        cleaned = sequence.replace(' ', '')
        if abs(idx) >= len(cleaned):
            raise ValueError(f'index {idx} out of range for sequence of '
                             f'length {len(cleaned)}')
        chars = list(cleaned)
        chars[idx] = '*'
        joiner = '' if self.is_esm_variant else ' '
        return joiner.join(chars).replace(
            '*', self.tokenizer.mask_token)

    def redesign_residue(self, sequence: str, residue_index: int,
                         top_k: int = 10, verbose: bool = False):
        """Mask + unmask one residue; returns [(token_str, full_sequence,
        score)] sorted by score (reference antibody_modeling.py:208)."""
        masked = self._mask_seq_pos(sequence, residue_index)
        per_mask = self.fill_mask([masked], top_k=top_k)[0]
        cleaned = sequence.replace(' ', '')
        out = []
        if per_mask:
            for cand in per_mask[0]:
                tok = cand['token_str']
                full = (cleaned[:residue_index] + tok +
                        cleaned[residue_index + 1:])
                out.append((tok, full, cand['score']))
        if verbose:
            print(f'Original residue at {residue_index}: '
                  f'{cleaned[residue_index]}')
            for i, (tok, _, score) in enumerate(out):
                print(f'Redesigned residue {i + 1}: {tok}, '
                      f'score: {score}')
        return out

    def _optimize_residue_pos(self, sequence: str, residue_index: int,
                              verbose: bool = False,
                              threshold: float = 0.0, **kwargs):
        """Proposals scoring above both the threshold and the original
        residue (reference antibody_modeling.py:255)."""
        if not 0.0 <= threshold <= 1.0:
            raise ValueError('threshold must be within [0, 1]')
        proposals = self.redesign_residue(
            sequence, residue_index, top_k=kwargs.get('top_k', 10),
            verbose=verbose)
        original = sequence.replace(' ', '')[residue_index]
        optimized = []
        for tok, full, score in proposals:
            if tok == original:
                break                 # proposals are score-sorted
            if score > threshold:
                optimized.append((tok, full, score))
        return optimized

    def redesign_sequence(self, sequence: str, **kwargs):
        """Optimize every residue position; returns [(index, token,
        sequence, score)] (reference antibody_modeling.py:310)."""
        cleaned = sequence.replace(' ', '')
        out = []
        for i in range(len(cleaned)):
            out += [(i,) + x
                    for x in self._optimize_residue_pos(sequence, i,
                                                        **kwargs)]
        return out


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


# OneFormer moved to deepchem_tpu/models/oneformer.py: a native flax
# architecture (the reference instantiates random-init weights from
# config anyway — oneformer.py:143 from_config — so the hub gate here
# was never load-bearing).

"""SMILES tokenizers and HuggingFace featurizer bridges.

Redesigns of reference deepchem/feat/smiles_tokenizer.py (SmilesTokenizer —
BERT wordpiece over a SMILES regex pre-tokenizer, BasicSmilesTokenizer),
bert_tokenizer.py / roberta_tokenizer.py / huggingface_featurizer.py, and
the vocabulary builders (feat/vocabulary_builders/hf_vocab.py).
"""

from __future__ import annotations

import collections
import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from deepchem_tpu.feat.base import Featurizer

# the standard SMILES regex (Schwaller et al.) used by the reference
SMI_REGEX_PATTERN = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|"
    r"\/|:|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])")


class BasicSmilesTokenizer:
    """Regex SMILES tokenizer (reference smiles_tokenizer.py
    BasicSmilesTokenizer)."""

    def __init__(self, regex_pattern: str = SMI_REGEX_PATTERN):
        self.regex_pattern = regex_pattern
        self.regex = re.compile(regex_pattern)

    def tokenize(self, text: str) -> List[str]:
        return [t for t in self.regex.findall(text)]


class SmilesTokenizer:
    """Vocabulary-backed SMILES tokenizer with BERT-style special tokens
    (reference smiles_tokenizer.py SmilesTokenizer; the reference subclasses
    transformers.BertTokenizer — this implementation is self-contained but
    vocab-file compatible)."""

    def __init__(self, vocab_file: Optional[str] = None, **kwargs):
        self.basic = BasicSmilesTokenizer()
        self.vocab: Dict[str, int] = {}
        if vocab_file and os.path.exists(vocab_file):
            with open(vocab_file) as f:
                for i, line in enumerate(f):
                    self.vocab[line.strip()] = i
        else:
            for tok in ('[PAD]', '[unused1]', '[unused2]', '[UNK]',
                        '[CLS]', '[SEP]', '[MASK]'):
                self.vocab[tok] = len(self.vocab)
        self.ids_to_tokens = {v: k for k, v in self.vocab.items()}
        self.pad_token = '[PAD]'
        self.unk_token = '[UNK]'
        self.cls_token = '[CLS]'
        self.sep_token = '[SEP]'
        self.mask_token = '[MASK]'

    @classmethod
    def from_corpus(cls, smiles_list: Sequence[str]) -> 'SmilesTokenizer':
        """Build a vocabulary from data (reference
        vocabulary_builders/hf_vocab.py behavior)."""
        tok = cls()
        counter: collections.Counter = collections.Counter()
        basic = BasicSmilesTokenizer()
        for s in smiles_list:
            counter.update(basic.tokenize(s))
        for t, _ in counter.most_common():
            if t not in tok.vocab:
                tok.vocab[t] = len(tok.vocab)
        tok.ids_to_tokens = {v: k for k, v in tok.vocab.items()}
        return tok

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def vocab_list(self) -> List[str]:
        """Vocabulary tokens in id order (reference
        smiles_tokenizer.py:106)."""
        return list(self.vocab.keys())

    @property
    def cls_token_id(self) -> int:
        return self.vocab[self.cls_token]

    @property
    def sep_token_id(self) -> int:
        return self.vocab[self.sep_token]

    def tokenize(self, text: str) -> List[str]:
        return self.basic.tokenize(text)

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        """Join tokens, merging '##' wordpieces (reference
        smiles_tokenizer.py:147)."""
        return ' '.join(tokens).replace(' ##', '').strip()

    def add_special_tokens_single_sequence(self,
                                           tokens: List[str]) -> List[str]:
        """[CLS] X [SEP] on token strings (reference
        smiles_tokenizer.py:178)."""
        return [self.cls_token] + list(tokens) + [self.sep_token]

    def add_special_tokens_ids_single_sequence(
            self, token_ids: List[int]) -> List[int]:
        """[CLS] X [SEP] on token ids (reference
        smiles_tokenizer.py:164)."""
        return [self.cls_token_id] + list(token_ids) + [self.sep_token_id]

    def add_special_tokens_ids_sequence_pair(
            self, token_ids_0: List[int],
            token_ids_1: List[int]) -> List[int]:
        """[CLS] A [SEP] B [SEP] on token ids (reference
        smiles_tokenizer.py:189)."""
        return ([self.cls_token_id] + list(token_ids_0)
                + [self.sep_token_id] + list(token_ids_1)
                + [self.sep_token_id])

    def convert_tokens_to_ids(self, tokens) -> List[int]:
        if isinstance(tokens, str):
            return self.vocab.get(tokens, self.vocab['[UNK]'])
        return [self.vocab.get(t, self.vocab['[UNK]']) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> List[str]:
        return [self.ids_to_tokens.get(int(i), '[UNK]') for i in ids]

    def encode(self, text: str, max_length: Optional[int] = None,
               add_special_tokens: bool = True,
               padding: bool = True) -> List[int]:
        toks = self.tokenize(text)
        if add_special_tokens:
            toks = ['[CLS]'] + toks + ['[SEP]']
        ids = self.convert_tokens_to_ids(toks)
        if max_length is not None:
            ids = ids[:max_length]
            if padding:
                ids = ids + [self.vocab['[PAD]']] * (max_length - len(ids))
        return ids

    def decode(self, ids) -> str:
        toks = [t for t in self.convert_ids_to_tokens(ids)
                if t not in ('[PAD]', '[CLS]', '[SEP]')]
        return ''.join(toks)

    def add_padding_tokens(self, ids: List[int], length: int) -> List[int]:
        return ids + [self.vocab['[PAD]']] * (length - len(ids))

    def save_vocabulary(self, vocab_path: str) -> str:
        path = os.path.join(vocab_path, 'vocab.txt') \
            if os.path.isdir(vocab_path) else vocab_path
        with open(path, 'w') as f:
            for tok, _ in sorted(self.vocab.items(), key=lambda kv: kv[1]):
                f.write(tok + '\n')
        return path


class HuggingFaceFeaturizer(Featurizer):
    """Wrap any HF tokenizer as a featurizer (reference
    feat/huggingface_featurizer.py)."""

    def __init__(self, tokenizer, max_length: int = 128):
        self.tokenizer = tokenizer
        self.max_length = max_length

    def _featurize(self, datapoint: str, **kwargs):
        out = self.tokenizer(datapoint, truncation=True,
                             padding='max_length',
                             max_length=self.max_length)
        return {k: np.asarray(v) for k, v in out.items()}


class BertFeaturizer(HuggingFaceFeaturizer):
    """(reference feat/bert_tokenizer.py)"""


class RobertaFeaturizer(HuggingFaceFeaturizer):
    """(reference feat/roberta_tokenizer.py)"""


class RxnFeaturizer(Featurizer):
    """Reaction SMILES featurizer (reference feat/reaction_featurizer.py):
    tokenizes source/target sides separately."""

    def __init__(self, tokenizer, sep_reagent: bool = True,
                 max_length: int = 256):
        self.tokenizer = tokenizer
        self.sep_reagent = sep_reagent
        self.max_length = max_length

    def _featurize(self, datapoint: str, **kwargs):
        parts = str(datapoint).split('>')
        reactant, reagent, product = (parts + ['', '', ''])[:3]
        if self.sep_reagent:
            source = f'{reactant}>{reagent}'
        else:
            joined = reactant if not reagent else f'{reactant}.{reagent}'
            source = f'{joined}>'
        src = self.tokenizer(source, truncation=True,
                             padding='max_length',
                             max_length=self.max_length)
        tgt = self.tokenizer(product, truncation=True,
                             padding='max_length',
                             max_length=self.max_length)
        return {'source_' + k: np.asarray(v) for k, v in src.items()} | \
               {'target_' + k: np.asarray(v) for k, v in tgt.items()}


class VocabularyBuilder:
    """Abstract vocabulary builder (reference
    feat/vocabulary_builders/vocabulary_builder.py)."""

    def build(self, dataset):
        raise NotImplementedError()

    def extend(self, dataset):
        """Extend an existing vocabulary from a dataset (reference
        vocabulary_builders/vocabulary_builder.py:38 abstract hook)."""
        raise NotImplementedError()

    @classmethod
    def load(cls, fname: str):
        raise NotImplementedError()

    def save(self, fname: str):
        raise NotImplementedError()


class HuggingFaceVocabularyBuilder(VocabularyBuilder):
    """Wrapper over huggingface ``tokenizers`` training algorithms
    (reference feat/vocabulary_builders/hf_vocab.py:9).

    Parameters
    ----------
    model: tokenizers.models.Model
        The core tokenization algorithm (e.g. ``models.BPE``).
    trainer: tokenizers.trainers.Trainer
        The matching trainer (e.g. ``trainers.BpeTrainer``).
    """

    def __init__(self, model, trainer):
        from tokenizers import Tokenizer
        self.model = model
        self.trainer = trainer
        self.tokenizer = Tokenizer(model)

    def build(self, paths):  # type: ignore[override]
        """Train the algorithm on text files (list of paths)."""
        self.tokenizer.train(paths, self.trainer)

    @classmethod
    def load(cls, fname: str):
        """Load a trained vocabulary as a fast transformers tokenizer."""
        from transformers import PreTrainedTokenizerFast
        return PreTrainedTokenizerFast(tokenizer_file=fname)

    def save(self, fname: str) -> None:
        """Serialize the trained tokenizer to a json file."""
        self.tokenizer.save(fname)

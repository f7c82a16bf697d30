"""Sequence-to-sequence models (reference deepchem/models/seqtoseq.py:44
SeqToSeq, :420 AspuruGuzikAutoEncoder; torch port
torch_models/seqtoseq.py).

Encoder: stacked GRU over input tokens -> embedding vector.
Decoder: GRU unrolled for max_output_length steps from the embedding.
Variational option adds the reparameterized KL as in the reference.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepchem_tpu.models.jax_model import JaxModel


class _Encoder(nn.Module):
    embedding_dimension: int
    n_layers: int

    @nn.compact
    def __call__(self, tokens_onehot):
        x = tokens_onehot
        for i in range(self.n_layers):
            x = nn.RNN(nn.GRUCell(features=self.embedding_dimension))(x)
        return x[:, -1, :]     # final state


class _Decoder(nn.Module):
    embedding_dimension: int
    n_layers: int
    output_tokens: int
    max_output_length: int

    @nn.compact
    def __call__(self, embedding):
        B = embedding.shape[0]
        x = jnp.repeat(embedding[:, None, :], self.max_output_length,
                       axis=1)
        for i in range(self.n_layers):
            x = nn.RNN(nn.GRUCell(features=self.embedding_dimension))(x)
        logits = nn.Dense(self.output_tokens)(x)
        return logits


class _SeqToSeqModule(nn.Module):
    input_tokens: int
    output_tokens: int
    max_output_length: int
    embedding_dimension: int
    encoder_layers: int
    decoder_layers: int
    variational: bool

    @nn.compact
    def __call__(self, tokens, training: bool = False):
        onehot = jax.nn.one_hot(tokens.astype(jnp.int32),
                                self.input_tokens)
        emb = _Encoder(self.embedding_dimension, self.encoder_layers)(
            onehot)
        if self.variational:
            mu = nn.Dense(self.embedding_dimension)(emb)
            logvar = nn.Dense(self.embedding_dimension)(emb)
            if training:
                rng = self.make_rng('dropout')
                eps = jax.random.normal(rng, mu.shape)
                z = mu + jnp.exp(0.5 * logvar) * eps
            else:
                z = mu
            logits = _Decoder(self.embedding_dimension,
                              self.decoder_layers, self.output_tokens,
                              self.max_output_length)(z)
            return logits, z, mu, logvar
        logits = _Decoder(self.embedding_dimension, self.decoder_layers,
                          self.output_tokens, self.max_output_length)(emb)
        return logits, emb


class SeqToSeqModel(JaxModel):
    """(reference seqtoseq.py:44).

    fit_sequences(iterable of (input_str, output_str)); predict_from_
    sequences / predict_embeddings mirror the reference API.
    """

    sequence_end = object()

    def __init__(self, input_tokens: Sequence[str],
                 output_tokens: Sequence[str], max_output_length: int,
                 encoder_layers: int = 4, decoder_layers: int = 4,
                 embedding_dimension: int = 512, dropout: float = 0.0,
                 reverse_input: bool = True, variational: bool = False,
                 annealing_start_step: int = 5000,
                 annealing_final_step: int = 10000,
                 batch_size: int = 100, **kwargs):
        self._input_dict = {t: i for i, t in enumerate(input_tokens)}
        self._output_dict = {t: i for i, t in enumerate(output_tokens)}
        self._output_tokens = list(output_tokens)
        self.max_output_length = max_output_length
        self.reverse_input = reverse_input
        self.variational = variational
        self.annealing_start_step = annealing_start_step
        self.annealing_final_step = annealing_final_step
        self._max_input_length = None
        module = _SeqToSeqModule(
            input_tokens=len(input_tokens) + 1,
            output_tokens=len(output_tokens) + 1,
            max_output_length=max_output_length,
            embedding_dimension=embedding_dimension,
            encoder_layers=encoder_layers, decoder_layers=decoder_layers,
            variational=variational)

        model_self = self

        def loss_fn(outputs, labels, weights):
            logits = outputs[0]
            target = labels[0].astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, target[..., None],
                                       axis=-1)[..., 0]
            rec = jnp.mean(nll)
            if model_self.variational:
                _, _, mu, logvar = outputs
                kl = 0.5 * jnp.mean(jnp.sum(
                    jnp.square(mu) + jnp.exp(logvar) - 1 - logvar,
                    axis=-1))
                step = model_self._global_step
                a0, a1 = (model_self.annealing_start_step,
                          model_self.annealing_final_step)
                anneal = min(1.0, max(0.0, (step - a0) / max(1, a1 - a0)))
                return rec + anneal * kl
            return rec
        output_types = (['prediction', 'embedding', 'loss', 'loss']
                        if variational else ['prediction', 'embedding'])
        super().__init__(module, loss_fn, output_types=output_types,
                         batch_size=batch_size, **kwargs)

    # -- sequence plumbing (reference seqtoseq.py fit_sequences etc.) ------
    def _encode_input(self, seq: str, length: int) -> np.ndarray:
        ids = [self._input_dict.get(c, len(self._input_dict))
               for c in seq][:length]
        if self.reverse_input:
            ids = ids[::-1]
        ids += [len(self._input_dict)] * (length - len(ids))
        return np.array(ids, dtype=np.int32)

    def _encode_output(self, seq: str) -> np.ndarray:
        ids = [self._output_dict.get(c, len(self._output_dict))
               for c in seq][:self.max_output_length]
        ids += [len(self._output_dict)] * \
            (self.max_output_length - len(ids))
        return np.array(ids, dtype=np.int32)

    def _sequence_batches(self, sequences, batch_size: int):
        sequences = list(sequences)
        length = max((len(s) for s, _ in sequences), default=1)
        self._max_input_length = length
        for start in range(0, len(sequences), batch_size):
            chunk = sequences[start:start + batch_size]
            while len(chunk) < batch_size:
                chunk = chunk + chunk[:batch_size - len(chunk)]
            X = np.stack([self._encode_input(s, length)
                          for s, _ in chunk])
            Y = np.stack([self._encode_output(t) for _, t in chunk])
            yield ([X], [Y], [np.ones((batch_size, 1), np.float32)])

    def fit_sequences(self, sequences: Iterable[Tuple[str, str]],
                      max_checkpoints_to_keep: int = 5,
                      checkpoint_interval: int = 1000,
                      restore: bool = False) -> float:
        """(reference seqtoseq.py fit_sequences)"""
        return self.fit_generator(
            self._sequence_batches(sequences, self.batch_size),
            max_checkpoints_to_keep, checkpoint_interval, restore)

    def predict_from_sequences(self, sequences: Iterable[str],
                               beam_width: int = 1) -> List[List[str]]:
        out = []
        sequences = list(sequences)
        length = self._max_input_length or max(
            (len(s) for s in sequences), default=1)
        fn = self._get_predict_fn(training=False)
        for start in range(0, len(sequences), self.batch_size):
            chunk = sequences[start:start + self.batch_size]
            real = len(chunk)
            while len(chunk) < self.batch_size:
                chunk = chunk + chunk[:self.batch_size - len(chunk)]
            X = np.stack([self._encode_input(s, length) for s in chunk])
            if not self._built:
                self.build([jnp.asarray(X)])
            outputs = fn(self.params, None, jnp.asarray(X))
            logits = np.asarray(outputs[0])[:real]
            for row in logits:
                ids = row.argmax(axis=-1)
                toks = [self._output_tokens[i] for i in ids
                        if i < len(self._output_tokens)]
                out.append(toks)
        return out

    def predict_embeddings(self, sequences: Iterable[str]) -> np.ndarray:
        sequences = list(sequences)
        length = self._max_input_length or max(
            (len(s) for s in sequences), default=1)
        fn = self._get_predict_fn(training=False)
        embs = []
        for start in range(0, len(sequences), self.batch_size):
            chunk = sequences[start:start + self.batch_size]
            real = len(chunk)
            while len(chunk) < self.batch_size:
                chunk = chunk + chunk[:self.batch_size - len(chunk)]
            X = np.stack([self._encode_input(s, length) for s in chunk])
            if not self._built:
                self.build([jnp.asarray(X)])
            outputs = fn(self.params, None, jnp.asarray(X))
            embs.append(np.asarray(outputs[1])[:real])
        return np.concatenate(embs)

    def predict_from_embeddings(self, embeddings: np.ndarray
                                ) -> List[List[str]]:
        """Decode output sequences from embedding vectors (reference
        seqtoseq.py:275; torch_models/seqtoseq.py:481
        ``predict_from_embedding``)."""
        embs = np.asarray(embeddings, dtype=np.float32)
        dec = _Decoder(self.module.embedding_dimension,
                       self.module.decoder_layers,
                       self.module.output_tokens,
                       self.module.max_output_length)
        # decode through the trained decoder params
        dec_params = {'params': self.params['params']['_Decoder_0']}
        logits = dec.apply(dec_params, jnp.asarray(embs))
        out = []
        for row in np.asarray(logits):
            ids = row.argmax(axis=-1)
            out.append([self._output_tokens[i] for i in ids
                        if i < len(self._output_tokens)])
        return out

    # torch-harness spelling (reference torch_models/seqtoseq.py:481)
    predict_from_embedding = predict_from_embeddings


SeqToSeq = SeqToSeqModel


class AspuruGuzikAutoEncoder(SeqToSeqModel):
    """Variational molecular autoencoder (reference seqtoseq.py:420)."""

    def __init__(self, num_tokens=None, max_output_length=None,
                 tokens: Optional[Sequence[str]] = None, **kwargs):
        if tokens is None and num_tokens is not None:
            tokens = [chr(ord('a') + i) for i in range(num_tokens)]
        kwargs.setdefault('variational', True)
        kwargs.setdefault('reverse_input', False)
        super().__init__(tokens, tokens, max_output_length, **kwargs)

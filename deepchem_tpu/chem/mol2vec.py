"""Native mol2vec: substructure embeddings without gensim or a
downloaded corpus model.

The reference's Mol2VecFingerprint (feat/molecule_featurizers/
mol2vec_fingerprint.py) wraps the mol2vec package: molecules become
"sentences" of Morgan substructure identifiers (Jaeger, Fulle & Turk,
J. Chem. Inf. Model. 2018) and a gensim word2vec model — pretrained on
20M ZINC/ChEMBL compounds — embeds each identifier; the fingerprint is
the sum of a molecule's identifier vectors.  Neither gensim nor the
pretrained model exists in this environment, so this module implements
the whole pipeline natively:

- :func:`mol_to_sentence`: per-atom Morgan identifiers at radii
  0..radius, interleaved per atom (mol2vec's MolSentence order), using
  the same invariant iteration as chem/fingerprints.py.
- :func:`train_mol2vec`: skip-gram with negative sampling (SGNS,
  Mikolov et al. 2013) in vectorized numpy — unigram^0.75 negative
  table, linear lr decay, rare identifiers folded into the ``UNK``
  token so unseen-at-inference always has a trained vector.
- :class:`Mol2VecModel`: vocab + vectors with npz save/load.

The shipped default corpus is the local tox21 mirror (trained on first
use and cached under the data dir) — smaller than the published 20M
model but the same construction; pass your own corpus to
``train_mol2vec`` for production embeddings.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from deepchem_tpu.chem.mol import Molecule

logger = logging.getLogger(__name__)

UNK = 'UNK'


def _initial_invariants(mol: Molecule) -> List[int]:
    from deepchem_tpu.chem.fingerprints import _hash_ints
    invs = []
    for a in mol.atoms:
        fields = [a.atomic_num, a.degree, a.total_hs, a.formal_charge,
                  int(a.is_aromatic), a.num_radical_electrons]
        invs.append(_hash_ints(fields))
    return invs


def mol_to_sentence(mol: Molecule, radius: int = 1) -> List[str]:
    """Morgan identifier sentence: for each atom, its substructure
    identifiers at radii 0..radius, interleaved per atom (mol2vec
    MolSentence convention).  Identifiers are decimal strings of the
    32-bit environment hashes."""
    from deepchem_tpu.chem.fingerprints import _hash_ints
    n = mol.num_atoms
    per_atom: List[List[int]] = [[inv] for inv in
                                 _initial_invariants(mol)]
    current = [ids[0] for ids in per_atom]
    for r in range(1, radius + 1):
        new = []
        for i in range(n):
            nbrs = []
            for b in mol.atom_bonds(i):
                j = b.other(i)
                nbrs.append((int(round(b.order * 2)), current[j]))
            nbrs.sort()
            flat = [r, current[i]]
            for oc, inv in nbrs:
                flat.extend((oc, inv))
            new.append(_hash_ints(flat))
        for i in range(n):
            per_atom[i].append(new[i])
        current = new
    out: List[str] = []
    for ids in per_atom:
        out.extend(str(h) for h in ids)
    return out


class Mol2VecModel:
    """Trained identifier embeddings: ``model[word] -> (dim,)``."""

    def __init__(self, vocab: Dict[str, int], vectors: np.ndarray):
        self.vocab = vocab
        self.vectors = vectors

    @property
    def vector_size(self) -> int:
        return self.vectors.shape[1]

    def __contains__(self, word: str) -> bool:
        return word in self.vocab

    def __getitem__(self, word: str) -> np.ndarray:
        return self.vectors[self.vocab.get(word, self.vocab[UNK])]

    def save(self, path: str) -> None:
        words = sorted(self.vocab, key=self.vocab.get)
        np.savez_compressed(path, words=np.asarray(words, dtype=object),
                            vectors=self.vectors)

    @classmethod
    def load(cls, path: str) -> 'Mol2VecModel':
        data = np.load(path, allow_pickle=True)
        words = list(data['words'])
        return cls({w: i for i, w in enumerate(words)}, data['vectors'])


def train_mol2vec(sentences: Sequence[Sequence[str]],
                  vector_size: int = 300, window: int = 10,
                  min_count: int = 3, negative: int = 5,
                  epochs: int = 3, lr: float = 0.025,
                  seed: int = 0, batch: int = 8192) -> Mol2VecModel:
    """Skip-gram with negative sampling over identifier sentences.

    Vectorized numpy minibatch SGD: positive pairs from a
    ``window``-wide context, ``negative`` samples per pair from the
    unigram^0.75 distribution, sigmoid losses, linear lr decay to
    lr/10.  Rare words (< min_count) are replaced by ``UNK`` so every
    later query has a trained vector."""
    rng = np.random.RandomState(seed)
    counts: Dict[str, int] = {}
    for s in sentences:
        for w in s:
            counts[w] = counts.get(w, 0) + 1
    vocab: Dict[str, int] = {UNK: 0}
    for w, c in sorted(counts.items(), key=lambda kv: -kv[1]):
        if c >= min_count:
            vocab[w] = len(vocab)
    V = len(vocab)
    encoded = [np.asarray([vocab.get(w, 0) for w in s], dtype=np.int32)
               for s in sentences if len(s) > 1]
    # positive pair list (center, context)
    centers, contexts = [], []
    for s in encoded:
        L = len(s)
        for i in range(L):
            lo = max(0, i - window)
            hi = min(L, i + window + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(s[i])
                    contexts.append(s[j])
    centers = np.asarray(centers, dtype=np.int32)
    contexts = np.asarray(contexts, dtype=np.int32)
    n_pairs = len(centers)
    if n_pairs == 0:
        raise ValueError('corpus produced no training pairs')
    # unigram^0.75 negative-sampling table
    freq = np.zeros(V)
    for s in encoded:
        np.add.at(freq, s, 1.0)
    p_neg = freq ** 0.75
    p_neg /= p_neg.sum()
    syn0 = (rng.rand(V, vector_size).astype(np.float32) - 0.5) \
        / vector_size
    syn1 = np.zeros((V, vector_size), dtype=np.float32)
    total_steps = max(1, epochs * ((n_pairs + batch - 1) // batch))
    step = 0
    for _epoch in range(epochs):
        order = rng.permutation(n_pairs)
        for lo in range(0, n_pairs, batch):
            idx = order[lo:lo + batch]
            c = centers[idx]
            o = contexts[idx]
            negs = rng.choice(V, size=(len(idx), negative), p=p_neg)
            cur_lr = lr * max(0.1, 1.0 - step / total_steps)
            step += 1
            v = syn0[c]                                  # [B, D]
            u_pos = syn1[o]                              # [B, D]
            u_neg = syn1[negs]                           # [B, K, D]

            def sigmoid(x):
                return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))
            s_pos = sigmoid(np.sum(v * u_pos, axis=1))
            s_neg = sigmoid(np.einsum('bd,bkd->bk', v, u_neg))
            g_pos = (s_pos - 1.0)[:, None]               # dL/d(v.u_pos)
            g_neg = s_neg[..., None]                     # dL/d(v.u_neg)
            grad_v = g_pos * u_pos + np.einsum('bk,bkd->bd',
                                               s_neg, u_neg)
            # duplicate rows in a batch would otherwise sum into one
            # giant step (np.add.at accumulates); normalize per row so
            # each word moves by its mean batch gradient
            upd0 = np.zeros_like(syn0)
            np.add.at(upd0, c, grad_v)
            cnt0 = np.bincount(c, minlength=V).astype(
                np.float32)[:, None]
            syn0 -= cur_lr * upd0 / np.maximum(cnt0, 1.0)
            upd1 = np.zeros_like(syn1)
            np.add.at(upd1, o, g_pos * v)
            np.add.at(upd1, negs.reshape(-1),
                      (g_neg * v[:, None, :]).reshape(-1, vector_size))
            cnt1 = (np.bincount(o, minlength=V)
                    + np.bincount(negs.reshape(-1), minlength=V)
                    ).astype(np.float32)[:, None]
            syn1 -= cur_lr * upd1 / np.maximum(cnt1, 1.0)
    return Mol2VecModel(vocab, syn0)


def sentences2vec(sentences: Sequence[Sequence[str]],
                  model: Mol2VecModel,
                  unseen: Optional[str] = UNK) -> np.ndarray:
    """Sum of identifier vectors per sentence (reference mol2vec
    features.sentences2vec semantics)."""
    out = np.zeros((len(sentences), model.vector_size), dtype=np.float32)
    for i, s in enumerate(sentences):
        for w in s:
            if w in model:
                out[i] += model[w]
            elif unseen is not None:
                out[i] += model.vectors[model.vocab[unseen]]
    return out


_DEFAULT_CORPUS_CACHE = 'mol2vec_tox21_r1_d300.npz'


def default_corpus_model(radius: int = 1,
                         vector_size: int = 300) -> Mol2VecModel:
    """The framework's own corpus model: trained on the local tox21
    mirror on first use, cached under the data dir."""
    from deepchem_tpu.utils.data_utils import get_data_dir
    cache = os.path.join(get_data_dir(), _DEFAULT_CORPUS_CACHE)
    if os.path.exists(cache):
        return Mol2VecModel.load(cache)
    import csv
    import gzip
    from deepchem_tpu.chem.smiles import mol_from_smiles
    path = None
    for mirror in ('/root/reference/datasets/tox21.csv.gz',
                   os.path.join(get_data_dir(), 'tox21.csv.gz')):
        if os.path.exists(mirror):
            path = mirror
            break
    if path is None:
        raise FileNotFoundError(
            'no local tox21 mirror to train the default mol2vec corpus '
            'model; pass pretrain_model_path= or model= instead')
    logger.info('training default mol2vec corpus model on %s '
                '(one-time, cached at %s)', path, cache)
    with gzip.open(path, 'rt') as fh:
        smiles = [row['smiles'] for row in csv.DictReader(fh)]
    sentences = []
    for smi in smiles:
        try:
            mol = mol_from_smiles(smi)
        except Exception:
            mol = None
        if mol is not None:
            sentences.append(mol_to_sentence(mol, radius))
    model = train_mol2vec(sentences, vector_size=vector_size,
                          epochs=2, min_count=3)
    model.save(cache)
    return model

"""Genomics sequence helpers (reference deepchem/utils/genomics_utils.py:
seq_one_hot_encode, encode_bio_sequence)."""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


def seq_one_hot_encode(sequences, letters: str = 'ATCGN') -> np.ndarray:
    """One-hot encode an iterable of equal-length sequences into
    (N, len(letters), seq_len, 1) (reference genomics_utils
    seq_one_hot_encode)."""
    seqs = [str(s) for s in sequences]
    if not seqs:
        return np.zeros((0, len(letters), 0, 1))
    L = len(seqs[0])
    for s in seqs:
        if len(s) != L:
            raise ValueError('sequences must have equal length')
    out = np.zeros((len(seqs), len(letters), L, 1), dtype=np.float32)
    index = {c: i for i, c in enumerate(letters)}
    for i, s in enumerate(seqs):
        for j, c in enumerate(s.upper()):
            if c in index:
                out[i, index[c], j, 0] = 1.0
    return out


def encode_bio_sequence(fname: str, file_type: str = 'fasta',
                        letters: str = 'ATCGN') -> np.ndarray:
    """FASTA file -> one-hot array (reference genomics_utils
    encode_bio_sequence)."""
    seqs: List[str] = []
    header = None
    chunks: List[str] = []
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if line.startswith('>'):
                if header is not None:
                    seqs.append(''.join(chunks))
                header = line[1:]
                chunks = []
            elif line:
                chunks.append(line)
    if header is not None:
        seqs.append(''.join(chunks))
    return seq_one_hot_encode(seqs, letters)


def sequence_to_kmers(sequence: str, k: int = 3) -> List[str]:
    """Sliding k-mers."""
    return [sequence[i:i + k] for i in range(len(sequence) - k + 1)]

"""Genomics metrics (reference deepchem/metrics/genomic_metrics.py:11-123:
motif PWM scoring, in-silico mutagenesis)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def get_motif_scores(encoded_sequences: np.ndarray, motif_names,
                     max_scores: Optional[int] = None,
                     return_positions: bool = False,
                     GC_fraction: float = 0.4,
                     pwms: Optional[dict] = None) -> np.ndarray:
    """Score one-hot sequences against PWMs (reference
    genomic_metrics.py:11; the reference fetches PWMs from simdna — here
    they are passed in as {name: (4, L) matrix})."""
    if pwms is None:
        raise ValueError('pass pwms={name: (4, L) weight matrix}')
    seqs = np.asarray(encoded_sequences)          # (N, 1, 4, L) or (N,4,L)
    if seqs.ndim == 4:
        seqs = seqs[:, 0]
    out = []
    for name in motif_names:
        pwm = np.asarray(pwms[name])
        out.append(get_pssm_scores(seqs, pwm, GC_fraction))
    scores = np.stack(out, axis=1)                 # (N, n_motifs, L)
    if max_scores is not None:
        scores = np.sort(scores, axis=-1)[..., ::-1][..., :max_scores]
    return scores


def get_pssm_scores(encoded_sequences: np.ndarray, pssm: np.ndarray,
                    GC_fraction: float = 0.4) -> np.ndarray:
    """Sliding-window log-odds scores (reference
    genomic_metrics.py get_pssm_scores)."""
    seqs = np.asarray(encoded_sequences, dtype=float)   # (N, 4, L)
    pssm = np.asarray(pssm, dtype=float)
    bg = np.array([(1 - GC_fraction) / 2, GC_fraction / 2,
                   GC_fraction / 2, (1 - GC_fraction) / 2])
    log_odds = np.log(np.maximum(pssm, 1e-9) / bg[:, None])
    n, _, L = seqs.shape
    w = log_odds.shape[1]
    out = np.zeros((n, L))
    for start in range(L - w + 1):
        window = seqs[:, :, start:start + w]
        out[:, start] = np.einsum('ncl,cl->n', window, log_odds)
    return out


def in_silico_mutagenesis(model, encoded_sequences: np.ndarray
                          ) -> np.ndarray:
    """Mutate every position to every base and measure prediction deltas
    (reference genomic_metrics.py in_silico_mutagenesis)."""
    from deepchem_tpu.data import NumpyDataset
    seqs = np.asarray(encoded_sequences)
    base_pred = model.predict(NumpyDataset(seqs))
    base_pred = np.asarray(base_pred)
    N = seqs.shape[0]
    C, L = seqs.shape[-2], seqs.shape[-1]
    out_shape = (C, L) + base_pred.shape
    deltas = np.zeros(out_shape)
    for c in range(C):
        for pos in range(L):
            mutated = seqs.copy()
            if mutated.ndim == 4:
                mutated[:, 0, :, pos] = 0
                mutated[:, 0, c, pos] = 1
            else:
                mutated[:, :, pos] = 0
                mutated[:, c, pos] = 1
            pred = np.asarray(model.predict(NumpyDataset(mutated)))
            deltas[c, pos] = pred - base_pred
    return deltas

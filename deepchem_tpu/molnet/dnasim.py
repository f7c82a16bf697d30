"""DNA sequence simulation for genomics benchmarks.

Redesign of reference deepchem/molnet/dnasim.py (which delegates to the
``simdna`` package and its bundled ENCODE motif file — neither available
here): a self-contained PWM engine with consensus-derived motif models and
the same nine public simulation functions/signatures.  Motif PWMs are
built from published consensus strings (IUPAC) rather than the ENCODE
matrix file, so sampled instances are equivalent for benchmark purposes
(CNN motif-detection tasks) without the external data dependency.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_BASES = np.array(list('ACGT'))
_COMPLEMENT = str.maketrans('ACGT', 'TGCA')

# IUPAC degenerate codes -> base probability rows
_IUPAC = {
    'A': 'A', 'C': 'C', 'G': 'G', 'T': 'T',
    'R': 'AG', 'Y': 'CT', 'S': 'CG', 'W': 'AT', 'K': 'GT', 'M': 'AC',
    'B': 'CGT', 'D': 'AGT', 'H': 'ACT', 'V': 'ACG', 'N': 'ACGT',
}


def _pwm_from_consensus(consensus: str, strength: float = 0.85
                        ) -> np.ndarray:
    """[L, 4] PWM: ``strength`` mass spread over the IUPAC-allowed bases,
    the rest spread uniformly."""
    pwm = np.zeros((len(consensus), 4))
    for i, ch in enumerate(consensus.upper()):
        allowed = [('ACGT').index(b) for b in _IUPAC.get(ch, 'ACGT')]
        pwm[i, :] = (1.0 - strength) / 4.0
        pwm[i, allowed] += strength / len(allowed)
    return pwm


#: published consensus strings for common benchmark TFs (the names mirror
#: the ENCODE motif identifiers the reference uses)
MOTIF_CONSENSUS: Dict[str, str] = {
    'TAL1_known4': 'AACAGATGGT',          # E-box CAGATG core
    'GATA_known1': 'AGATAAGA',            # WGATAR
    'GATA_disc1': 'TTATCT',
    'CTCF_known1': 'CCACCAGGGGGCGCTA',
    'SPI1_known4': 'AAAGAGGAAGTG',        # PU.1 GGAA core
    'CEBPB_known1': 'ATTGCGCAAT',
    'MYC_known1': 'CACGTG',               # E-box palindrome
    'FOXA1_known1': 'TGTTTAC',
    'IRF_known1': 'AANTGAAA',
    'NANOG_known1': 'AGCCATCAA',
    'SIX5_known1': 'GGTGTCA',
    'ZNF143_known2': 'TTCCCAGAATGCATTG',
    'AP1_known1': 'TGACTCA',
    'NFKB_known1': 'GGGACTTTCC',
}

#: user-extensible PWM registry; entries here win over MOTIF_CONSENSUS
MOTIF_PWMS: Dict[str, np.ndarray] = {}


def register_motif(name: str, pwm_or_consensus) -> None:
    """Register a custom motif (PWM array [L,4] or consensus string)."""
    if isinstance(pwm_or_consensus, str):
        MOTIF_PWMS[name] = _pwm_from_consensus(pwm_or_consensus)
    else:
        pwm = np.asarray(pwm_or_consensus, dtype=np.float64)
        MOTIF_PWMS[name] = pwm / pwm.sum(axis=1, keepdims=True)


def _get_pwm(name: str) -> np.ndarray:
    if name in MOTIF_PWMS:
        return MOTIF_PWMS[name]
    if name in MOTIF_CONSENSUS:
        return _pwm_from_consensus(MOTIF_CONSENSUS[name])
    raise KeyError(
        f'unknown motif {name!r}; known: {sorted(MOTIF_CONSENSUS)} '
        f'(register custom ones with register_motif)')


@dataclass
class Embedding:
    """Where a motif instance was planted (simdna embedding equivalent)."""
    what: str
    startPos: int

    def __repr__(self):
        return f'pos-{self.startPos}_{self.what}'


def get_distribution(GC_fraction: float) -> Dict[str, float]:
    """Zero-order background distribution (reference dnasim.py:4)."""
    return {'A': (1 - GC_fraction) / 2, 'C': GC_fraction / 2,
            'G': GC_fraction / 2, 'T': (1 - GC_fraction) / 2}


def _background(rng: np.random.RandomState, length: int,
                GC_fraction: float) -> np.ndarray:
    p = [(1 - GC_fraction) / 2, GC_fraction / 2, GC_fraction / 2,
         (1 - GC_fraction) / 2]
    return rng.choice(4, size=length, p=p)


def _sample_motif(rng: np.random.RandomState, name: str) -> str:
    pwm = _get_pwm(name)
    idx = [rng.choice(4, p=row) for row in pwm]
    s = ''.join(_BASES[idx])
    if rng.rand() < 0.5:                     # reverse-complement wrapper
        s = s.translate(_COMPLEMENT)[::-1]
    return s


def _plant(seq: List[str], motif: str, pos: int) -> None:
    seq[pos:pos + len(motif)] = list(motif)


def _embed_motifs(rng, seq_length, GC_fraction, plan
                  ) -> Tuple[str, List[Embedding]]:
    """plan: list of (motif_name, lo, hi) position windows (hi exclusive,
    None = anywhere)."""
    seq = list(_BASES[_background(rng, seq_length, GC_fraction)])
    embeddings = []
    for name, lo, hi in plan:
        inst = _sample_motif(rng, name)
        hi_eff = (seq_length if hi is None else hi) - len(inst)
        lo_eff = max(lo, 0)
        pos = int(rng.randint(lo_eff, max(hi_eff, lo_eff) + 1))
        _plant(seq, inst, pos)
        embeddings.append(Embedding(f'{name}-{inst}', pos))
    return ''.join(seq), embeddings


def simple_motif_embedding(motif_name: Optional[str], seq_length: int,
                           num_seqs: int, GC_fraction: float,
                           seed: Optional[int] = None):
    """Sequences with one motif instance anywhere (reference
    dnasim.py:14)."""
    rng = np.random.RandomState(seed)
    seqs, embs = [], []
    for _ in range(num_seqs):
        plan = [] if motif_name is None else [(motif_name, 0, None)]
        s, e = _embed_motifs(rng, seq_length, GC_fraction, plan)
        seqs.append(s)
        embs.append(e)
    return np.array(seqs), embs


def motif_density(motif_name: str, seq_length: int, num_seqs: int,
                  min_counts: int, max_counts: int, GC_fraction: float,
                  central_bp: Optional[int] = None,
                  seed: Optional[int] = None):
    """Sequences with [min,max] motif instances, optionally confined to
    the central ``central_bp`` (reference dnasim.py:63)."""
    rng = np.random.RandomState(seed)
    if central_bp is not None:
        lo = (seq_length - central_bp) // 2
        hi = lo + central_bp
    else:
        lo, hi = 0, None
    seqs, embs = [], []
    for _ in range(num_seqs):
        k = int(rng.randint(min_counts, max_counts + 1))
        s, e = _embed_motifs(rng, seq_length, GC_fraction,
                             [(motif_name, lo, hi)] * k)
        seqs.append(s)
        embs.append(e)
    return np.array(seqs), embs


def simulate_single_motif_detection(motif_name, seq_length, num_pos,
                                    num_neg, GC_fraction,
                                    seed: Optional[int] = None):
    """Positive = motif embedded; negative = pure background (reference
    dnasim.py:104)."""
    pos_seq, pos_emb = simple_motif_embedding(motif_name, seq_length,
                                              num_pos, GC_fraction, seed)
    neg_seq, neg_emb = simple_motif_embedding(
        None, seq_length, num_neg, GC_fraction,
        None if seed is None else seed + 1)
    sequence_arr = np.concatenate((pos_seq, neg_seq))
    y = np.array([[True]] * num_pos + [[False]] * num_neg)
    return sequence_arr, y, pos_emb + neg_emb


def simulate_motif_counting(motif_name, seq_length, pos_counts, neg_counts,
                            num_pos, num_neg, GC_fraction,
                            seed: Optional[int] = None):
    """Positive/negative classes differ in motif COUNT (reference
    dnasim.py:143)."""
    pos_seq, pos_emb = motif_density(motif_name, seq_length, num_pos,
                                     pos_counts[0], pos_counts[1],
                                     GC_fraction, seed=seed)
    neg_seq, neg_emb = motif_density(
        motif_name, seq_length, num_neg, neg_counts[0], neg_counts[1],
        GC_fraction, seed=None if seed is None else seed + 1)
    sequence_arr = np.concatenate((pos_seq, neg_seq))
    y = np.array([[True]] * num_pos + [[False]] * num_neg)
    return sequence_arr, y, pos_emb + neg_emb


def simulate_motif_density_localization(motif_name, seq_length, center_size,
                                        min_motif_counts, max_motif_counts,
                                        num_pos, num_neg, GC_fraction,
                                        seed: Optional[int] = None):
    """Positive = motifs confined to the center; negative = anywhere
    (reference dnasim.py:181)."""
    pos_seq, pos_emb = motif_density(motif_name, seq_length, num_pos,
                                     min_motif_counts, max_motif_counts,
                                     GC_fraction, center_size, seed=seed)
    neg_seq, neg_emb = motif_density(
        motif_name, seq_length, num_neg, min_motif_counts,
        max_motif_counts, GC_fraction,
        seed=None if seed is None else seed + 1)
    sequence_arr = np.concatenate((pos_seq, neg_seq))
    y = np.array([[True]] * num_pos + [[False]] * num_neg)
    return sequence_arr, y, pos_emb + neg_emb


def simulate_multi_motif_embedding(motif_names, seq_length, min_num_motifs,
                                   max_num_motifs, num_seqs, GC_fraction,
                                   seed: Optional[int] = None):
    """Embed a random subset of motifs; y is the per-motif presence
    matrix (reference dnasim.py:231)."""
    rng = np.random.RandomState(seed)
    seqs, embs = [], []
    y = np.zeros((num_seqs, len(motif_names)), dtype=bool)
    for i in range(num_seqs):
        k = int(rng.randint(min_num_motifs, max_num_motifs + 1))
        chosen = rng.choice(len(motif_names), size=min(k, len(motif_names)),
                            replace=False)
        plan = [(motif_names[j], 0, None) for j in chosen]
        s, e = _embed_motifs(rng, seq_length, GC_fraction, plan)
        seqs.append(s)
        embs.append(e)
        y[i, chosen] = True
    return np.array(seqs), y, embs


def simulate_differential_accessibility(pos_motif_names, neg_motif_names,
                                        seq_length, min_num_motifs,
                                        max_num_motifs, num_pos, num_neg,
                                        GC_fraction,
                                        seed: Optional[int] = None):
    """Positive/negative classes carry different motif vocabularies
    (reference dnasim.py:294)."""
    pos_seq, _, pos_emb = simulate_multi_motif_embedding(
        pos_motif_names, seq_length, min_num_motifs, max_num_motifs,
        num_pos, GC_fraction, seed)
    neg_seq, _, neg_emb = simulate_multi_motif_embedding(
        neg_motif_names, seq_length, min_num_motifs, max_num_motifs,
        num_neg, GC_fraction, None if seed is None else seed + 1)
    sequence_arr = np.concatenate((pos_seq, neg_seq))
    y = np.array([[True]] * num_pos + [[False]] * num_neg)
    return sequence_arr, y, pos_emb + neg_emb


def simulate_heterodimer_grammar(motif1, motif2, seq_length, min_spacing,
                                 max_spacing, num_pos, num_neg,
                                 GC_fraction, seed: Optional[int] = None):
    """Positive = motif1..motif2 at a constrained spacing; negative =
    both motifs placed independently (reference dnasim.py:335)."""
    rng = np.random.RandomState(seed)
    seqs, pos_emb = [], []
    for _ in range(num_pos):
        m1 = _sample_motif(rng, motif1)
        m2 = _sample_motif(rng, motif2)
        spacing = int(rng.randint(min_spacing, max_spacing + 1))
        total = len(m1) + spacing + len(m2)
        seq = list(_BASES[_background(rng, seq_length, GC_fraction)])
        start = int(rng.randint(0, max(seq_length - total, 0) + 1))
        _plant(seq, m1, start)
        p2 = start + len(m1) + spacing
        _plant(seq, m2, p2)
        seqs.append(''.join(seq))
        pos_emb.append([Embedding(f'{motif1}-{m1}', start),
                        Embedding(f'{motif2}-{m2}', p2)])
    neg_seq, _, neg_emb = simulate_multi_motif_embedding(
        [motif1, motif2], seq_length, 2, 2, num_neg, GC_fraction,
        None if seed is None else seed + 1)
    sequence_arr = np.concatenate((np.array(seqs), neg_seq))
    y = np.array([[True]] * num_pos + [[False]] * num_neg)
    return sequence_arr, y, pos_emb + neg_emb

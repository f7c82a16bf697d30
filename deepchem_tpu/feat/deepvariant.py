"""DeepVariant-style read realignment + pileup images (pysam-free).

Redesign of reference deepchem/feat/deepvariant_featurizer.py (the
``_Realigner`` pipeline: left-align indels, allele counting, candidate
region selection, de Bruijn-graph haplotype assembly, read realignment)
and deepchem/feat/deepvariant_pileup_featurizer.py (multi-channel pileup
images for the variant-calling CNN).  The reference consumes pysam
AlignedSegments; this version consumes plain ``Read`` records so it runs
without pysam, and emits numpy channel images ready for the CNN models.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from deepchem_tpu.feat.base import Featurizer


@dataclass
class Read:
    """A sequencing read aligned (possibly poorly) to a reference."""
    name: str
    sequence: str
    start: int                      # 0-based reference start
    qualities: Optional[Sequence[int]] = None
    mapq: int = 60
    is_reverse: bool = False

    def __post_init__(self):
        if self.qualities is None:
            self.qualities = [30] * len(self.sequence)


def left_align_indel(seq: str, pos: int, indel: str) -> Tuple[int, str]:
    """Shift an indel left while the preceding base matches its tail
    (reference deepvariant_featurizer.py:26)."""
    if indel.startswith('+'):
        # '+<len><seq>'
        i = 1
        while i < len(indel) and indel[i].isdigit():
            i += 1
        indel_seq = indel[i:]
        while pos > 0 and indel_seq and seq[pos - 1] == indel_seq[-1]:
            pos -= 1
            indel_seq = seq[pos] + indel_seq[:-1]
        return pos, f'+{len(indel_seq)}{indel_seq}'
    if indel.startswith('-'):
        del_len = int(indel[1:])
        while pos > 0 and pos + del_len - 1 < len(seq) and \
                seq[pos - 1] == seq[pos + del_len - 1]:
            pos -= 1
        return pos, f'-{del_len}'
    return pos, indel


def allele_counts(reads: Sequence[Read], ref: str
                  ) -> Dict[int, Dict[str, Any]]:
    """Per-position allele counts vs the reference (reference
    process_pileup / update_counts)."""
    counts: Dict[int, Dict[str, Any]] = {}
    for read in reads:
        for i, base in enumerate(read.sequence):
            pos = read.start + i
            if pos < 0 or pos >= len(ref) or base not in 'ACGT':
                continue
            c = counts.setdefault(pos, {
                'reference_base': ref[pos],
                'read_alleles': defaultdict(int), 'coverage': 0})
            c['read_alleles'][base] += 1
            c['coverage'] += 1
    return counts


def select_candidate_regions(counts: Dict[int, Dict[str, Any]],
                             min_alt_count: int = 2,
                             min_alt_fraction: float = 0.2,
                             window_pad: int = 15,
                             merge_gap: int = 10
                             ) -> List[Tuple[int, int]]:
    """Positions with enough non-reference evidence, merged into padded
    windows (reference select_candidate_regions)."""
    cand = []
    for pos, c in counts.items():
        ref_base = c['reference_base']
        alt = sum(n for b, n in c['read_alleles'].items() if b != ref_base)
        if alt >= min_alt_count and \
                alt / max(c['coverage'], 1) >= min_alt_fraction:
            cand.append(pos)
    if not cand:
        return []
    cand.sort()
    regions = []
    lo = hi = cand[0]
    for p in cand[1:]:
        if p - hi <= merge_gap:
            hi = p
        else:
            regions.append((lo - window_pad, hi + window_pad))
            lo = hi = p
    regions.append((lo - window_pad, hi + window_pad))
    return [(max(0, a), b) for a, b in regions]


def get_kmers(sequence: str, k: int) -> List[str]:
    return [sequence[i:i + k] for i in range(len(sequence) - k + 1)]


def build_debruijn_graph(ref_window: str, reads: Sequence[str], k: int
                         ) -> Dict[str, Dict[str, int]]:
    """kmer -> {next_kmer: weight}; reference edges get weight boosted so
    the reference path always survives pruning (reference
    build_debruijn_graph)."""
    graph: Dict[str, Dict[str, int]] = defaultdict(
        lambda: defaultdict(int))
    for seq, w in [(ref_window, 2)] + [(r, 1) for r in reads]:
        kmers = get_kmers(seq, k)
        for a, b in zip(kmers[:-1], kmers[1:]):
            if 'N' in a or 'N' in b:
                continue
            graph[a][b] += w
    return {a: dict(bs) for a, bs in graph.items()}


def prune_debruijn_graph(graph: Dict[str, Dict[str, int]],
                         min_edge_weight: int = 2
                         ) -> Dict[str, Dict[str, int]]:
    return {a: {b: w for b, w in bs.items() if w >= min_edge_weight}
            for a, bs in graph.items()}


def candidate_haplotypes(graph: Dict[str, Dict[str, int]], ref_window: str,
                         k: int, max_haplotypes: int = 32,
                         max_length: Optional[int] = None) -> List[str]:
    """All source->sink paths through the pruned graph between the
    reference window's first and last kmers (reference
    candidate_haplotypes)."""
    if len(ref_window) < k:
        return [ref_window]
    source = ref_window[:k]
    sink = ref_window[-k:]
    max_length = max_length or len(ref_window) + 20
    haps: List[str] = []

    def dfs(kmer: str, seq: str):
        if len(haps) >= max_haplotypes or len(seq) > max_length:
            return
        if kmer == sink and len(seq) >= k:
            haps.append(seq)
            # sink kmer may also continue (cycles through repeats) — stop
            return
        for nxt in graph.get(kmer, {}):
            dfs(nxt, seq + nxt[-1])

    dfs(source, source)
    if ref_window not in haps:
        haps.append(ref_window)
    return haps


def smith_waterman(query: str, target: str, match: int = 2,
                   mismatch: int = -1, gap: int = -2
                   ) -> Tuple[int, int]:
    """Local alignment (numpy DP): returns (best score, target start of
    the best-scoring local alignment) — the role of the reference's
    fast_pass_aligner (SSW library)."""
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    t = np.frombuffer(target.encode(), dtype=np.uint8)
    n, m = len(q), len(t)
    H = np.zeros((n + 1, m + 1), dtype=np.int32)
    start = np.zeros((n + 1, m + 1), dtype=np.int32)
    start[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        sub = np.where(t == q[i - 1], match, mismatch)
        for j in range(1, m + 1):
            diag = H[i - 1, j - 1] + sub[j - 1]
            up = H[i - 1, j] + gap
            left = H[i, j - 1] + gap
            best = max(0, diag, up, left)
            H[i, j] = best
            if best == 0:
                start[i, j] = j
            elif best == diag:
                start[i, j] = start[i - 1, j - 1]
            elif best == up:
                start[i, j] = start[i - 1, j]
            else:
                start[i, j] = start[i, j - 1]
    ij = np.unravel_index(np.argmax(H), H.shape)
    return int(H[ij]), int(start[ij])


class Realigner:
    """Assembly-based read realigner (reference _Realigner,
    deepvariant_featurizer.py:14)."""

    def __init__(self, k: int = 11, min_edge_weight: int = 2,
                 min_alt_count: int = 2, min_alt_fraction: float = 0.2):
        self.k = k
        self.min_edge_weight = min_edge_weight
        self.min_alt_count = min_alt_count
        self.min_alt_fraction = min_alt_fraction

    def realign(self, reads: Sequence[Read], ref: str
                ) -> Tuple[List[Read], List[Dict[str, Any]]]:
        """Returns (realigned reads, candidate windows).  Each window dict
        has 'span' (lo, hi), 'haplotypes', and 'reads' (indices)."""
        counts = allele_counts(reads, ref)
        regions = select_candidate_regions(
            counts, self.min_alt_count, self.min_alt_fraction)
        realigned = list(reads)
        windows: List[Dict[str, Any]] = []
        for lo, hi in regions:
            hi = min(hi, len(ref))
            ref_window = ref[lo:hi]
            in_region = [i for i, r in enumerate(reads)
                         if r.start < hi and r.start + len(r.sequence) > lo]
            graph = build_debruijn_graph(
                ref_window, [reads[i].sequence for i in in_region], self.k)
            graph = prune_debruijn_graph(graph, self.min_edge_weight)
            haps = candidate_haplotypes(graph, ref_window, self.k)
            # realign each read against its best haplotype
            for i in in_region:
                read = reads[i]
                best = (-1, 0, ref_window)
                for hap in haps:
                    score, t_start = smith_waterman(read.sequence, hap)
                    if score > best[0]:
                        best = (score, t_start, hap)
                _, t_start, hap = best
                new_start = lo + t_start
                if hap != ref_window:
                    # map haplotype offset back through the ref prefix
                    new_start = lo + min(t_start, len(ref_window) - 1)
                realigned[i] = Read(read.name, read.sequence, new_start,
                                    read.qualities, read.mapq,
                                    read.is_reverse)
            windows.append({'span': (lo, hi), 'haplotypes': haps,
                            'reads': in_region})
        return realigned, windows



def _decode_one_hot(one_hot_vector, charset=None):
    charset = charset or ['A', 'C', 'T', 'G', 'N']
    return ''.join(charset[int(np.argmax(v))] for v in one_hot_vector)

class RealignerFeaturizer(Featurizer):
    """Featurizer wrapper (reference deepvariant_featurizer.py:717):
    datapoint = (reads, reference_seq) -> (realigned_reads, windows)."""

    def __init__(self, **kwargs):
        self.realigner = Realigner(**kwargs)

    def _featurize(self, datapoint, **kwargs):
        reads, ref = datapoint
        reads = [r if isinstance(r, Read) else Read(*r) for r in reads]
        return self.realigner.realign(reads, ref)

    def decode_one_hot(self, one_hot_vector, charset=None):
        """Decode a one-hot nucleotide sequence (reference
        deepvariant_featurizer.py:747)."""
        return _decode_one_hot(one_hot_vector, charset)


_BASE_INTENSITY = {'A': 250.0, 'G': 180.0, 'T': 100.0, 'C': 30.0}


class PileupFeaturizer(Featurizer):
    """Multi-channel pileup images (reference
    deepvariant_pileup_featurizer.py): datapoint = (reads, ref, center)
    -> [height, width, 6] float image.

    Channels: base identity, base quality, mapping quality, strand,
    matches-ref, supports-most-common-alt.
    """

    def __init__(self, height: int = 100, width: int = 221):
        self.height = height
        self.width = width

    def decode_one_hot(self, one_hot_vector, charset=None):
        """Decode a one-hot nucleotide sequence (reference
        deepvariant_pileup_featurizer.py:47)."""
        return _decode_one_hot(one_hot_vector, charset)

    def _featurize(self, datapoint, **kwargs):
        reads, ref, center = datapoint
        reads = [r if isinstance(r, Read) else Read(*r) for r in reads]
        h, w = self.height, self.width
        img = np.zeros((h, w, 6), dtype=np.float32)
        lo = center - w // 2
        # most common alt at center
        c = allele_counts(reads, ref).get(center)
        alt_base = None
        if c:
            alts = {b: n for b, n in c['read_alleles'].items()
                    if b != c['reference_base']}
            if alts:
                alt_base = max(alts, key=alts.get)
        for row, read in enumerate(reads[:h]):
            supports_alt = (alt_base is not None
                            and 0 <= center - read.start
                            < len(read.sequence)
                            and read.sequence[center - read.start]
                            == alt_base)
            for i, base in enumerate(read.sequence):
                col = read.start + i - lo
                if not 0 <= col < w:
                    continue
                pos = read.start + i
                img[row, col, 0] = _BASE_INTENSITY.get(base, 0.0) / 250.0
                img[row, col, 1] = min(read.qualities[i], 40) / 40.0
                img[row, col, 2] = min(read.mapq, 60) / 60.0
                img[row, col, 3] = 1.0 if read.is_reverse else 0.5
                img[row, col, 4] = 1.0 if (0 <= pos < len(ref)
                                           and ref[pos] == base) else 0.2
                img[row, col, 5] = 1.0 if supports_alt else 0.5
        return img

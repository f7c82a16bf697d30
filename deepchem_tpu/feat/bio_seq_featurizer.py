"""Aligned-read featurizers (reference deepchem/feat/bio_seq_featurizer.py
SAMFeaturizer/BAMFeaturizer/CRAMFeaturizer, gated on pysam which is not in
this environment; these raise a clear ImportError at use, matching the
reference's optional-dependency behavior, and a pure-text SAM fallback is
provided)."""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

try:
    import pysam
    _HAS_PYSAM = True
except ImportError:
    pysam = None
    _HAS_PYSAM = False


class SAMFeaturizer:
    """(reference bio_seq_featurizer.py SAMFeaturizer): per-read
    [query_name, query_seq, query_qualities, reference_start] records."""

    def __init__(self, max_records: Optional[int] = None):
        self.max_records = max_records

    def get_features(self, samfile) -> np.ndarray:
        records = []
        for i, read in enumerate(samfile.fetch(until_eof=True)):
            if self.max_records is not None and i >= self.max_records:
                break
            records.append([read.query_name, read.query_sequence,
                            read.query_qualities, read.reference_start])
        out = np.empty(len(records), dtype=object)
        for i, r in enumerate(records):
            out[i] = r
        return out

    def featurize(self, path: str) -> np.ndarray:
        if _HAS_PYSAM:
            return self.get_features(pysam.AlignmentFile(path, 'r'))
        return self._featurize_text(path)

    def _featurize_text(self, path: str) -> np.ndarray:
        """Pure-text SAM parsing fallback."""
        records = []
        with open(path) as f:
            for line in f:
                if line.startswith('@'):
                    continue
                parts = line.rstrip('\n').split('\t')
                if len(parts) < 11:
                    continue
                qname, _, _, pos = parts[0], parts[1], parts[2], parts[3]
                seq, qual = parts[9], parts[10]
                records.append([qname, seq, qual, int(pos) - 1])
                if self.max_records is not None and \
                        len(records) >= self.max_records:
                    break
        out = np.empty(len(records), dtype=object)
        for i, r in enumerate(records):
            out[i] = r
        return out


class BAMFeaturizer(SAMFeaturizer):
    """(reference bio_seq_featurizer.py BAMFeaturizer)"""

    def featurize(self, path: str) -> np.ndarray:
        if not _HAS_PYSAM:
            raise ImportError('BAMFeaturizer requires pysam')
        return self.get_features(pysam.AlignmentFile(path, 'rb'))


class CRAMFeaturizer(SAMFeaturizer):
    """(reference bio_seq_featurizer.py CRAMFeaturizer)"""

    def featurize(self, path: str) -> np.ndarray:
        if not _HAS_PYSAM:
            raise ImportError('CRAMFeaturizer requires pysam')
        return self.get_features(pysam.AlignmentFile(path, 'rc'))

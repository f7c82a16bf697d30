"""Aligned-read featurizers (reference deepchem/feat/bio_seq_featurizer.py
SAMFeaturizer:19, BAMFeaturizer:104, CRAMFeaturizer:253).

SAM is parsed as text, BAM with the in-repo pure-Python BGZF/BAM
reader (``deepchem_tpu.utils.bamlib``), and CRAM with the in-repo
CRAM 3.0 reader (``deepchem_tpu.utils.cramlib``: rANS 4x8 + gzip
codecs, read-feature sequence reconstruction) — none need pysam; if
pysam IS installed it is preferred (identical output layout).

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


def pileup_from_records(records) -> List[dict]:
    """Pure-Python pileup: one dict per covered reference position with
    the reference's layout (``bio_seq_featurizer.py`` pileup_info —
    name/pos/depth/reads; each read entry is [query_sequence,
    query_position, is_del, is_refskip, indel]).

    Computed from CIGAR walks over the in-repo BAM records.  Matches
    pysam's ``pileup(stepper='nofilter', min_base_quality=0)`` — the
    default pysam stepper additionally drops bases below quality 13,
    which is a filtering choice, not part of the pileup definition.
    """
    cols: dict = {}
    for r in records:
        if r.flag & 0x4 or r.reference_start is None \
                or r.reference_start < 0 or not r.cigar:
            continue
        qpos, rpos = 0, r.reference_start
        ops = list(r.cigar)
        for k, (op, ln) in enumerate(ops):
            if op in (0, 7, 8):            # M / = / X: aligned bases
                for i in range(ln):
                    indel = 0
                    if i == ln - 1 and k + 1 < len(ops):
                        nop, nln = ops[k + 1]
                        if nop == 1:       # insertion follows this base
                            indel = nln
                        elif nop == 2:     # deletion follows this base
                            indel = -nln
                    cols.setdefault((r.reference_name, rpos + i),
                                    []).append(
                        [r.query_sequence, qpos + i, 0, 0, indel])
                qpos += ln
                rpos += ln
            elif op == 1:                  # I: query only
                qpos += ln
            elif op == 2:                  # D: deleted ref positions
                for i in range(ln):
                    cols.setdefault((r.reference_name, rpos + i),
                                    []).append(
                        [r.query_sequence, None, 1, 0, 0])
                rpos += ln
            elif op == 3:                  # N: refskip
                for i in range(ln):
                    cols.setdefault((r.reference_name, rpos + i),
                                    []).append(
                        [r.query_sequence, None, 0, 1, 0])
                rpos += ln
            elif op == 4:                  # S: soft clip, query only
                qpos += ln
            # H (5), P (6): consume neither
    out = []
    for (name, pos) in sorted(cols, key=lambda t: (str(t[0]), t[1])):
        reads = cols[(name, pos)]
        out.append({'name': name, 'pos': pos, 'depth': len(reads),
                    'reads': reads})
    return out


class BAMFeaturizer(SAMFeaturizer):
    """(reference bio_seq_featurizer.py BAMFeaturizer): SAM columns plus
    [is_reverse, query_qualities]; ``get_pileup=True`` appends the
    file's pileup columns to every row (the reference appends
    ``datapoint.pileup()`` output per record — same value each time, so
    it is computed once here)."""

    def __init__(self, max_records: Optional[int] = None,
                 get_pileup: bool = False):
        super().__init__(max_records)
        self.get_pileup = get_pileup

    def get_features(self, bamfile) -> np.ndarray:
        records = []
        for i, r in enumerate(bamfile):
            if self.max_records is not None and i >= self.max_records:
                break
            records.append(r)
        pileup_columns: Optional[List[dict]] = None
        if self.get_pileup:
            if hasattr(bamfile, 'pileup'):     # pysam AlignmentFile
                pileup_columns = [
                    {'name': pc.reference_name,
                     'pos': pc.reference_pos,
                     'depth': pc.nsegments,
                     'reads': [[pr.alignment.query_sequence,
                                pr.query_position, pr.is_del,
                                pr.is_refskip, pr.indel]
                               for pr in pc.pileups]}
                    for pc in bamfile.pileup()]
            else:
                pileup_columns = pileup_from_records(records)
        features = []
        for r in records:
            row = [r.query_name, r.query_sequence, r.query_length,
                   r.reference_name, r.reference_start, r.cigar,
                   r.mapping_quality, r.is_reverse,
                   np.array(r.query_qualities
                            if r.query_qualities is not None else [])]
            if pileup_columns is not None:
                row.append(pileup_columns)
            features.append(row)
        bamfile.close()
        return np.array(features, dtype=object)

    def featurize(self, path: str) -> np.ndarray:
        if _HAS_PYSAM:
            return self.get_features(pysam.AlignmentFile(path, 'rb'))
        return self.get_features(_RecordIter(read_bam(
            path, max_records=self.max_records).records))


class CRAMFeaturizer(SAMFeaturizer):
    """(reference bio_seq_featurizer.py CRAMFeaturizer): emits the SAM
    7-column layout, NOT the BAM 9-column one — matching the reference's
    class hierarchy.  Decoding uses the in-repo pure-Python CRAM 3.0
    reader (``utils/cramlib.py``: container framing, rANS 4x8 + gzip
    codecs, read-feature sequence reconstruction) so no pysam/htslib is
    needed; when pysam IS installed it is preferred (identical layout)."""

    def featurize(self, path: str) -> np.ndarray:
        if _HAS_PYSAM:
            return self.get_features(pysam.AlignmentFile(path, 'rc'))
        from deepchem_tpu.utils.cramlib import read_cram
        return self.get_features(_RecordIter(read_cram(
            path, max_records=self.max_records).records))

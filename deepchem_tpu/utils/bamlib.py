"""Pure-Python BAM reader (no pysam, no htslib).

The reference's BAM/CRAM featurizers (deepchem/feat/bio_seq_featurizer.py
BAMFeaturizer:104) delegate to pysam, which this environment does not
ship.  BAM is a fully documented format (SAM spec v1.6 §4): a BGZF
stream (concatenated gzip members, which Python's zlib/gzip handle
natively) containing a binary header and fixed-layout alignment
records.  This module implements the reader side, exposing records with
the pysam attribute names the featurizers consume (query_name,
query_sequence, query_qualities, reference_name, reference_start,
cigar, mapping_quality, is_reverse, ...).

CRAM (reference-based compression with custom codecs) is out of scope;
CRAMFeaturizer stays gated on pysam.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

#: BAM 4-bit base codes (SAM spec §4.2.3)
SEQ_CODES = '=ACMGRSVTWYHKDBN'
#: CIGAR operation characters in BAM integer order (SAM spec §4.2.4)
CIGAR_OPS = 'MIDNSHP=X'


@dataclass
class BamRecord:
    """One alignment, pysam-compatible attribute surface."""
    query_name: str
    flag: int
    reference_id: int
    reference_name: Optional[str]
    reference_start: int            # 0-based, -1 if unmapped
    mapping_quality: int
    cigar: List[Tuple[int, int]]    # [(op, length)] — pysam layout
    next_reference_id: int
    next_reference_start: int
    template_length: int
    query_sequence: Optional[str]
    query_qualities: Optional[List[int]]
    tags: bytes = b''

    @property
    def query_length(self) -> int:
        return len(self.query_sequence or '')

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & 0x10)

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & 0x4)

    @property
    def cigarstring(self) -> Optional[str]:
        if not self.cigar:
            return None
        return ''.join(f'{ln}{CIGAR_OPS[op]}' for op, ln in self.cigar)


@dataclass
class BamFile:
    """Parsed BAM: SAM-text header + reference table + records."""
    text: str
    references: List[str]
    lengths: List[int]
    records: List[BamRecord] = field(default_factory=list)

    def fetch(self, until_eof: bool = True) -> Iterator[BamRecord]:
        return iter(self.records)

    def __iter__(self) -> Iterator[BamRecord]:
        return iter(self.records)

    def close(self) -> None:
        pass


def _decompress_bgzf(path: str) -> bytes:
    # BGZF is a series of gzip members; gzip.decompress handles
    # multi-member streams, including the zero-length EOF block
    with open(path, 'rb') as f:
        return gzip.decompress(f.read())


def read_bam(path: str, max_records: Optional[int] = None) -> BamFile:
    """Parse a BAM file (SAM spec §4.2)."""
    data = _decompress_bgzf(path)
    if data[:4] != b'BAM\x01':
        raise ValueError(f'{path}: not a BAM file (bad magic {data[:4]!r})')
    off = 4
    (l_text,) = struct.unpack_from('<i', data, off)
    off += 4
    text = data[off:off + l_text].rstrip(b'\x00').decode()
    off += l_text
    (n_ref,) = struct.unpack_from('<i', data, off)
    off += 4
    names: List[str] = []
    lengths: List[int] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from('<i', data, off)
        off += 4
        names.append(data[off:off + l_name - 1].decode())
        off += l_name
        (l_ref,) = struct.unpack_from('<i', data, off)
        off += 4
        lengths.append(l_ref)
    bam = BamFile(text=text, references=names, lengths=lengths)
    while off + 4 <= len(data):
        (block_size,) = struct.unpack_from('<i', data, off)
        off += 4
        end = off + block_size
        (ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
         next_ref, next_pos, tlen) = struct.unpack_from(
            '<iiBBHHHiiii', data, off)
        p = off + 32
        name = data[p:p + l_read_name - 1].decode()
        p += l_read_name
        cigar = []
        for _ in range(n_cigar):
            (c,) = struct.unpack_from('<I', data, p)
            p += 4
            cigar.append((c & 0xF, c >> 4))
        seq = None
        if l_seq:
            packed = data[p:p + (l_seq + 1) // 2]
            p += (l_seq + 1) // 2
            chars = []
            for b in packed:
                chars.append(SEQ_CODES[b >> 4])
                chars.append(SEQ_CODES[b & 0xF])
            seq = ''.join(chars[:l_seq])
        quals: Optional[List[int]] = None
        if l_seq:
            q = data[p:p + l_seq]
            p += l_seq
            quals = None if (q and q[0] == 0xFF) else list(q)
        bam.records.append(BamRecord(
            query_name=name, flag=flag, reference_id=ref_id,
            reference_name=(names[ref_id] if 0 <= ref_id < n_ref
                            else None),
            reference_start=pos, mapping_quality=mapq, cigar=cigar,
            next_reference_id=next_ref, next_reference_start=next_pos,
            template_length=tlen, query_sequence=seq,
            query_qualities=quals, tags=bytes(data[p:end])))
        off = end
        if max_records is not None and len(bam.records) >= max_records:
            break
    return bam


def cigar_tuples_from_string(cigarstring: str) -> List[Tuple[int, int]]:
    """SAM text CIGAR -> pysam-style [(op, len)] ('*' -> [])."""
    if cigarstring in ('*', '', None):
        return []
    out: List[Tuple[int, int]] = []
    num = ''
    for ch in cigarstring:
        if ch.isdigit():
            num += ch
        else:
            out.append((CIGAR_OPS.index(ch), int(num)))
            num = ''
    return out

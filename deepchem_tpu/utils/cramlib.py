"""Pure-Python CRAM 3.0 reader.

The reference gates its ``CRAMLoader``/``CRAMFeaturizer`` on pysam
(htslib's codec stack, reference ``data_loader.py:2086``,
``bio_seq_featurizer.py:234``).  This module removes that gate the same
way ``bamlib`` removed the BAM one: a self-contained implementation of
the container format (CRAM 3.0 spec, samtools/hts-specs CRAMv3.pdf)
sufficient to decode real htslib-written files —

- ITF8/LTF8 varints, container / block / slice framing,
- block compression methods: raw, gzip, bzip2, lzma, and the
  **rANS 4x8** entropy coder (order-0 and order-1, the htslib
  ``rans_static.c`` stream layout) with an encoder for round-trip
  tests,
- compression-header preservation map (RN/AP/RR/SM/TD), data-series
  encoding map, and tag encoding map,
- record decoding: EXTERNAL / HUFFMAN (canonical, incl. the 0-bit
  constant case) / BETA / GAMMA / BYTE_ARRAY_STOP / BYTE_ARRAY_LEN
  encodings, detached and downstream mate info, and read-feature
  reconstruction (B X I D i S H P N Q b q) of sequence + CIGAR
  against the slice's embedded reference (``RR=0`` files) or a
  substitution matrix.

Records are returned as :class:`deepchem_tpu.utils.bamlib.BamRecord`
(the pysam-compatible attribute surface shared with the BAM reader),
so the SAM/BAM/CRAM featurizers all consume one record type.

Validated against the reference's ``example.cram`` fixture (htslib
output: gzip + rANS-order-0 blocks, embedded reference, bisulfite
substitution matrix) with sequences cross-checked against the
same-named reads in ``example.bam``.
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from deepchem_tpu.utils.bamlib import BamRecord

CRAM_MAGIC = b'CRAM'
#: special container marker: alignment start 0x454F46 ('EOF'), refid -1
EOF_ALIGNMENT_START = 4542278

# block compression methods (spec §8)
RAW, GZIP, BZIP2, LZMA, RANS = 0, 1, 2, 3, 4

# block content types (spec §8)
FILE_HEADER, COMPRESSION_HEADER, MAPPED_SLICE = 0, 1, 2
EXTERNAL_DATA, CORE_DATA = 4, 5

# CRAM record flags (CF data series)
CF_QUAL_STORED = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4
CF_UNKNOWN_BASES = 0x8

# mate flags (MF data series) -> BAM flag bits
MF_MATE_REVERSED = 0x1   # -> BAM 0x20
MF_MATE_UNMAPPED = 0x2   # -> BAM 0x08

BASES = 'ACGTN'
CIGAR_M, CIGAR_I, CIGAR_D, CIGAR_N, CIGAR_S, CIGAR_H, CIGAR_P = range(7)


class CramFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# byte-stream reader: ITF8 / LTF8 varints (spec §2.3)

class ByteReader:
    __slots__ = ('buf', 'pos')

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def peek(self) -> int:
        return self.buf[self.pos]

    def read(self, n: int) -> bytes:
        v = self.buf[self.pos:self.pos + n]
        if len(v) != n:
            raise CramFormatError(f'truncated stream (wanted {n} bytes)')
        self.pos += n
        return v

    def u32le(self) -> int:
        (v,) = struct.unpack_from('<I', self.buf, self.pos)
        self.pos += 4
        return v

    def i32le(self) -> int:
        (v,) = struct.unpack_from('<i', self.buf, self.pos)
        self.pos += 4
        return v

    def itf8(self) -> int:
        b0 = self.u8()
        if b0 < 0x80:
            return b0
        if b0 < 0xC0:
            return ((b0 & 0x7F) << 8) | self.u8()
        if b0 < 0xE0:
            return ((b0 & 0x3F) << 16) | (self.u8() << 8) | self.u8()
        if b0 < 0xF0:
            return ((b0 & 0x1F) << 24) | (self.u8() << 16) \
                | (self.u8() << 8) | self.u8()
        return ((b0 & 0x0F) << 28) | (self.u8() << 20) | (self.u8() << 12) \
            | (self.u8() << 4) | (self.u8() & 0x0F)

    def sitf8(self) -> int:
        """ITF8 reinterpreted as signed 32-bit (refid -1, TLEN, ...)."""
        v = self.itf8()
        return v - (1 << 32) if v >= (1 << 31) else v

    def ltf8(self) -> int:
        b0 = self.u8()
        n = 0
        while n < 8 and (b0 & (0x80 >> n)):
            n += 1
        v = (b0 & (0xFF >> n)) if n < 8 else 0
        for _ in range(n):
            v = (v << 8) | self.u8()
        return v

    def itf8_array(self) -> List[int]:
        return [self.itf8() for _ in range(self.itf8())]


class BitReader:
    """MSB-first bit reader over the core data block (spec §13)."""
    __slots__ = ('buf', 'byte', 'bit')

    def __init__(self, buf: bytes):
        self.buf = buf
        self.byte = 0
        self.bit = 7

    def read_bit(self) -> int:
        v = (self.buf[self.byte] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.byte += 1
        else:
            self.bit -= 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# ---------------------------------------------------------------------------
# rANS 4x8 (htslib rans_static.c stream layout; spec §rANS codec)

TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT            # 4096
RANS_BYTE_L = 1 << 23


def _read_freq_table(r: ByteReader) -> Dict[int, int]:
    """Symbol->freq with htslib's run-length symbol packing: after two
    consecutive symbols, a run-length byte follows the second."""
    freqs: Dict[int, int] = {}
    rle = 0
    j = r.u8()
    while True:
        f = r.u8()
        if f >= 128:
            f = ((f & 127) << 8) | r.u8()
        freqs[j] = f
        if rle > 0:
            rle -= 1
            j += 1
        elif not r.eof() and r.peek() == j + 1:
            j = r.u8()
            rle = r.u8()
        else:
            j = r.u8()
        if j == 0:
            break
    return freqs


def _write_freq_table(freqs: Dict[int, int]) -> bytes:
    out = bytearray()
    syms = sorted(freqs)
    rle = 0
    for idx, j in enumerate(syms):
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j and (j - 1) in freqs:
                run = 0
                while idx + 1 + run < len(syms) \
                        and syms[idx + 1 + run] == j + 1 + run:
                    run += 1
                out.append(run)
                rle = run
        f = freqs[j]
        if f >= 128:
            out.append(128 | (f >> 8))
            out.append(f & 0xFF)
        else:
            out.append(f)
    out.append(0)
    return bytes(out)


def _cumulative(freqs: Dict[int, int]):
    cum: Dict[int, int] = {}
    lookup = bytearray(TOTFREQ)
    x = 0
    for s in sorted(freqs):
        f = freqs[s]
        cum[s] = x
        lookup[x:x + f] = bytes([s]) * f
        x += f
    if x > TOTFREQ:
        raise CramFormatError(f'rANS freq table sums to {x} > {TOTFREQ}')
    return cum, bytes(lookup)


def rans_decode(data: bytes) -> bytes:
    """Decode one rANS 4x8 block (order-0 or order-1)."""
    r = ByteReader(data)
    order = r.u8()
    if order not in (0, 1):
        raise CramFormatError(f'rANS order {order} not in (0, 1)')
    n_in = r.u32le()     # compressed payload size (unused: buf is exact)
    n_out = r.u32le()
    del n_in
    if n_out == 0:
        return b''
    if order == 0:
        return _rans_decode_o0(r, n_out)
    return _rans_decode_o1(r, n_out)


def _rans_decode_o0(r: ByteReader, n_out: int) -> bytes:
    freqs = _read_freq_table(r)
    cum, lookup = _cumulative(freqs)
    R = [r.u32le() for _ in range(4)]
    out = bytearray(n_out)
    buf, pos = r.buf, r.pos
    mask = TOTFREQ - 1
    for i in range(n_out):
        k = i & 3
        x = R[k]
        m = x & mask
        s = lookup[m]
        out[i] = s
        x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
        while x < RANS_BYTE_L and pos < len(buf):
            x = (x << 8) | buf[pos]
            pos += 1
        R[k] = x
    return bytes(out)


def _rans_decode_o1(r: ByteReader, n_out: int) -> bytes:
    """Order-1: four states decode four contiguous quarters (each byte's
    frequency context is its predecessor within the quarter); the
    remainder bytes ride state 3."""
    # outer table: context symbols with the same RLE packing
    tables: Dict[int, Tuple[Dict[int, int], Dict[int, int], bytes]] = {}
    rle = 0
    i = r.u8()
    while True:
        freqs = _read_freq_table(r)
        cum, lookup = _cumulative(freqs)
        tables[i] = (freqs, cum, lookup)
        if rle > 0:
            rle -= 1
            i += 1
        elif not r.eof() and r.peek() == i + 1:
            i = r.u8()
            rle = r.u8()
        else:
            i = r.u8()
        if i == 0:
            break
    R = [r.u32le() for _ in range(4)]
    out = bytearray(n_out)
    buf, pos = r.buf, r.pos
    mask = TOTFREQ - 1
    isz4 = n_out >> 2
    ctx = [0, 0, 0, 0]
    starts = [0, isz4, 2 * isz4, 3 * isz4]
    for j in range(isz4):
        for k in range(4):
            x = R[k]
            m = x & mask
            freqs, cum, lookup = tables[ctx[k]]
            s = lookup[m]
            out[starts[k] + j] = s
            x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
            while x < RANS_BYTE_L and pos < len(buf):
                x = (x << 8) | buf[pos]
                pos += 1
            R[k] = x
            ctx[k] = s
    # tail: state 3 continues past its quarter
    for i_out in range(4 * isz4, n_out):
        x = R[3]
        m = x & mask
        freqs, cum, lookup = tables[ctx[3]]
        s = lookup[m]
        out[i_out] = s
        x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
        while x < RANS_BYTE_L and pos < len(buf):
            x = (x << 8) | buf[pos]
            pos += 1
        R[3] = x
        ctx[3] = s
    return bytes(out)


def _normalize_freqs(counts: Dict[int, int]) -> Dict[int, int]:
    """Scale counts to sum exactly TOTFREQ with every present symbol >= 1."""
    total = sum(counts.values())
    freqs = {}
    for s, c in counts.items():
        freqs[s] = max(1, (c * TOTFREQ) // total)
    excess = sum(freqs.values()) - TOTFREQ
    # push the correction onto the most frequent symbol
    top = max(freqs, key=lambda s: freqs[s])
    freqs[top] -= excess
    if freqs[top] <= 0:
        raise CramFormatError('rANS freq normalization failed')
    return freqs


def _rans_enc_flush(x: int, out: bytearray) -> None:
    out.append((x >> 0) & 0xFF)
    out.append((x >> 8) & 0xFF)
    out.append((x >> 16) & 0xFF)
    out.append((x >> 24) & 0xFF)


def _rans_enc_put(x: int, freq: int, cum: int, out: bytearray) -> int:
    x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * freq
    while x >= x_max:
        out.append(x & 0xFF)
        x >>= 8
    return ((x // freq) << TF_SHIFT) + cum + (x % freq)


def rans_encode(raw: bytes, order: int = 0) -> bytes:
    """rANS 4x8 encoder (order 0/1) — the inverse of :func:`rans_decode`;
    used by the round-trip tests and for writing CRAM-compatible blocks."""
    if order == 0:
        return _rans_encode_o0(raw)
    if order == 1:
        return _rans_encode_o1(raw)
    raise CramFormatError(f'rANS order {order} not in (0, 1)')


def _rans_encode_o0(raw: bytes) -> bytes:
    if not raw:
        return struct.pack('<BII', 0, 0, 0)
    counts: Dict[int, int] = {}
    for b in raw:
        counts[b] = counts.get(b, 0) + 1
    freqs = _normalize_freqs(counts)
    cum, _ = _cumulative(freqs)
    table = _write_freq_table(freqs)
    R = [RANS_BYTE_L] * 4
    emitted = bytearray()
    for i in range(len(raw) - 1, -1, -1):
        k = i & 3
        s = raw[i]
        R[k] = _rans_enc_put(R[k], freqs[s], cum[s], emitted)
    states = bytearray()
    for k in range(4):
        _rans_enc_flush(R[k], states)
    payload = bytes(table) + bytes(states) + bytes(reversed(emitted))
    return struct.pack('<BII', 0, len(payload), len(raw)) + payload


def _rans_encode_o1(raw: bytes) -> bytes:
    if not raw:
        return struct.pack('<BII', 1, 0, 0)
    n = len(raw)
    isz4 = n >> 2
    starts = [0, isz4, 2 * isz4, 3 * isz4]
    # per-context counts; context of the first byte of each quarter is 0
    counts: Dict[int, Dict[int, int]] = {}

    def bump(ctx: int, s: int) -> None:
        c = counts.setdefault(ctx, {})
        c[s] = c.get(s, 0) + 1

    for k in range(4):
        end = starts[k] + isz4 if k < 3 else n
        prev = 0
        for i in range(starts[k], end):
            bump(prev, raw[i])
            prev = raw[i]
    freqs = {c: _normalize_freqs(cc) for c, cc in counts.items()}
    cums = {c: _cumulative(f)[0] for c, f in freqs.items()}
    # serialize outer table with the same RLE symbol packing
    out = bytearray()
    ctxs = sorted(freqs)
    rle = 0
    for idx, c in enumerate(ctxs):
        if rle:
            rle -= 1
        else:
            out.append(c)
            if c and (c - 1) in freqs:
                run = 0
                while idx + 1 + run < len(ctxs) \
                        and ctxs[idx + 1 + run] == c + 1 + run:
                    run += 1
                out.append(run)
                rle = run
        out += _write_freq_table(freqs[c])
    out.append(0)
    # encode: each state owns one quarter, processed back-to-front;
    # state 3 also owns the tail.  Interleave emission by global
    # position order so the decoder's per-step renorm reads align.
    R = [RANS_BYTE_L] * 4
    emitted = bytearray()
    ends = [starts[1], starts[2], starts[3], n]
    # positions processed in reverse global round-robin mirroring decode:
    # decode order is (j, k) for j in range(isz4) for k in 0..3, then the
    # tail on state 3 — encode must reverse exactly that order.
    steps: List[Tuple[int, int]] = []
    for j in range(isz4):
        for k in range(4):
            steps.append((k, starts[k] + j))
    for i in range(4 * isz4, n):
        steps.append((3, i))
    for k, i in reversed(steps):
        s = raw[i]
        ctx = raw[i - 1] if i > starts[k] else 0
        R[k] = _rans_enc_put(R[k], freqs[ctx][s], cums[ctx][s], emitted)
    states = bytearray()
    for k in range(4):
        _rans_enc_flush(R[k], states)
    payload = bytes(out) + bytes(states) + bytes(reversed(emitted))
    return struct.pack('<BII', 1, len(payload), n) + payload


# ---------------------------------------------------------------------------
# blocks / containers

@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes          # decompressed


def _read_block(r: ByteReader) -> Block:
    method = r.u8()
    ctype = r.u8()
    cid = r.itf8()
    csize = r.itf8()
    rsize = r.itf8()
    payload = r.read(csize)
    r.read(4)  # CRC32 (unchecked: fixture-scale trust, format-validated)
    if method == RAW:
        data = payload
    elif method == GZIP:
        data = zlib.decompress(payload, wbits=31)
    elif method == BZIP2:
        data = bz2.decompress(payload)
    elif method == LZMA:
        data = lzma.decompress(payload)
    elif method == RANS:
        data = rans_decode(payload)
    else:
        raise CramFormatError(f'unknown block compression method {method}')
    if len(data) != rsize:
        raise CramFormatError(
            f'block content id {cid}: decoded {len(data)} != raw size '
            f'{rsize}')
    return Block(method, ctype, cid, data)


@dataclass
class Container:
    length: int
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_bases: int
    n_blocks: int
    landmarks: List[int]
    blocks: List[Block] = field(default_factory=list)

    @property
    def is_eof(self) -> bool:
        return self.ref_seq_id == -1 and self.start == EOF_ALIGNMENT_START \
            and self.n_records == 0


def _read_container(r: ByteReader, version: int) -> Container:
    length = r.i32le()
    ref_seq_id = r.sitf8()
    start = r.itf8()
    span = r.itf8()
    n_records = r.itf8()
    record_counter = r.ltf8() if version >= 3 else r.itf8()
    n_bases = r.ltf8() if version >= 3 else r.itf8()
    n_blocks = r.itf8()
    landmarks = r.itf8_array()
    if version >= 3:
        r.read(4)  # container CRC32
    c = Container(length, ref_seq_id, start, span, n_records,
                  record_counter, n_bases, n_blocks, landmarks)
    body_end = r.pos + length
    while r.pos < body_end and len(c.blocks) < n_blocks:
        c.blocks.append(_read_block(r))
    r.pos = body_end
    return c


# ---------------------------------------------------------------------------
# encodings (spec §13)

class Encoding:
    """One data-series codec; reads ints or byte arrays from the core
    bit stream / external byte streams."""

    def __init__(self, kind: int, params: ByteReader,
                 read_sub=None):
        self.kind = kind
        if kind == 0:    # NULL
            pass
        elif kind == 1:  # EXTERNAL
            self.content_id = params.itf8()
        elif kind == 3:  # HUFFMAN (canonical)
            nsym = params.itf8()
            symbols = [params.sitf8() for _ in range(nsym)]
            nlen = params.itf8()
            lengths = [params.itf8() for _ in range(nlen)]
            self._build_huffman(symbols, lengths)
        elif kind == 4:  # BYTE_ARRAY_LEN
            self.len_enc = read_sub(params)
            self.val_enc = read_sub(params)
        elif kind == 5:  # BYTE_ARRAY_STOP
            self.stop = params.u8()
            self.content_id = params.itf8()
        elif kind == 6:  # BETA
            self.offset = params.sitf8()
            self.nbits = params.itf8()
        elif kind == 9:  # GAMMA
            self.offset = params.sitf8()
        else:
            raise CramFormatError(
                f'encoding id {kind} (GOLOMB/SUBEXP family) not emitted '
                f'by htslib writers; unsupported')

    def _build_huffman(self, symbols: List[int],
                       lengths: List[int]) -> None:
        if len(set(lengths)) == 1 and lengths[0] == 0:
            self.const = symbols[0]
            self.codes = None
            return
        self.const = None
        # canonical code assignment: ascending (length, symbol-order)
        order = sorted(range(len(symbols)), key=lambda i: (lengths[i],))
        code = 0
        prev_len = 0
        table: Dict[Tuple[int, int], int] = {}
        for i in order:
            code <<= (lengths[i] - prev_len)
            table[(lengths[i], code)] = symbols[i]
            code += 1
            prev_len = lengths[i]
        self.codes = table
        self.max_len = max(lengths)

    def read_int(self, core: BitReader,
                 external: Dict[int, ByteReader]) -> int:
        if self.kind == 1:
            return external[self.content_id].itf8()
        if self.kind == 3:
            if self.const is not None:
                return self.const
            length = 0
            code = 0
            while length <= self.max_len:
                code = (code << 1) | core.read_bit()
                length += 1
                if (length, code) in self.codes:
                    return self.codes[(length, code)]
            raise CramFormatError('bad huffman code in core block')
        if self.kind == 6:
            return core.read_bits(self.nbits) - self.offset
        if self.kind == 9:
            n = 0
            while core.read_bit() == 0:
                n += 1
            return (core.read_bits(n) | (1 << n)) - self.offset
        raise CramFormatError(f'encoding {self.kind} cannot read ints')

    def read_sint(self, core, external) -> int:
        v = self.read_int(core, external)
        return v - (1 << 32) if v >= (1 << 31) else v

    def read_byte(self, core: BitReader,
                  external: Dict[int, ByteReader]) -> int:
        if self.kind == 1:
            return external[self.content_id].u8()
        return self.read_int(core, external)

    def read_bytes(self, core: BitReader,
                   external: Dict[int, ByteReader],
                   length: Optional[int] = None) -> bytes:
        if self.kind == 5:
            r = external[self.content_id]
            out = bytearray()
            while not r.eof():
                b = r.u8()
                if b == self.stop:
                    break
                out.append(b)
            return bytes(out)
        if self.kind == 4:
            n = self.len_enc.read_int(core, external)
            return bytes(self.val_enc.read_byte(core, external)
                         for _ in range(n))
        if self.kind == 1 and length is not None:
            return external[self.content_id].read(length)
        if length is not None:
            return bytes(self.read_byte(core, external)
                         for _ in range(length))
        raise CramFormatError(
            f'encoding {self.kind} cannot read byte arrays')


def _read_encoding(params: ByteReader) -> Encoding:
    kind = params.itf8()
    plen = params.itf8()
    sub = ByteReader(params.read(plen))
    return Encoding(kind, sub, read_sub=_read_encoding)


# ---------------------------------------------------------------------------
# compression header (spec §12)

@dataclass
class CompressionHeader:
    read_names_included: bool = True
    ap_delta: bool = True
    reference_required: bool = True
    substitution_matrix: bytes = b'\x00' * 5
    tag_lines: List[List[bytes]] = field(default_factory=list)
    data_series: Dict[str, Encoding] = field(default_factory=dict)
    tag_encodings: Dict[int, Encoding] = field(default_factory=dict)

    def substitute(self, ref_base: str, code: int) -> str:
        """SM matrix: row = ref base (ACGTN order); the row byte packs the
        2-bit code of each alternative base in ACGTN order."""
        ri = BASES.find(ref_base.upper())
        if ri < 0:
            ri = 4
        row = self.substitution_matrix[ri]
        alts = [b for b in BASES if b != BASES[ri]]
        for pos, alt in enumerate(alts):
            if (row >> (6 - 2 * pos)) & 0x3 == code:
                return alt
        raise CramFormatError(f'substitution code {code} not in SM row')


def _parse_compression_header(data: bytes) -> CompressionHeader:
    r = ByteReader(data)
    h = CompressionHeader()
    # preservation map
    r.itf8()                       # size in bytes
    for _ in range(r.itf8()):
        key = r.read(2).decode('ascii')
        if key == 'RN':
            h.read_names_included = bool(r.u8())
        elif key == 'AP':
            h.ap_delta = bool(r.u8())
        elif key == 'RR':
            h.reference_required = bool(r.u8())
        elif key == 'SM':
            h.substitution_matrix = r.read(5)
        elif key == 'TD':
            raw = r.read(r.itf8())
            h.tag_lines = [
                [line[i:i + 3] for i in range(0, len(line), 3)]
                for line in raw.split(b'\x00')[:-1]]
        else:
            raise CramFormatError(f'unknown preservation-map key {key!r}')
    # data-series encodings
    r.itf8()
    for _ in range(r.itf8()):
        key = r.read(2).decode('ascii')
        h.data_series[key] = _read_encoding(r)
    # tag encodings
    r.itf8()
    for _ in range(r.itf8()):
        key = r.itf8()   # read key BEFORE the encoding (stream order)
        h.tag_encodings[key] = _read_encoding(r)
    return h


# ---------------------------------------------------------------------------
# slice (spec §11)

@dataclass
class SliceHeader:
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_blocks: int
    content_ids: List[int]
    embedded_ref_id: int
    ref_md5: bytes


def _parse_slice_header(data: bytes, version: int) -> SliceHeader:
    r = ByteReader(data)
    ref_seq_id = r.sitf8()
    start = r.itf8()
    span = r.itf8()
    n_records = r.itf8()
    record_counter = r.ltf8() if version >= 3 else r.itf8()
    n_blocks = r.itf8()
    content_ids = r.itf8_array()
    embedded_ref_id = r.sitf8()
    ref_md5 = r.read(16)
    return SliceHeader(ref_seq_id, start, span, n_records, record_counter,
                       n_blocks, content_ids, embedded_ref_id, ref_md5)


# ---------------------------------------------------------------------------
# record decode (spec §10)

_TAG_STRUCT = {ord('c'): '<b', ord('C'): '<B', ord('s'): '<h',
               ord('S'): '<H', ord('i'): '<i', ord('I'): '<I',
               ord('f'): '<f'}


def _decode_slice(header: CompressionHeader, sh: SliceHeader,
                  core: bytes, ext_blocks: Dict[int, bytes],
                  references: List[str]) -> List[BamRecord]:
    ds = header.data_series
    core_r = BitReader(core)
    ext = {cid: ByteReader(b) for cid, b in ext_blocks.items()}
    embed = ext_blocks.get(sh.embedded_ref_id, b'') \
        if sh.embedded_ref_id >= 0 else b''

    def ref_base(pos1: int) -> str:
        """reference base at 1-based position pos1."""
        if embed:
            i = pos1 - sh.start
            if 0 <= i < len(embed):
                return chr(embed[i])
        return 'N'

    def series_int(key: str, default=None) -> int:
        if key not in ds:
            if default is not None:
                return default
            raise CramFormatError(f'data series {key} missing')
        return ds[key].read_int(core_r, ext)

    records: List[BamRecord] = []
    mate_links: List[Tuple[int, int]] = []
    prev_ap = sh.start
    for rec_i in range(sh.n_records):
        bf = series_int('BF')
        cf = series_int('CF')
        if sh.ref_seq_id == -2:
            ref_id = ds['RI'].read_sint(core_r, ext)
        else:
            ref_id = sh.ref_seq_id
        rl = series_int('RL')
        ap = series_int('AP')
        if header.ap_delta:
            ap = prev_ap + (ap - (1 << 32) if ap >= (1 << 31) else ap)
            prev_ap = ap
        series_int('RG')  # read group (unused downstream)
        name = ''
        if header.read_names_included:
            name = ds['RN'].read_bytes(core_r, ext).decode('ascii')
        next_ref_id, next_start, tlen = -1, -1, 0
        if cf & CF_DETACHED:
            mf = series_int('MF')
            if not header.read_names_included:
                name = ds['RN'].read_bytes(core_r, ext).decode('ascii')
            next_ref_id = ds['NS'].read_sint(core_r, ext)
            next_start = series_int('NP') - 1
            tlen = ds['TS'].read_sint(core_r, ext)
            if mf & MF_MATE_REVERSED:
                bf |= 0x20
            if mf & MF_MATE_UNMAPPED:
                bf |= 0x8
        elif cf & CF_MATE_DOWNSTREAM:
            nf = series_int('NF')
            mate_links.append((rec_i, rec_i + nf + 1))
        # tags
        tl = series_int('TL')
        tag_bytes = bytearray()
        if header.tag_lines:
            for tag in header.tag_lines[tl]:
                val = header.tag_encodings[
                    (tag[0] << 16) | (tag[1] << 8) | tag[2]].read_bytes(
                        core_r, ext)
                tag_bytes += tag[:3] + val
        seq = ''
        quals: Optional[List[int]] = None
        cigar: List[Tuple[int, int]] = []
        mapq = 0
        if not (bf & 0x4):   # mapped
            fn = series_int('FN')
            seq_chars: List[str] = []
            qual_arr = [0xFF] * rl
            ref_pos = ap          # 1-based
            read_pos = 0          # 0-based within read
            prev_fp = 0
            ops: List[Tuple[int, int]] = []

            def emit(op: int, n: int) -> None:
                if n <= 0:
                    return
                if ops and ops[-1][0] == op:
                    ops[-1] = (op, ops[-1][1] + n)
                else:
                    ops.append((op, n))

            for _ in range(fn):
                fc = chr(ds['FC'].read_byte(core_r, ext))
                prev_fp += series_int('FP')
                fp = prev_fp      # 1-based position in read
                gap = fp - 1 - read_pos
                for _ in range(gap):   # reference-matching run
                    seq_chars.append(ref_base(ref_pos))
                    ref_pos += 1
                    read_pos += 1
                emit(CIGAR_M, gap)
                if fc == 'X':
                    code = ds['BS'].read_byte(core_r, ext)
                    seq_chars.append(
                        header.substitute(ref_base(ref_pos), code))
                    ref_pos += 1
                    read_pos += 1
                    emit(CIGAR_M, 1)
                elif fc == 'B':
                    seq_chars.append(chr(ds['BA'].read_byte(core_r, ext)))
                    qual_arr[read_pos] = ds['QS'].read_byte(core_r, ext)
                    ref_pos += 1
                    read_pos += 1
                    emit(CIGAR_M, 1)
                elif fc == 'I':
                    ins = ds['IN'].read_bytes(core_r, ext)
                    seq_chars.extend(ins.decode('ascii'))
                    read_pos += len(ins)
                    emit(CIGAR_I, len(ins))
                elif fc == 'i':
                    seq_chars.append(chr(ds['BA'].read_byte(core_r, ext)))
                    read_pos += 1
                    emit(CIGAR_I, 1)
                elif fc == 'D':
                    n = series_int('DL')
                    ref_pos += n
                    emit(CIGAR_D, n)
                elif fc == 'N':
                    n = series_int('RS')
                    ref_pos += n
                    emit(CIGAR_N, n)
                elif fc == 'S':
                    sc = ds['SC'].read_bytes(core_r, ext)
                    seq_chars.extend(sc.decode('ascii'))
                    read_pos += len(sc)
                    emit(CIGAR_S, len(sc))
                elif fc == 'H':
                    emit(CIGAR_H, series_int('HC'))
                elif fc == 'P':
                    emit(CIGAR_P, series_int('PD'))
                elif fc == 'Q':
                    qual_arr[read_pos] = ds['QS'].read_byte(core_r, ext)
                elif fc == 'b':
                    bb = ds['BB'].read_bytes(core_r, ext)
                    seq_chars.extend(bb.decode('ascii'))
                    ref_pos += len(bb)
                    read_pos += len(bb)
                    emit(CIGAR_M, len(bb))
                elif fc == 'q':
                    qq = ds['QQ'].read_bytes(core_r, ext)
                    for qi, q in enumerate(qq):
                        qual_arr[read_pos + qi] = q - 33
                else:
                    raise CramFormatError(f'unknown feature code {fc!r}')
            tail = rl - read_pos
            for _ in range(tail):
                seq_chars.append(ref_base(ref_pos))
                ref_pos += 1
                read_pos += 1
            emit(CIGAR_M, tail)
            seq = ''.join(seq_chars)
            cigar = ops
            mapq = series_int('MQ')
            if cf & CF_QUAL_STORED:
                quals = list(ds['QS'].read_bytes(core_r, ext, length=rl))
            elif any(q != 0xFF for q in qual_arr):
                quals = qual_arr
        else:                # unmapped
            if cf & CF_UNKNOWN_BASES:
                seq = 'N' * rl
            else:
                seq = ''.join(chr(ds['BA'].read_byte(core_r, ext))
                              for _ in range(rl))
            if cf & CF_QUAL_STORED:
                quals = list(ds['QS'].read_bytes(core_r, ext, length=rl))
        if quals is not None and all(q == 0xFF for q in quals):
            quals = None   # 0xFF == quality missing ('*'), pysam -> None
        rname = None
        if 0 <= ref_id < len(references):
            rname = references[ref_id]
        records.append(BamRecord(
            query_name=name, flag=bf, reference_id=ref_id,
            reference_name=rname,
            reference_start=ap - 1 if not (bf & 0x4) else -1,
            mapping_quality=mapq, cigar=cigar,
            next_reference_id=next_ref_id, next_reference_start=next_start,
            template_length=tlen, query_sequence=seq,
            query_qualities=quals, tags=bytes(tag_bytes)))
    # resolve downstream-mate links (RNEXT/PNEXT/TLEN + mate flag bits)
    for a_i, b_i in mate_links:
        if b_i >= len(records):
            continue
        a, b = records[a_i], records[b_i]
        a_end = a.reference_start + sum(
            n for op, n in a.cigar if op in (CIGAR_M, CIGAR_D, CIGAR_N))
        b_end = b.reference_start + sum(
            n for op, n in b.cigar if op in (CIGAR_M, CIGAR_D, CIGAR_N))
        tlen = max(a_end, b_end) - min(a.reference_start, b.reference_start)
        for x_i, x, y in ((a_i, a, b), (b_i, b, a)):
            flag = x.flag
            if y.flag & 0x10:
                flag |= 0x20
            if y.flag & 0x4:
                flag |= 0x8
            sign = 1 if x.reference_start <= y.reference_start else -1
            records[x_i] = BamRecord(
                query_name=x.query_name, flag=flag,
                reference_id=x.reference_id, reference_name=x.reference_name,
                reference_start=x.reference_start,
                mapping_quality=x.mapping_quality, cigar=x.cigar,
                next_reference_id=y.reference_id,
                next_reference_start=y.reference_start,
                template_length=sign * tlen,
                query_sequence=x.query_sequence,
                query_qualities=x.query_qualities, tags=x.tags)
    return records


# ---------------------------------------------------------------------------
# file-level API

@dataclass
class CramFile:
    """Parsed CRAM: SAM-text header + reference table + records
    (mirrors :class:`deepchem_tpu.utils.bamlib.BamFile`)."""
    text: str
    references: List[str]
    lengths: List[int]
    records: List[BamRecord]

    def __iter__(self):
        return iter(self.records)

    def close(self) -> None:
        pass


def _parse_sam_header(text: str) -> Tuple[List[str], List[int]]:
    names: List[str] = []
    lengths: List[int] = []
    for line in text.splitlines():
        if line.startswith('@SQ'):
            name, ln = None, 0
            for fieldv in line.split('\t')[1:]:
                if fieldv.startswith('SN:'):
                    name = fieldv[3:]
                elif fieldv.startswith('LN:'):
                    ln = int(fieldv[3:])
            if name is not None:
                names.append(name)
                lengths.append(ln)
    return names, lengths


def read_cram(path: str, max_records: Optional[int] = None) -> CramFile:
    """Parse a CRAM 3.x file into records (no pysam, no reference FASTA
    needed for RR=0 / embedded-reference files)."""
    with open(path, 'rb') as f:
        data = f.read()
    if data[:4] != CRAM_MAGIC:
        raise CramFormatError(f'{path}: bad magic {data[:4]!r}')
    major, minor = data[4], data[5]
    if major != 3:
        raise CramFormatError(
            f'{path}: CRAM version {major}.{minor}; this reader implements '
            f'3.x')
    r = ByteReader(data, 26)   # skip magic+version+file id
    text = ''
    references: List[str] = []
    lengths: List[int] = []
    records: List[BamRecord] = []
    first = True
    while r.pos < len(data):
        c = _read_container(r, major)
        if c.is_eof:
            break
        if first:
            # SAM header container: block payload = i32 length + text
            hb = ByteReader(c.blocks[0].data)
            tlen = hb.i32le()
            text = hb.read(tlen).rstrip(b'\x00').decode()
            references, lengths = _parse_sam_header(text)
            first = False
            continue
        if not c.blocks:
            continue
        if c.blocks[0].content_type != COMPRESSION_HEADER:
            raise CramFormatError('data container missing compression '
                                  'header block')
        header = _parse_compression_header(c.blocks[0].data)
        bi = 1
        while bi < len(c.blocks):
            if c.blocks[bi].content_type != MAPPED_SLICE:
                bi += 1
                continue
            sh = _parse_slice_header(c.blocks[bi].data, major)
            bi += 1
            core = b''
            ext: Dict[int, bytes] = {}
            for _ in range(sh.n_blocks):
                blk = c.blocks[bi]
                bi += 1
                if blk.content_type == CORE_DATA:
                    core = blk.data
                elif blk.content_type == EXTERNAL_DATA:
                    ext[blk.content_id] = blk.data
            records.extend(
                _decode_slice(header, sh, core, ext, references))
            if max_records is not None and len(records) >= max_records:
                return CramFile(text, references, lengths,
                                records[:max_records])
    return CramFile(text, references, lengths, records)

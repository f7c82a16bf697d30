"""Pure-Python CRAM 3.0 reader (utils/cramlib.py).

Oracle chain: the reference's example.cram fixture was written by
htslib (gzip + rANS-order-0 blocks, embedded reference, bisulfite
substitution matrix).  Its records are cross-validated field-by-field
against the same-named reads in example.bam decoded by the
independently-validated bamlib; the rANS codec is additionally pinned
by encode->decode round-trips on adversarial inputs (both orders).

Mirrors /root/reference/deepchem/data/tests/test_cram_loader.py
(dataset shapes (5, 7) and (10, 7)) without needing pysam.
"""

import os

import numpy as np
import pytest

from deepchem_tpu.utils import cramlib
from deepchem_tpu.utils.bamlib import read_bam
from deepchem_tpu.utils.cramlib import rans_decode, rans_encode, read_cram

REF_TESTS = '/root/reference/deepchem/data/tests'
CRAM = os.path.join(REF_TESTS, 'example.cram')
BAM = os.path.join(REF_TESTS, 'example.bam')

needs_fixture = pytest.mark.skipif(not os.path.exists(CRAM),
                                   reason='reference fixture absent')


@needs_fixture
class TestCramDecode:

    def test_header_and_references(self):
        cf = read_cram(CRAM)
        assert cf.references == ['chr1', 'chr2']
        assert cf.lengths == [1575, 1584]
        assert cf.text.startswith('@HD\tVN:1.0')

    def test_record_count_and_fields(self):
        cf = read_cram(CRAM)
        assert len(cf.records) == 5
        # htslib-written values, independently recomputable from the
        # raw data-series blocks (BF external block, AP deltas)
        assert [r.flag for r in cf.records] == [83, 99, 147, 83, 147]
        assert [r.reference_start for r in cf.records] == \
            [29, 30, 30, 30, 33]
        assert all(r.reference_name == 'chr1' for r in cf.records)
        assert all(r.mapping_quality == 42 for r in cf.records)
        assert all(r.cigarstring == '75M' for r in cf.records)
        assert all(r.query_length == 75 for r in cf.records)

    def test_records_match_bam_oracle(self):
        """Every CRAM record exists in example.bam with identical
        sequence (reconstructed from the embedded reference + SM-matrix
        substitution features), position, CIGAR, and mate position."""
        cf = read_cram(CRAM)
        by_key = {(r.query_name, r.flag): r for r in read_bam(BAM).records}
        for r in cf.records:
            b = by_key[(r.query_name, r.flag)]
            assert r.query_sequence == b.query_sequence
            assert r.reference_start == b.reference_start
            assert r.cigarstring == b.cigarstring
            assert r.next_reference_start == b.next_reference_start
            assert r.mapping_quality == b.mapping_quality

    def test_bisulfite_substitution_matrix(self):
        """The fixture's SM matrix is the bismark signature: code 1
        substitutes C->T and G->A (bisulfite conversion)."""
        h = cramlib.CompressionHeader(
            substitution_matrix=bytes.fromhex('1b874b931b'))
        assert h.substitute('C', 1) == 'T'
        assert h.substitute('G', 1) == 'A'
        assert h.substitute('A', 1) == 'G'
        assert h.substitute('T', 1) == 'C'

    def test_tags_decoded(self):
        """XM/XR/XG bismark tags ride BYTE_ARRAY_STOP tag encodings; the
        XM methylation string must use only the bismark alphabet and be
        read-length long."""
        cf = read_cram(CRAM)
        for r in cf.records:
            assert r.tags.startswith(b'XMZ')
            xm = r.tags[3:].split(b'\x00')[0]
            assert len(xm) == 75
            assert set(xm) <= set(b'.zZxXhHuU')
            assert b'XRZ' in r.tags and b'XGZ' in r.tags

    def test_missing_quals_map_to_none(self):
        """The fixture stores 0xFF ('*') qualities -> pysam None."""
        cf = read_cram(CRAM)
        assert all(r.query_qualities is None for r in cf.records)

    def test_max_records(self):
        assert len(read_cram(CRAM, max_records=3).records) == 3

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / 'x.cram'
        p.write_bytes(b'BAM\x01' + b'\x00' * 30)
        with pytest.raises(cramlib.CramFormatError, match='magic'):
            read_cram(str(p))


@needs_fixture
class TestCramFeaturizerLoader:

    def test_featurizer_shape(self):
        """Reference test_cram_loader.py::test_cram_featurizer."""
        from deepchem_tpu.feat.bio_seq_featurizer import CRAMFeaturizer
        feats = CRAMFeaturizer(max_records=5).featurize(CRAM)
        assert feats.shape == (5, 7)
        # column layout: qname, seq, qlen, rname, start, cigar, mapq
        assert feats[0][2] == 75
        assert feats[0][3] == 'chr1'
        assert feats[0][6] == 42
        assert isinstance(feats[0][1], str) and len(feats[0][1]) == 75

    def test_loader_single_file(self):
        """Reference test_cram_loader_with_single_file: X.shape (5, 7)."""
        from deepchem_tpu.data import CRAMLoader
        ds = CRAMLoader().create_dataset(CRAM)
        assert ds.X.shape == (5, 7)

    def test_loader_multiple_files(self):
        """Reference test_cram_loader_with_multiple_files: (10, 7)."""
        from deepchem_tpu.data import CRAMLoader
        ds = CRAMLoader().create_dataset([CRAM, CRAM])
        assert ds.X.shape == (10, 7)


class TestRans:
    """rANS 4x8 codec: decode is validated against htslib-written blocks
    in the fixture tests above; encode<->decode round-trips pin both
    directions on adversarial inputs."""

    CASES = [
        b'A' * 1000,                                  # single symbol
        bytes(range(256)) * 5,                        # flat alphabet
        b'ACGTACGGGGTTTACGTNNA' * 137,                # DNA-ish skew
        os.urandom(4097),                             # incompressible
        b'x',                                         # single byte
        b'ab',                                        # len 2 (tail path)
        b'abc',                                       # len 3 (tail path)
        b'abcd' * 3 + b'Z',                           # len % 4 == 1
    ]

    @pytest.mark.parametrize('order', [0, 1])
    def test_round_trip(self, order):
        for raw in self.CASES:
            enc = rans_encode(raw, order=order)
            assert rans_decode(enc) == raw, (order, raw[:16])

    def test_empty(self):
        for order in (0, 1):
            assert rans_decode(rans_encode(b'', order=order)) == b''

    def test_fixture_embedded_reference_block(self):
        """Decode the fixture's raw rANS block directly: the slice's
        embedded reference must be 79 bases of pure ACGTN spanning the
        slice's alignment span."""
        if not os.path.exists(CRAM):
            pytest.skip('fixture absent')
        data = open(CRAM, 'rb').read()
        # block at offset 456: method=4 (rANS), content id 10 (embedded
        # reference), raw size 79 == slice span (see slice header)
        r = cramlib.ByteReader(data, 456)
        blk = cramlib._read_block(r)
        assert blk.method == cramlib.RANS
        assert blk.content_id == 10
        assert len(blk.data) == 79
        assert set(blk.data.decode()) <= set('ACGTN')

    def test_bad_order_raises(self):
        with pytest.raises(cramlib.CramFormatError):
            rans_decode(b'\x07' + b'\x00' * 8 + b'\x01')


class TestVarints:

    def test_itf8_boundaries(self):
        import struct as _s

        def enc_itf8(v):
            if v < 0x80:
                return bytes([v])
            if v < 0x4000:
                return bytes([0x80 | (v >> 8), v & 0xFF])
            if v < 0x200000:
                return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
            if v < 0x10000000:
                return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                              (v >> 8) & 0xFF, v & 0xFF])
            return bytes([0xF0 | (v >> 28), (v >> 20) & 0xFF,
                          (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])

        for v in [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
                  0xFFFFFFF, 0x10000000, 0xFFFFFFFF]:
            r = cramlib.ByteReader(enc_itf8(v))
            assert r.itf8() == v, v
        # signed reinterpretation: -1 stored as 0xFFFFFFFF
        r = cramlib.ByteReader(enc_itf8(0xFFFFFFFF))
        assert r.sitf8() == -1
        del _s

    def test_ltf8_small_values(self):
        # one-byte LTF8 (MSB clear) is the value itself
        for v in (0, 1, 0x7F):
            assert cramlib.ByteReader(bytes([v])).ltf8() == v
        # 0x80 prefix -> one payload byte
        assert cramlib.ByteReader(b'\x80\xFF').ltf8() == 0xFF
        # full 8-byte form
        assert cramlib.ByteReader(b'\xFF' + b'\x00' * 7 + b'\x2A').ltf8() \
            == 42

"""DNA simulation + DeepVariant realigner tests (reference
molnet/tests/test_dnasim.py and data/tests/test_deepvariant_featurizer.py
shapes of coverage)."""
import numpy as np
import pytest

from deepchem_tpu.feat.deepvariant import (PileupFeaturizer, Read,
                                           Realigner, left_align_indel,
                                           smith_waterman)
from deepchem_tpu.molnet import (simulate_single_motif_detection,
                                 simulate_motif_density_localization,
                                 simulate_multi_motif_embedding,
                                 simulate_heterodimer_grammar,
                                 register_motif)


def test_single_motif_detection():
    seqs, y, emb = simulate_single_motif_detection(
        'TAL1_known4', 100, 8, 8, 0.4, seed=0)
    assert seqs.shape == (16,) and y.shape == (16, 1)
    assert all(len(s) == 100 for s in seqs)
    # planted instance actually present at the recorded position
    for e_list, s in zip(emb[:8], seqs[:8]):
        e = e_list[0]
        inst = e.what.split('-', 1)[1]
        assert s[e.startPos:e.startPos + len(inst)] == inst


def test_motif_density_localization():
    seqs, y, _ = simulate_motif_density_localization(
        'GATA_known1', 120, 40, 2, 4, 5, 5, 0.4, seed=1)
    assert seqs.shape == (10,) and bool(y[0, 0]) and not bool(y[-1, 0])


def test_multi_motif_embedding_labels():
    seqs, y, emb = simulate_multi_motif_embedding(
        ['GATA_known1', 'MYC_known1'], 120, 1, 2, 10, 0.4, seed=2)
    assert y.shape == (10, 2)
    # each True label corresponds to an embedding of that motif
    for yi, ei in zip(y, emb):
        names = {e.what.split('-')[0] for e in ei}
        assert yi[0] == ('GATA_known1' in names)
        assert yi[1] == ('MYC_known1' in names)


def test_heterodimer_and_custom_motif():
    register_motif('MYMOTIF', 'TTTTCCCC')
    seqs, y, _ = simulate_heterodimer_grammar(
        'MYMOTIF', 'AP1_known1', 200, 5, 10, 4, 4, 0.4, seed=3)
    assert len(seqs) == 8 and y.sum() == 4


def test_left_align_indel():
    # insertion of C after run of Cs shifts to the run start
    pos, indel = left_align_indel('ACCCG', 4, '+1C')
    assert pos == 1 and indel == '+1C'
    pos, indel = left_align_indel('ATTTG', 4, '-1')
    assert pos == 4


def test_smith_waterman():
    score, start = smith_waterman('ACGT', 'TTACGTTT')
    assert score == 8 and start == 2


@pytest.fixture(scope='module')
def snp_reads():
    rng = np.random.RandomState(0)
    ref = ''.join(np.array(list('ACGT'))[rng.randint(0, 4, 300)])
    alt = 'T' if ref[150] != 'T' else 'A'
    var_ref = ref[:150] + alt + ref[151:]
    reads = []
    for i in range(20):
        start = rng.randint(100, 160)
        src = var_ref if i % 2 == 0 else ref
        reads.append(Read(f'r{i}', src[start:start + 60], start))
    return reads, ref, alt


def test_realigner_finds_variant_haplotype(snp_reads):
    reads, ref, alt = snp_reads
    realigned, windows = Realigner(k=11).realign(reads, ref)
    assert any(w['span'][0] <= 150 <= w['span'][1] for w in windows)
    found = any(
        w['span'][0] <= 150 < w['span'][0] + len(h)
        and h[150 - w['span'][0]] == alt
        for w in windows for h in w['haplotypes'])
    assert found
    assert len(realigned) == len(reads)


def test_pileup_featurizer(snp_reads):
    reads, ref, alt = snp_reads
    img = PileupFeaturizer(height=24, width=61)._featurize(
        (reads, ref, 150))
    assert img.shape == (24, 61, 6)
    # alt-supporting reads flagged in channel 5 (het: alternating reads)
    center = img[:, 30, 5]
    assert (center == 1.0).any() and (center == 0.5).any()


REF_TESTS = '/root/reference/deepchem/data/tests'


def test_bam_reader_and_featurizer():
    """Pure-Python BGZF/BAM reader against the reference's committed
    example.bam (reference data/tests; pysam absent in this env)."""
    import os
    import pytest
    path = os.path.join(REF_TESTS, 'example.bam')
    if not os.path.exists(path):
        pytest.skip('reference BAM fixture not present')
    from deepchem_tpu.utils.bamlib import read_bam
    bam = read_bam(path)
    assert bam.references == ['chr1', 'chr2']
    assert len(bam.records) > 100
    for r in bam.records:
        # structural invariants of a well-formed alignment record
        assert isinstance(r.query_name, str) and r.query_name
        if r.query_sequence is not None and r.query_qualities is not None:
            assert len(r.query_sequence) == len(r.query_qualities)
        if r.cigar and r.query_sequence is not None:
            # CIGAR ops that consume the query must sum to l_seq
            consume_q = {0, 1, 4, 7, 8}          # M I S = X
            n = sum(ln for op, ln in r.cigar if op in consume_q)
            assert n == len(r.query_sequence)
        assert 0 <= r.mapping_quality <= 255
    from deepchem_tpu.feat.bio_seq_featurizer import BAMFeaturizer
    X = BAMFeaturizer(max_records=5).featurize(path)
    assert X.shape == (5, 9)
    name, seq, qlen, rname, start, cigar, mapq, rev, quals = X[0]
    assert qlen == len(seq) and rname in ('chr1', 'chr2')
    assert isinstance(cigar, list) and isinstance(rev, (bool,))


def test_sam_featurizer_reference_layout():
    import os
    import pytest
    path = os.path.join(REF_TESTS, 'example.sam')
    if not os.path.exists(path):
        pytest.skip('reference SAM fixture not present')
    from deepchem_tpu.feat.bio_seq_featurizer import SAMFeaturizer
    X = SAMFeaturizer().featurize(path)
    assert X.shape[1] == 7
    # spec example r001: pos 7 (1-based) -> reference_start 6, cigar
    # 8M4I4M1D3M -> [(0,8),(1,4),(0,4),(2,1),(0,3)]
    row = next(r for r in X if r[0] == 'r001')
    assert row[4] == 6
    assert row[5] == [(0, 8), (1, 4), (0, 4), (2, 1), (0, 3)]


def test_bam_loader_dataset(tmp_path):
    import os
    import pytest
    path = os.path.join(REF_TESTS, 'example.bam')
    if not os.path.exists(path):
        pytest.skip('reference BAM fixture not present')
    from deepchem_tpu.data import BAMLoader
    ds = BAMLoader().create_dataset(path, data_dir=str(tmp_path))
    assert len(ds) > 100
    assert ds.X[0][0]            # query_name non-empty

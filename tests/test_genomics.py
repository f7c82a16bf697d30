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

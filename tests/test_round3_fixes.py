"""Round-3 fixes: ADVICE r2 items + the device-resident fit() fast path.

Covers:
- BAMFeaturizer(get_pileup=True) produces real pileup columns without
  pysam (ADVICE r2 medium: previously silently empty).
- CRAMFeaturizer emits the SAM 7-column layout (reference hierarchy).
- build_neighbor_table raises on degree > max_nb instead of silently
  truncating (the table VJPs assume a complete table).
- _GroverGroupedMPN rejects depth < 2.
- fit() fast path: loss history cadence, checkpointing, callback firing
  at intervals, convergence parity with the per-step generator path.
"""

import os

import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset


# -- BAM pileup (pure Python) ---------------------------------------------

BAM = '/root/reference/deepchem/data/tests/example.bam'


@pytest.mark.skipif(not os.path.exists(BAM), reason='fixture missing')
def test_bam_pileup_pure_python():
    from deepchem_tpu.feat.bio_seq_featurizer import BAMFeaturizer
    feats = BAMFeaturizer(get_pileup=True).featurize(BAM)
    assert feats.shape[1] == 10          # 9 record cols + pileup
    pl = feats[0][9]
    assert len(pl) > 0
    # every column dict has the reference's keys and consistent depth
    for col in pl:
        assert set(col) == {'name', 'pos', 'depth', 'reads'}
        assert col['depth'] == len(col['reads'])
        for read in col['reads']:
            seq, qpos, is_del, is_refskip, indel = read
            if is_del or is_refskip:
                assert qpos is None
            else:
                assert 0 <= qpos < len(seq)
    # the same pileup object is appended to every row (computed once)
    assert feats[1][9] is pl
    # depths follow coverage: positions covered by more reads have
    # higher depth; total bases in pileup == total aligned bases
    n_aligned = sum(c['depth'] for c in pl)
    assert n_aligned > len(pl)           # multi-read coverage exists


def test_pileup_cigar_semantics():
    """Hand-built records: match, insertion, deletion, soft clip."""
    from deepchem_tpu.utils.bamlib import BamRecord
    from deepchem_tpu.feat.bio_seq_featurizer import pileup_from_records

    def rec(start, cigar, seq):
        return BamRecord(query_name='q', flag=0, reference_id=0,
                         reference_name='c', reference_start=start,
                         mapping_quality=60, cigar=cigar,
                         next_reference_id=-1, next_reference_start=-1,
                         template_length=0, query_sequence=seq,
                         query_qualities=None)

    # read A: 3M1I2M at pos 0 (insertion after ref pos 2)
    # read B: 2M2D2M at pos 1 (deletion covers ref pos 3-4)
    a = rec(0, [(0, 3), (1, 1), (0, 2)], 'AAAAAA')
    b = rec(1, [(0, 2), (2, 2), (0, 2)], 'CCCC')
    cols = pileup_from_records([a, b])
    by_pos = {c['pos']: c for c in cols}
    assert by_pos[0]['depth'] == 1
    assert by_pos[1]['depth'] == 2 and by_pos[2]['depth'] == 2
    # insertion marker: read A at ref pos 2 carries indel=+1
    ra = [r for r in by_pos[2]['reads'] if r[0] == 'AAAAAA'][0]
    assert ra[4] == 1
    # deletion marker: read B at ref pos 2 carries indel=-2, and ref
    # pos 3/4 have is_del entries with query_position None
    rb = [r for r in by_pos[2]['reads'] if r[0] == 'CCCC'][0]
    assert rb[4] == -2
    for p in (3, 4):
        dels = [r for r in by_pos[p]['reads'] if r[2] == 1]
        assert len(dels) == 1 and dels[0][1] is None
    # read A consumed the inserted base: its ref pos 3 base is query
    # index 4 (3 matched + 1 inserted)
    ra3 = [r for r in by_pos[3]['reads'] if r[0] == 'AAAAAA'][0]
    assert ra3[1] == 4


def test_cram_featurizer_is_sam_layout():
    from deepchem_tpu.feat.bio_seq_featurizer import (CRAMFeaturizer,
                                                      SAMFeaturizer)
    assert issubclass(CRAMFeaturizer, SAMFeaturizer)
    # 7-column get_features inherited from SAMFeaturizer, not BAM's 9
    from deepchem_tpu.feat.bio_seq_featurizer import BAMFeaturizer
    assert not issubclass(CRAMFeaturizer, BAMFeaturizer)


# -- neighbor-table degree guard ------------------------------------------

def test_neighbor_table_degree_guard():
    from deepchem_tpu.ops.nei_table import build_neighbor_table
    # star graph: center node degree 5 > max_nb=4 must raise
    src = np.array([1, 2, 3, 4, 5, 0, 0, 0, 0, 0])
    dst = np.array([0, 0, 0, 0, 0, 1, 2, 3, 4, 5])
    with pytest.raises(ValueError, match='degree'):
        build_neighbor_table(src, dst, 6, max_nb=4)
    table, mask = build_neighbor_table(src, dst, 6, max_nb=5)
    assert mask[0].sum() == 5


def test_grover_grouped_depth_guard():
    from deepchem_tpu.models.grover import _GroverGroupedMPN
    import jax
    import jax.numpy as jnp
    m = _GroverGroupedMPN(groups=2, hidden=8, depth=1,
                          atom_messages=True)
    f = jnp.zeros((4, 8))
    a2nei = jnp.zeros((4, 3), jnp.int32)
    mask = jnp.ones(4)
    with pytest.raises(ValueError, match='depth'):
        m.init(jax.random.PRNGKey(0), f, a2nei,
               jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32),
               mask)


# -- fit() fast path -------------------------------------------------------

def _toy_model(tmpdir, **kwargs):
    from deepchem_tpu.models import MultitaskClassifier
    return MultitaskClassifier(n_tasks=2, n_features=10,
                               layer_sizes=[16], batch_size=10,
                               model_dir=str(tmpdir), **kwargs)


def _toy_data(n=50, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 10).astype(np.float32)
    y = (X[:, :2] > 0).astype(np.float32)
    return NumpyDataset(X, y)


def test_fit_fast_path_is_used_and_converges(tmp_path):
    ds = _toy_data()
    model = _toy_model(tmp_path)
    losses = []
    out = model.fit(ds, nb_epoch=30, checkpoint_interval=0,
                    all_losses=losses)
    # fast path populated the prepared-batch cache
    assert isinstance(getattr(model, '_fit_data_cache', None), dict)
    assert model._fit_data_cache['S'] == 5
    assert len(losses) > 0 and out == losses[-1]
    assert losses[-1] < losses[0]        # it actually trained
    assert model.get_global_step() == 150


def test_fit_fast_loss_history_cadence(tmp_path):
    ds = _toy_data()
    model = _toy_model(tmp_path)
    model.log_frequency = 7
    losses = []
    model.fit(ds, nb_epoch=4, checkpoint_interval=0, all_losses=losses)
    # 20 steps, windows at 7/14/20 -> 3 entries (generator-path cadence)
    assert len(losses) == 3


def test_fit_fast_checkpoints_and_restore(tmp_path):
    ds = _toy_data()
    model = _toy_model(tmp_path)
    model.fit(ds, nb_epoch=4, checkpoint_interval=10)
    ckpts = model.get_checkpoints()
    assert len(ckpts) >= 2               # interval saves + final save
    step = model.get_global_step()
    model2 = _toy_model(tmp_path)
    model2.fit(ds, nb_epoch=1, checkpoint_interval=0, restore=True)
    assert model2.get_global_step() == step + 5


def test_fit_fast_callback_interval(tmp_path):
    ds = _toy_data()
    model = _toy_model(tmp_path)
    seen = []

    class Cb:
        interval = 8

        def __call__(self, m, step):
            seen.append(step)
    model.fit(ds, nb_epoch=4, checkpoint_interval=0, callbacks=Cb())
    # steps 1..20, callback at multiples of 8 with live params
    assert seen == [8, 16]


def test_fit_fast_callback_early_stop(tmp_path):
    ds = _toy_data()
    model = _toy_model(tmp_path)

    class Stop:
        interval = 5

        def __call__(self, m, step):
            raise StopIteration
    model.fit(ds, nb_epoch=10, checkpoint_interval=0, callbacks=Stop())
    assert model.get_global_step() == 5  # stopped at first boundary


def test_fit_fallback_on_custom_loss(tmp_path):
    """Custom loss must take the generator path (per-step host loop)."""
    ds = _toy_data()
    model = _toy_model(tmp_path)

    def loss(outputs, labels, weights):
        import jax.numpy as jnp
        return jnp.mean((outputs[0] - labels[0][..., None]) ** 2)
    model.fit(ds, nb_epoch=1, checkpoint_interval=0, loss=loss)
    assert getattr(model, '_fit_data_cache', None) is None


def test_fit_fast_matches_generator_quality(tmp_path):
    """Both paths reach the same overfit quality on a toy problem."""
    from deepchem_tpu.metrics import Metric, roc_auc_score
    ds = _toy_data(n=40, seed=3)
    metric = Metric(roc_auc_score, np.mean)
    m1 = _toy_model(tmp_path / 'a')
    m1.fit(ds, nb_epoch=50, checkpoint_interval=0)
    s1 = m1.evaluate(ds, [metric])['roc_auc_score']
    m2 = _toy_model(tmp_path / 'b')
    m2.fit_generator(m2.default_generator(ds, epochs=50),
                     checkpoint_interval=0)
    s2 = m2.evaluate(ds, [metric])['roc_auc_score']
    assert s1 > 0.95 and s2 > 0.95


def test_fit_fast_cache_invalidated_by_version(tmp_path):
    """DiskDataset mutation (version bump) refreshes the cache."""
    ds = _toy_data()
    model = _toy_model(tmp_path)
    model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    c1 = model._fit_data_cache
    ds._version = getattr(ds, '_version', 0) + 1
    model.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert model._fit_data_cache is not c1


# -- parallel featurization wiring ----------------------------------------

def test_n_jobs_pool_matches_serial():
    """Pooled featurization (workers parse SMILES) must produce
    byte-identical features to the serial path."""
    from deepchem_tpu.feat import CircularFingerprint
    smiles = ['CCO', 'c1ccccc1', 'CC(=O)OC1=CC=CC=C1C(=O)O',
              'not_a_smiles', 'CCN'] * 20
    feat = CircularFingerprint(size=512)
    a = feat.featurize(smiles, n_jobs=1)
    b = feat.featurize(smiles, n_jobs=2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loader_n_jobs_plumbed(tmp_path):
    import csv as _csv
    from deepchem_tpu.data import CSVLoader
    from deepchem_tpu.feat import CircularFingerprint
    path = tmp_path / 'mini.csv'
    with open(path, 'w', newline='') as f:
        w = _csv.writer(f)
        w.writerow(['smiles', 'task'])
        for s, y in [('CCO', 1), ('CCN', 0), ('c1ccccc1', 1)] * 30:
            w.writerow([s, y])
    loader = CSVLoader(['task'], CircularFingerprint(size=128),
                       feature_field='smiles', n_jobs=2)
    assert loader.n_jobs == 2
    ds = loader.create_dataset(str(path), str(tmp_path / 'out'))
    assert len(ds) == 90 and ds.X.shape == (90, 128)
    serial = CSVLoader(['task'], CircularFingerprint(size=128),
                       feature_field='smiles', n_jobs=1)
    ds2 = serial.create_dataset(str(path), str(tmp_path / 'out2'))
    np.testing.assert_array_equal(ds.X, ds2.X)


# -- native transformer encoder -------------------------------------------

def test_bert_encoder_forward_and_training():
    import jax
    import jax.numpy as jnp
    import optax
    from deepchem_tpu.models.bert_encoder import BertEncoderMLM, mlm_loss
    rng = np.random.RandomState(0)
    B, S, V = 8, 16, 40
    m = BertEncoderMLM(vocab_size=V, hidden=32, layers=2, heads=4,
                       intermediate=64, max_positions=S + 2)
    ids = jnp.asarray(rng.randint(4, V, (B, S)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    logits = m.apply(params, ids)
    assert logits.shape == (B, S, V) and logits.dtype == jnp.float32
    # padding mask changes masked positions' influence
    mask = np.ones((B, S), np.float32)
    mask[:, S // 2:] = 0.0
    logits_m = m.apply(params, ids, attention_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(logits), np.asarray(logits_m))
    # a few steps of MLM training reduce the loss
    labels = ids
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda p: mlm_loss(m.apply(p, ids), labels))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l
    losses = []
    for _ in range(30):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7


def test_flash_and_xla_attention_agree_when_available():
    import jax
    import jax.numpy as jnp
    from deepchem_tpu.models.bert_encoder import flash_or_xla_attention
    if jax.devices()[0].platform == 'cpu':
        pytest.skip('pallas flash kernel needs TPU')
    q = jnp.asarray(np.random.RandomState(0).randn(2, 128, 4, 64),
                    jnp.float32)
    a = flash_or_xla_attention(q, q, q, None, use_flash=True)
    b = flash_or_xla_attention(q, q, q, None, use_flash=False)
    assert float(jnp.abs(a - b).max()) < 1e-3

"""Offline end-to-end execution of every hub-LLM wrapper (VERDICT r3
item 7; reference torch_models/hf_models.py:23,545, chemberta.py,
prot_bert.py, antibody_modeling.py, molformer.py): tiny random-init
configs, no downloads — MLM pretrain -> save -> finetune (encoder
transfer) -> fill_mask -> predict."""

import os

import numpy as np
import pytest

from deepchem_tpu.data import NumpyDataset

TINY = dict(num_hidden_layers=2, num_attention_heads=2, hidden_size=32,
            intermediate_size=64)

SMILES = ['CCO', 'c1ccccc1', 'CC(=O)O', 'CCN', 'CCCC', 'C1CC1',
          'CCOC', 'CN(C)C'] * 2
PROTEINS = ['MPCTTYLPLLLLLFLLPPPSVQSKV', 'SSGLFWMELLTQFVLTWPLVVIAFL',
            'MKVLAAGIVQ', 'GATTACAWYH'] * 4


def _smiles_ds(n_tasks=1):
    y = np.tile(np.arange(len(SMILES)) % 2, (n_tasks, 1)).T.astype(
        np.float32)
    return NumpyDataset(np.asarray(SMILES, dtype=object), y)


def _protein_ds():
    y = (np.arange(len(PROTEINS)) % 2).astype(np.float32)[:, None]
    return NumpyDataset(np.asarray(PROTEINS, dtype=object), y)


def test_chemberta_mlm_finetune_fillmask_predict(tmp_path):
    """The full reference workflow offline: MLM pretrain 2 epochs ->
    checkpoint -> classification finetune via load_from_pretrained ->
    fill_mask -> predict."""
    from deepchem_tpu.models import Chemberta
    ds = _smiles_ds()
    pre_dir = str(tmp_path / 'pretrain')
    pre = Chemberta(task='mlm', max_length=32, batch_size=8,
                    model_dir=pre_dir, **TINY)
    loss = pre.fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert np.isfinite(loss)
    pre.save_checkpoint()

    fine = Chemberta(task='classification', n_tasks=1, max_length=32,
                     batch_size=8, **TINY)
    ids, attn = fine._tokenize(SMILES[:8])
    fine.load_from_pretrained(
        Chemberta(task='mlm', max_length=32, batch_size=8, **TINY),
        model_dir=pre_dir, inputs=[ids, attn])
    floss = fine.fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert np.isfinite(floss)
    preds = fine.predict(ds)
    assert np.asarray(preds).shape[0] == len(SMILES)

    # fill_mask on the pretrained MLM
    masked = SMILES[0].replace('O', pre.tokenizer.tok.vocab and '[MASK]'
                               if hasattr(pre.tokenizer, 'tok') else
                               '[MASK]')
    out = pre.fill_mask(['CC[MASK]'], top_k=3)
    assert len(out) == 1 and len(out[0]) >= 1
    assert len(out[0][0]) == 3
    assert all({'token', 'token_str', 'score'} <= set(c)
               for c in out[0][0])


def test_chemberta_encoder_transfer_actually_copies():
    from deepchem_tpu.models import Chemberta
    import jax.numpy as jnp
    src = Chemberta(task='mlm', max_length=16, batch_size=4, **TINY)
    ds = _smiles_ds()
    src.fit(ds, nb_epoch=1, checkpoint_interval=0)
    dst = Chemberta(task='classification', max_length=16, batch_size=4,
                    **TINY)
    ids, attn = dst._tokenize(SMILES[:4])
    dst.load_from_pretrained(src, inputs=[ids, attn])
    # shared roberta embedding weights must now be identical
    src_emb = src.params['params']['roberta']['embeddings'][
        'word_embeddings']['embedding']
    dst_emb = dst.params['params']['roberta']['embeddings'][
        'word_embeddings']['embedding']
    assert np.allclose(np.asarray(src_emb), np.asarray(dst_emb))


def test_huggingface_model_regression_path():
    from deepchem_tpu.models import HuggingFaceModel
    from deepchem_tpu.models.hf_models import (_SmilesTokenizerHFShim,
                                               _build_chemberta)
    from deepchem_tpu.feat.tokenizers import SmilesTokenizer
    tok = _SmilesTokenizerHFShim(SmilesTokenizer())
    model = _build_chemberta('regression', 1, tok.vocab_size, 16, **TINY)
    m = HuggingFaceModel(model, tok, task='regression', max_length=16,
                         batch_size=4)
    X = np.asarray(SMILES[:8], dtype=object)
    y = np.random.RandomState(0).randn(8, 1).astype(np.float32)
    loss = m.fit(NumpyDataset(X, y), nb_epoch=2, checkpoint_interval=0)
    assert np.isfinite(loss)
    preds = m.predict(NumpyDataset(X, y))
    assert np.asarray(preds).shape[0] == 8


def test_protbert_mlm_and_logreg_classification(tmp_path):
    from deepchem_tpu.models import ProtBERT
    ds = _protein_ds()
    pre_dir = str(tmp_path / 'protbert')
    pre = ProtBERT(task='mlm', max_length=32, batch_size=4,
                   model_dir=pre_dir, **TINY)
    loss = pre.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(loss)
    pre.save_checkpoint()
    # fill_mask proposes amino acids
    out = pre.fill_mask(['MPCT[MASK]YLPL'], top_k=3)
    assert len(out[0]) == 1 and len(out[0][0]) == 3

    clf = ProtBERT(task='classification', cls_name='LogReg',
                   n_classes=2, max_length=32, batch_size=4, **TINY)
    ids, attn = clf._tokenize(PROTEINS[:4])
    clf.load_from_pretrained(
        ProtBERT(task='mlm', max_length=32, batch_size=4, **TINY),
        model_dir=pre_dir, inputs=[ids, attn])
    closs = clf.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(closs)
    preds = clf.predict(ds)
    assert np.asarray(preds).shape == (len(PROTEINS), 2)


def test_protbert_ffn_head():
    from deepchem_tpu.models import ProtBERT
    ds = _protein_ds()
    clf = ProtBERT(task='classification', cls_name='FFN', n_classes=2,
                   max_length=32, batch_size=4, **TINY)
    loss = clf.fit(ds, nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(loss)
    preds = clf.predict(ds)
    assert np.asarray(preds).shape == (len(PROTEINS), 2)
    # head params really are the 2-layer FFN
    head = clf.params['params']['head']
    assert 'layers_0' in head and 'layers_2' in head


def test_protbert_invalid_args():
    from deepchem_tpu.models import ProtBERT
    with pytest.raises(ValueError, match='Invalid task'):
        ProtBERT(task='segmentation', **TINY)
    with pytest.raises(ValueError, match='Invalid classifier'):
        ProtBERT(task='classification', cls_name='SVM', **TINY)


def test_deepabllm_mlm_pretrain_and_redesign():
    from deepchem_tpu.models import DeepAbLLM
    ds = _protein_ds()
    m = DeepAbLLM(task='mlm', max_length=32, batch_size=4)
    loss = m.fit(ds, nb_epoch=2, checkpoint_interval=0)
    assert np.isfinite(loss)
    seq = 'MPCTTYLPLL'
    # masking utility honors both tokenization conventions
    assert m._mask_seq_pos(seq, 2).split(' ')[2] == '[MASK]'
    esm = DeepAbLLM(task='mlm', is_esm_variant=True, max_length=32,
                    batch_size=4)
    assert '[MASK]' in esm._mask_seq_pos(seq, 0)
    assert ' ' not in esm._mask_seq_pos(seq, 0)

    proposals = m.redesign_residue(seq, 3, top_k=5)
    assert len(proposals) == 5
    for tok, full, score in proposals:
        assert len(full) == len(seq)
        assert full[:3] == seq[:3] and full[4:] == seq[4:]
        assert 0.0 <= score <= 1.0
    # score-sorted
    scores = [p[2] for p in proposals]
    assert scores == sorted(scores, reverse=True)

    optimized = m._optimize_residue_pos(seq, 3, threshold=0.0)
    assert all(tok != seq[3] for tok, _, _ in optimized)

    redesigned = m.redesign_sequence(seq[:4], top_k=3)
    for idx, tok, full, score in redesigned:
        assert 0 <= idx < 4
        assert len(full) == 4


def test_molformer_local_adapter_runs():
    """MoLFormer executes with a local flax model adapter (the documented
    zero-egress path)."""
    from deepchem_tpu.models import MoLFormer
    from deepchem_tpu.models.hf_models import (_SmilesTokenizerHFShim,
                                               _build_chemberta)
    from deepchem_tpu.feat.tokenizers import SmilesTokenizer
    tok = _SmilesTokenizerHFShim(SmilesTokenizer())
    local = _build_chemberta('mlm', 1, tok.vocab_size, 16, **TINY)
    m = MoLFormer(task='mlm', model=local, tokenizer=tok,
                  max_length=16, batch_size=4)
    loss = m.fit(_smiles_ds(), nb_epoch=1, checkpoint_interval=0)
    assert np.isfinite(loss)
    out = m.fill_mask(['CC[MASK]'], top_k=2)
    assert len(out[0][0]) == 2


def test_molformer_hub_gate_and_native_oneformer():
    from deepchem_tpu.models import MoLFormer, OneFormer
    with pytest.raises(ImportError, match='MoLFormer'):
        MoLFormer()
    # OneFormer is native since r4 (tests/test_oneformer.py trains it);
    # construction needs no hub, and non-semantic tasks raise like the
    # reference (oneformer.py:31-33)
    m = OneFormer(id2label={0: 'bg', 1: 'fg'})
    assert m.num_labels == 2 and m.task == 'universal_segmentation'
    with pytest.raises(ValueError, match='not supported'):
        OneFormer(segmentation_task='panoptic')

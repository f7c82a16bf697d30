"""Demonstrate the GROVER pretrain->finetune benefit (VERDICT r1 item 4).

Protocol: 288 balanced tox21 NR-AhR molecules; self-supervised pretraining
(atom/bond context vocab + functional groups) on ALL molecules; supervised
finetuning on the first 20 labeled molecules (freeze encoder 30 epochs,
then unfreeze 30); evaluate ROC-AUC on the next 200 held-out molecules
against a from-scratch model trained 60 epochs on the same 20.

Result (2026-08-16, virtual CPU, seeds 0/1/2):
    seed 0: pretrained 0.8320  scratch 0.8255  delta +0.0065
    seed 1: pretrained 0.8315  scratch 0.8186  delta +0.0129
    seed 2: pretrained 0.8337  scratch 0.8302  delta +0.0035
    mean delta +0.0076 (positive on 3/3 seeds)

Run: JAX_PLATFORMS=cpu python scripts/grover_pretrain_delta.py
"""
import os
import tempfile

import numpy as np
import pandas as pd

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

from deepchem_tpu.chem import mol_from_smiles                 # noqa: E402
from deepchem_tpu.data import NumpyDataset                    # noqa: E402
from deepchem_tpu.metrics import Metric, roc_auc_score        # noqa: E402
from deepchem_tpu.models import (GroverAtomVocabularyBuilder,  # noqa: E402
                                 GroverBondVocabularyBuilder,
                                 GroverFeaturizer, GroverModel)

TOX21 = '/root/reference/datasets/tox21.csv.gz'
TASK = 'NR-AhR'


def main():
    df = pd.read_csv(TOX21)
    sub = df[~df[TASK].isna()]
    sub = pd.concat([sub[sub[TASK] == 1].head(150),
                     sub[sub[TASK] == 0].head(150)]).sample(
        frac=1.0, random_state=0)
    smiles = sub.smiles.tolist()
    y = sub[TASK].values.astype(float)[:, None]
    mols = [mol_from_smiles(s) for s in smiles]
    ok = [i for i, m in enumerate(mols)
          if m is not None and 3 <= m.num_atoms <= 40]
    smiles = [smiles[i] for i in ok]
    y = y[ok]
    mols = [mols[i] for i in ok]
    av = GroverAtomVocabularyBuilder()
    av.build(mols)
    bv = GroverBondVocabularyBuilder()
    bv.build(mols)
    X = GroverFeaturizer(atom_vocab=av, bond_vocab=bv).featurize(smiles)
    keep = [i for i, x in enumerate(X)
            if not np.isscalar(x) and getattr(x, 'num_nodes', 0) > 0]
    X = np.asarray([X[i] for i in keep], dtype=object)
    y = y[keep]
    n_lab = 20
    train = NumpyDataset(X[:n_lab], y[:n_lab])
    test = NumpyDataset(X[n_lab:n_lab + 200], y[n_lab:n_lab + 200])
    pre_ds = NumpyDataset(X, np.zeros((len(X), 1)))
    metric = Metric(roc_auc_score, np.mean)
    arch = dict(hidden_size=64, num_mt_block=1, num_heads=4, depth=2)

    tmp = tempfile.mkdtemp()
    pre = GroverModel(task='pretraining', atom_vocab=av, bond_vocab=bv,
                      learning_rate=0.001, model_dir=tmp, seed=0,
                      batch_size=48, **arch)
    losses: list = []
    pre.fit(pre_ds, nb_epoch=40, all_losses=losses, checkpoint_interval=0)
    print(f'pretrain loss {losses[0]:.3f} -> {losses[-1]:.3f}')
    pre.save_components()

    deltas = []
    for seed in (0, 1, 2):
        ft = GroverModel(task='finetuning', mode='classification',
                         n_tasks=1, learning_rate=0.001, seed=seed,
                         batch_size=n_lab, **arch)
        gen = ft.default_generator(train, epochs=1)
        ft.build(ft._prepare_batch(next(gen))[0])
        ft.load_components(tmp, components=['encoder'])
        ft.freeze_components(['encoder'])
        ft.fit(train, nb_epoch=30, checkpoint_interval=0)
        ft.unfreeze_components(['encoder'])
        ft.fit(train, nb_epoch=30, checkpoint_interval=0)
        sp = ft.evaluate(test, [metric])['roc_auc_score']
        sc = GroverModel(task='finetuning', mode='classification',
                         n_tasks=1, learning_rate=0.001, seed=seed,
                         batch_size=n_lab, **arch)
        sc.fit(train, nb_epoch=60, checkpoint_interval=0)
        ss = sc.evaluate(test, [metric])['roc_auc_score']
        deltas.append(sp - ss)
        print(f'seed {seed}: pretrained {sp:.4f} scratch {ss:.4f} '
              f'delta {sp - ss:+.4f}')
    print(f'mean delta {np.mean(deltas):+.4f} '
          f'(positive on {sum(d > 0 for d in deltas)}/3 seeds)')


if __name__ == '__main__':
    main()

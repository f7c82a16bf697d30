"""Genomics: simulate motif data (dnasim), train a CNN to detect the
motif, and run the DeepVariant-style realigner on simulated reads.

Run: python examples/genomics_motifs.py
"""
import numpy as np

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import OneHotFeaturizer, Read, Realigner
from deepchem_tpu.metrics import Metric, roc_auc_score
from deepchem_tpu.models import CNNModel
from deepchem_tpu.molnet import simulate_single_motif_detection

# 1. simulate a TAL1 motif detection task
seqs, y, _ = simulate_single_motif_detection(
    'TAL1_known4', seq_length=100, num_pos=100, num_neg=100,
    GC_fraction=0.4, seed=0)
X = OneHotFeaturizer(charset=['A', 'C', 'G', 'T'],
                     max_length=100).featurize(seqs)
ds = NumpyDataset(X, y.astype(float))
model = CNNModel(n_tasks=1, n_features=4, dims=1, layer_filters=[16],
                 kernel_size=12, mode='classification', batch_size=20,
                 learning_rate=1e-3)
model.fit(ds, nb_epoch=10, checkpoint_interval=0)
print('motif detection AUC:',
      model.evaluate(ds, [Metric(roc_auc_score, np.mean)]))

# 2. realign simulated reads around a SNP
rng = np.random.RandomState(0)
ref = ''.join(np.array(list('ACGT'))[rng.randint(0, 4, 300)])
alt = 'T' if ref[150] != 'T' else 'A'
var = ref[:150] + alt + ref[151:]
reads = [Read(f'r{i}', (var if i % 2 == 0 else ref)[s:s + 60], s)
         for i, s in enumerate(rng.randint(100, 160, 20))]
realigned, windows = Realigner(k=11).realign(reads, ref)
for w in windows:
    print(f"candidate window {w['span']}: "
          f"{len(w['haplotypes'])} haplotypes, {len(w['reads'])} reads")

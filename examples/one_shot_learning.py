"""One-shot learning on multitask molecular data (matching networks /
AttnLSTM / IterRefLSTM; reference low-data benchmark workflow).

Run: python examples/one_shot_learning.py
"""
import numpy as np

from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.feat import MolGraphConvFeaturizer
from deepchem_tpu.metrics import roc_auc_score
from deepchem_tpu.models import SupportGraphClassifier

np.random.seed(0)
smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'c1ccncc1',
          'C1CCCCC1', 'CCCC', 'CCOC', 'CC(C)C', 'c1ccco1', 'C1CC1',
          'CCCCO', 'CCCN', 'c1ccc(O)cc1', 'CC(C)O', 'CCCCC', 'C1CCOC1',
          'c1cncnc1', 'CCCCCC']
X = MolGraphConvFeaturizer().featurize(smiles)
y = np.stack([np.array(['1' in s for s in smiles], float),       # ring?
              np.array(['O' in s or 'o' in s for s in smiles],
                       float)], axis=1)                           # oxygen?
ds = NumpyDataset(X, y, np.ones_like(y))

for kind in ('siamese', 'attn', 'res'):
    model = SupportGraphClassifier(model=kind, n_pos=2, n_neg=4,
                                   n_test=8, n_feat=32,
                                   layer_sizes=(32,),
                                   learning_rate=3e-3)
    model.fit(ds, nb_epochs=1, n_episodes_per_epoch=60, log_every=0)
    means, stds = model.evaluate(ds, roc_auc_score, n_trials=6)
    print(f'{kind:8s} AUC per task:',
          {t: round(v, 3) for t, v in sorted(means.items())})

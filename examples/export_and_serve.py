"""Export a trained model to StableHLO and serve padded batches —
compile once, no Python model code needed at inference time.

Run: PYTHONPATH=. python examples/export_and_serve.py
"""
import os
import tempfile

import numpy as np

import deepchem_tpu as dc
from deepchem_tpu.data import NumpyDataset
from deepchem_tpu.serving import (export_model, load_exported,
                                  InferenceServer)

# train a small model
rng = np.random.RandomState(0)
X = rng.randn(200, 32).astype(np.float32)
y = (X[:, :4].sum(axis=1, keepdims=True) > 0).astype(float)
model = dc.models.MultitaskClassifier(n_tasks=1, n_features=32,
                                      layer_sizes=[64], batch_size=50)
model.fit(NumpyDataset(X, y), nb_epoch=20, checkpoint_interval=0)

# export: serialized StableHLO + params in one file
path = os.path.join(tempfile.mkdtemp(), 'classifier.dcx')
export_model(model, [X[:50]], path)
print(f'exported {os.path.getsize(path):,} bytes -> {path}')

# load + serve (no model class needed)
server = InferenceServer(load_exported(path))
preds = server.predict(X[:123])        # any length; padded internally
ref = model.predict_on_batch(X[:123])
print('served', preds.shape, 'matches python model:',
      bool(np.allclose(preds, ref, atol=1e-5)))

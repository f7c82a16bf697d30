"""Data-parallel training over a device mesh.

Run with real chips, or simulate: 
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_training.py
"""
import numpy as np
import jax
import deepchem_tpu as dc

print('devices:', jax.devices())
tasks, (train, valid, test), transformers = dc.molnet.load_tox21(
    featurizer='ecfp', splitter='random')
model = dc.models.MultitaskClassifier(
    n_tasks=len(tasks), n_features=1024, layer_sizes=[1000],
    batch_size=96)          # batch sharded over the mesh automatically
trainer = dc.models.DistributedTrainer(max_epochs=10,
                                       distributed_strategy='ddp')
trainer.fit(model, train)
from deepchem_tpu.metrics import Metric, roc_auc_score
print(model.evaluate(valid, [Metric(roc_auc_score, np.mean)],
                     transformers))

"""Native OneFormer (models/oneformer.py) — reference
torch_models/oneformer.py:20 training surface.

Discipline mirrors the reference's usage example (oneformer.py:36-64):
fit on an ImageDataset of (image, mask) pairs, predict full-resolution
label maps, score with jaccard/pixel accuracy.  The synthetic task is
learnable from pixel intensity + position: class 1 is a bright square
on a dark background.
"""

import numpy as np
import pytest

from deepchem_tpu.data import ImageDataset
from deepchem_tpu.models import OneFormer


def _square_dataset(n=8, size=32, seed=0):
    rng = np.random.RandomState(seed)
    X = np.zeros((n, size, size, 3), np.uint8)
    y = np.zeros((n, size, size), np.int64)
    for i in range(n):
        X[i] = rng.randint(0, 60, (size, size, 3))
        s = rng.randint(6, 12)
        r, c = rng.randint(0, size - s, 2)
        X[i, r:r + s, c:c + s] = rng.randint(180, 255, 3)
        y[i, r:r + s, c:c + s] = 1
    return ImageDataset(X, y)


def test_oneformer_learns_semantic_segmentation():
    ds = _square_dataset()
    model = OneFormer(id2label={0: 'background', 1: 'square'},
                      num_queries=8, hidden=32, dec_layers=2,
                      batch_size=4, learning_rate=3e-3)
    model.fit(ds, nb_epoch=60, checkpoint_interval=0)
    preds = model.predict(ds)
    assert preds.shape == ds.y.shape
    acc = float((preds == ds.y).mean())
    # both classes must actually be predicted (not background collapse)
    inter = float(((preds == 1) & (ds.y == 1)).sum())
    union = float(((preds == 1) | (ds.y == 1)).sum())
    iou = inter / max(union, 1.0)
    assert acc > 0.9, acc
    assert iou > 0.5, iou


def test_oneformer_task_gates_and_surface():
    with pytest.raises(ValueError, match='not supported'):
        OneFormer(segmentation_task='instance')
    with pytest.raises(ValueError, match='unknown task'):
        OneFormer(segmentation_task='edges')
    m = OneFormer(id2label={0: 'a', 1: 'b', 2: 'c'})
    assert m.get_num_tasks() == 3
    assert m.get_task_type() == 'universal_segmentation'
    assert m.label2id == {'a': 0, 'b': 1, 'c': 2}

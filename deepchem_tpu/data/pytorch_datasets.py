"""PyTorch dataset adapters (reference deepchem/data/pytorch_datasets.py:9
_TorchNumpyDataset/_TorchDiskDataset/_TorchImageDataset with worker/DDP
rank sharding).

Torch (CPU) ships in this environment; adapters are provided for users
migrating tooling, while TPU training consumes batches directly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _worker_shard(n: int):
    """(start, stop, step) honoring torch DataLoader workers + DDP ranks
    (reference pytorch_datasets.py rank-splitting)."""
    first, step = 0, 1
    try:
        import torch
        import torch.distributed as dist
        if dist.is_available() and dist.is_initialized():
            first = dist.get_rank()
            step = dist.get_world_size()
        info = torch.utils.data.get_worker_info()
        if info is not None:
            first = first * info.num_workers + info.id
            step = step * info.num_workers
    except ImportError:
        pass
    return first, step


def make_pytorch_dataset(dataset, epochs: int = 1,
                         deterministic: bool = False,
                         batch_size: Optional[int] = None):
    """dataset -> torch IterableDataset (reference
    data/datasets.py make_pytorch_dataset)."""
    import torch

    class _TorchDataset(torch.utils.data.IterableDataset):

        def __iter__(self):
            first, step = _worker_shard(len(dataset))
            for epoch in range(epochs):
                if batch_size is None:
                    n = len(dataset)
                    order = (np.arange(n) if deterministic
                             else np.random.permutation(n))
                    for i in order[first::step]:
                        X, y, w, ids = (dataset.X[i], dataset.y[i],
                                        dataset.w[i], dataset.ids[i])
                        yield X, y, w, ids
                else:
                    for bi, batch in enumerate(dataset.iterbatches(
                            batch_size=batch_size,
                            deterministic=deterministic)):
                        if (bi - first) % step == 0:
                            yield batch

        def __len__(self):
            return len(dataset) * epochs

    return _TorchDataset()

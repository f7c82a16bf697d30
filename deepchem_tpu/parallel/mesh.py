"""Device-mesh utilities: the framework's distribution substrate.

The reference delegates multi-device training to PyTorch Lightning DDP/FSDP
over NCCL (reference deepchem/models/trainer.py:6,56-104,
models/lightning/dc_lightning_module.py:6).  The TPU-native replacement is
single-controller JAX: one ``jax.sharding.Mesh`` over all chips (ICI), with
parameters replicated and batches sharded on the leading axis; XLA emits the
gradient all-reduce (SURVEY.md section 2.7).  There is deliberately no
user-visible collective API — shardings are the interface.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return len(jax.devices())


def get_default_mesh(n_devices: Optional[int] = None,
                     axis_name: str = 'data') -> Optional[Mesh]:
    """1-D data-parallel mesh over all (or the first n) devices; None if
    only one device is available."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch_axis(tree, mesh: Mesh, axis_name: str = 'data'):
    """Shard every array leaf on its leading axis (must divide the mesh
    size); non-divisible leaves are replicated."""
    n = mesh.devices.size

    def put(x):
        if hasattr(x, 'shape') and getattr(x, 'ndim', 0) >= 1 \
                and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh]):
    """Enter the mesh (no-op when mesh is None)."""
    if mesh is None:
        yield
    else:
        with mesh:
            yield

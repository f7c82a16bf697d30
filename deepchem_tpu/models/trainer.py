"""DistributedTrainer: the multi-device training entry point.

API shim over the mesh-based engine, standing in for reference
deepchem/models/trainer.py:6 (DistributedTrainer -> Lightning
ddp/fsdp).  On TPU there is no strategy zoo: the engine's data-parallel
mesh covers ddp semantics, and parameter sharding ('fsdp') replicates
optimizer state sharding via NamedSharding rules.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


class DistributedTrainer:
    """Train a JaxModel over all available devices.

    Parameters mirror the reference trainer where meaningful:
    ``distributed_strategy`` accepts 'ddp' (batch sharded, params
    replicated) or 'fsdp' (batch sharded + optimizer state sharded).
    """

    def __init__(self, max_epochs: int = 10,
                 distributed_strategy: str = 'ddp',
                 accelerator: Optional[str] = None,
                 devices: Optional[int] = None,
                 log_every_n_steps: int = 100):
        if distributed_strategy not in ('ddp', 'fsdp'):
            raise ValueError("strategy must be 'ddp' or 'fsdp'")
        self.max_epochs = max_epochs
        self.distributed_strategy = distributed_strategy
        self.devices = devices
        self.log_every_n_steps = log_every_n_steps

    def fit(self, model, dataset, on_device: bool = False) -> float:
        """Train ``model`` (a JaxModel) on ``dataset`` over the mesh.

        ``model.distribute`` derives every family-specific piece of
        distribution state — dense models shard the batch axis; graph
        models additionally derive subgraph shards and padding quanta
        from the dataset — so this works unchanged for
        ``DistributedTrainer().fit(GraphConvModel(...), ds)``.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        devices = jax.devices()
        if self.devices is not None:
            devices = devices[:self.devices]
        model.distribute(devices=devices, dataset=dataset)
        model.log_frequency = self.log_every_n_steps
        if self.distributed_strategy == 'fsdp' and model.mesh is not None \
                and model._built:
            # shard large optimizer-state leaves along their first axis
            mesh = model.mesh

            def shard_leaf(x):
                # shard along the largest axis the mesh divides — axis 0
                # alone fails whenever a layer's fan-in is not a multiple
                # of the device count (e.g. a (12, 8192) kernel on 8
                # devices), which silently degraded fsdp to replication
                if hasattr(x, 'ndim') and x.ndim >= 1 and x.size > 65536:
                    for axis in sorted(range(x.ndim),
                                       key=lambda a: -x.shape[a]):
                        if x.shape[axis] % mesh.devices.size == 0:
                            spec = [None] * x.ndim
                            spec[axis] = 'data'
                            return jax.device_put(
                                x, NamedSharding(mesh, P(*spec)))
                return jax.device_put(x, NamedSharding(mesh, P()))
            model.opt_state = jax.tree.map(shard_leaf, model.opt_state)
        if on_device:
            return model.fit_on_device(dataset, nb_epoch=self.max_epochs)
        return model.fit(dataset, nb_epoch=self.max_epochs)

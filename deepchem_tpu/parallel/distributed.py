"""Multi-host (DCN) runtime: jax.distributed wiring + per-process data.

The reference's multi-node path is Lightning's ``num_nodes``/strategy
(reference models/trainer.py:56-104) plus rank-sharded torch datasets
(reference data/pytorch_datasets.py:9).  The TPU-native equivalent
(SURVEY 2.7) is:

1. one :func:`init_distributed` call per host process — wraps
   ``jax.distributed.initialize`` so every process sees the GLOBAL
   device set (ICI within a slice, DCN across slices);
2. a global :func:`global_mesh` whose 'data' axis spans all devices —
   ``model.distribute(mesh)`` then trains data-parallel across hosts,
   with XLA emitting the cross-host gradient all-reduces;
3. :func:`process_shard` assigning each process its slice of the
   dataset — whole DiskDataset shards round-robin (IO stays host-local,
   the file-sharded layout maps 1:1 onto processes), or block-interleaved
   indices whose per-batch concatenation reproduces the single-process
   global batch exactly (loss-parity-exact data parallelism).

On CPU a local multi-process cluster works out of the box (gloo
collectives) — that is how ``tests/test_multiprocess.py`` validates the
cross-process all-reduce and 2-process-vs-1 fit parity without multiple
TPU hosts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ['init_distributed', 'global_mesh', 'process_shard',
           'process_shard_indices']

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> Tuple[int, int]:
    """Join (or start) the multi-host JAX cluster; returns
    ``(process_index, process_count)``.

    Call once per host process BEFORE any other JAX use.  On TPU pods
    every argument is auto-detected from the pod metadata and all
    arguments may be omitted; for manual clusters (or a local CPU test
    cluster) pass ``coordinator_address='host:port'``, ``num_processes``
    and ``process_id``.  Safe to call twice (idempotent) and safe on a
    single process (returns ``(0, 1)`` without starting a cluster when
    no coordinator is known).
    """
    global _initialized
    import jax
    if _initialized:
        return jax.process_index(), jax.process_count()
    # CPU multi-process collectives need gloo; set it before the backend
    # initializes.  Scoped to explicit CPU requests so TPU autodetection
    # is untouched.
    if os.environ.get('JAX_PLATFORMS', '').startswith('cpu'):
        try:
            jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        except Exception:  # older jax: option absent, gloo is default
            pass
    no_args = (coordinator_address is None and num_processes is None
               and process_id is None)
    auto = any(k in os.environ for k in (
        'JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
        'TPU_WORKER_HOSTNAMES', 'MEGASCALE_COORDINATOR_ADDRESS'))
    if no_args and not auto:
        return 0, 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError:
        if not no_args:
            raise
        # auto-detection fired off ambient pod env vars but the backend
        # is already up (single-process session on a tunneled chip):
        # argless init degrades to a no-op
        return jax.process_index(), jax.process_count()
    _initialized = True
    return jax.process_index(), jax.process_count()


def global_mesh(axis_names: Sequence[str] = ('data',),
                axis_shape: Optional[Sequence[int]] = None):
    """Mesh over the GLOBAL device set (every process's devices).

    Default: 1-D 'data' mesh — data parallelism across all chips on all
    hosts.  Pass ``axis_shape`` to fold the devices into more axes, e.g.
    ``axis_names=('data', 'model'), axis_shape=(-1, 4)``.
    """
    import jax
    devices = np.array(jax.devices())
    if axis_shape is not None:
        devices = devices.reshape(axis_shape)
    elif len(axis_names) != 1:
        raise ValueError('axis_shape required for multi-axis meshes')
    from jax.sharding import Mesh
    return Mesh(devices, tuple(axis_names))


def process_shard_indices(n: int, batch_size: Optional[int] = None,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None
                          ) -> np.ndarray:
    """This process's row indices out of ``n`` dataset rows.

    With ``batch_size`` (the PER-PROCESS batch size): block-interleaved
    so that the concatenation over processes of each local batch ``b``
    equals rows ``[b*B_g, (b+1)*B_g)`` of the dataset (``B_g = batch *
    processes``) — i.e. multi-process training consumes exactly the
    batches a single process would, split across hosts.  Rows beyond
    the last full global batch go to the trailing ragged window by the
    same rule.

    Without ``batch_size``: plain strided assignment
    (``rank::world_size``), the reference's rank-sharding rule
    (data/pytorch_datasets.py:9).
    """
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return np.arange(n)
    if batch_size is None:
        return np.arange(pi, n, pc)
    B, G = batch_size, batch_size * pc
    out = []
    for lo in range(0, n, G):
        window = np.arange(lo, min(lo + G, n))
        # p-th equal block of the window (ragged tail: same split rule)
        blocks = np.array_split(window, pc)
        out.append(blocks[pi])
    return np.concatenate(out) if out else np.arange(0)


def process_shard(dataset, batch_size: Optional[int] = None,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None, **select_kwargs):
    """This process's slice of ``dataset`` for multi-host training.

    DiskDataset without ``batch_size``: whole shards are assigned
    round-robin per process (``shard_i % process_count``), so each host
    only ever reads its own shard files — the file-sharded layout maps
    directly onto the process grid.  Everything else (or when exact
    global-batch semantics are wanted): row-level
    :func:`process_shard_indices`.
    """
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return dataset
    if batch_size is None and hasattr(dataset, 'get_number_shards'):
        n_shards = dataset.get_number_shards()
        if n_shards >= pc:
            # contiguous row ranges of the assigned shards: select()
            # reads only those shard files
            sizes = [len(dataset.get_shard_ids(i))
                     if hasattr(dataset, 'get_shard_ids')
                     else len(dataset.get_shard(i)[0])
                     for i in range(n_shards)]
            starts = np.concatenate([[0], np.cumsum(sizes)])
            idx = np.concatenate([
                np.arange(starts[i], starts[i + 1])
                for i in range(n_shards) if i % pc == pi])
            return dataset.select(idx.astype(np.int64), **select_kwargs)
    idx = process_shard_indices(len(dataset), batch_size, pi, pc)
    return dataset.select(idx, **select_kwargs)

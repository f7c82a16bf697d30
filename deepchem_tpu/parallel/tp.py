"""Tensor parallelism: Megatron-style parameter sharding via GSPMD.

The reference has no tensor parallelism at all (SURVEY.md section 2.7:
its only multi-device path is Lightning DDP/FSDP).  On TPU the dense
transformer families this framework owns (the native MLM encoder
`models/bert_encoder.py`, GROVER's packed attention blocks) outgrow one
chip long before molecular GNNs do, and the TPU-native answer is not a
collective API but SHARDINGS: annotate each weight with a
PartitionSpec over a ('data', 'model') mesh and let XLA's SPMD
partitioner insert the all-reduces on the ICI.

The Megatron pairing implemented by `BERT_TP_RULES`:

- column-parallel: qkv and mlp_in kernels shard their OUTPUT dim over
  'model' (each device owns a head/neuron slice; no communication —
  the following op is elementwise or per-head attention);
- row-parallel: out and mlp_out kernels shard their INPUT dim; their
  matmul produces partial sums and XLA emits ONE all-reduce per pair,
  exactly Megatron's f/g operators (Shoeybi et al. 2019, fig. 3);
- everything else (embeddings, layernorms, biases) replicates.

No module changes are needed: `shard_params` places the existing
pytree, and every jitted step that consumes the placed params inherits
the layout (GSPMD propagates through reshape/transpose, so splitting
3*hidden on the qkv output splits the head axis of the attention).
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: (path-regex, PartitionSpec) — first match wins; matched against the
#: '/'-joined pytree path, e.g. 'params/layer_3/qkv/kernel'.
Rules = Sequence[Tuple[str, P]]

BERT_TP_RULES: Rules = (
    # column-parallel (shard output features over 'model')
    (r'.*/qkv/kernel$', P(None, 'model')),
    (r'.*/mlp_in/kernel$', P(None, 'model')),
    (r'.*/qkv/bias$', P('model')),
    (r'.*/mlp_in/bias$', P('model')),
    # row-parallel (shard input features; XLA all-reduces the partials)
    (r'.*/out/kernel$', P('model', None)),
    (r'.*/mlp_out/kernel$', P('model', None)),
    # replicated: embeddings, layernorms, head, row-parallel biases
    (r'.*', P()),
)

#: Same Megatron pairing for the transformers-Flax BERT/RoBERTa param
#: naming (`.../attention/self/query/kernel` etc.) used by
#: HuggingFaceModel/Chemberta/ProtBERT/DeepAbLLM: q/k/v and the MLP
#: intermediate are column-parallel, both `output/dense` projections
#: (attention out and MLP out) are row-parallel.
HF_TP_RULES: Rules = (
    (r'.*/attention/self/(query|key|value)/kernel$', P(None, 'model')),
    (r'.*/attention/self/(query|key|value)/bias$', P('model')),
    (r'.*/intermediate/dense/kernel$', P(None, 'model')),
    (r'.*/intermediate/dense/bias$', P('model')),
    (r'.*/output/dense/kernel$', P('model', None)),
    (r'.*', P()),
)

#: flax ``nn.MultiHeadDotProductAttention`` naming (GROVER's transformer
#: blocks, models/grover.py): q/k/v kernels are (in, heads, head_dim) —
#: sharding the heads axis is column-parallel; the out kernel is
#: (heads, head_dim, out) — sharding heads is row-parallel (XLA reduces
#: the per-device partial sums).  The grouped MPN that feeds the
#: attention stays replicated: its message-passing gathers are
#: node-flat, not feature-parallel.
GROVER_TP_RULES: Rules = (
    (r'.*/(query|key|value)/kernel$', P(None, 'model')),
    (r'.*/(query|key|value)/bias$', P('model')),
    (r'.*attention[^/]*/out/kernel$', P('model')),
    (r'.*', P()),
)


def get_mesh_2d(model_parallel: int,
                devices: Optional[Sequence] = None,
                axis_names: Tuple[str, str] = ('data', 'model')) -> Mesh:
    """('data', 'model') mesh: 'model' should map to the fastest ICI
    links (adjacent devices), so it is the minor mesh axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f'{n} devices not divisible by '
                         f'model_parallel={model_parallel}')
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def spec_for(path: str, rules: Rules = BERT_TP_RULES) -> P:
    """PartitionSpec for one '/'-joined param path."""
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, 'key', getattr(k, 'idx', k))))
    return '/'.join(parts)


def param_specs(params, rules: Rules = BERT_TP_RULES):
    """Pytree of PartitionSpecs matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: spec_for(_path_str(path), rules), params)


def shard_params(params, mesh: Mesh, rules: Rules = BERT_TP_RULES):
    """Place ``params`` on the mesh per the TP rules.  A spec whose
    sharded dimension does not divide evenly falls back to replication
    (loud, not silent: a warning names the leaf)."""
    import logging
    logger = logging.getLogger(__name__)

    def place(path, x):
        spec = spec_for(_path_str(path), rules)
        if any(spec):
            axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            for dim, name in enumerate(spec):
                if name is None:
                    continue
                if x.ndim <= dim or x.shape[dim] % axis_sizes[name] != 0:
                    logger.warning(
                        'TP: %s dim %d (%s) not divisible by mesh axis '
                        '%r (%d) — replicating', _path_str(path), dim,
                        getattr(x, 'shape', None), name, axis_sizes[name])
                    spec = P()
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(tree, mesh: Mesh, axis_name: str = 'data'):
    """Shard array leaves batch-wise on the mesh's data axis (leading
    dim must divide the data-axis size; otherwise replicate)."""
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]

    def put(x):
        if hasattr(x, 'ndim') and getattr(x, 'ndim', 0) >= 1 \
                and x.shape[0] % n == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)


def local_shard_shapes(tree):
    """{path: (global_shape, local_shard_shape)} — inspection helper for
    tests and memory accounting."""
    out = {}

    def visit(path, x):
        shards = getattr(x, 'addressable_shards', None)
        if shards:
            out[_path_str(path)] = (tuple(x.shape),
                                    tuple(shards[0].data.shape))
        return x
    jax.tree_util.tree_map_with_path(visit, tree)
    return out

"""Reference import path for tensor helpers (reference
``deepchem/utils/pytorch_utils.py``).  The segment/chunk machinery the
reference keeps here lives natively in :mod:`deepchem_tpu.ops` (XLA
segment ops) and :mod:`deepchem_tpu.utils.differentiation_utils`; this
module keeps the names a reference user would import."""

from typing import Callable, Union

import jax
import jax.numpy as jnp

from deepchem_tpu.ops import segment_sum as _segment_sum


def get_activation(fn: Union[Callable, str]) -> Callable:
    """Resolve an activation by name (reference pytorch_utils.py:8)."""
    if isinstance(fn, str):
        try:
            return getattr(jax.nn, fn)
        except AttributeError:
            return getattr(jnp, fn)
    return fn


def segment_sum(data, segment_ids):
    """Sum ``data`` rows by contiguous segment id (reference
    pytorch_utils.py:77)."""
    data = jnp.asarray(data)
    segment_ids = jnp.asarray(segment_ids)
    return _segment_sum(data, segment_ids,
                        int(segment_ids.max()) + 1)


def unsorted_segment_sum(data, segment_ids, num_segments: int):
    """Sum ``data`` rows by (unsorted) segment id (reference
    pytorch_utils.py:20)."""
    return _segment_sum(jnp.asarray(data), jnp.asarray(segment_ids),
                        num_segments)


def chunkify(a, dim: int, maxnumel: int):
    """Split an array along ``dim`` into chunks of at most ``maxnumel``
    elements each; yields (chunk, start, end) (reference
    pytorch_utils.py:126)."""
    a = jnp.asarray(a)
    if maxnumel < 1:
        raise ValueError('maxnumel must be >= 1')
    per_row = max(1, a.size // max(a.shape[dim], 1))
    step = max(1, maxnumel // per_row)
    for start in range(0, a.shape[dim], step):
        end = min(start + step, a.shape[dim])
        yield jax.lax.slice_in_dim(a, start, end, axis=dim), start, end


def get_memory(a) -> int:
    """Bytes held by an array (reference pytorch_utils.py:181)."""
    a = jnp.asarray(a)
    return int(a.size * a.dtype.itemsize)


def gaussian_integral(n: int, alpha):
    """int_0^inf x^n exp(-alpha x^2) dx (reference
    pytorch_utils.py:207)."""
    import math
    alpha = jnp.asarray(alpha)
    n1 = (n + 1) * 0.5
    return jax.scipy.special.gamma(jnp.asarray(n1)) / \
        (2 * alpha ** n1) if hasattr(jax.scipy.special, 'gamma') else \
        math.gamma(n1) / (2 * alpha ** n1)

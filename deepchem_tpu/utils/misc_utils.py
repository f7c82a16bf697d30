"""Small general utilities (reference deepchem/utils/misc_utils.py and
the array-generic parts of utils/pytorch_utils.py, re-based on
numpy/jax arrays).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple, \
    TypeVar, Union

import numpy as np

T = TypeVar('T')
K = TypeVar('K')

__all__ = [
    'indent', 'shape2str', 'UnimplementedError', 'GetSetParamsError',
    'ConvergenceWarning', 'MathWarning', 'Uniquifier', 'memoize_method',
    'get_option', 'chunkify', 'get_memory', 'get_dtype_memsize',
    'get_np_dtype', 'gaussian_integral', 'TensorNonTensorSeparator',
    'tallqr', 'to_fortran_order', 'unsorted_segment_sum',
    'unsorted_segment_max', 'estimate_ovlp_rcut',
    'UniversalNamedTemporaryFile',
]


def indent(s: str, nspace: int) -> str:
    """Indent every line of ``s`` by ``nspace`` spaces (reference
    misc_utils.py:8).

    >>> print(indent('a\\nb', 2))
      a
      b
    """
    spaces = ' ' * nspace
    return '\n'.join(spaces + c if c else c for c in s.split('\n'))


def shape2str(shape) -> str:
    """Format a shape tuple (reference misc_utils.py:32).

    >>> shape2str((1, 2, 3))
    '(1, 2, 3)'
    """
    return '(%s)' % (', '.join([str(s) for s in shape]))


class UnimplementedError(Exception):
    """Raised when a method is not implemented (reference
    misc_utils.py:51)."""


class GetSetParamsError(Exception):
    """Raised on a getparams/setparams contract violation (reference
    misc_utils.py:58)."""


class ConvergenceWarning(Warning):
    """Warns when an iterative algorithm does not converge (reference
    misc_utils.py:65)."""


class MathWarning(Warning):
    """Warns on suspicious mathematical conditions, e.g. complex
    eigenvalues where real ones are expected (reference
    misc_utils.py:72)."""


class Uniquifier:
    """Deduplicate a sequence by object identity so expensive
    per-object work runs once per distinct object, then broadcast the
    results back to the original positions (same contract as reference
    misc_utils.py:79; independent implementation on dict insertion
    order).

    >>> u = Uniquifier([1, 2, 3, 1, 1])
    >>> u.get_unique_objs()
    [1, 2, 3]
    """

    def __init__(self, allobjs: List):
        # One pass: dict keyed by id() keeps first-seen order, and each
        # position records which unique slot it refers to.
        slot_of: Dict[int, Tuple[int, Any]] = {}
        positions: List[int] = []
        first_seen: List[int] = []
        for pos, obj in enumerate(allobjs):
            entry = slot_of.get(id(obj))
            if entry is None:
                # keep a reference to obj alive so id() stays stable
                entry = (len(slot_of), obj)
                slot_of[id(obj)] = entry
                first_seen.append(pos)
            positions.append(entry[0])
        self.nobjs = len(allobjs)
        self.num_unique = len(slot_of)
        self.all_unique = self.num_unique == self.nobjs
        self.unique_objs = [obj for _, obj in slot_of.values()]
        self.unique_idxs = first_seen
        self.nonunique_map_idxs = positions

    def get_unique_objs(self, allobjs: Optional[List] = None) -> List:
        """Unique objects in first-seen order; with ``allobjs`` given,
        the parallel elements of another same-length list."""
        if allobjs is None:
            return self.unique_objs
        if len(allobjs) != self.nobjs:
            raise ValueError('expected %d objects, got %d' %
                             (self.nobjs, len(allobjs)))
        if self.all_unique:
            return allobjs
        return [allobjs[pos] for pos in self.unique_idxs]

    def map_unique_objs(self, uniqueobjs: List) -> List:
        """Broadcast per-unique results back to original positions."""
        if len(uniqueobjs) != self.num_unique:
            raise ValueError('expected %d unique objects, got %d' %
                             (self.num_unique, len(uniqueobjs)))
        if self.all_unique:
            return uniqueobjs
        return [uniqueobjs[slot] for slot in self.nonunique_map_idxs]


def memoize_method(fcn: Callable[[Any], T]) -> Callable[[Any], T]:
    """Cache a no-argument method's result on the instance (same
    contract as reference misc_utils.py:176).  Each decorated method
    gets its own per-instance slot; the cache dies with the object and
    is never shared across instances."""
    slot = f'_memoized_{fcn.__qualname__}'

    @functools.wraps(fcn)
    def wrapper(self) -> T:
        try:
            return self.__dict__[slot]
        except KeyError:
            return self.__dict__.setdefault(slot, fcn(self))

    return wrapper


def get_option(name: str, s: K, options: Mapping[K, T]) -> T:
    """Look up ``s`` in ``options`` with an informative KeyError
    (reference misc_utils.py:218).

    >>> get_option('method', 'a', {'a': 1, 'b': 2})
    1
    """
    if s in options:
        return options[s]
    raise ValueError(
        f'Unknown {name}: {s}. The available options are: '
        f'{str(list(options.keys()))}')


def chunkify(a: np.ndarray, dim: int, maxnumel: int):
    """Iterate (chunk, start, end) views of ``a`` along ``dim`` such
    that each chunk has at most ``maxnumel`` elements (reference
    pytorch_utils.py:126).

    >>> import numpy as np
    >>> [tuple(c[0].shape) for c in chunkify(np.zeros((4, 2)), 0, 4)]
    [(2, 2), (2, 2)]
    """
    a = np.asarray(a) if not hasattr(a, 'shape') else a
    dim = dim % a.ndim
    shape = a.shape
    csize = max(maxnumel // (int(np.prod(shape)) // shape[dim]
                             if shape[dim] else 1), 1)
    ioffset = 0
    idx = [slice(None)] * a.ndim
    while ioffset < shape[dim]:
        idx[dim] = slice(ioffset, ioffset + csize)
        yield a[tuple(idx)], ioffset, min(ioffset + csize, shape[dim])
        ioffset += csize


def get_memory(a) -> int:
    """Size of array ``a`` in bytes (reference pytorch_utils.py:181)."""
    return int(np.prod(a.shape)) * get_dtype_memsize(a)


def get_dtype_memsize(a) -> int:
    """Bytes per element of ``a``'s dtype (reference
    pytorch_utils.py:570)."""
    return int(np.dtype(
        a.dtype if not hasattr(a.dtype, 'name') else a.dtype.name
    ).itemsize)


def get_np_dtype(dtype) -> Any:
    """Corresponding numpy dtype for an array-library dtype (reference
    pytorch_utils.py:438)."""
    return np.dtype(str(dtype).replace('torch.', '')
                    if 'torch' in str(dtype) else dtype)


def gaussian_integral(n: int, alpha):
    """int_0^inf x^n exp(-alpha x^2) dx (reference
    pytorch_utils.py:207).

    >>> round(float(gaussian_integral(0, 1.0)), 6)
    0.886227
    """
    import math
    n1 = (n + 1) * 0.5
    return math.gamma(n1) / (2 * alpha ** n1)


class TensorNonTensorSeparator:
    """Separate array parameters from non-array parameters so solvers
    can differentiate only through arrays (reference
    pytorch_utils.py:234).  ``varonly`` has no effect on jax arrays
    (no requires_grad flag); all arrays are treated as variable."""

    def __init__(self, params, varonly: bool = True):
        import jax
        self.tensor_idxs = []
        self.tensor_params = []
        self.nontensor_idxs = []
        self.nontensor_params = []
        self.nparams = len(params)
        for i, p in enumerate(params):
            if isinstance(p, (np.ndarray, jax.Array)):
                self.tensor_idxs.append(i)
                self.tensor_params.append(p)
            else:
                self.nontensor_idxs.append(i)
                self.nontensor_params.append(p)
        self.alltensors = len(self.tensor_idxs) == self.nparams

    def get_tensor_params(self):
        return self.tensor_params

    def ntensors(self) -> int:
        return len(self.tensor_idxs)

    def nnontensors(self) -> int:
        return len(self.nontensor_idxs)

    def reconstruct_params(self, tensor_params, nontensor_params=None):
        if nontensor_params is None:
            nontensor_params = self.nontensor_params
        if len(tensor_params) + len(nontensor_params) != self.nparams:
            raise ValueError(
                'The total length of tensor and nontensor params do not '
                'match with the expected length: %d instead of %d' %
                (len(tensor_params) + len(nontensor_params),
                 self.nparams))
        if self.alltensors:
            return tensor_params
        params: List = [None] * self.nparams
        for nidx, p in zip(self.nontensor_idxs, nontensor_params):
            params[nidx] = p
        for idx, p in zip(self.tensor_idxs, tensor_params):
            params[idx] = p
        return params


def tallqr(V, MV=None):
    """QR decomposition specialized for tall matrices in an M-inner
    product: returns (Q, R) with Q = V R^-1 orthonormal in the M
    metric (reference pytorch_utils.py:349).  V: (*, na, nguess)."""
    import jax.numpy as jnp
    if MV is None:
        MV = V
    VTV = jnp.matmul(jnp.swapaxes(V, -2, -1), MV)
    R = jnp.linalg.cholesky(
        jnp.swapaxes(VTV, -2, -1)).swapaxes(-2, -1)
    Q = jnp.linalg.solve(
        jnp.swapaxes(R, -2, -1),
        jnp.swapaxes(V, -2, -1)).swapaxes(-2, -1)
    return Q, R


def to_fortran_order(V):
    """Return ``V`` in Fortran (column-major) memory order (reference
    pytorch_utils.py:391)."""
    return np.asfortranarray(np.asarray(V))


def unsorted_segment_sum(data, segment_ids, num_segments: int):
    """Segment sum over the leading axis (reference
    pytorch_utils.py:20, there with torch scatter_add).

    >>> import numpy as np
    >>> unsorted_segment_sum(np.array([1., 2., 3.]),
    ...                      np.array([0, 1, 0]), 2).tolist()
    [4.0, 2.0]
    """
    import jax
    return jax.ops.segment_sum(data, segment_ids,
                               num_segments=num_segments)


def unsorted_segment_max(data, segment_ids, num_segments: int):
    """Segment max over the leading axis (reference
    pytorch_utils.py:473)."""
    import jax
    return jax.ops.segment_max(data, segment_ids,
                               num_segments=num_segments)


def estimate_ovlp_rcut(precision: float, coeffs, alphas) -> float:
    """Estimate the cutoff radius where all pairwise Gaussian overlaps
    fall below ``precision`` (reference pytorch_utils.py:531):
    solves c1 c2 exp(-a1 a2 / (a1 + a2) r^2) < precision pairwise by
    fixed-point iteration on r^2 = log-term, like the reference."""
    c12 = (np.asarray(coeffs)[:, None] * np.asarray(coeffs)[None, :]
           ).ravel()
    a12 = np.asarray(alphas)
    aij = (a12[:, None] * a12[None, :] /
           (a12[:, None] + a12[None, :])).ravel()
    rcut = 10.0
    for _ in range(10):
        arg = np.maximum(c12 / precision, 1e-300)
        r2 = np.log(arg * np.maximum(rcut, 1.0)) / aij
        rcut = float(np.sqrt(np.maximum(r2, 0.0)).max())
    return rcut


class UniversalNamedTemporaryFile:
    """NamedTemporaryFile usable on platforms where an open temp file
    cannot be re-opened by name (reference utils/__init__.py
    UniversalNamedTemporaryFile): closes the handle and removes the
    file on context exit."""

    def __init__(self, mode: str = 'w', suffix: str = ''):
        self.mode = mode
        self.suffix = suffix

    def __enter__(self):
        import tempfile
        fd, self.name = tempfile.mkstemp(suffix=self.suffix)
        import os
        os.close(fd)
        self._f = open(self.name, self.mode)
        return self._f

    def __exit__(self, *exc):
        import os
        self._f.close()
        try:
            os.unlink(self.name)
        except OSError:
            pass
        return False

"""Prefix-addressed computation cache (reference
deepchem/utils/cache_utils.py Cache: HDF5-backed memoization for the DFT
stack; here backed by npz files so h5py isn't required)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


class Cache:
    """Persist expensive array computations keyed by a path-like prefix."""

    def __init__(self, fname: Optional[str] = None):
        self._fname = fname
        self._prefix = ''
        self._mem: dict = {}
        if fname and os.path.exists(fname):
            with np.load(fname, allow_pickle=True) as data:
                self._mem = {k: data[k] for k in data.files}

    def set(self, fname: str) -> None:
        self._fname = fname

    def add_prefix(self, prefix: str) -> 'Cache':
        child = Cache.__new__(Cache)
        child._fname = self._fname
        child._prefix = self._prefix + prefix + '/'
        child._mem = self._mem
        return child

    def cache(self, key: str, fcn: Callable[[], np.ndarray]) -> np.ndarray:
        full = self._prefix + key
        if full in self._mem:
            return self._mem[full]
        val = np.asarray(fcn())
        self._mem[full] = val
        self._flush()
        return val

    def cache_multi(self, keys, fcn):
        full = [self._prefix + k for k in keys]
        if all(k in self._mem for k in full):
            return tuple(self._mem[k] for k in full)
        vals = tuple(np.asarray(v) for v in fcn())
        for k, v in zip(full, vals):
            self._mem[k] = v
        self._flush()
        return vals

    def _flush(self) -> None:
        if self._fname:
            np.savez_compressed(self._fname, **self._mem)


def normalize_prefix(prefix: str) -> str:
    """Ensure a cache prefix ends with a dot (reference
    cache_utils.py:704)."""
    return prefix if prefix.endswith('.') else prefix + '.'

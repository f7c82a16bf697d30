"""Hashing helpers for fingerprint/voxel featurizers (reference
deepchem/utils/hash_utils.py)."""

from __future__ import annotations

import hashlib
from typing import Any, Callable

import numpy as np


def hash_ecfp(ecfp: str, size: int = 1024) -> int:
    """Fragment string -> bit index (reference hash_utils.hash_ecfp)."""
    ecfp = ecfp.encode('utf-8')
    h = hashlib.md5(ecfp).hexdigest()
    return int(h, 16) % size


def hash_ecfp_pair(ecfp_pair, size: int = 1024) -> int:
    """(reference hash_utils.hash_ecfp_pair)"""
    ecfp = f'{ecfp_pair[0]},{ecfp_pair[1]}'.encode('utf-8')
    h = hashlib.md5(ecfp).hexdigest()
    return int(h, 16) % size


def vectorize(hash_function: Callable, feature_dict=None,
              size: int = 1024) -> np.ndarray:
    """Sparse feature dict -> fixed vector (reference
    hash_utils.vectorize)."""
    vector = np.zeros(size)
    if feature_dict is not None:
        on_channels = [hash_function(feature, size)
                       for key, feature in feature_dict.items()]
        vector[on_channels] += 1
    return vector


def hash_sybyl(sybyl, sybyl_types):
    """Index of a SYBYL atom type in the type list (reference
    hash_utils.py:36)."""
    return sybyl_types.index(sybyl)

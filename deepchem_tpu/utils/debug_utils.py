"""Debug printing thresholds (reference deepchem/utils/debug_utils.py)."""

from __future__ import annotations

import numpy as np

_PRINT_THRESHOLD = 10
_MAX_PRINT_SIZE = 30


def get_print_threshold() -> int:
    """(reference debug_utils.get_print_threshold)"""
    return _PRINT_THRESHOLD


def set_print_threshold(threshold: int) -> None:
    global _PRINT_THRESHOLD
    _PRINT_THRESHOLD = threshold


def get_max_print_size() -> int:
    return _MAX_PRINT_SIZE


def set_max_print_size(size: int) -> None:
    global _MAX_PRINT_SIZE
    _MAX_PRINT_SIZE = size


def summarize_array(arr) -> str:
    """Short human-readable description of an array."""
    a = np.asarray(arr)
    if a.size <= get_print_threshold():
        return repr(a)
    return (f'<array shape={a.shape} dtype={a.dtype} '
            f'mean={a.mean():.4g} std={a.std():.4g}>')

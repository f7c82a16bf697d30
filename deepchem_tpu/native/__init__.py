"""Native (C++) kernels for host-side hot loops.

The reference's chemistry hot loops run in RDKit's C++; this package is
the TPU-build analog for the in-repo chem core.  The library builds
lazily on first import (g++, ~1s) and caches the .so next to the source;
every consumer falls back to the pure-Python implementation when the
toolchain or zlib headers are unavailable, so the native path is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'chemops.cpp')
_SO = os.path.join(_DIR, '_chemops.so')

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _SO, _SRC, '-lz']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain, headers, ...
        logger.info('native chemops build failed (%s); using pure-Python '
                    'fallbacks', e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    native path is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        logger.info('native chemops load failed (%s)', e)
        return None
    lib.morgan_fold.restype = ctypes.c_int
    lib.morgan_fold.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.tanimoto_matrix.restype = None
    lib.tanimoto_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ------------------------------------------------------------------
# intor: the McMurchie-Davidson molecular-integral engine (intor.cpp),
# a second .so built on demand (the DFT stack is optional; keeping it
# separate means chem users never pay its compile time).
_INTOR_SRC = os.path.join(_DIR, 'intor.cpp')
_INTOR_SO = os.path.join(_DIR, '_intor.so')
_intor_lib: Optional[ctypes.CDLL] = None
_intor_tried = False

_I32P = ctypes.POINTER(ctypes.c_int32)
_F64P = ctypes.POINTER(ctypes.c_double)


def get_intor_lib() -> Optional[ctypes.CDLL]:
    """The native integral engine, building on first use; None when the
    toolchain is unavailable (callers fall back to the Python path)."""
    global _intor_lib, _intor_tried
    if _intor_lib is not None or _intor_tried:
        return _intor_lib
    _intor_tried = True
    if not os.path.exists(_INTOR_SO) or \
            os.path.getmtime(_INTOR_SO) < os.path.getmtime(_INTOR_SRC):
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _INTOR_SO,
               _INTOR_SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=180)
        except Exception as e:
            logger.info('native intor build failed (%s); using '
                        'pure-Python integrals', e)
            return None
    try:
        lib = ctypes.CDLL(_INTOR_SO)
    except OSError as e:
        logger.info('native intor load failed (%s)', e)
        return None
    base = [ctypes.c_int, _I32P, _F64P, _I32P, _F64P, _F64P]
    for name, extra in (('intor_overlap', [_F64P]),
                        ('intor_kinetic', [_F64P]),
                        ('intor_nuclear',
                         [ctypes.c_int, _F64P, _F64P, _F64P]),
                        ('intor_eri', [_F64P]),
                        ('intor_ao_values',
                         [ctypes.c_int, _F64P, _F64P, _F64P]),
                        ('intor_ao_hessian',
                         [ctypes.c_int, _F64P, _F64P]),
                        ('intor_grad_rhf',
                         [_I32P, ctypes.c_int, _F64P, _F64P, _F64P,
                          _F64P, ctypes.c_double, _F64P]),
                        ('intor_grad_uhf',
                         [_I32P, ctypes.c_int, _F64P, _F64P, _F64P,
                          _F64P, _F64P, ctypes.c_double, _F64P]),
                        ('intor_eri_erf', [ctypes.c_double, _F64P]),
                        ('intor_eri_3c',
                         [ctypes.c_int, _I32P, _F64P, _I32P, _F64P,
                          _F64P, _F64P])):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = base + extra
    lib.intor_eri_2c.restype = None
    lib.intor_eri_2c.argtypes = base + [_F64P]  # aux basis + out
    _intor_lib = lib
    return _intor_lib


def morgan_fold_native(invs: np.ndarray, bond_a1: np.ndarray,
                       bond_a2: np.ndarray, order_code: np.ndarray,
                       radius: int, n_bits: int,
                       counts: bool) -> Optional[np.ndarray]:
    """Folded Morgan fingerprint via the C++ kernel (bit-identical to the
    Python path); None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    invs = np.ascontiguousarray(invs, dtype=np.uint32)
    a1 = np.ascontiguousarray(bond_a1, dtype=np.int32)
    a2 = np.ascontiguousarray(bond_a2, dtype=np.int32)
    oc = np.ascontiguousarray(order_code, dtype=np.int32)
    out = np.zeros(n_bits, dtype=np.float32)
    lib.morgan_fold(len(invs), _ptr(invs, ctypes.c_uint32), len(a1),
                    _ptr(a1, ctypes.c_int32), _ptr(a2, ctypes.c_int32),
                    _ptr(oc, ctypes.c_int32), int(radius), int(n_bits),
                    int(bool(counts)), _ptr(out, ctypes.c_float))
    return out


def tanimoto_matrix_native(A_bits: np.ndarray,
                           B_bits: np.ndarray) -> Optional[np.ndarray]:
    """Dense Tanimoto matrix between binary fingerprint matrices
    [na, n_bits] x [nb, n_bits]; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    A = np.packbits(np.asarray(A_bits, dtype=bool), axis=1)
    B = np.packbits(np.asarray(B_bits, dtype=bool), axis=1)
    # pad byte dim to a multiple of 8 for the uint64 view
    pad = (-A.shape[1]) % 8
    if pad:
        A = np.pad(A, ((0, 0), (0, pad)))
        B = np.pad(B, ((0, 0), (0, pad)))
    A64 = np.ascontiguousarray(A).view(np.uint64)
    B64 = np.ascontiguousarray(B).view(np.uint64)
    na, nw = A64.shape
    nb = B64.shape[0]
    out = np.zeros((na, nb), dtype=np.float32)
    lib.tanimoto_matrix(_ptr(A64, ctypes.c_uint64), na,
                        _ptr(B64, ctypes.c_uint64), nb, nw,
                        _ptr(out, ctypes.c_float))
    return out

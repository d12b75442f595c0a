"""ctypes binding for the native packed-format codecs (native/qpt_pack.cpp).

Replaces the reference's numba packers (lib/quantizer/pack_op.py) for
host-side quantization/IO; transparently falls back to the JAX codecs in
ops/packing.py when the shared library hasn't been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libqpt_pack.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.qpt_pack_rows.argtypes = [i32p, u32p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int64]
    lib.qpt_unpack_rows.argtypes = [u32p, i32p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int,
                                    ctypes.c_int64]
    lib.qpt_pack_trellis.argtypes = [i32p, u32p, ctypes.c_int64,
                                     ctypes.c_int]
    lib.qpt_unpack_trellis.argtypes = [u32p, i32p, ctypes.c_int64,
                                       ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def pack_rows(indices: np.ndarray, bits: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    m, P = idx.shape
    wpr = -(-(P * bits) // 32) + 1
    out = np.zeros((m, wpr), np.uint32)
    lib.qpt_pack_rows(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        m, P, bits, wpr)
    return out


def unpack_rows(packed: np.ndarray, bits: int,
                n_idx: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(packed, dtype=np.uint32)
    m, wpr = w.shape
    out = np.zeros((m, n_idx), np.int32)
    lib.qpt_unpack_rows(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        m, n_idx, bits, wpr)
    return out


def pack_trellis(states: np.ndarray, KV: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(states, dtype=np.int32)
    T = s.shape[0]
    out = np.zeros((T, 4 * KV), np.uint32)
    lib.qpt_pack_trellis(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), T, KV)
    return out


def unpack_trellis(packed: np.ndarray, KV: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(packed, dtype=np.uint32)
    T = w.shape[0]
    out = np.zeros((T, 128), np.int32)
    lib.qpt_unpack_trellis(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), T, KV)
    return out

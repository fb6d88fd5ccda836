"""The exact WORLD reference PRNG stream (xorshift128 'randn').

Reference: externs/WORLD_v2/src/matlabfunctions.cpp:247-277.  The C++ calls
randn_reseed() at the top of CheapTrick (cheaptrick.cpp:205), D4C
(d4c.cpp:340) and Synthesis (synthesis.cpp:341), then consumes draws in
strict frame order.  The JAX kernels take the whole stream as an input array
and gather per-frame slices; this module generates the stream.

The recurrence is serial, so generation is native C (native/worldrand.c)
with a pure-python fallback for small counts.
"""
from __future__ import annotations

import ctypes

import numpy as np

from hts_train_world_tpu.runtime import native

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = native.load("worldrand", ["worldrand.c"])
        lib.worldrand_fill.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.worldrand_fill.restype = None
        _lib = lib
    return _lib


def randn_stream(n: int) -> np.ndarray:
    """First n randn() draws after randn_reseed() (float64)."""
    out = np.empty(int(n), dtype=np.float64)
    if n == 0:
        return out
    try:
        lib = _get_lib()
        lib.worldrand_fill(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), int(n))
    except Exception:  # no compiler: slow but exact python fallback
        out[:] = _randn_stream_py(int(n))
    return out


def _randn_stream_py(n: int) -> np.ndarray:
    x, y, z, w = 123456789, 362436069, 521288629, 88675123
    mask = 0xFFFFFFFF
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        tmp = 0
        for _ in range(12):
            t = (x ^ (x << 11)) & mask
            x, y, z = y, z, w
            w = ((w ^ (w >> 19)) ^ (t ^ (t >> 8))) & mask
            tmp += w >> 4
        out[i] = tmp / 268435456.0 - 6.0
    return out

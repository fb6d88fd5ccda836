"""Loader for the native (C) runtime pieces.

The compute path is JAX/XLA; the runtime around it (exact-PRNG stream
generation, fast file loaders) is native C, built on demand with the system
compiler and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_lock = threading.Lock()
_libs = {}


def _build(name: str, sources: list[str], extra: list[str] | None = None) -> str:
    so_path = os.path.join(_NATIVE_DIR, f"lib{name}.so")
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
            os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs):
        return so_path
    compiler = "g++" if any(s.endswith((".cc", ".cpp")) for s in sources) else "gcc"
    cmd = [compiler, "-O2", "-shared", "-fPIC", "-o", so_path, *srcs,
           *(extra or []), "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def load(name: str, sources: list[str]) -> ctypes.CDLL:
    with _lock:
        if name not in _libs:
            _libs[name] = ctypes.CDLL(_build(name, sources))
        return _libs[name]

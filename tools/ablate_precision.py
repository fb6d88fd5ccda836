#!/usr/bin/env python3
"""Matmul precision ablation for the f32 fast path (run on the chip).

TPU f32 matmuls default to single-pass bf16; this measures what that
does to WORLD outputs (vs the same f32 graph on CPU, which computes in
true f32) and what each higher precision costs, so the fast path can pin
an explicit precision with a stated error budget.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp  # noqa: E402

from hts_train_world_tpu import config as cfg  # noqa: E402
from hts_train_world_tpu.parallel import batch as batch_mod  # noqa: E402

FS = 48000
DUR = 2.0
B = 8


def make_batch():
    L = int(FS * DUR)
    t = np.arange(L) / FS
    rng = np.random.default_rng(0)
    xs = []
    for i in range(B):
        f0 = 160 + 15 * (i % 6)
        ph = np.cumsum(2 * np.pi * f0
                       * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)) / FS)
        xs.append(0.5 * np.sin(ph) + 0.25 * np.sin(2 * ph)
                  + 0.01 * rng.standard_normal(L))
    return np.stack(xs).astype(np.float32)


def run(xs, fs, noise, yl, N):
    f0, sp, ap, y = jax.vmap(lambda x, nz: batch_mod._copy_synth_one(
        x, fs, 5.0, N, 0.0, yl, nz))(xs, noise)
    return f0, sp, y


def main():
    print("devices:", jax.devices())
    xs_np = make_batch()
    L = xs_np.shape[1]
    N = cfg.cheaptrick_fft_size(FS)
    T = cfg.samples_for_dio(FS, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * FS) + 1
    from hts_train_world_tpu.ops import synthesis as syn
    rng = np.random.default_rng(1)
    noise_np = rng.standard_normal(
        (B, syn.synthesis_stream_len(yl))).astype(np.float32)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = jax.jit(run, static_argnums=(1, 3, 4))(
            jnp.asarray(xs_np), FS, jnp.asarray(noise_np), yl, N)
        ref = [np.asarray(r) for r in ref]

    for prec in ("default", "tensorfloat32", "float32"):
        ctx = (jax.default_matmul_precision(prec)
               if prec != "default" else _null())
        with ctx:
            jf = jax.jit(run, static_argnums=(1, 3, 4))
            out = jf(jnp.asarray(xs_np), FS, jnp.asarray(noise_np), yl, N)
            np.asarray(out[0][:, :2])
            t0 = time.perf_counter()
            for _ in range(3):
                out = jf(jnp.asarray(xs_np), FS, jnp.asarray(noise_np),
                         yl, N)
                np.asarray(out[0][:, :2])
            dt = (time.perf_counter() - t0) / 3
            f0, sp, y = [np.asarray(o) for o in out]
        vuv = (f0 > 0) == (ref[0] > 0)
        both = (f0 > 0) & (ref[0] > 0)
        f0rel = np.abs(f0[both] - ref[0][both]) / ref[0][both]
        live = ref[1] > ref[1].max(axis=2, keepdims=True) * 1e-6
        lsp = np.abs(np.log(np.maximum(sp[live], 1e-30))
                     - np.log(ref[1][live]))
        ydev = np.abs(y - ref[2]).max() / np.abs(ref[2]).max()
        print(f"{prec:15s} {dt*1000:7.1f} ms/batch "
              f"({B*DUR/dt:6.1f} audio-s/s)  vuv_agree {vuv.mean():.4f}  "
              f"f0 relerr med {np.median(f0rel):.2e}  "
              f"logsp med {np.median(lsp):.3e} p99 "
              f"{np.percentile(lsp, 99):.3e}  y reldev {ydev:.3e}",
              flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()

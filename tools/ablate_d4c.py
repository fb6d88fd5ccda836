#!/usr/bin/env python3
"""D4C component ablation on the real chip: times each piece of the
per-frame pipeline separately to locate the 200 ms hotspot, plus a
matmul-precision ablation done CORRECTLY (the context manager must be
active during tracing, i.e. inside the jitted function body)."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FS = 48000
DUR = 2.0
BATCH = 8


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import jax.random as jr
    from hts_train_world_tpu import config as cfg
    from hts_train_world_tpu.ops import d4c as d4c_mod
    from hts_train_world_tpu.ops import dio as dio_mod, stonemask as sm
    from hts_train_world_tpu.ops import fftmat, prims

    L = int(FS * DUR)
    N = cfg.cheaptrick_fft_size(FS)

    def corpus(seed):
        key = jr.fold_in(jr.PRNGKey(0), seed)
        t = (jnp.arange(L, dtype=jnp.float32) / FS)[None, :]
        f0 = (160.0 + 15.0 * (jnp.arange(BATCH) % 6))[:, None]
        x = jnp.zeros((BATCH, L), jnp.float32)
        for h, a in enumerate([0.5, 0.3, 0.2, 0.1]):
            x = x + a * jnp.sin(2 * jnp.pi * f0 * (h + 1) * t + 0.1 * h)
        x = x + 0.011 * jr.normal(key, (BATCH, L), jnp.float32)
        return 0.7 * x / jnp.max(jnp.abs(x), axis=1, keepdims=True)

    xs = jax.jit(corpus)(0)
    fp = 5.0
    mk = jax.jit(lambda xs: jax.vmap(
        lambda x: dio_mod.dio.__wrapped__(x, FS, fp))(xs))
    t_, f0_, _, _ = mk(xs)
    f0r_ = jax.jit(lambda xs, t, f0: jax.vmap(
        lambda x, tt, ff: sm.stonemask.__wrapped__(x, FS, tt, ff))(
            xs, t, f0))(xs, t_, f0_)
    np.asarray(f0r_[0, :4])

    fft_d = cfg.d4c_fft_size(FS)
    n_lt = cfg.d4c_love_train_fft_size(FS)
    n_ap = cfg.number_of_aperiodicities(FS)
    fmax = max(FS / 12.0, cfg.K_CEIL_F0)
    ul_max = 2 + int(fmax * fft_d / FS) + 1
    b_max = int(fmax * fft_d / FS) + 1
    window_length = int(cfg.K_FREQUENCY_INTERVAL * fft_d / FS) * 2 + 1
    window = prims.nuttall_window(window_length, jnp.float32)
    print(f"fft_d={fft_d} n_lt={n_lt} n_ap={n_ap} wl={window_length}",
          flush=True)
    pad = int(2.0 * FS / cfg.K_FLOOR_F0_D4C + 0.5) + 2
    j_b = jnp.arange(fft_d)

    def padx(x):
        return jnp.concatenate([
            jnp.full((pad,), x[0], jnp.float32), x,
            jnp.full((pad + fft_d,), x[-1], jnp.float32)])

    def tsum(o):
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), o, 0.0)

    def timeit(name, fn, *args, reps=4):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            r = np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"  {name:30s} compile {c:6.1f}s  {dt:8.1f} ms  "
              f"(out {float(r):.4g})", flush=True)
        return dt

    zt = jnp.zeros((1,), jnp.float32)

    # --- piece 1: LoveTrain only ---
    def lt_only(xs, f0, t):
        def one(x, ff, tt):
            xp = padx(x)
            nlt = jnp.zeros((ff.shape[0], 1), jnp.float32)
            return d4c_mod._love_train(x, FS, ff, tt, nlt, xp, pad)
        return tsum(jax.vmap(one)(xs, f0, t))

    # --- piece 2: windowed waveforms only (3 per frame) ---
    def win_only(xs, f0, t):
        def one(x, ff, tt):
            xp = padx(x)
            def fr(f0i, pos):
                w1, _ = d4c_mod._windowed_waveform(
                    x, L, FS, f0i, pos - 0.25 / f0i, "blackman", 4.0, zt,
                    fft_d, jnp.float32, xp, pad)
                w2, _ = d4c_mod._windowed_waveform(
                    x, L, FS, f0i, pos + 0.25 / f0i, "blackman", 4.0, zt,
                    fft_d, jnp.float32, xp, pad)
                w3, _ = d4c_mod._windowed_waveform(
                    x, L, FS, f0i, pos, "hanning", 4.0, zt,
                    fft_d, jnp.float32, xp, pad)
                return jnp.sum(w1) + jnp.sum(w2) + jnp.sum(w3)
            cf0 = jnp.maximum(cfg.K_FLOOR_F0_D4C, ff)
            return jnp.sum(jax.vmap(fr)(cf0, tt))
        return tsum(jax.vmap(one)(xs, f0, t))

    # --- piece 3: windows + the 5 body FFTs (no smoothing/coarse) ---
    def fft_only(xs, f0, t):
        def one(x, ff, tt):
            xp = padx(x)
            def fr(f0i, pos):
                w1, _ = d4c_mod._windowed_waveform(
                    x, L, FS, f0i, pos - 0.25 / f0i, "blackman", 4.0, zt,
                    fft_d, jnp.float32, xp, pad)
                r1, i1 = fftmat.rfft_matmul(w1, fft_d)
                r2, i2 = fftmat.rfft_matmul(
                    w1 * (j_b.astype(jnp.float32) + 1.0), fft_d)
                w3, _ = d4c_mod._windowed_waveform(
                    x, L, FS, f0i, pos, "hanning", 4.0, zt,
                    fft_d, jnp.float32, xp, pad)
                sps = fftmat.rfft_power_matmul(w3, fft_d)
                return jnp.sum(r1 * r2 + i1 * i2) + jnp.sum(sps)
            cf0 = jnp.maximum(cfg.K_FLOOR_F0_D4C, ff)
            return jnp.sum(jax.vmap(fr)(cf0, tt))
        return tsum(jax.vmap(one)(xs, f0, t))

    # --- piece 4: smoothing chain on a fixed spectrum ---
    def smooth_only(xs, f0, t):
        def one(x, ff, tt):
            def fr(f0i, pos):
                sps = jnp.abs(jnp.sin(
                    (j_b[:fft_d // 2 + 1]).astype(jnp.float32)
                    * f0i)) + 0.1
                sc = prims.dc_correction(sps * 2.0, f0i, FS, fft_d, ul_max)
                sps2 = prims.dc_correction(sps, f0i, FS, fft_d, ul_max)
                sps2 = prims.linear_smoothing(sps2, f0i, FS, fft_d, b_max)
                sgd = sc / sps2
                sgd = jnp.where(jnp.isfinite(sgd), sgd, 0.0)
                sgd = prims.linear_smoothing(sgd, f0i / 2.0, FS, fft_d,
                                             b_max)
                sgd = sgd - prims.linear_smoothing(sgd, f0i, FS, fft_d,
                                                   b_max)
                return jnp.sum(sgd)
            cf0 = jnp.maximum(cfg.K_FLOOR_F0_D4C, ff)
            return jnp.sum(jax.vmap(fr)(cf0, tt))
        return tsum(jax.vmap(one)(xs, f0, t))

    # --- piece 5: coarse aperiodicity on a fixed sgd ---
    def coarse_only(xs, f0, t):
        def one(x, ff, tt):
            def fr(f0i, pos):
                sgd = jnp.sin((j_b[:fft_d // 2 + 1]).astype(jnp.float32)
                              * (f0i + pos))
                ca = d4c_mod._coarse_aperiodicity(
                    sgd, FS, fft_d, n_ap, window, window_length)
                return jnp.sum(ca)
            cf0 = jnp.maximum(cfg.K_FLOOR_F0_D4C, ff)
            return jnp.sum(jax.vmap(fr)(cf0, tt))
        return tsum(jax.vmap(one)(xs, f0, t))

    # --- full d4c for reference ---
    def full(xs, f0, t):
        return tsum(jax.vmap(lambda x, tt, ff: d4c_mod.d4c.__wrapped__(
            x, FS, tt, ff, N, 0.0, None)[0])(xs, t, f0))

    # --- full d4c, single-pass bf16 matmuls (traced INSIDE the ctx) ---
    def full_bf16(xs, f0, t):
        with jax.default_matmul_precision("bfloat16"):
            return full(xs, f0, t)

    def full_f32(xs, f0, t):
        with jax.default_matmul_precision("float32"):
            return full(xs, f0, t)

    print("d4c ablation (batch 8 x 2 s @48k):", flush=True)
    timeit("full", jax.jit(full), xs, f0r_, t_)
    timeit("love_train only", jax.jit(lt_only), xs, f0r_, t_)
    timeit("3 windows only", jax.jit(win_only), xs, f0r_, t_)
    timeit("windows + 5 ffts", jax.jit(fft_only), xs, f0r_, t_)
    timeit("smoothing chain", jax.jit(smooth_only), xs, f0r_, t_)
    timeit("coarse_ap", jax.jit(coarse_only), xs, f0r_, t_)
    timeit("full bf16", jax.jit(full_bf16), xs, f0r_, t_)
    timeit("full f32-highest", jax.jit(full_f32), xs, f0r_, t_)


if __name__ == "__main__":
    main()

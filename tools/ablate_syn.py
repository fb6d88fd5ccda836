#!/usr/bin/env python3
"""Synthesis component ablation on the real chip: where do the ~105 ms
go — time base, per-pulse spectra, OLA, or masked pulse-slot waste?"""
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
    from hts_train_world_tpu.parallel import batch as batch_mod
    from hts_train_world_tpu.ops import synthesis as syn

    L = int(FS * DUR)
    N = cfg.cheaptrick_fft_size(FS)
    T = cfg.samples_for_dio(FS, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * FS) + 1
    SL = syn.synthesis_stream_len(yl)
    mp_def = syn.default_max_pulses(yl, FS)
    print(f"N={N} yl={yl} default_max_pulses={mp_def}", flush=True)

    def corpus(seed):
        key = jr.fold_in(jr.PRNGKey(0), seed)
        t = (jnp.arange(L, dtype=jnp.float32) / FS)[None, :]
        f0 = (160.0 + 15.0 * (jnp.arange(BATCH) % 6))[:, None]
        x = jnp.zeros((BATCH, L), jnp.float32)
        for h, a in enumerate([0.5, 0.3, 0.2, 0.1]):
            x = x + a * jnp.sin(2 * jnp.pi * f0 * (h + 1) * t + 0.1 * h)
        x = x + 0.011 * jr.normal(key, (BATCH, L), jnp.float32)
        x = 0.7 * x / jnp.max(jnp.abs(x), axis=1, keepdims=True)
        noise = jr.normal(key, (BATCH, SL), jnp.float32)
        return x, noise

    xs, noise = jax.jit(corpus)(0)
    an = jax.jit(lambda xs: jax.vmap(
        lambda x: batch_mod._analyze_one(x, FS, 5.0, N, 0.0))(xs))
    t_, f0_, sp_, ap_ = an(xs)
    np.asarray(f0_[0, :2])

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

    def full(f0, sp, ap, nz, mp):
        return tsum(jax.vmap(lambda a, b, c, d: syn.synthesis.__wrapped__(
            a, b, c, N, 5.0, FS, yl, d, mp, False))(f0, sp, ap, nz))

    # how many pulses are real?
    npulse = jax.jit(lambda f0: jnp.sum(jnp.abs(jnp.diff(jnp.mod(
        jnp.cumsum(2 * jnp.pi * jnp.where(
            f0 > FS / N + 1.0, f0, 500.0).repeat(240)[:yl] / FS),
        2 * jnp.pi))) > jnp.pi))
    print("approx pulses lane0:", int(npulse(f0_[0])), flush=True)

    print("synthesis ablation:", flush=True)
    timeit("full (default slots)", jax.jit(
        lambda a, b, c, d: full(a, b, c, d, 0)), f0_, sp_, ap_, noise)
    timeit("full (768 slots)", jax.jit(
        lambda a, b, c, d: full(a, b, c, d, 768)), f0_, sp_, ap_, noise)
    timeit("full (512 slots)", jax.jit(
        lambda a, b, c, d: full(a, b, c, d, 512)), f0_, sp_, ap_, noise)


if __name__ == "__main__":
    main()

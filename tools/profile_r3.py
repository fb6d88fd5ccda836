#!/usr/bin/env python3
"""Round-3 on-chip profile: stage timings with tiny fetches + matmul
precision ablation.  All graphs go through the persistent compile cache
(/root/repo/.jax_cache) so repeat runs are cheap despite the relay's
slow remote compile."""
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
    from hts_train_world_tpu.ops import dio as dio_mod, stonemask as sm
    from hts_train_world_tpu.ops import cheaptrick as ct, d4c as d4c_mod
    from hts_train_world_tpu.ops import synthesis as syn

    L = int(FS * DUR)
    N = cfg.cheaptrick_fft_size(FS)
    T = cfg.samples_for_dio(FS, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * FS) + 1
    SL = syn.synthesis_stream_len(yl)

    def corpus(seed):
        key = jr.fold_in(jr.PRNGKey(0), seed)
        t = (jnp.arange(L, dtype=jnp.float32) / FS)[None, :]
        f0 = (160.0 + 15.0 * (jnp.arange(BATCH) % 6))[:, None]
        amps = [0.5, 0.3, 0.2, 0.1]
        x = jnp.zeros((BATCH, L), jnp.float32)
        for h in range(4):
            x = x + amps[h] * jnp.sin(2 * jnp.pi * f0 * (h + 1) * t + 0.1 * h)
        x = x * (1.0 + 0.02 * jnp.sin(2 * jnp.pi * 5.0 * t))
        k1, k2 = jr.split(key)
        x = x + 0.011 * jr.normal(k1, (BATCH, L), jnp.float32)
        x = 0.7 * x / jnp.max(jnp.abs(x), axis=1, keepdims=True)
        noise = jr.normal(k2, (BATCH, SL), jnp.float32)
        return x, noise

    def tsum(o):
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), o, 0.0)

    xs, noise = jax.jit(corpus)(0)
    fp = 5.0

    def timeit(name, fn, *args, reps=4):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        print(f"  {name:28s} compile {time.perf_counter()-t0:7.1f}s",
              end="", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = np.asarray(fn(*args))
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"   {dt:8.1f} ms   (out {float(r):.4g})", flush=True)
        return dt

    # stage graphs, tiny outputs
    dio_fn = jax.jit(lambda xs: tsum(jax.vmap(
        lambda x: dio_mod.dio.__wrapped__(x, FS, fp))(xs)))
    # full analysis pieces need actual intermediates once (device-resident)
    mk = jax.jit(lambda xs: jax.vmap(
        lambda x: dio_mod.dio.__wrapped__(x, FS, fp))(xs))
    t_, f0_, _, _ = mk(xs)
    sm_full = jax.jit(lambda xs, t, f0: jax.vmap(
        lambda x, tt, ff: sm.stonemask.__wrapped__(x, FS, tt, ff))(xs, t, f0))
    f0r_ = sm_full(xs, t_, f0_)
    ct_full = jax.jit(lambda xs, t, f0: jax.vmap(
        lambda x, tt, ff: ct.cheaptrick.__wrapped__(x, FS, tt, ff, N))(
            xs, t, f0))
    sp_ = ct_full(xs, t_, f0r_)
    d4c_full = jax.jit(lambda xs, t, f0: jax.vmap(
        lambda x, tt, ff: d4c_mod.d4c.__wrapped__(x, FS, tt, ff, N, 0.0,
                                                  None)[0])(xs, t, f0))
    ap_ = d4c_full(xs, t_, f0r_)
    jax.tree_util.tree_map(lambda a: np.asarray(a[0, 0]), (sp_, ap_))

    sm_fn = jax.jit(lambda xs, t, f0: tsum(sm_full(xs, t, f0)))
    ct_fn = jax.jit(lambda xs, t, f0: tsum(ct_full(xs, t, f0)))
    d4c_fn = jax.jit(lambda xs, t, f0: tsum(d4c_full(xs, t, f0)))
    syn_fn = jax.jit(lambda f0, sp, ap, nz: tsum(jax.vmap(
        lambda a, b, c, d: syn.synthesis.__wrapped__(
            a, b, c, N, fp, FS, yl, d, 0, False))(f0, sp, ap, nz)))

    print("stages (batch 8 x 2 s @48k):", flush=True)
    timeit("dio", dio_fn, xs)
    timeit("stonemask", sm_fn, xs, t_, f0_)
    timeit("cheaptrick", ct_fn, xs, t_, f0r_)
    timeit("d4c", d4c_fn, xs, t_, f0r_)
    timeit("synthesis", syn_fn, f0r_, sp_, ap_, noise)

    # precision ablation on cheaptrick + d4c (are the FFT matmuls already
    # running single-pass bf16 under DEFAULT precision?)
    with jax.default_matmul_precision("float32"):
        ct_hi = jax.jit(lambda xs, t, f0: tsum(jax.vmap(
            lambda x, tt, ff: ct.cheaptrick.__wrapped__(
                x, FS, tt, ff, N))(xs, t, f0)))
        d4c_hi = jax.jit(lambda xs, t, f0: tsum(jax.vmap(
            lambda x, tt, ff: d4c_mod.d4c.__wrapped__(
                x, FS, tt, ff, N, 0.0, None)[0])(xs, t, f0)))
    print("precision=float32 (HIGHEST):", flush=True)
    timeit("cheaptrick/f32", ct_hi, xs, t_, f0r_)
    timeit("d4c/f32", d4c_hi, xs, t_, f0r_)

    with jax.default_matmul_precision("bfloat16"):
        ct_lo = jax.jit(lambda xs, t, f0: tsum(jax.vmap(
            lambda x, tt, ff: ct.cheaptrick.__wrapped__(
                x, FS, tt, ff, N))(xs, t, f0)))
        d4c_lo = jax.jit(lambda xs, t, f0: tsum(jax.vmap(
            lambda x, tt, ff: d4c_mod.d4c.__wrapped__(
                x, FS, tt, ff, N, 0.0, None)[0])(xs, t, f0)))
    print("precision=bfloat16 (fastest):", flush=True)
    timeit("cheaptrick/bf16", ct_lo, xs, t_, f0r_)
    timeit("d4c/bf16", d4c_lo, xs, t_, f0r_)


if __name__ == "__main__":
    main()

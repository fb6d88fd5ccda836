#!/usr/bin/env python3
"""Dev benchmark: on-device corpus generation + per-stage timing.

The axon relay's host<->device bandwidth varies day to day (measured
7-100 MB/s), so the production bench must not upload inputs inside the
timed loop.  Here the synthetic corpus is generated ON DEVICE from a
scalar seed; the timed fetch is a (B,) reduction that forces the whole
batch.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FS = 48000
DUR = 2.0
BATCH = 8
ITERS = 5


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import jax.random as jr
    from functools import partial
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
        amps = jnp.asarray([0.5, 0.3, 0.2, 0.1], jnp.float32)
        x = jnp.zeros((BATCH, L), jnp.float32)
        for h in range(4):
            x = x + amps[h] * jnp.sin(2 * jnp.pi * f0 * (h + 1) * t + 0.1 * h)
        x = x * (1.0 + 0.02 * jnp.sin(2 * jnp.pi * 5.0 * t))
        k1, k2 = jr.split(key)
        x = x + 0.011 * jr.normal(k1, (BATCH, L), jnp.float32)
        x = 0.7 * x / jnp.max(jnp.abs(x), axis=1, keepdims=True)
        noise = jr.normal(k2, (BATCH, SL), jnp.float32)
        return x, noise

    @jax.jit
    def run(seed):
        xs, noise = corpus(seed)
        y = jax.vmap(lambda x, nz: batch_mod._copy_synth_one(
            x, FS, 5.0, N, 0.0, yl, nz))(xs, noise)[3]
        return jnp.sum(y * y, axis=1)  # forces every batch lane

    t0 = time.perf_counter()
    np.asarray(run(0))
    print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)

    for rep in range(2):
        t0 = time.perf_counter()
        for s in range(1, ITERS + 1):
            np.asarray(run(s + rep * 100))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"rep{rep}: {dt*1000:.0f} ms/iter -> "
              f"{BATCH*DUR/dt:.1f} audio-s/s", flush=True)

    # ---- per-stage timing (on-device inputs) ----
    xs, noise = jax.jit(corpus)(0)
    frame_period = 5.0

    dio_fn = jax.jit(jax.vmap(
        lambda x: dio_mod.dio.__wrapped__(x, FS, frame_period)))
    t_, f0_, _, _ = dio_fn(xs)
    sm_fn = jax.jit(jax.vmap(
        lambda x, t, f0: sm.stonemask.__wrapped__(x, FS, t, f0)))
    f0r_ = sm_fn(xs, t_, f0_)
    ct_fn = jax.jit(jax.vmap(
        lambda x, t, f0: ct.cheaptrick.__wrapped__(x, FS, t, f0, N)))
    sp_ = ct_fn(xs, t_, f0r_)
    d4c_fn = jax.jit(jax.vmap(
        lambda x, t, f0: d4c_mod.d4c.__wrapped__(x, FS, t, f0, N, 0.0,
                                                 None)[0]))
    ap_ = d4c_fn(xs, t_, f0r_)
    syn_fn = jax.jit(jax.vmap(
        lambda f0, sp, ap, nz: syn.synthesis.__wrapped__(
            f0, sp, ap, N, frame_period, FS, yl, nz, 0, False)))
    y_ = syn_fn(f0r_, sp_, ap_, noise)

    def stage(name, fn, *args):
        # fetch only a tiny slice — np.asarray on the full output would
        # time the relay's transfer, not the stage
        def tiny(out):
            leaf = jax.tree_util.tree_leaves(out)[1 if name == "dio" else 0]
            return np.asarray(leaf.ravel()[:16])
        tiny(fn(*args))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            tiny(fn(*args))
        print(f"  {name:10s} {(time.perf_counter()-t0)/reps*1000:7.1f} ms",
              flush=True)

    stage("dio", dio_fn, xs)
    stage("stonemask", sm_fn, xs, t_, f0_)
    stage("cheaptrick", ct_fn, xs, t_, f0r_)
    stage("d4c", d4c_fn, xs, t_, f0r_)
    stage("synthesis", syn_fn, f0r_, sp_, ap_, noise)


if __name__ == "__main__":
    main()

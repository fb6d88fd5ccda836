#!/usr/bin/env python3
"""TPU micro-bench of the zero-crossing candidate machinery that
dominates Harvest's raw stage (608 streams = 152 channels x 4 ZC types).

Times each primitive in isolation on (S, L) batches so the hot one is
unambiguous: cumsum, cumsum_mxu, compact_indices, searchsorted-style
interp1, dio.zero_crossings, and the full _zc_candidates.
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

from hts_train_world_tpu.ops import dio as dio_mod  # noqa: E402
from hts_train_world_tpu.ops import harvest as hv  # noqa: E402
from hts_train_world_tpu.ops import prims  # noqa: E402

S, L, CAP, T = 608, 16000, 2624, 2001
FS8 = 8000.0


def timeit(name, fn, *args, reps=3):
    jf = jax.jit(lambda *a: sum(jnp.sum(x) for x in
                                jax.tree_util.tree_leaves(fn(*a))))
    np.asarray(jf(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(jf(*args))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.1f} ms", flush=True)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    sig = jnp.asarray(np.sin(np.cumsum(
        rng.uniform(0.05, 0.3, (S, L)), axis=1))
        + 0.01 * rng.standard_normal((S, L)), jnp.float32)
    mask = sig[:, :-1] > 0
    maskf = mask.astype(jnp.float32)
    locs = jnp.sort(jnp.asarray(rng.uniform(0, 2, (S, CAP)), jnp.float32),
                    axis=1)
    vals = jnp.asarray(rng.uniform(60, 800, (S, CAP)), jnp.float32)
    qs = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32) * 1e-3, (S, T))
    nv = jnp.full((S,), CAP - 5, jnp.int32)

    timeit("cumsum int32 (S,L)", lambda m: jnp.cumsum(
        m.astype(jnp.int32), axis=1), mask)
    timeit("cumsum f32 (S,L)", lambda m: jnp.cumsum(m, axis=1), maskf)
    timeit("compact_indices vmap", lambda m: jax.vmap(
        lambda r: prims.compact_indices(r, CAP, L - 1))(m), mask)
    timeit("interp1 vmap (S,T into CAP)", lambda l, v, q, n: jax.vmap(
        lambda a, b, c, d: prims.interp1(a, b, c, n_valid=d))(l, v, q, n),
        locs, vals, qs, nv)
    timeit("zero_crossings vmap", lambda s: jax.vmap(
        lambda r: dio_mod.zero_crossings(r, L, FS8, CAP))(s), sig)
    tgrid = jnp.arange(T, dtype=jnp.float32) * 1e-3
    timeit("_zc_candidates vmap", lambda s: jax.vmap(
        lambda r: hv._zc_candidates(r, jnp.float32(200.0), L, tgrid,
                                    FS8, 71.0, 800.0, CAP))(s[:152]), sig)



def searchsorted_variants():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    locs = jnp.sort(jnp.asarray(rng.uniform(0, 2, (S, CAP)), jnp.float32),
                    axis=1)
    qs = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32) * 1e-3, (S, T))
    csum = jnp.cumsum(jnp.asarray(
        rng.random((S, L)) < 0.1, jnp.int32), axis=1)
    k = jnp.broadcast_to(jnp.arange(1, CAP + 1, dtype=jnp.int32), (S, CAP))
    for m in ("scan", "scan_unrolled", "sort"):
        timeit(f"interp1-ss[{m}] (S,T|CAP)",
               lambda a, b, mm=m: jax.vmap(lambda x, y: jnp.searchsorted(
                   x, y, side="right", method=mm))(a, b), locs, qs)
    for m in ("scan", "scan_unrolled", "sort"):
        timeit(f"compact-ss[{m}] (S,CAP|L)",
               lambda a, b, mm=m: jax.vmap(lambda x, y: jnp.searchsorted(
                   x, y, side="left", method=mm))(a, b), csum, k)


def compact_topk():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((S, L - 1)) < 0.1)

    def via_topk(m):
        n = m.shape[-1]
        idx = jnp.where(m, jnp.arange(n, dtype=jnp.int32), n)
        topv, _ = jax.lax.top_k(-idx, CAP)
        pos = -topv
        n_true = jnp.sum(m, axis=-1, keepdims=True)
        return jnp.where(jnp.arange(CAP) < n_true, pos, n - 1)

    def via_ss_sort(m):
        csum = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        k = jnp.broadcast_to(jnp.arange(1, CAP + 1, dtype=jnp.int32),
                             m.shape[:-1] + (CAP,))
        return jax.vmap(lambda c, q: jnp.searchsorted(
            c, q, side="left", method="sort"))(csum, k)

    timeit("compact via top_k", via_topk, mask)
    timeit("compact via ss-sort (incl cumsum)", via_ss_sort, mask)


if os.environ.get("PZ_VARIANTS"):
    main = searchsorted_variants
if os.environ.get("PZ_TOPK"):
    main = compact_topk

if __name__ == "__main__":
    main()



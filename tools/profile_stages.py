#!/usr/bin/env python3
"""Per-stage TPU timing of the batched copy-synthesis pipeline.

Times each stage (dio / stonemask / cheaptrick / d4c / synthesis) as its
own jitted vmapped program with forced result fetches (the axon relay is
async).  Serialize: never run concurrently with another TPU process.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import cheaptrick as ct
from hts_train_world_tpu.ops import d4c as d4c_mod
from hts_train_world_tpu.ops import dio as dio_mod
from hts_train_world_tpu.ops import stonemask as sm
from hts_train_world_tpu.ops import synthesis as syn

FS = int(os.environ.get("FS", "16000"))
DUR = 2.0
BATCH = int(os.environ.get("BATCH", "8"))
ITERS = int(os.environ.get("ITERS", "4"))
L = int(FS * DUR)
N = cfg.cheaptrick_fft_size(FS)
T = cfg.samples_for_dio(FS, L, 5.0)
YL = int((T - 1) * 5.0 / 1000.0 * FS) + 1


def corpus(seed):
    rng = np.random.default_rng(seed)
    t = np.arange(L) / FS
    xs = []
    for i in range(BATCH):
        f0 = 160.0 + 15.0 * (i % 6)
        x = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * t + 0.1 * h)
                for h, a in enumerate([0.5, 0.3, 0.2, 0.1]))
        x += 0.01 * rng.standard_normal(L)
        xs.append(0.7 * x / np.abs(x).max())
    return jnp.asarray(np.stack(xs), jnp.float32)


dio_b = jax.jit(jax.vmap(lambda x: dio_mod.dio.__wrapped__(x, FS, 5.0)[:2]))
sm_b = jax.jit(jax.vmap(lambda x, t, f0: sm.stonemask.__wrapped__(
    x, FS, t, f0, grid_step=int(FS * 5.0 / 1000))))
ct_b = jax.jit(jax.vmap(lambda x, t, f0: ct.cheaptrick.__wrapped__(
    x, FS, t, f0, N, grid_step=int(FS * 5.0 / 1000))))
GS = int(FS * 5.0 / 1000)
MP = int(os.environ.get("MAX_PULSES", "0"))
d4c_b = jax.jit(jax.vmap(lambda x, t, f0: d4c_mod.d4c.__wrapped__(
    x, FS, t, f0, N, 0.0, None, grid_step=GS)[0]))
syn_b = jax.jit(jax.vmap(lambda f0, sp, ap, nz: syn.synthesis.__wrapped__(
    f0, sp, ap, N, 5.0, FS, YL, nz, MP, False)))


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])  # warm/compile + fetch
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[..., :1])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:12s} {best*1e3:8.1f} ms  (med {np.median(ts)*1e3:.1f})")
    return out, best


def main():
    xs = corpus(0)
    rng = np.random.default_rng(1)
    nz = jnp.asarray(rng.standard_normal((BATCH, YL + 16)), jnp.float32)

    total = 0.0
    (t, f0d), dt = timeit("dio", dio_b, xs); total += dt
    f0, dt = timeit("stonemask", sm_b, xs, t, f0d); total += dt
    f0 = f0[0] if isinstance(f0, tuple) else f0
    sp, dt = timeit("cheaptrick", ct_b, xs, t, f0); total += dt
    ap, dt = timeit("d4c", d4c_b, xs, t, f0); total += dt
    y, dt = timeit("synthesis", syn_b, f0, sp, ap, nz); total += dt
    print(f"{'TOTAL':12s} {total*1e3:8.1f} ms  -> "
          f"{BATCH*DUR/total:.2f} audio-s/s (stage-sum)")


if __name__ == "__main__":
    main()

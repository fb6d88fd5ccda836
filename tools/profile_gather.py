#!/usr/bin/env python3
"""Micro-benchmarks: gather strategies for D4C hot loops on the TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

F = 3208          # B*T frames
W = 2048          # window length
L = 32000
P = 1025 + 2 * 688 + 1   # smoothing mirror length

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(L + 2 * 700), jnp.float32)
seg = jnp.asarray(rng.standard_normal((F, P)), jnp.float32)
starts = jnp.asarray(rng.integers(0, L - W, F), jnp.int32)
offs = jnp.asarray(rng.integers(0, 600, F), jnp.int32)
fracs = jnp.asarray(rng.uniform(0, 1, F), jnp.float32)


def timeit(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out.ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:8.1f} ms")


# A. window from shared x: per-element gather (current style)
def gA(starts):
    j = jnp.arange(W)
    return jax.vmap(lambda s: jnp.take(x, s + j, mode="clip"))(starts)
timeit("window: elementwise gather", gA, starts)

# B. vmapped dynamic_slice
def gB(starts):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(x, (s,), (W,)))(starts)
timeit("window: vmapped dynamic_slice", gB, starts)

# C. per-row fractional shift of seg: elementwise take per row (current)
def sC(seg, offs):
    j = jnp.arange(1025)
    return jax.vmap(lambda s, o: jnp.take(s, o + j, mode="clip"))(seg, offs)
timeit("shift: per-row elementwise gather", sC, seg, offs)

# D. per-row dynamic_slice
def sD(seg, offs):
    return jax.vmap(lambda s, o: jax.lax.dynamic_slice(s, (o,), (1025,)))(seg, offs)
timeit("shift: vmapped dynamic_slice", sD, seg, offs)

# E. take_along_axis
def sE(seg, offs):
    j = jnp.arange(1025)
    return jnp.take_along_axis(seg, jnp.clip(offs[:, None] + j[None], 0, P - 1), axis=1)
timeit("shift: take_along_axis", sE, seg, offs)

# F. cumsum cost at (F, P)
timeit("cumsum (F,P)", lambda s: jnp.cumsum(s, -1), seg)

# G. static mirror build (concat/reverse) + cumsum
def gmir(ps):
    a = ps[:, ::-1]
    return jnp.cumsum(jnp.concatenate([a[:, -689:], ps, a[:, 1:690]], 1), -1)
ps = seg[:, :1025]
timeit("static mirror + cumsum", gmir, ps)

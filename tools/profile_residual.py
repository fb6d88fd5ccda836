#!/usr/bin/env python3
"""Residual hotspot hunt after the dynamic_slice fast paths."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims
from hts_train_world_tpu.ops import d4c as d4c_mod
from hts_train_world_tpu.ops import synthesis as syn

FS = 16000
B, T = 8, 401
L = 32000
FFTD = cfg.d4c_fft_size(FS)
N = 1024
YL = 32081
MP = syn.default_max_pulses(YL, FS)

rng = np.random.default_rng(0)
ps = jnp.asarray(rng.uniform(0.1, 1.0, (B, T, FFTD // 2 + 1)), jnp.float32)
f0 = jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32)
wv = jnp.asarray(rng.standard_normal((B, T, FFTD)), jnp.float32)
logp = jnp.asarray(rng.standard_normal((B, MP, N // 2 + 1)) * 0.1, jnp.float32)
resp = jnp.asarray(rng.standard_normal((B, MP, N)), jnp.float32)
offs = jnp.asarray(np.sort(rng.integers(0, YL - N, (B, MP))), jnp.int32)

fmax = max(FS / 12.0, cfg.K_CEIL_F0)
BMAX = int(fmax * FFTD / FS) + 1
UL = 2 + int(fmax * FFTD / FS) + 1


def timeit(name, fn, *args, iters=4):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms")


# new linear_smoothing
def lsm(ps, f0):
    return jax.vmap(jax.vmap(lambda p, fi: prims.linear_smoothing(
        p, fi, FS, FFTD, BMAX)))(ps, f0)
timeit("linear_smoothing NEW x1", lsm, ps, f0)

# dc_correction
def dcc(ps, f0):
    return jax.vmap(jax.vmap(lambda p, fi: prims.dc_correction(
        p, fi, FS, FFTD, UL)))(ps, f0)
timeit("dc_correction x1", dcc, ps, f0)

# windowed waveform via dslice
pad = int(2.0 * FS / cfg.K_FLOOR_F0_D4C + 0.5) + 2
x = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
pos = jnp.asarray(np.tile(np.arange(T) * 0.005, (B, 1)), jnp.float32)
def wwf(x, f0, pos):
    def one(xu, f0u, posu):
        xpu = jnp.concatenate([jnp.full((pad,), xu[0]), xu,
                               jnp.full((pad + FFTD,), xu[-1])])
        return jax.vmap(lambda fi, pi: d4c_mod._windowed_waveform(
            xu, L, FS, fi, pi, "hanning", 4.0, 0.0, FFTD, jnp.float32,
            xpu, pad)[0])(f0u, posu)
    return jax.vmap(one)(x, f0, pos)
timeit("windowed_waveform dslice x1", wwf, x, f0, pos)

# minphase matmul at pulse shapes
def mpm(lp):
    return jax.vmap(jax.vmap(lambda l: fftmat.minphase_matmul(l, N)[0]))(lp)
timeit("minphase_matmul (pulses)", mpm, logp)

# irfft matmul at pulse shapes
re = logp
im = logp * 0.5
def irf(re, im):
    return jax.vmap(jax.vmap(lambda r, i: fftmat.irfft_scaled_matmul(r, i, N)))(re, im)
timeit("irfft_scaled_matmul (pulses)", irf, re, im)

# chunked OLA
half = N // 2
def ola(resp, offs):
    def one(r, o):
        n_chunks = (YL + half) // N + 2
        chunk = o // N
        oo = o % N
        rows = jax.vmap(lambda rr, oi: jax.lax.dynamic_update_slice(
            jnp.zeros(2 * N, jnp.float32), rr, (oi,)))(r, oo)
        R = jnp.zeros((n_chunks, 2 * N), jnp.float32)
        R = R.at[chunk].add(rows, mode="drop")
        f, s = R[:, :N], R[:, N:]
        return (jnp.pad(f, ((0, 1), (0, 0))) + jnp.pad(s, ((1, 0), (0, 0)))).reshape(-1)
    return jax.vmap(one)(resp, offs)
timeit("chunked OLA", ola, resp, offs)

# full d4c and synthesis again for reference
def fulld4c(x, pos, f0):
    return jax.vmap(lambda xu, tu, fu: d4c_mod.d4c.__wrapped__(
        xu, FS, tu, fu, 1024, 0.0, None)[0])(x, pos, f0)
timeit("FULL d4c", fulld4c, x, pos, f0, iters=3)

#!/usr/bin/env python3
"""Ablation timing of D4C sub-components on the TPU at bench shapes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims
from hts_train_world_tpu.ops import d4c as d4c_mod

FS = int(os.environ.get("FS", "16000"))
B, T = 8, 401
L = FS * 2
FFTD = cfg.d4c_fft_size(FS)          # 2048
NAP = cfg.number_of_aperiodicities(FS)
print("fft_d", FFTD, "n_ap", NAP)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
f0 = jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32)
pos = jnp.asarray(np.tile(np.arange(T) * 0.005, (B, 1)), jnp.float32)
ps = jnp.asarray(rng.uniform(0.1, 1.0, (B, T, FFTD // 2 + 1)), jnp.float32)
wv = jnp.asarray(rng.standard_normal((B, T, FFTD)), jnp.float32)

fmax = max(FS / 12.0, cfg.K_CEIL_F0)
UL = 2 + int(fmax * FFTD / FS) + 1
BMAX = int(fmax * FFTD / FS) + 1
WL = int(cfg.K_FREQUENCY_INTERVAL * FFTD / FS) * 2 + 1
window = prims.nuttall_window(WL, jnp.float32)


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
    print(f"{name:28s} {min(ts)*1e3:8.1f} ms")


# 1. windowed waveform gathers (3 per frame in the body)
def wwf(x, f0, pos):
    def one(xu, f0u, posu):
        return jax.vmap(lambda fi, pi: d4c_mod._windowed_waveform(
            xu, L, FS, fi, pi, "hanning", 4.0, 0.0, FFTD, jnp.float32)[0]
        )(f0u, posu)
    return jax.vmap(one)(x, f0, pos)
timeit("windowed_waveform x1", wwf, x, f0, pos)

# 2. rfft power matmul over all frames
timeit("rfft_power_matmul", lambda w: fftmat.rfft_power_matmul(w, FFTD), wv)

# 3. plain jnp.fft.rfft power
timeit("jnp.fft.rfft power", lambda w: jnp.abs(jnp.fft.rfft(w)) ** 2, wv)

# 4. linear_smoothing x1 over all frames
def lsm(ps, f0):
    return jax.vmap(jax.vmap(lambda p, fi: prims.linear_smoothing(
        p, fi, FS, FFTD, BMAX)))(ps, f0)
timeit("linear_smoothing x1", lsm, ps, f0)

# 5. dc_correction
def dcc(ps, f0):
    return jax.vmap(jax.vmap(lambda p, fi: prims.dc_correction(
        p, fi, FS, FFTD, UL)))(ps, f0)
timeit("dc_correction x1", dcc, ps, f0)

# 6. coarse aperiodicity (dynamic_slice + matmul fft + top_k)
def coarse(sgd):
    return jax.vmap(jax.vmap(lambda s: d4c_mod._coarse_aperiodicity(
        s, FS, FFTD, NAP, window, WL)))(sgd)
timeit("coarse_aperiodicity", coarse, ps)

# 7. top_k alone
timeit("top_k(b+1) alone", lambda p: jax.lax.top_k(p, 132)[0].sum(-1), ps)

# 8. noise-slicing machinery with stream=zeros(1) (fast mode cost)
def noise_mach(f0):
    stream = jnp.zeros(1, jnp.float32)
    def one(f0u):
        h_lt = prims.matlab_round_i(1.5 * FS / jnp.maximum(f0u, 40.0))
        lt_counts = jnp.where(f0u == 0.0, 0, 2 * h_lt + 1)
        lt_off = jnp.cumsum(lt_counts) - lt_counts
        j = jnp.arange(FFTD)
        return jnp.where(j[None] <= 2 * h_lt[:, None],
                         jnp.take(stream, lt_off[:, None] + j[None],
                                  mode="clip"), 0.0)
    return jax.vmap(one)(f0)
timeit("noise slice (T,2048) x1", noise_mach, f0)

# 9. full d4c for reference
def full(x, pos, f0):
    return jax.vmap(lambda xu, tu, fu: d4c_mod.d4c.__wrapped__(
        xu, FS, tu, fu, 1024, 0.0, None)[0])(x, pos, f0)
timeit("FULL d4c", full, x, pos, f0, iters=3)

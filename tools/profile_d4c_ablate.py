#!/usr/bin/env python3
"""Ablate stages inside the d4c body to find the residual cost."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims
from hts_train_world_tpu.ops import d4c as d4c_mod

FS = 16000
B, T, L = 8, 401, 32000
FFTD = cfg.d4c_fft_size(FS)
NAP = cfg.number_of_aperiodicities(FS)
fmax = max(FS / 12.0, cfg.K_CEIL_F0)
UL = 2 + int(fmax * FFTD / FS) + 1
BMAX = int(fmax * FFTD / FS) + 1
WL = int(cfg.K_FREQUENCY_INTERVAL * FFTD / FS) * 2 + 1
window = prims.nuttall_window(WL, jnp.float32)
PAD = int(2.0 * FS / cfg.K_FLOOR_F0_D4C + 0.5) + 2
j_b = jnp.arange(FFTD)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
f0 = jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32)
pos = jnp.asarray(np.tile(np.arange(T) * 0.005, (B, 1)), jnp.float32)


def timeit(name, fn, *args, iters=3):
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


def make_body(do_centroid=True, do_sps=True, do_smooth=True, do_coarse=True):
    def run(x, pos, f0):
        def one(xu, posu, f0u):
            xp = jnp.concatenate([jnp.full((PAD,), xu[0]), xu,
                                  jnp.full((PAD + FFTD,), xu[-1])])

            def centroid(f0i, p, noise):
                wave, h = d4c_mod._windowed_waveform(
                    xu, L, FS, f0i, p, "blackman", 4.0, noise, FFTD,
                    jnp.float32, xp, PAD)
                power = jnp.sum(wave * wave)
                wave = wave / jnp.sqrt(power)
                r1, i1 = fftmat.rfft_matmul(wave, FFTD)
                r2, i2 = fftmat.rfft_matmul(wave * (j_b.astype(jnp.float32) + 1.0), FFTD)
                return r2 * r1 + i1 * i2

            def frame(f0i, p):
                if do_centroid:
                    c1 = centroid(f0i, p - 0.25 / f0i, 0.0)
                    c2 = centroid(f0i, p + 0.25 / f0i, 0.0)
                    sc = prims.dc_correction(c1 + c2, f0i, FS, FFTD, UL)
                else:
                    sc = jnp.ones(FFTD // 2 + 1, jnp.float32)
                if do_sps:
                    wave, _ = d4c_mod._windowed_waveform(
                        xu, L, FS, f0i, p, "hanning", 4.0, 0.0, FFTD,
                        jnp.float32, xp, PAD)
                    sps = fftmat.rfft_power_matmul(wave, FFTD)
                    sps = prims.dc_correction(sps, f0i, FS, FFTD, UL)
                    sps = prims.linear_smoothing(sps, f0i, FS, FFTD, BMAX)
                else:
                    sps = jnp.ones(FFTD // 2 + 1, jnp.float32)
                sgd = sc / sps
                sgd = jnp.where(jnp.isfinite(sgd), sgd, 0.0)
                if do_smooth:
                    sgd = prims.linear_smoothing(sgd, f0i / 2.0, FS, FFTD, BMAX)
                    sgd = sgd - prims.linear_smoothing(sgd, f0i, FS, FFTD, BMAX)
                if do_coarse:
                    ca = d4c_mod._coarse_aperiodicity(sgd, FS, FFTD, NAP,
                                                      window, WL)
                else:
                    ca = sgd[:NAP]
                return jnp.minimum(0.0, ca + (f0i - 100.0) / 50.0)

            return jax.vmap(frame)(f0u, posu)
        return jax.vmap(one)(x, pos, f0)
    return run


timeit("body FULL", make_body(), x, pos, f0)
timeit("body -coarse", make_body(do_coarse=False), x, pos, f0)
timeit("body -smooth", make_body(do_smooth=False), x, pos, f0)
timeit("body -centroid", make_body(do_centroid=False), x, pos, f0)
timeit("body -sps", make_body(do_sps=False), x, pos, f0)
timeit("body centroid only", make_body(do_sps=False, do_smooth=False,
                                       do_coarse=False), x, pos, f0)

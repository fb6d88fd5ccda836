#!/usr/bin/env python3
"""Ablation timing of DIO sub-components on the TPU at bench shapes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import dio as dio_mod
from hts_train_world_tpu.ops import prims

FS = 16000
B = 8
L = 32000
plan = dio_mod.dio_plan(L, FS)
YL = plan["y_length"]
NF = plan["fft_size"]
T = plan["f0_length"]
CAP = YL // 2 + 2
print("y_length", YL, "fft", NF, "T", T, "cap", CAP,
      "bands", plan["number_of_bands"])

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
filt = jnp.asarray(rng.standard_normal((B, YL)), jnp.float32)
tp = jnp.asarray(np.tile(np.arange(T) * 0.005, (B, 1)), jnp.float32)


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


# 1. spectrum + 11-band filtering (FFT work only)
def bandfilt(x):
    def one(xu):
        y = jnp.zeros(NF, jnp.float32).at[:L].set(xu)
        ys = jnp.fft.rfft(y)
        outs = []
        for boundary in plan["boundary_f0"]:
            ha = int(plan["actual_fs"] / boundary / 2.0 + 0.5)
            lpf = jnp.zeros(NF, jnp.float32).at[:ha * 4].set(
                prims.nuttall_window(ha * 4, jnp.float32))
            f = jnp.fft.irfft(ys * jnp.fft.rfft(lpf), NF) * NF
            outs.append(jax.lax.dynamic_slice(f, (2 * ha,), (YL,)))
        return jnp.stack(outs)
    return jax.vmap(one)(x)
timeit("11-band FFT filtering", bandfilt, x)

# 2. one zero_crossings call (x44 in dio)
def zc(filt):
    return jax.vmap(lambda f: dio_mod.zero_crossings(f, YL, plan["actual_fs"], CAP)[0])(filt)
timeit("zero_crossings x1 (cap=16k)", zc, filt)

# 3. compact_indices alone
def ci(filt):
    return jax.vmap(lambda f: prims.compact_indices(
        (f[:-1] > 0) & (f[1:] <= 0), CAP, YL - 1))(filt)
timeit("compact_indices x1 (cap=16k)", ci, filt)

# smaller cap variant
def ci_small(filt):
    return jax.vmap(lambda f: prims.compact_indices(
        (f[:-1] > 0) & (f[1:] <= 0), 512, YL - 1))(filt)
timeit("compact_indices x1 (cap=512)", ci_small, filt)

# 4. interp1 from cap-length to T (x44)
locs = jnp.asarray(np.sort(rng.uniform(0, 2, (B, CAP))), jnp.float32)
vals = jnp.asarray(rng.standard_normal((B, CAP)), jnp.float32)
nv = jnp.full((B,), 900, jnp.int32)
def itp(locs, vals, tp):
    return jax.vmap(lambda l, v, t: prims.interp1(l, v, t, n_valid=900))(locs, vals, tp)
timeit("interp1 cap->T x1", itp, locs, vals, tp)

# 5. full band candidate (4 zc + 4 interp1 + score)
def bc(filt):
    return jax.vmap(lambda f, t: dio_mod._band_candidate(
        f, YL, plan["actual_fs"], 200.0, 71.0, 800.0, t, CAP))(filt, tp)
timeit("_band_candidate x1", bc, filt)

# 6. fix_f0_contour (scans)
bf = jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32)
cd = jnp.asarray(rng.uniform(100, 300, (B, 11, T)), jnp.float32)
def fix(bf, cd):
    return jax.vmap(lambda b, c: dio_mod.fix_f0_contour(b, c, 5.0, 71.0, 0.1))(bf, cd)
timeit("fix_f0_contour", fix, bf, cd)

# 7. full dio
def full(x):
    return jax.vmap(lambda xu: dio_mod.dio.__wrapped__(xu, FS, 5.0)[1])(x)
timeit("FULL dio", full, x, iters=3)

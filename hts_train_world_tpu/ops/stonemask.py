"""StoneMask F0 refinement — TPU-native reimplementation of
externs/WORLD_v2/src/stonemask.cpp (SURVEY.md N5).

The reference refines each frame with an F0-adaptive Blackman window whose
FFT size depends on f0 (stonemask.cpp:189-195).  Static shapes are kept by
bucketing: the set of reachable FFT sizes for f0 in [f0_floor, f0_ceil] is
enumerated at trace time; every bucket computes all frames vectorized and
the per-frame result is selected by the frame's true FFT size.  (DIO output
is guaranteed inside [floor, ceil] by dio.cpp:459-463.)
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import prims


def _fft_size_for_f0(fs: int, f0: float) -> int:
    half = int(1.5 * fs / f0 + 1.0)
    return int(2 ** (2 + int(math.log(half * 2.0 + 1.0) / cfg.K_LOG2)))


def stonemask_buckets(fs: int, f0_floor: float = cfg.K_FLOOR_F0,
                      f0_ceil: float = cfg.K_CEIL_F0):
    lo = _fft_size_for_f0(fs, f0_ceil)
    hi = _fft_size_for_f0(fs, f0_floor)
    out = []
    b = lo
    while b <= hi:
        out.append(b)
        b *= 2
    return out


def _fix_f0(power, numer, idx, n_harmonics: int, fft_size: int, fs: int):
    """FixF0 (stonemask.cpp:96-117) over a (..., 6) harmonic index array."""
    dtype = power.dtype
    half = fft_size // 2
    k = jnp.arange(1, 7, dtype=dtype)
    idx_c = jnp.clip(idx, 0, half)
    p = jnp.take_along_axis(power, idx_c, axis=-1)
    nm = jnp.take_along_axis(numer, idx_c, axis=-1)
    inst = jnp.where(p == 0.0, 0.0,
                     idx_c.astype(dtype) * fs / fft_size
                     + nm / p * fs / (2.0 * jnp.pi))
    amp = jnp.sqrt(p)
    mask = (jnp.arange(6) < n_harmonics).astype(dtype)
    num = jnp.sum(amp * inst * mask, axis=-1)
    den = jnp.sum(amp * k * mask, axis=-1)
    return num / (den + cfg.K_MY_SAFE_GUARD_MINIMUM)


@partial(jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil"))
def stonemask(x, fs: int, temporal_positions, f0,
              f0_floor: float = cfg.K_FLOOR_F0,
              f0_ceil: float = cfg.K_CEIL_F0):
    """StoneMask (stonemask.cpp:211-217)."""
    dtype = x.dtype
    L = x.shape[0]
    refined = jnp.zeros_like(f0)

    # f32 fast path: the window gather round((pos+(j-h)/fs)*fs) is the
    # contiguous range round(pos*fs) + j - h (exact in integer arithmetic;
    # the f64 parity path keeps the reference's per-element float rounding)
    fast = dtype == jnp.float32
    if fast:
        pad = int(1.5 * fs / cfg.K_FLOOR_F0_STONEMASK) + 8
        Wmax = stonemask_buckets(fs, f0_floor, f0_ceil)[-1] // 2
        xp = jnp.concatenate([
            jnp.full((pad,), x[0], dtype), x,
            jnp.full((pad + Wmax,), x[-1], dtype)])

    for B in stonemask_buckets(fs, f0_floor, f0_ceil):
        W = B // 2  # max window length in this bucket is < B/2
        half_w = (1.5 * fs / f0 + 1.0).astype(jnp.int32)  # trunc
        frame_fft = 4 * (2 ** jnp.floor(
            jnp.log(half_w.astype(dtype) * 2.0 + 1.0) / cfg.K_LOG2)
        ).astype(jnp.int32)
        in_bucket = (frame_fft == B) & (f0 > cfg.K_FLOOR_F0_STONEMASK) \
            & (f0 <= fs / 12.0)

        def refine(pos, f0i, h):
            wlen = 2 * h + 1
            j = jnp.arange(W)
            valid = j <= 2 * h
            if fast:
                index_raw = prims.matlab_round_i(pos * fs) + (j - h)
            else:
                base_time = (j - h).astype(dtype) / fs
                index_raw = prims.matlab_round_i((pos + base_time) * fs)
            wt = wlen.astype(dtype) / fs
            tmp = (index_raw.astype(dtype) - 1.0) / fs - pos
            mw = (0.42 + 0.5 * jnp.cos(2.0 * jnp.pi * tmp / wt)
                  + 0.08 * jnp.cos(4.0 * jnp.pi * tmp / wt))
            mw = jnp.where(valid, mw, 0.0)
            # diff window (stonemask.cpp:49-55); zero-padding makes the
            # generic centered difference reproduce both edge cases
            mw_p = jnp.concatenate([mw[1:], jnp.zeros(1, dtype)])
            mw_m = jnp.concatenate([jnp.zeros(1, dtype), mw[:-1]])
            dw = jnp.where(valid, -(mw_p - mw_m) / 2.0, 0.0)
            if fast:
                start = prims.matlab_round_i(pos * fs) - h - 1 + pad
                seg = jax.lax.dynamic_slice(xp, (start,), (W,))
            else:
                seg = jnp.take(x, jnp.clip(index_raw - 1, 0, L - 1),
                               mode="clip")
            spec_m = jnp.fft.rfft(seg * mw, B)
            spec_d = jnp.fft.rfft(seg * dw, B)
            power = jnp.real(spec_m) ** 2 + jnp.imag(spec_m) ** 2
            numer = (jnp.real(spec_m) * jnp.imag(spec_d)
                     - jnp.imag(spec_m) * jnp.real(spec_d))
            ks = jnp.arange(1, 7, dtype=dtype)
            idx1 = prims.matlab_round_i(f0i * B / fs * ks)
            t1 = _fix_f0(power, numer, idx1, 2, B, fs)
            ok1 = (t1 > 0.0) & (t1 <= f0i * 2.0)
            idx2 = prims.matlab_round_i(t1 * B / fs * ks)
            t2 = _fix_f0(power, numer, idx2, 6, B, fs)
            mean_f0 = jnp.where(ok1, t2, 0.0)
            # >20% correction -> keep the DIO value (stonemask.cpp:202)
            return jnp.where(jnp.abs(mean_f0 - f0i) / f0i > 0.2, f0i, mean_f0)

        # guard traced values for frames outside the bucket
        f0_safe = jnp.where(in_bucket, f0, 100.0)
        h_safe = jnp.where(in_bucket, half_w, W // 4)
        vals = jax.vmap(refine)(temporal_positions, f0_safe, h_safe)
        refined = jnp.where(in_bucket, vals, refined)

    gate = (f0 <= cfg.K_FLOOR_F0_STONEMASK) | (f0 > fs / 12.0)
    return jnp.where(gate, 0.0, refined)

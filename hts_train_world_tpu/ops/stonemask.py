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


def _stonemask_slab(x, fs: int, temporal_positions, f0, f0_floor: float,
                    f0_ceil: float, step: int):
    """Single-pass f32 StoneMask on the regular frame grid: per-frame
    slab rows (static slices, no gathers) + ONE worst-case-size DFT with
    bin-stride readout (DFT_Bmax[k*r] == DFT_{B_c}[k] for a window zero
    beyond its extent — the harvest-refine identity), replacing the
    5-bucket sweep that computed every frame once per bucket.  The IF
    readouts |sm|^2 and Im(conj(sm)sd) are offset-invariant, so the
    floating slab offset needs no phase correction."""
    from hts_train_world_tpu.ops import d4c as _d4c
    from hts_train_world_tpu.ops import fftmat as _fm
    dtype = x.dtype
    T = f0.shape[0]
    B_max = stonemask_buckets(fs, f0_floor, f0_ceil)[-1]
    half_max = B_max // 2
    h_cap = (B_max // 2 - 1) // 2
    pad_s = h_cap + 6
    W2 = -(-(2 * h_cap + 13) // 128) * 128
    slab = _d4c._slab_frames(x, T, step, pad_s, W2, dtype)
    C, S = _fm.rfft_mats(B_max, dtype)
    if W2 <= B_max:
        C, S = C[:W2], S[:W2]
    else:
        Ce, Se = _fm._rfft_mats_ext_np(B_max, W2)
        C, S = jnp.asarray(Ce, dtype), jnp.asarray(Se, dtype)
    mm_i = jnp.arange(W2)
    ks = jnp.arange(1, 7, dtype=dtype)
    k6 = jnp.arange(6)
    grid_base = jnp.arange(T, dtype=jnp.int32) * step

    gate = (f0 <= cfg.K_FLOOR_F0_STONEMASK) | (f0 > fs / 12.0)
    f0s = jnp.where(gate, 100.0, f0)

    def windows(row, pos, base, f0i):
        h = jnp.minimum((1.5 * fs / f0i + 1.0).astype(jnp.int32), h_cap)
        s0 = jnp.clip(prims.matlab_round_i(pos * fs) - base, -4, 4)
        d = s0 + pad_s - h - 1
        valid = (mm_i >= d) & (mm_i <= d + 2 * h)
        wlen = 2 * h + 1
        wt = wlen.astype(dtype) / fs
        tmp = (base - pad_s + mm_i).astype(dtype) / fs - pos
        mw = (0.42 + 0.5 * jnp.cos(2.0 * jnp.pi * tmp / wt)
              + 0.08 * jnp.cos(4.0 * jnp.pi * tmp / wt))
        mw = jnp.where(valid, mw, 0.0)
        mw_p = jnp.concatenate([mw[1:], jnp.zeros(1, dtype)])
        mw_m = jnp.concatenate([jnp.zeros(1, dtype), mw[:-1]])
        dw = jnp.where(valid, -(mw_p - mw_m) / 2.0, 0.0)
        e_c = jnp.floor(jnp.log((h * 2 + 1).astype(dtype))
                        / cfg.K_LOG2).astype(jnp.int32)
        bc = 4 * (1 << e_c)            # per-frame fft size
        return row * mw, row * dw, bc

    segm, segd, bc = jax.vmap(windows)(slab, temporal_positions,
                                       grid_base, f0s)
    smr, smi = _fm.mm(segm, C), _fm.mm(segm, S)
    sdr, sdi = _fm.mm(segd, C), _fm.mm(segd, S)
    power = smr * smr + smi * smi
    numer = smr * sdi - smi * sdr

    def fix(pw, nm, f0_seed, bc, n_harmonics):
        r = B_max // 4 // (bc // 4)
        idx_c = jnp.clip(prims.matlab_round_i(
            f0_seed * bc.astype(dtype) / fs * ks), 0, bc // 2)
        idx = idx_c * r
        p = jnp.take(pw, idx)
        n = jnp.take(nm, idx)
        inst = jnp.where(p == 0.0, 0.0,
                         idx_c.astype(dtype) * fs / bc.astype(dtype)
                         + n / p * fs / (2.0 * jnp.pi))
        amp = jnp.sqrt(p)
        mask = (k6 < n_harmonics).astype(dtype)
        num = jnp.sum(amp * inst * mask)
        den = jnp.sum(amp * ks * mask)
        return num / (den + cfg.K_MY_SAFE_GUARD_MINIMUM)

    def refine(pw, nm, f0i, bc):
        t1 = fix(pw, nm, f0i, bc, 2)
        ok1 = (t1 > 0.0) & (t1 <= f0i * 2.0)
        t2 = fix(pw, nm, t1, bc, 6)     # seed t1 like the bucket path
        mean_f0 = jnp.where(ok1, t2, 0.0)
        return jnp.where(jnp.abs(mean_f0 - f0i) / f0i > 0.2, f0i, mean_f0)

    refined = jax.vmap(refine)(power, numer, f0s, bc)
    return jnp.where(gate, 0.0, refined)


@partial(jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil",
                                   "grid_step"))
def stonemask(x, fs: int, temporal_positions, f0,
              f0_floor: float = cfg.K_FLOOR_F0,
              f0_ceil: float = cfg.K_CEIL_F0, grid_step: int = 0):
    """StoneMask (stonemask.cpp:211-217).  grid_step > 0 (f32): the
    temporal positions sit on the regular frame grid — use the
    single-pass slab + bin-stride formulation (_stonemask_slab)."""
    dtype = x.dtype
    L = x.shape[0]
    if dtype == jnp.float32 and grid_step > 0:
        return _stonemask_slab(x, fs, temporal_positions, f0, f0_floor,
                               f0_ceil, grid_step)
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

"""WORLD waveform synthesis — TPU-native reimplementation of
externs/WORLD_v2/src/synthesis.cpp (SURVEY.md N9).

Pitch-synchronous overlap-add of minimum-phase responses:
- time base: phase accumulation is a cumsum, pulse detection a wrapped-phase
  jump mask, compacted to a static max_pulses axis (synthesis.cpp:223-320);
- per pulse (vmap): linear frame interp of envelope/aperiodicity, periodic
  response = min-phase spectrum + fractional-delay linear phase + DC
  removal, aperiodic response = white-noise segment x min-phase spectrum
  (synthesis.cpp:38-221);
- OLA = scatter-add with dropped out-of-range indices (synthesis.cpp:378-383).

Reference quirks reproduced: the last pulse has noise_size 0 and contributes
nothing (synthesis.cpp:369-371 with GetNoiseSpectrum's zeroed buffer); the
DC remover *overwrites* the first half of the response (synthesis.cpp:73-82,
harmless because the min-phase response is causal).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims


def synthesis_stream_len(y_length: int) -> int:
    """Noise draws consumed <= y_length (sum of pulse gaps)."""
    return y_length + 16


def default_max_pulses(y_length: int, fs: int) -> int:
    # pulse rate = interpolated f0 <= f0_ceil (800) in voiced parts,
    # kDefaultF0 (500) in unvoiced parts; the end-of-contour linear
    # extrapolation can overshoot only within the last frame.  Slots
    # beyond the cap are masked, so the cap trades per-pulse compute
    # against headroom.
    return int(y_length * 810.0 / fs) + 80


def _time_base(f0, frame_period: float, fs: int, y_length: int,
               fft_size: int, exact_phase: bool):
    """GetTimeBase (synthesis.cpp:223-320): coarse f0/vuv -> sample-rate
    interpolation -> accumulated phase -> wrapped-phase jump mask.
    Returns (if0, ivuv, wrap, jump)."""
    dtype = f0.dtype
    T = f0.shape[0]
    fp = frame_period / 1000.0
    lowest_f0 = fs / fft_size + 1.0
    idxT = jnp.arange(T + 1, dtype=dtype)
    coarse_time = idxT * fp
    if exact_phase:
        # keep the multiply from contracting into downstream subtracts
        # (XLA FMA-fuses iota*const with (xi-x0), flipping ulp-sensitive
        # V/UV threshold decisions)
        coarse_time = jax.lax.optimization_barrier(coarse_time)
    cf0 = jnp.where(f0 < lowest_f0, 0.0, f0)
    cvuv = jnp.where(cf0 == 0.0, 0.0, 1.0)
    cf0 = jnp.concatenate([cf0, (cf0[-1] * 2 - cf0[-2])[None]])
    cvuv = jnp.concatenate([cvuv, (cvuv[-1] * 2 - cvuv[-2])[None]])
    time_axis = prims.exact_div(jnp.arange(y_length, dtype=dtype),
                                float(fs))
    if0 = prims.interp1(coarse_time, cf0, time_axis, exact=exact_phase)
    ivuv = prims.interp1(coarse_time, cvuv, time_axis, exact=exact_phase)
    ivuv = jnp.where(ivuv > 0.5, 1.0, 0.0)
    if0 = jnp.where(ivuv == 0.0, cfg.K_DEFAULT_F0, if0)
    if exact_phase:
        deltas = prims.exact_div(2.0 * jnp.pi * if0, float(fs))

        def acc(c, d):
            c = c + d
            return c, c
        _, total_phase = jax.lax.scan(acc, deltas[0] * 0.0, deltas,
                                      unroll=64)
    else:
        deltas = 2.0 * jnp.pi * if0 / fs
        total_phase = jnp.cumsum(deltas)
    wrap = jnp.mod(total_phase, 2.0 * jnp.pi)
    jump = jnp.abs(wrap[1:] - wrap[:-1]) > jnp.pi  # at sample i, i<y-1
    return if0, ivuv, wrap, jump


def count_pulses(f0, frame_period: float, fs: int, y_length: int,
                 fft_size: int):
    """Exact FAST-mode pulse count (jittable): the two-stage pulse
    bucket dispatch fetches this between the analysis and synthesis
    programs to size max_pulses (cf. harvest's width dispatch)."""
    _, _, _, jump = _time_base(f0, frame_period, fs, y_length, fft_size,
                               exact_phase=False)
    return jnp.sum(jump)


def _dc_remover(fft_size: int, dtype):
    """GetDCRemover (synthesis.cpp:322-334)."""
    half = fft_size // 2
    i = np.arange(half)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (i + 1.0) / (1.0 + fft_size))
    dc = np.sum(w) * 2.0
    w = w / dc
    return jnp.asarray(np.concatenate([w, w[::-1]]), dtype)


@partial(jax.jit, static_argnames=("fft_size", "frame_period", "fs",
                                   "y_length", "max_pulses", "exact_phase"))
def synthesis(f0, spectrogram, aperiodicity, fft_size: int,
              frame_period: float, fs: int, y_length: int, stream=None,
              max_pulses: int = 0, exact_phase: bool = True):
    """Synthesis (synthesis.cpp:338-397).  frame_period in ms.

    exact_phase: reproduce the C++'s strictly sequential phase
    accumulation (synthesis.cpp:248-255) with a left-fold scan.  Pulse
    positions are rounding-sensitive when f0*N/fs is integral (e.g. the
    500 Hz unvoiced default at 16 kHz lands crossings exactly on sample
    boundaries), so parallel cumsum can shift pulses by one sample.
    Fast mode (False) uses jnp.cumsum — preferred on TPU."""
    dtype = spectrogram.dtype
    T = f0.shape[0]
    N = fft_size
    half = N // 2
    fp = frame_period / 1000.0
    if not max_pulses:
        max_pulses = default_max_pulses(y_length, fs)
    if stream is None:
        stream = jnp.zeros(1, dtype)

    # ---- GetTimeBase (synthesis.cpp:223-320) ----
    if0, ivuv, wrap, jump = _time_base(f0, frame_period, fs, y_length,
                                       N, exact_phase)
    n_pulses = jnp.sum(jump)
    pidx = prims.compact_indices(jump, max_pulses, y_length - 2)
    p_valid = jnp.arange(max_pulses) < n_pulses
    y1 = jnp.take(wrap, pidx) - 2.0 * jnp.pi
    y2 = jnp.take(wrap, pidx + 1)
    time_shift = (-y1 / (y2 - y1)) / fs
    pulse_time = prims.exact_div(pidx.astype(dtype), float(fs))

    pidx_next = jnp.where(jnp.arange(max_pulses) + 1 < n_pulses,
                          jnp.roll(pidx, -1), pidx)
    noise_size = pidx_next - pidx
    noise_off = jnp.cumsum(noise_size) - noise_size

    dc_rm = _dc_remover(N, dtype)
    kj = jnp.arange(N)
    # zero-padded stream for contiguous noise slices (tail is masked)
    stream_p = jnp.concatenate([stream, jnp.zeros(N, dtype)])

    # fast mode trades the FFT path for MXU matmuls (ops/fftmat.py);
    # parity mode keeps jnp.fft to match the C++ rounding
    use_matmul = not exact_phase

    if use_matmul:
        # frame interpolation for ALL pulses as one interpolation-weight
        # matmul (two nonzeros per row) — MXU instead of per-pulse row
        # gathers; arithmetic identical (two-term lerp, exact zeros)
        pos_all = prims.exact_div(pulse_time, fp)
        fl_a = jnp.minimum(T - 1, jnp.floor(pos_all)).astype(jnp.int32)
        ce_a = jnp.minimum(T - 1, jnp.ceil(pos_all)).astype(jnp.int32)
        frac_a = (pos_all - jnp.floor(pos_all)).astype(dtype)
        tt = jnp.arange(T)
        same_a = (fl_a == ce_a)[:, None]
        Wfl = (tt[None, :] == fl_a[:, None]).astype(dtype)
        Wce = (tt[None, :] == ce_a[:, None]).astype(dtype)
        W = jnp.where(same_a, Wfl,
                      Wfl * (1.0 - frac_a)[:, None]
                      + Wce * frac_a[:, None])
        sp_env_all = fftmat.mm(W, jnp.abs(spectrogram))
        ap_all = fftmat.mm(W, jnp.clip(aperiodicity, 0.001,
                                       0.999999999999))
        apr_all = ap_all * ap_all
    else:
        sp_env_all = jnp.zeros((max_pulses, 1), dtype)
        apr_all = jnp.zeros((max_pulses, 1), dtype)

    def one_pulse(p_i, t_i, shift_i, ns, off, vuv_i, sp_env_in, apr_in):
        if use_matmul:
            sp_env, apr = sp_env_in, apr_in
        else:
            # frame interpolation (synthesis.cpp:140-178), parity order
            pos = prims.exact_div(t_i, fp)
            fl = jnp.minimum(T - 1, jnp.floor(pos)).astype(jnp.int32)
            ce = jnp.minimum(T - 1, jnp.ceil(pos)).astype(jnp.int32)
            frac = pos - jnp.floor(pos)
            sp0 = jnp.abs(spectrogram[fl])
            sp1 = jnp.abs(spectrogram[ce])
            same = fl == ce
            sp_env = jnp.where(same, sp0, (1.0 - frac) * sp0 + frac * sp1)
            ap0 = jnp.clip(aperiodicity[fl], 0.001, 0.999999999999)
            ap1 = jnp.clip(aperiodicity[ce], 0.001, 0.999999999999)
            apr = jnp.where(same, ap0,
                            (1.0 - frac) * ap0 + frac * ap1) ** 2

        # periodic response (synthesis.cpp:105-138)
        unvoiced = (vuv_i <= 0.5) | (apr[0] > 0.999)
        log_p = jnp.log(sp_env * (1.0 - apr)
                        + cfg.K_MY_SAFE_GUARD_MINIMUM) / 2.0
        coef = 2.0 * jnp.pi * shift_i * fs / N
        re2 = jnp.cos(coef * jnp.arange(half + 1, dtype=dtype))
        im2 = jnp.sqrt(1.0 - re2 * re2)
        if use_matmul:
            re, im = fftmat.minphase_matmul(log_p, N)
        else:
            mp = prims.minimum_phase_spectrum(log_p, N)
            re, im = jnp.real(mp), jnp.imag(mp)
        sre = re * re2 + im * im2
        sim = im * re2 - re * im2
        if use_matmul:
            per = prims.fftshift(fftmat.irfft_scaled_matmul(sre, sim, N))
        else:
            per = prims.fftshift(jnp.fft.irfft(sre + 1j * sim, N) * N)
        dc = jnp.sum(per[half:])
        per = jnp.where(kj < half, -dc * dc_rm, per - dc * dc_rm)
        per = jnp.where(unvoiced, 0.0, per)

        # aperiodic response (synthesis.cpp:38-68); the segment is
        # contiguous, so slice (values identical to the clip-gather: the
        # tail beyond ns is masked either way)
        noise = jnp.where(kj < ns,
                          jax.lax.dynamic_slice(stream_p, (off,), (N,)), 0.0)
        avg = jnp.sum(noise) / jnp.maximum(ns, 1)
        noise = jnp.where(kj < ns, noise - avg, 0.0)
        tiny = prims.tiny_floor(dtype)  # f32 guard; no-op in f64 parity
        log_a = jnp.where(vuv_i != 0.0,
                          jnp.log(jnp.maximum(sp_env * apr, tiny)) / 2.0,
                          jnp.log(jnp.maximum(sp_env, tiny)) / 2.0)
        if use_matmul:
            nre, nim = fftmat.rfft_matmul(noise, N)
            are, aim = fftmat.minphase_matmul(log_a, N)
            pre = are * nre - aim * nim
            pim = are * nim + aim * nre
            aper = prims.fftshift(fftmat.irfft_scaled_matmul(pre, pim, N))
        else:
            nspec = jnp.fft.rfft(noise)
            mpa = prims.minimum_phase_spectrum(log_a, N)
            aper = prims.fftshift(jnp.fft.irfft(mpa * nspec, N) * N)

        return (per * jnp.sqrt(ns.astype(dtype)) + aper) / N

    responses = jax.vmap(one_pulse)(
        pidx, pulse_time, time_shift, noise_size, noise_off,
        jnp.take(ivuv, pidx), sp_env_all, apr_all)
    responses = jnp.where((p_valid & (noise_size > 0))[:, None],
                          responses, 0.0)

    # ---- OLA (synthesis.cpp:378-383) ----
    if not exact_phase:
        # fast mode: chunk-aligned OLA.  Each pulse's N-wide response
        # lands in exactly two N-chunks of the (half-shifted) output;
        # place it in a (2N,) row at offset (start mod N), row-scatter-add
        # by chunk id (contiguous rows beat the elementwise scatter ~5x),
        # then fold the chunk halves with static shifts.
        start = pidx + 1            # output position + half (always >= 1)
        n_chunks = (y_length + half) // N + 2
        chunk = jnp.where(p_valid, start // N, n_chunks + 4)
        o = start % N
        rows = jax.vmap(lambda r, oi: jax.lax.dynamic_update_slice(
            jnp.zeros(2 * N, dtype), r, (oi,)))(responses, o)
        # chunk-sum as a one-hot matmul: n_chunks is small (~y/N), so the
        # (n_chunks, P) @ (P, 2N) contraction rides the MXU and beats the
        # row scatter-add ~5x
        onehot = (chunk[None, :] == jnp.arange(n_chunks)[:, None]) \
            .astype(dtype)
        from hts_train_world_tpu.ops import fftmat as _fm
        R = _fm.mm(onehot, rows)
        first, second = R[:, :N], R[:, N:]
        yp = (jnp.pad(first, ((0, 1), (0, 0)))
              + jnp.pad(second, ((1, 0), (0, 0)))).reshape(-1)
        return jax.lax.dynamic_slice(yp, (half,), (y_length,))
    out_idx = pidx[:, None] + kj[None, :] - half + 1
    # negative / invalid indices must be dropped, not wrapped: push them
    # past the end where mode="drop" discards them (synthesis.cpp:381 skips)
    out_idx = jnp.where((out_idx < 0) | ~p_valid[:, None], y_length, out_idx)
    y = jnp.zeros(y_length, dtype)
    y = y.at[out_idx.reshape(-1)].add(responses.reshape(-1), mode="drop")
    return y

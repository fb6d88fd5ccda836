"""CheapTrick spectral-envelope estimation — TPU-native reimplementation of
externs/WORLD_v2/src/cheaptrick.cpp (SURVEY.md N7).

The reference's per-frame loop (cheaptrick.cpp:216-223) becomes a vmap over
frames around a fixed fft_size; the F0-adaptive gather uses clipped indices
on zero-masked padded windows.  The reference's reproducible noise
(randn()*1e-12 into the windowed waveform, |randn()|*eps onto the smoothed
spectrum; consumed in strict frame order after randn_reseed,
cheaptrick.cpp:205,128,150) is threaded in as explicit per-frame arrays
built from the exact PRNG stream by cheaptrick_noise().
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims


def _max_f0(fs: int) -> float:
    # voiced f0 <= fs/12 after StoneMask; unvoiced frames use kDefaultF0;
    # raw DIO can reach f0_ceil.  Static bound for mask sizes.
    return max(fs / 12.0, cfg.K_DEFAULT_F0, cfg.K_CEIL_F0)


def cheaptrick_stream_len(f0_length: int, fft_size: int) -> int:
    """Upper bound on PRNG draws consumed (window 2h+1 <= N-2, plus
    N/2+1 spectral draws per frame)."""
    return f0_length * (fft_size - 1 + fft_size // 2 + 1) + 16


def cheaptrick_noise(f0, fs: int, fft_size: int, stream):
    """Slice the reseeded randn stream into per-frame (window, spectrum)
    noise exactly as the C++ consumes it."""
    dtype = stream.dtype
    half_spec = fft_size // 2 + 1
    f0_floor = cfg.cheaptrick_f0_floor(fs, fft_size)
    cf0 = jnp.where(f0 <= f0_floor, cfg.K_DEFAULT_F0, f0)
    h = prims.matlab_round_i(1.5 * fs / cf0)
    counts = 2 * h + 1 + half_spec
    off = jnp.cumsum(counts) - counts
    j = jnp.arange(fft_size)
    win_idx = off[:, None] + j[None, :]
    win_valid = j[None, :] <= 2 * h[:, None]
    noise_win = jnp.where(
        win_valid, jnp.take(stream, win_idx, mode="clip"),
        jnp.zeros((), dtype))
    spec_idx = (off + 2 * h + 1)[:, None] + jnp.arange(half_spec)[None, :]
    noise_spec = jnp.take(stream, spec_idx, mode="clip")
    return noise_win, noise_spec


@partial(jax.jit, static_argnames=("fs", "fft_size", "q1", "grid_step"))
def cheaptrick(x, fs: int, temporal_positions, f0, fft_size: int = 0,
               q1: float = -0.15, noise_win=None, noise_spec=None,
               grid_step: int = 0):
    """CheapTrick (cheaptrick.cpp:200-228) -> spectrogram (T, N/2+1).

    grid_step > 0 (fast mode only, noise_win=None) promises
    temporal_positions sit on the regular frame grid and enables the
    SLAB formulation (see ops/d4c.py): regular frame slabs from static
    slices, the F0-adaptive Hann window floating inside its row via
    elementwise masks, and the power spectrum via the offset-invariant
    mod-N DFT matmul — no per-frame gathers or dynamic slices."""
    dtype = x.dtype
    L = x.shape[0]
    N = fft_size or cfg.cheaptrick_fft_size(fs)
    half = N // 2
    f0_floor = cfg.cheaptrick_f0_floor(fs, N)
    fmax = _max_f0(fs)
    ul_max = 2 + int(fmax * N / fs) + 1
    b_max = int(fmax * 2.0 / 3.0 * N / fs) + 1

    cf0 = jnp.where(f0 <= f0_floor, cfg.K_DEFAULT_F0, f0)
    use_slab = (noise_win is None and dtype == jnp.float32
                and grid_step > 0 and N <= fftmat.MATMUL_FFT_LIMIT)
    if noise_win is None:
        noise_win = jnp.zeros((f0.shape[0], N), dtype)
    if noise_spec is None:
        noise_spec = jnp.zeros((f0.shape[0], half + 1), dtype)

    # quefrency-domain lifters (cheaptrick.cpp:28-37), f0-dependent per frame
    q = jnp.arange(half + 1, dtype=dtype) / fs
    # float32 fast path: the per-frame rffts and the smoothing-recovery
    # chain run as MXU matmuls (ops/fftmat.py); f64 keeps jnp.fft parity
    use_matmul = dtype == jnp.float32 and N <= fftmat.MATMUL_FFT_LIMIT

    # fast mode: window gather as one contiguous dynamic_slice from an
    # edge-padded x (padding replicates x[0]/x[-1] = clip semantics)
    if dtype == jnp.float32:
        pad = int(1.5 * fs / cfg.cheaptrick_f0_floor(fs, N) + 0.5) + 2
        xp = jnp.concatenate([
            jnp.full((pad,), x[0], dtype), x,
            jnp.full((pad + N,), x[-1], dtype)])
    else:
        xp, pad = None, 0

    if use_slab:
        from hts_train_world_tpu.ops import d4c as _d4c
        T = f0.shape[0]
        h_cap = int(1.5 * fs / f0_floor + 0.5) + 1
        pad_s = h_cap + 2
        wl2 = -(-(2 * h_cap + 5) // 128) * 128
        slab = _d4c._slab_frames(x, T, grid_step, pad_s, wl2, dtype)
        grid_base = jnp.arange(T, dtype=jnp.int32) * grid_step
        s_reg = jnp.clip(
            prims.matlab_round_i(temporal_positions * fs + 0.001)
            - grid_base, -2, 2)

    def slab_wave(row, s, f0i):
        h = jnp.minimum(prims.matlab_round_i(1.5 * fs / f0i), h_cap)
        m = jnp.arange(wl2)
        c = pad_s + s
        d = c - h
        valid = (m >= d) & (m <= d + 2 * h)
        position = (m - c).astype(dtype) / 1.5 / fs
        w = 0.5 * jnp.cos(jnp.pi * position * f0i) + 0.5
        w = jnp.where(valid, w, 0.0)
        w = w / jnp.sqrt(jnp.sum(w * w))
        wave = jnp.where(valid, row * w, 0.0)
        coef = jnp.sum(wave) / jnp.sum(w)
        return jnp.where(valid, wave - w * coef, 0.0)

    def frame(pos, f0i, nw, ns, swave):
        if use_slab:
            wave = swave
        else:
            h = prims.matlab_round_i(1.5 * fs / f0i)
            j = jnp.arange(N)
            valid = j <= 2 * h
            base_index = j - h
            origin = prims.matlab_round_i(pos * fs + 0.001)
            position = base_index.astype(dtype) / 1.5 / fs
            w = 0.5 * jnp.cos(jnp.pi * position * f0i) + 0.5
            w = jnp.where(valid, w, 0.0)
            w = w / jnp.sqrt(jnp.sum(w * w))
            if xp is not None:
                seg = jax.lax.dynamic_slice(xp, (origin - h + pad,), (N,))
            else:
                seg = jnp.take(x, jnp.clip(origin + base_index, 0, L - 1),
                               mode="clip")
            wave = jnp.where(valid, seg * w
                             + nw * cfg.K_MY_SAFE_GUARD_MINIMUM, 0.0)
            coef = jnp.sum(wave) / jnp.sum(w)
            wave = jnp.where(valid, wave - w * coef, 0.0)

        if use_slab:
            ps = fftmat.rfft_power_matmul(wave, N)  # mod-N beyond N
        elif use_matmul:
            # measured: identical f32 accuracy to jnp.fft on this input
            # class (the f32/f64 divergence at deep nulls is inherent to
            # the 32-bit dynamic range, with or without matmul)
            sre, sim = fftmat.rfft_matmul(wave, N)
            ps = sre * sre + sim * sim
        else:
            spec = jnp.fft.rfft(wave)
            ps = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        ps = prims.dc_correction(ps, f0i, fs, N, ul_max)
        ps = prims.linear_smoothing(ps, f0i * 2.0 / 3.0, fs, N, b_max)
        ps = ps + jnp.abs(ns) * cfg.K_EPS  # AddInfinitesimalNoise
        if dtype == jnp.float32:
            # fast path: f32 smoothing cancellation makes valleys below
            # ~1e-7 of the frame peak meaningless (or negative).  Floor
            # RELATIVE to the peak: an absolute tiny floor puts
            # log(denormal) ~ -85 spikes into log_ps, and the cepstral
            # lifter rings them into e^{+-60} envelope blowups on
            # deep-null signals (caught by tests/test_fast_stress.py).
            ps = jnp.maximum(ps, jnp.maximum(jnp.max(ps) * 1e-7,
                                             prims.tiny_floor(dtype)))
        else:
            # unreachable guard in the f64 parity path
            ps = jnp.maximum(ps, prims.tiny_floor(dtype))

        # SmoothingWithRecovery (cheaptrick.cpp:22-57)
        qf = jnp.pi * f0i * q
        sl = jnp.where(jnp.arange(half + 1) == 0, 1.0, jnp.sin(qf) / qf)
        cl = (1.0 - 2.0 * q1) + 2.0 * q1 * jnp.cos(2.0 * jnp.pi * q * f0i)
        log_ps = jnp.log(ps)
        if use_matmul:
            creal = fftmat.mm(log_ps, fftmat.sym_rfft_real_mat(N, dtype))
            spec2 = creal * sl * cl / N
            A, _ = fftmat.irfft_half_mats(N, dtype)
            return jnp.exp(fftmat.mm(spec2, A))
        sym = jnp.concatenate([log_ps, log_ps[-2:0:-1]])
        C = jnp.conj(jnp.fft.rfft(sym))  # wrapper negates imag (fft.cpp:57)
        spec2 = jnp.real(C) * sl * cl / N  # imag forced to 0 (cheaptrick.cpp:48)
        wave2 = jnp.fft.irfft(spec2.astype(C.dtype), N) * N
        return jnp.exp(wave2[:half + 1])

    if use_slab:
        waves = jax.vmap(slab_wave)(slab, s_reg, cf0)
        return jax.vmap(frame)(temporal_positions, cf0, noise_win,
                               noise_spec, waves)
    return jax.vmap(lambda pos, f0i, nw, ns: frame(pos, f0i, nw, ns, None))(
        temporal_positions, cf0, noise_win, noise_spec)

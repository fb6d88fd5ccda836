"""Spectral/aperiodicity codec + SPTK warping — TPU-native reimplementation
of externs/WORLD_v2/src/codec.cpp (SURVEY.md N11) and the mgc2sp path of
test/sptkfunctions.cpp (N15) used by the synth CLI.

Everything here is linear algebra on fixed axes, so the per-frame work is
precomputed into gather tables and dense matrices (numpy, float64, cached
per (fs, fft_size)) and executed as batched matmuls — MXU-friendly by
construction:
- mel-warped DCT coding  = gather-lerp + (T,M)@(M,D) matmul
- decoding               = (T,D)@(D,M) matmul + gather-lerp + exp
- freqt frequency warping (sptkfunctions.cpp:596-631) = (T,m+1)@(m+1,M+1)

The C++ consumes these through per-frame FFTs (codec.cpp:73-115); the
matrices are built from the same trigonometric identities, exact to f64
rounding.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg


def _mel(f):
    return cfg.K_M0 * np.log(f / cfg.K_F0 + 1.0)


def _mel_to_freq(m):
    return cfg.K_F0 * (np.exp(m / cfg.K_M0) - 1.0)


def _interp_table(x, xi):
    """interp1 gather/weight tables on static axes (histc semantics:
    k = #(x <= xi) clipped to [1, len(x)-1]; linear w/ extrapolation)."""
    k = np.clip(np.searchsorted(x, xi, side="right"), 1, len(x) - 1)
    s = (xi - x[k - 1]) / (x[k] - x[k - 1])
    return k.astype(np.int32), s


@functools.lru_cache(maxsize=None)
def _coding_tables(fs: int, fft_size: int, n_dims: int):
    """GetParametersForCoding (codec.cpp:162-180) + DCTForCodec (:73-88)."""
    M = fft_size // 2
    floor_mel = _mel(cfg.K_FLOOR_FREQUENCY)
    ceil_mel = _mel(min(fs / 2.0, cfg.K_CEIL_FREQUENCY))
    mel_axis = (ceil_mel - floor_mel) * np.arange(M) / M + floor_mel
    # frequency axis in mel; the C leaves entry M uninitialized
    # (codec.cpp:178-179 fills only i < M) but never consults it for these
    # axes — use +inf as the sentinel.
    fm = np.empty(M + 1)
    fm[:M] = _mel(np.arange(M) * fs / fft_size)  # mel(0) = 0 exactly
    fm[M] = np.inf
    k, s = _interp_table(fm, mel_axis)

    # DCT matrix: waveform[i]=ms[2i], waveform[i+M/2]=ms[M-2i-1]; rfft(M);
    # mc_k = Re(S_k * w_k)/sqrt(M), w_k = 2 e^{i k pi/N}/sqrt(N), w_0 /= sqrt2
    sigma = np.empty(M, dtype=np.int64)
    i = np.arange(M // 2)
    sigma[2 * i] = i
    sigma[M - 2 * i - 1] = i + M // 2
    kk = np.arange(n_dims)[:, None]
    ang = kk * np.pi / fft_size - 2.0 * np.pi * kk * sigma[None, :] / M
    D = 2.0 * np.cos(ang) / math.sqrt(fft_size * M)
    D[0] /= math.sqrt(2.0)
    # cache NUMPY, not device arrays: jnp.asarray inside a jit trace
    # yields a tracer, and lru_cache would leak it into later traces
    return k, s, np.ascontiguousarray(D.T)  # (M,D)


@functools.lru_cache(maxsize=None)
def _decoding_tables(fs: int, fft_size: int, n_dims: int):
    """GetParametersForDecoding (codec.cpp:185-208) + IDCTForCodec (:93-115)."""
    M = fft_size // 2
    floor_mel = _mel(cfg.K_FLOOR_FREQUENCY)
    ceil_mel = _mel(min(fs / 2.0, cfg.K_CEIL_FREQUENCY))
    # mel axis in Hz with 0 / fs/2 endpoints; mel_spectrum gets duplicated
    # boundary values (DecodeOneFrame, codec.cpp:147-148)
    mel_axis_hz = np.empty(M + 2)
    mel_axis_hz[1:M + 1] = _mel_to_freq(
        (ceil_mel - floor_mel) * np.arange(M) / M + floor_mel)
    mel_axis_hz[0] = 0.0
    mel_axis_hz[M + 1] = fs / 2.0
    freq_axis = np.arange(fft_size // 2 + 1) * fs / fft_size
    k, s = _interp_table(mel_axis_hz, freq_axis)

    # IDCT: in_k = mc_k * w2_k * sqrt(M) (conj), backward c2c (=M*ifft),
    # ms[2i]=Re(out[i]), ms[2i+1]=Re(out[M-1-i])
    sigma = np.empty(M, dtype=np.int64)
    i = np.arange(M // 2)
    sigma[2 * i] = i
    sigma[2 * i + 1] = M - 1 - i
    kk = np.arange(n_dims)[None, :]
    # in_k = mc_k sqrt(N) sqrt(M) e^{-i k pi/N}; the wrapper's backward c2c
    # (fft.cpp:36-46) is out_n = sum_k conj(in_k) e^{+2 pi i n k / M} — note
    # the conjugation of the coefficients, not a plain M*ifft
    ang = 2.0 * np.pi * sigma[:, None] * kk / M + kk * np.pi / fft_size
    Dinv = math.sqrt(fft_size * M) * np.cos(ang)
    Dinv[:, 0] /= math.sqrt(2.0)
    return k, s, np.ascontiguousarray(Dinv.T)  # (D,M)  (numpy; see above)


def _gather_lerp(vals, k, s):
    """vals: (..., X); tables map to output axis via y[k-1]+s*(y[k]-y[k-1])."""
    v0 = jnp.take(vals, k - 1, axis=-1)
    v1 = jnp.take(vals, jnp.minimum(k, vals.shape[-1] - 1), axis=-1)
    return v0 + s * (v1 - v0)


def code_spectral_envelope(spectrogram, fs: int, fft_size: int, n_dims: int):
    """CodeSpectralEnvelope (codec.cpp:266-295): log -> mel interp -> DCT."""
    k, s, D = (jnp.asarray(a) for a in _coding_tables(fs, fft_size, n_dims))
    mel_sp = _gather_lerp(jnp.log(spectrogram), k, s)
    from hts_train_world_tpu.ops import fftmat as _fm
    return _fm.mm(mel_sp, D.astype(spectrogram.dtype))


def decode_spectral_envelope(coded, fs: int, fft_size: int, n_dims: int):
    """DecodeSpectralEnvelope (codec.cpp:297-324): IDCT -> Hz interp ->
    exp(x / (fft_size/2))."""
    k, s, Dinv = (jnp.asarray(a)
                  for a in _decoding_tables(fs, fft_size, n_dims))
    from hts_train_world_tpu.ops import fftmat as _fm
    mel_sp = _fm.mm(coded, Dinv.astype(coded.dtype))   # (T, M)
    # boundary duplication: mel_spectrum[0]=ms[0], [M+1]=ms[M-1]
    padded = jnp.concatenate(
        [mel_sp[..., :1], mel_sp, mel_sp[..., -1:]], axis=-1)
    sp = _gather_lerp(padded, k, s)
    return jnp.exp(sp / (fft_size // 2))


def code_aperiodicity(aperiodicity, fs: int, fft_size: int):
    """CodeAperiodicity (codec.cpp:217-235): dB + interp1Q down to the
    3 kHz coarse bands."""
    n_ap = cfg.number_of_aperiodicities(fs)
    coarse_hz = cfg.K_FREQUENCY_INTERVAL * (np.arange(n_ap) + 1.0)
    delta = fs / fft_size
    base = (coarse_hz / delta).astype(np.int64)
    fracs = coarse_hz / delta - base
    log_ap = 20.0 * jnp.log10(aperiodicity)
    v0 = jnp.take(log_ap, jnp.asarray(base), axis=-1)
    v1 = jnp.take(log_ap, jnp.asarray(
        np.minimum(base + 1, fft_size // 2)), axis=-1)
    return v0 + (v1 - v0) * jnp.asarray(fracs, aperiodicity.dtype)


def decode_aperiodicity(coded, fs: int, fft_size: int):
    """DecodeAperiodicity (codec.cpp:237-264) with the CheckVUV gate."""
    n_ap = coded.shape[-1]
    dtype = coded.dtype
    coarse_axis = np.concatenate([
        np.arange(n_ap + 1) * cfg.K_FREQUENCY_INTERVAL, [fs / 2.0]])
    freq_axis = np.arange(fft_size // 2 + 1) * fs / fft_size
    k, s = _interp_table(coarse_axis, freq_axis)
    vals = jnp.concatenate([
        jnp.full(coded.shape[:-1] + (1,), -60.0, dtype), coded,
        jnp.full(coded.shape[:-1] + (1,), -cfg.K_MY_SAFE_GUARD_MINIMUM,
                 dtype)], axis=-1)
    ap = 10.0 ** (_gather_lerp(vals, jnp.asarray(k), jnp.asarray(s)) / 20.0)
    voiced = jnp.mean(coded, axis=-1) > -0.5  # CheckVUV, codec.cpp:31-41
    default = jnp.asarray(1.0 - cfg.K_MY_SAFE_GUARD_MINIMUM, dtype)
    return jnp.where(voiced[..., None], default, ap)


# ---------------------------------------------------------------------------
# SPTK freqt / mgc2sp (the synth CLI's asymmetric bap decode path)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def freqt_matrix(m1: int, m2: int, a: float):
    """freqt (sptkfunctions.cpp:596-631) as a (m1+1, m2+1) matrix.

    The recursion is linear in c1; columns are built by running it on unit
    vectors with the exact C update order (d = old g; g[j] uses new g[j-1])."""
    b = 1.0 - a * a
    T = np.zeros((m1 + 1, m2 + 1))
    for u in range(m1 + 1):
        c1 = np.zeros(m1 + 1)
        c1[u] = 1.0
        g = np.zeros(m2 + 1)
        for i in range(-m1, 1):
            d = g.copy()
            gn = np.empty(m2 + 1)
            gn[0] = c1[-i] + a * d[0]
            if m2 >= 1:
                gn[1] = b * d[0] + a * d[1]
            for j in range(2, m2 + 1):
                gn[j] = d[j - 1] + a * (d[j] - gn[j - 1])
            g = gn
        T[u] = g
    return T  # numpy: cached tables must not hold traced constants


def mgc2sp_real(mgc, alpha: float, fft_size: int):
    """mgc2sp with gamma=0 (sptkfunctions.cpp:186-219): freqt to a plain
    cepstrum (alpha -> -alpha composite), then the real part of its FFT
    (c2sp, :256-274).  Returns (T, fft_size/2+1) log-amplitude values."""
    m = mgc.shape[-1] - 1
    M = fft_size // 2
    T = freqt_matrix(m, M, -alpha).astype(mgc.dtype)
    c = mgc @ T  # (T, M+1)
    # Re(FFT) = sum c_k cos(2 pi j k / fft_size)
    spec = jnp.fft.rfft(c, fft_size, axis=-1)
    return jnp.real(spec)

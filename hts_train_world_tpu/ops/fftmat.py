"""Small FFTs as MXU matmuls.

XLA's TPU FFT runs far from peak for the small (<=4 k) per-frame/per-pulse
transforms that dominate synthesis, while 128x128-systolic matmuls run at
~peak.  For fixed small N it is faster to spend more FLOPs on a dense
(N/2+1)-square matmul than fewer FLOPs on the FFT path — the classic
TPU-first tradeoff (see the repo README's design notes).

Provides cached operator matrices:
- rfft_mats(N):   x (.., N)       -> (Re, Im) of rfft          2 matmuls
- irfft_mats(N):  (Re, Im) spec   -> irfft(X) * N (WORLD c2r)  2 matmuls
- minphase_mats(N): log|S| half   -> (Re, Im) of log-min-phase spectrum
  (the linear part of prims.minimum_phase_spectrum: mirror -> rfft ->
  conj-fold -> fft, all linear; exp applied by the caller)   2 matmuls

All matrices are built in float64 numpy from the same conventions the
parity kernels use and gated against jnp.fft in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# All operator matmuls pin f32 precision: the TPU default is single-pass
# bf16, which triples the fast path's envelope error (median |d log sp|
# 0.067 vs 0.020 vs true-f32 CPU) for no measurable speedup at these
# shapes (tools/ablate_precision.py on the chip: 692 vs 622 ms/batch).
HI = jax.lax.Precision.HIGHEST


def mm(x, M):
    """Matmul at pinned f32 precision (see module note)."""
    return jnp.matmul(x, M, precision=HI)

# f32 fast paths run per-frame DFTs as MXU matmuls up to this size; above
# it they fall back to XLA's FFT.  4096 covers the 48 kHz CheapTrick/D4C/
# LoveTrain sizes (cheaptrick.cpp:191-194, d4c.cpp:344-346) where XLA's
# TPU FFT is ~4x off matmul pace.  Shared here so cheaptrick/d4c/harvest
# can't silently diverge.
MATMUL_FFT_LIMIT = 4096


@functools.lru_cache(maxsize=None)
def _rfft_mats_np(N: int):
    k = np.arange(N // 2 + 1)
    n = np.arange(N)
    ang = -2.0 * np.pi * np.outer(n, k) / N
    return np.cos(ang), np.sin(ang)  # (N, half+1)


def rfft_mats(N: int, dtype=jnp.float32):
    C, S = _rfft_mats_np(N)
    return jnp.asarray(C, dtype), jnp.asarray(S, dtype)


@functools.lru_cache(maxsize=None)
def _rfft_mats_ext_np(N: int, L: int):
    """DFT-N basis periodically extended to L > N time rows:
    sum_m x_m e^{-2pi i k m / N} — the exact mod-N DFT of a sequence
    laid out at an arbitrary offset (used by the slab formulations
    where the window floats inside a wider regular frame)."""
    k = np.arange(N // 2 + 1)
    m = np.arange(L)
    ang = -2.0 * np.pi * np.outer(m, k) / N
    return np.cos(ang), np.sin(ang)


def rfft_matmul(x, N: int):
    """x (..., L) -> (Re, Im) each (..., N/2+1).  L <= N means implied
    zero padding; L > N means periodic (mod-N) time indexing — the
    result is the true DFT times a unit phase e^{-2pi i k d/N} when the
    content sits at offset d, so power spectra and cross-products of
    same-offset transforms are exact."""
    L = x.shape[-1]
    if L <= N:
        C, S = rfft_mats(N, x.dtype)
        return mm(x, C[:L]), mm(x, S[:L])
    C, S = _rfft_mats_ext_np(N, L)
    return (mm(x, jnp.asarray(C, x.dtype)),
            mm(x, jnp.asarray(S, x.dtype)))


@functools.lru_cache(maxsize=None)
def _irfft_mats_np(N: int):
    # irfft(X)*N = sum_k w_k (Re X_k cos(2pi nk/N) - Im X_k sin(2pi nk/N))
    # with w_0 = w_{N/2} = 1, else 2  (real-even expansion), no 1/N since
    # the WORLD c2r convention is unnormalized
    half = N // 2
    k = np.arange(half + 1)
    n = np.arange(N)
    w = np.where((k == 0) | (k == half), 1.0, 2.0)
    ang = 2.0 * np.pi * np.outer(k, n) / N
    A = (w[:, None] * np.cos(ang))          # (half+1, N) for Re
    B = (-w[:, None] * np.sin(ang))         # (half+1, N) for Im
    return A, B


def irfft_mats(N: int, dtype=jnp.float32):
    A, B = _irfft_mats_np(N)
    return jnp.asarray(A, dtype), jnp.asarray(B, dtype)


def irfft_scaled_matmul(re, im, N: int):
    """(Re, Im) (..., N/2+1) -> irfft(X) * N  (..., N)."""
    A, B = irfft_mats(N, re.dtype)
    return mm(re, A) + mm(im, B)


@functools.lru_cache(maxsize=None)
def _minphase_mats_np(N: int):
    half = N // 2
    eye = np.eye(half + 1)
    # mirror: (N, half+1)
    sym = np.concatenate([eye, eye[-2:0:-1]], axis=0)
    C = np.conj(np.fft.rfft(sym, axis=0))            # (half+1, half+1)
    scale = np.where((np.arange(half + 1) == 0)
                     | (np.arange(half + 1) == half), 1.0, 2.0)
    ceps = C * scale[:, None]                        # fold
    cep_full = np.concatenate(
        [ceps, np.zeros((N - half - 1, half + 1), complex)], axis=0)
    D = np.fft.fft(cep_full, axis=0)[:half + 1] / N  # (half+1, half+1)
    # operator acts on log_half from the right: out = M @ ls
    return np.ascontiguousarray(D.real.T), np.ascontiguousarray(D.imag.T)


def minphase_mats(N: int, dtype=jnp.float32):
    R, I = _minphase_mats_np(N)
    return jnp.asarray(R, dtype), jnp.asarray(I, dtype)


def minphase_matmul(log_half, N: int):
    """log_half (..., N/2+1) -> (Re, Im) of the min-phase spectrum
    exp(D): returns exp(re)*cos(im), exp(re)*sin(im)."""
    R, I = minphase_mats(N, log_half.dtype)
    dre = mm(log_half, R)
    dim = mm(log_half, I)
    mag = jnp.exp(dre)
    return mag * jnp.cos(dim), mag * jnp.sin(dim)


@functools.lru_cache(maxsize=None)
def _sym_rfft_real_mat_np(N: int):
    half = N // 2
    eye = np.eye(half + 1)
    sym = np.concatenate([eye, eye[-2:0:-1]], axis=0)   # (N, half+1)
    return np.ascontiguousarray(np.fft.rfft(sym, axis=0).real.T)


def sym_rfft_real_mat(N: int, dtype=jnp.float32):
    """Linear map log-half-spectrum -> Re(rfft(mirrored)), (h+1, h+1)."""
    return jnp.asarray(_sym_rfft_real_mat_np(N), dtype)


@functools.lru_cache(maxsize=None)
def _irfft_half_mats_np(N: int):
    A, B = _irfft_mats_np(N)
    half = N // 2
    return (np.ascontiguousarray(A[:, :half + 1]),
            np.ascontiguousarray(B[:, :half + 1]))


def irfft_half_mats(N: int, dtype=jnp.float32):
    """irfft(X)*N restricted to the first N/2+1 output samples."""
    A, B = _irfft_half_mats_np(N)
    return jnp.asarray(A, dtype), jnp.asarray(B, dtype)


def rfft_power_matmul(x, N: int):
    """|rfft(x, N)|^2 via matmuls; x (..., L).  L <= N = zero-padding
    semantics; L > N = mod-N indexing (power is offset-invariant, see
    rfft_matmul)."""
    re, im = rfft_matmul(x, N)
    return re * re + im * im

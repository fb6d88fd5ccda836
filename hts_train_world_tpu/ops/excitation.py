"""SPTK-excitation vocoder branch — gen_wave's non-STRAIGHT/non-WORLD
path (Training.pl:2873-2899): pitch-synchronous mixed excitation through
the MGLSA synthesis filter.

Reference command chain per utterance:
  SOPR -magic -1e10 -EXP -INV -m sr -MAGIC 0   lf0 -> pitch period (samp)
  EXCITE -n -p shift           pulse train (sqrt-period amp) / Gauss noise
  DFS -b lowpass / highpass    makefilter.pl mixed-excitation band split
  VOPR -a                      voiced-low + unvoiced-high = excitation
  MGLSADF -P 7 -m M-1 -p shift -a fw -c gm     synthesis filter
  X2X +fs                      float -> short

TPU-native design: EXCITE's per-sample pulse phase accumulator is a
cumsum formulation (pulse positions are threshold crossings of the
integrated instantaneous frequency); the band-split FIRs are
convolutions; and the MGLSA filter is applied per frame through its
EXACT transfer function H = exp(F(e^jw)) (mgc2sp) with windowed
overlap-add — SPTK's MGLSADF realizes the same H through a Pade(7)
approximation per sample, so the frequency-domain form is both faithful
and batched (big FFTs on the MXU instead of a serial per-sample IIR).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = -1.0e10


def lf0_to_pitch(lf0, sr: int):
    """SOPR -magic -1.0E+10 -EXP -INV -m sr -MAGIC 0.0: per-frame pitch
    period in samples (0 = unvoiced).  lf0: (T,) with MAGIC unvoiced."""
    lf0 = jnp.asarray(lf0)
    return jnp.where(lf0 == MAGIC, 0.0, sr / jnp.exp(lf0))


def _per_sample_pitch(pitch, shift: int):
    """EXCITE's linear inter-frame interpolation of the period, one value
    per output sample ((T-1)*shift samples; excite interpolates between
    consecutive frames)."""
    pitch = jnp.asarray(pitch)
    T = pitch.shape[0]
    n = (T - 1) * shift
    pos = jnp.arange(n) / shift
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 2)
    frac = pos - i0
    p0 = jnp.take(pitch, i0)
    p1 = jnp.take(pitch, i0 + 1)
    # a frame boundary into/out of unvoiced does not interpolate through 0
    both = (p0 > 0) & (p1 > 0)
    return jnp.where(both, p0 + (p1 - p0) * frac, p0)


def excite(pitch, shift: int, key=None, noise=None):
    """SPTK excite -n -p shift: voiced samples emit a pulse of amplitude
    sqrt(period) each time the accumulated phase (1/period per sample)
    wraps; unvoiced samples are unit-variance Gaussian noise.

    The serial phase accumulator becomes a cumsum: phase(t) = cumsum of
    instantaneous frequency (0 in unvoiced runs, reset at voicing onsets
    by subtracting the running value at the run start); a pulse fires
    where floor(phase) increments."""
    p = _per_sample_pitch(pitch, shift)
    voiced = p > 0.0
    freq = jnp.where(voiced, 1.0 / jnp.maximum(p, 1e-6), 0.0)
    raw = jnp.cumsum(freq)
    # reset the accumulator at each voicing onset: subtract the cumsum
    # value held at the start of the current voiced run
    onset = voiced & ~jnp.concatenate([jnp.asarray([False]), voiced[:-1]])
    base = jnp.where(onset, raw - freq, 0.0)
    # forward-fill the base over the run (running max works: raw is
    # nondecreasing, so the latest onset has the largest base)
    base = jax.lax.associative_scan(jnp.maximum, base)
    phase = raw - base
    fired = jnp.floor(phase) > jnp.floor(
        jnp.concatenate([jnp.zeros(1), phase[:-1]]))
    pulse = jnp.where(voiced & fired, jnp.sqrt(jnp.maximum(p, 1e-6)), 0.0)
    if noise is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(key, p.shape, p.dtype)
    return jnp.where(voiced, pulse, noise), voiced


def fir(x, b):
    """DFS -b: direct-form FIR y[t] = sum_k b[k] x[t-k]."""
    b = jnp.asarray(b, jnp.asarray(x).dtype)
    return jnp.convolve(jnp.asarray(x), b, mode="full")[:len(x)]


def mixed_excitation(pitch, shift: int, lowpass, highpass, key=None,
                     noise=None):
    """The reference's two EXCITE runs (Training.pl:2884-2890): noise
    excitation (pitch 0 everywhere) high-passed + pitch excitation
    low-passed, added."""
    zero = jnp.zeros_like(jnp.asarray(pitch))
    if noise is None:
        k1, k2 = jax.random.split(key if key is not None
                                  else jax.random.PRNGKey(0))
        voiced_ex, voiced = excite(pitch, shift, key=k1)
        noise_ex, _ = excite(zero, shift, key=k2)
    else:
        voiced_ex, voiced = excite(pitch, shift, noise=noise[0])
        noise_ex, _ = excite(zero, shift, noise=noise[1])
    # EXCITE output for the all-voiced branch keeps noise in unvoiced
    # runs; the reference's voiced path does too (pulses where voiced)
    return fir(voiced_ex, lowpass) + fir(noise_ex, highpass), voiced


def mglsa_synthesis(excitation, mgc, alpha: float, shift: int,
                    fft_size: int = 1024, gamma_stages: int = 0):
    """MGLSADF equivalent: filter each frame's excitation through the
    frame's exact transfer function |H| = exp(mgc2sp) with linear-phase
    windowed overlap-add (50% overlap, Hann).  gamma_stages = the -c
    argument; 0 = MLSA (log spectrum), c>0 uses the mel-generalized
    log via mgc2mgc normalization upstream (the caller converts, as
    gen_wave's c_mgc pipeline does)."""
    from hts_train_world_tpu.ops import codec
    exc = jnp.asarray(excitation)
    mgc = jnp.asarray(mgc)
    T = mgc.shape[0]
    n = exc.shape[0]
    logH = codec.mgc2sp_real(mgc, alpha, fft_size)      # (T, F) log |H|
    H = jnp.exp(logH)
    # frames of 2*shift, hop shift, Hann-windowed OLA (COLA at 50%).
    # H is zero-phase, so its impulse response has support on BOTH sides
    # of 0 (the negative-time half wraps to the end of the FFT buffer);
    # each filtered segment is gathered as [-K, L+K) with K = 2*shift.
    L = 2 * shift
    K = 2 * shift
    win = jnp.asarray(np.hanning(L + 1)[:L], exc.dtype)
    pad = jnp.concatenate([jnp.zeros(shift, exc.dtype), exc,
                           jnp.zeros(L, exc.dtype)])
    starts = jnp.arange(T) * shift
    segs = jax.vmap(lambda s: jax.lax.dynamic_slice(pad, (s,), (L,)))(
        starts) * win[None]
    spec = jnp.fft.rfft(segs, fft_size, axis=-1)
    filt = jnp.fft.irfft(spec * H, fft_size, axis=-1)
    seg_out = jnp.concatenate([filt[:, fft_size - K:],
                               filt[:, :L + K]], axis=-1)  # (T, L+2K)
    out = jnp.zeros(T * shift + L + 2 * K, exc.dtype)
    idx = (starts[:, None] + jnp.arange(L + 2 * K)[None]).ravel()
    out = out.at[idx].add(seg_out.ravel())
    return out[K + shift:K + shift + n]


def lsp_branch_to_mgc(mgc_lsp, alpha: float, gamma_stages: int,
                      pf: float = 0.0, log_gain: bool = True):
    """gen_wave's gm>0 preamble (Training.pl:2860-2866): optional LSP
    postfilter, stability projection (lspcheck -c -r), LSP -> LPC, then
    mgc2mgc to normalized mel-generalized cepstrum ready for the
    synthesis filter."""
    from hts_train_world_tpu.ops import postfilter as pf_mod
    from hts_train_world_tpu.ops import sptk
    x = jnp.asarray(mgc_lsp)
    if pf and pf != 1.0:
        x = pf_mod.lsp_postfilter(x, pf)
    gain = x[..., 0]
    lsp = pf_mod.lsp_check(x[..., 1:])
    a = pf_mod.lsp_to_lpc(lsp)
    g = gain if log_gain else jnp.log(jnp.maximum(gain, 1e-12))
    lpc = jnp.concatenate([jnp.exp(g)[..., None], a], axis=-1)
    gamma = -1.0 / gamma_stages
    return sptk.mgc2mgc(lpc, 0.0, gamma, x.shape[-1] - 1, alpha, gamma)


def synthesize_sptk(lf0, mgc, fs: int, sr_shift: int, alpha: float,
                    lowpass, highpass, fft_size: int = 1024, key=None):
    """The full gen_wave SPTK branch for one utterance: lf0 (T,) with
    MAGIC unvoiced, mgc (T, M) mel-cepstra.  sr_shift: frame shift in
    samples (EXCITE -p).  Returns the waveform ((T-1)*shift samples)."""
    pitch = lf0_to_pitch(jnp.asarray(lf0), fs)
    exc, _ = mixed_excitation(pitch, sr_shift, lowpass, highpass, key=key)
    return mglsa_synthesis(exc, jnp.asarray(mgc), alpha, sr_shift,
                           fft_size)

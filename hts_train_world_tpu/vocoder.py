"""High-level WORLD vocoder API.

`analyze` / `synthesize` orchestrate the TPU-native kernels with the exact
reference semantics (test/analysis.cpp:93-203, test/synth.cpp:97-108),
including the reseeded-PRNG noise streams.  parity=True reproduces the C++
bit-for-bit (to float64 rounding) — use on CPU/x64; parity=False is the
fast path for TPU (noise-free analysis floor, cumsum phase).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import (cheaptrick as ct, d4c as d4c_mod,
                                     dio as dio_mod, rand,
                                     stonemask as sm, synthesis as syn)


@dataclasses.dataclass
class WorldAnalysis:
    temporal_positions: jnp.ndarray
    f0: jnp.ndarray            # refined (StoneMask) F0, 0 = unvoiced
    spectrogram: jnp.ndarray   # (T, fft/2+1) power-ish spectral envelope
    aperiodicity: jnp.ndarray  # (T, fft/2+1) in [0, 1)
    fs: int
    fft_size: int
    frame_period: float


def estimate_f0(x, fs: int, frame_period: float = 5.0,
                f0_floor: float = cfg.K_FLOOR_F0,
                f0_ceil: float = cfg.K_CEIL_F0, refine: bool = True,
                algorithm: str = "dio", fast_grid: bool = False):
    """DIO + StoneMask (F0Estimation, analysis.cpp:93-143), or Harvest
    (harvest.cpp:1223-1255; its instantaneous-frequency refinement is
    built in, so StoneMask is not applied)."""
    if algorithm == "harvest":
        from hts_train_world_tpu.ops import harvest as hv_mod
        return hv_mod.harvest(x, fs, frame_period, f0_floor, f0_ceil)
    if algorithm != "dio":
        raise ValueError(f"unknown f0 algorithm {algorithm!r}")
    t, f0, _, _ = dio_mod.dio(x, fs, frame_period, f0_floor, f0_ceil)
    if refine:
        gs = fs * frame_period / 1000.0
        gstep = (int(gs) if fast_grid and float(gs).is_integer() else 0)
        f0 = sm.stonemask(x, fs, t, f0, f0_floor, f0_ceil,
                          grid_step=gstep)
    return t, f0


def analyze(x, fs: int, frame_period: float = 5.0, q1: float = -0.15,
            d4c_threshold: float = 0.0, parity: bool = True,
            fft_size: int = 0, algorithm: str = "dio",
            f0_floor: float = cfg.K_FLOOR_F0,
            f0_ceil: float = cfg.K_CEIL_F0) -> WorldAnalysis:
    x = jnp.asarray(x)
    N = fft_size or cfg.cheaptrick_fft_size(fs)
    t, f0 = estimate_f0(x, fs, frame_period, f0_floor, f0_ceil,
                        algorithm=algorithm,
                        fast_grid=not parity and x.dtype == jnp.float32)
    f0 = jnp.asarray(f0)
    t = jnp.asarray(t, x.dtype)
    T = int(f0.shape[0])
    if parity:
        ct_stream = jnp.asarray(
            rand.randn_stream(ct.cheaptrick_stream_len(T, N)), x.dtype)
        nw, ns = ct.cheaptrick_noise(f0, fs, N, ct_stream)
        d4c_stream = jnp.asarray(
            rand.randn_stream(d4c_mod.d4c_stream_len(T, fs)), x.dtype)
    else:
        nw = ns = d4c_stream = None
    gs = fs * frame_period / 1000.0
    gstep = int(gs) if not parity and float(gs).is_integer() else 0
    sp = ct.cheaptrick(x, fs, t, f0, N, q1, nw, ns, grid_step=gstep)
    ap, _ = d4c_mod.d4c(x, fs, t, f0, N, d4c_threshold, d4c_stream,
                        f0_floor=f0_floor, grid_step=gstep)
    return WorldAnalysis(t, f0, sp, ap, fs, N, frame_period)


def synthesize(f0, spectrogram, aperiodicity, fs: int, fft_size: int = 0,
               frame_period: float = 5.0, y_length: int = 0,
               parity: bool = True, seed: int = 0):
    """Synthesis (synth.cpp:97-108).  y_length 0 -> (T-1)*fp*fs+1."""
    f0 = jnp.asarray(f0)
    N = fft_size or cfg.cheaptrick_fft_size(fs)
    T = int(f0.shape[0])
    if not y_length:
        y_length = int((T - 1) * frame_period / 1000.0 * fs) + 1
    if parity:
        stream = jnp.asarray(
            rand.randn_stream(syn.synthesis_stream_len(y_length)),
            spectrogram.dtype)
    else:
        import jax
        stream = jax.random.normal(
            jax.random.PRNGKey(seed), (syn.synthesis_stream_len(y_length),),
            spectrogram.dtype)
    return syn.synthesis(f0, jnp.asarray(spectrogram),
                         jnp.asarray(aperiodicity), N, frame_period, fs,
                         y_length, stream, exact_phase=parity)


def modify_parameters(f0, spectrogram, fs: int, f0_scale: float = 1.0,
                      formant_ratio: float = 1.0):
    """The test demo's voice-change knobs (ParameterModification,
    test/test.cpp:200-237): F0 scaling and spectral (formant)
    stretching via log-spectrum resampling along a scaled frequency
    axis; for ratio < 1 the tail above N/2*ratio holds the last
    stretched bin."""
    import jax
    from hts_train_world_tpu.ops import prims
    f0 = jnp.asarray(f0) * f0_scale
    sp = jnp.asarray(spectrogram)
    if formant_ratio == 1.0:
        return f0, sp
    half = sp.shape[1] - 1
    N = 2 * half
    i = jnp.arange(half + 1, dtype=sp.dtype)
    axis1 = formant_ratio * i / N * fs
    axis2 = i / N * fs

    def frame(row):
        out = jnp.exp(prims.interp1(axis1, jnp.log(row), axis2))
        if formant_ratio < 1.0:
            cut = int(N / 2.0 * formant_ratio)
            hold = out[cut - 1]
            out = jnp.where(jnp.arange(half + 1) >= cut, hold, out)
        return out

    return f0, jax.vmap(frame)(sp)


def copy_synthesis(x, fs: int, frame_period: float = 5.0,
                   parity: bool = True, f0_scale: float = 1.0,
                   formant_ratio: float = 1.0):
    """Full analysis -> resynthesis round trip (the reference's de-facto
    integration test, test/test.cpp), with its optional F0/formant
    voice-change knobs (test.cpp:17-21)."""
    a = analyze(x, fs, frame_period, parity=parity)
    f0, sp = modify_parameters(a.f0, a.spectrogram, fs, f0_scale,
                               formant_ratio)
    y = synthesize(f0, sp, a.aperiodicity, fs, a.fft_size,
                   frame_period, parity=parity)
    return a, y

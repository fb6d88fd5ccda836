"""DIO F0 estimation — TPU-native reimplementation of
externs/WORLD_v2/src/dio.cpp (see SURVEY.md N4).

Structure vs. the reference:
- the per-band loop (dio.cpp:558-567) is unrolled at trace time (band
  boundary F0s are static), each band sharing one utterance spectrum;
- zero-crossing extraction (dio.cpp:357-435) becomes mask + fixed-size
  compaction (jnp.nonzero with static size);
- candidate interpolation/scoring (dio.cpp:441-508) is vectorized interp1
  with valid-count masking;
- the serial contour-fixing chains FixStep3/FixStep4 (dio.cpp:215-253) are
  lax.scan over frames (forward and reverse) with a walking-state carry
  that reproduces the reference's section-extension semantics exactly.

All computation is shape-static; per-utterance shapes (x_length, fs) are
Python-static at trace time.
"""
from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import prims


# ---------------------------------------------------------------------------
# zero crossings
# ---------------------------------------------------------------------------


def zero_crossings(sig, length: int, fs, cap: int):
    """ZeroCrossingEngine (dio.cpp:357-393): negative-going crossings of
    sig[:length] -> (interval_locations, intervals, n_intervals).

    Returns fixed-size (cap,) arrays; valid prefix length = n_intervals
    (= #edges - 1, or 0 when #edges < 2).
    """
    dtype = sig.dtype
    s = sig[:length]
    mask = (s[:-1] > 0.0) & (s[1:] <= 0.0)
    n_edges = jnp.sum(mask)
    pos = prims.compact_indices(mask, cap, length - 1)
    e = pos + 1  # edge sample index (dio.cpp:363)
    s_em1 = jnp.take(s, e - 1, mode="clip")
    s_e = jnp.take(s, e, mode="clip")
    fine = e.astype(dtype) - s_em1 / (s_e - s_em1)
    fine_next = jnp.roll(fine, -1)
    intervals = fs / (fine_next - fine)
    locations = (fine + fine_next) / 2.0 / fs
    n = jnp.where(n_edges < 2, 0, n_edges - 1)
    # cap-saturation guard: when the crossing count exceeds the compaction
    # cap (wideband noise in the LPF transition band, or a zero-padded
    # tail whose filtered residue oscillates around 0), the arrays hold
    # only the first `cap` edges.  Crossings are time-ordered, so the
    # kept prefix is still exact — clamp n to it and report the last
    # covered time so the caller degrades frames PAST it to "no
    # candidate" instead of extrapolating garbage (or, worse, killing
    # the whole band for frames whose events were all kept).
    saturated = n_edges > cap
    n = jnp.minimum(n, cap - 1)
    last_loc = jnp.take(locations, jnp.maximum(n - 1, 0), mode="clip")
    t_limit = jnp.where(saturated, last_loc,
                        jnp.asarray(jnp.finfo(dtype).max, dtype))
    return locations, intervals, n, t_limit


def _four_zero_crossings(filtered, y_length: int, actual_fs, cap: int):
    """GetFourZeroCrossingIntervals (dio.cpp:402-435)."""
    d = filtered[1:y_length] - filtered[:y_length - 1]  # diff(s)
    neg = zero_crossings(filtered, y_length, actual_fs, cap)
    pos = zero_crossings(-filtered, y_length, actual_fs, cap)
    peak = zero_crossings(d, y_length - 1, actual_fs, cap)
    dip = zero_crossings(-d, y_length - 1, actual_fs, cap)
    return neg, pos, peak, dip


# ---------------------------------------------------------------------------
# per-band candidate contour
# ---------------------------------------------------------------------------


def _band_candidate(filtered, y_length: int, actual_fs, boundary_f0: float,
                    f0_floor: float, f0_ceil: float, temporal_positions,
                    cap: int, fp_s: float = 0.0):
    """GetF0CandidateFromRawEvent minus the filtering (dio.cpp:441-508).
    fp_s > 0 (f32 fast path): temporal_positions is the regular grid
    arange(T)*fp_s — use the scatter+cumsum interpolation (no sort)."""
    dtype = filtered.dtype
    streams = _four_zero_crossings(filtered, y_length, actual_fs, cap)
    interped = []
    enough = jnp.asarray(True)
    t_limit = jnp.asarray(jnp.finfo(dtype).max, dtype)
    T = temporal_positions.shape[0]
    for locs, vals, n, tl in streams:
        enough = enough & (n > 2)  # CheckEvent(n-2), dio.cpp:475-478
        t_limit = jnp.minimum(t_limit, tl)
        if fp_s > 0.0 and dtype == jnp.float32:
            interped.append(prims.interp1_regular_grid(
                locs, vals, T, fp_s, n_valid=n))
        else:
            interped.append(prims.interp1(locs, vals, temporal_positions,
                                          n_valid=n))
    f = jnp.stack(interped)  # (4, T)
    cand = jnp.mean(f, axis=0)
    score = jnp.sqrt(jnp.sum((f - cand) ** 2, axis=0) / 3.0)
    bad = ((cand > boundary_f0) | (cand < boundary_f0 / 2.0)
           | (cand > f0_ceil) | (cand < f0_floor)
           | (temporal_positions > t_limit))
    cand = jnp.where(bad, 0.0, cand)
    score = jnp.where(bad, cfg.K_MAXIMUM_VALUE, score)
    cand = jnp.where(enough, cand, jnp.zeros((), dtype))
    score = jnp.where(enough, score, jnp.full((), cfg.K_MAXIMUM_VALUE, dtype))
    return cand, score


# ---------------------------------------------------------------------------
# contour fixing (FixStep1..4, dio.cpp:132-289)
# ---------------------------------------------------------------------------


def _select_best_f0(current, past, cands, allowed_range):
    """SelectBestF0 (dio.cpp:190-209); cands: (bands,) at the target frame."""
    ref = (current * 3.0 - past) / 2.0
    err = jnp.abs(ref - cands)
    best = cands[jnp.argmin(err)]  # first-min, like the strict < in C
    rel = jnp.abs(1.0 - best / ref)
    ok = (rel <= allowed_range) & (ref != 0.0)
    return jnp.where(ok, best, 0.0)


def fix_f0_contour(best_f0, f0_candidates, frame_period: float,
                   f0_floor: float, allowed_range: float):
    """FixF0Contour (dio.cpp:259-289). f0_candidates: (bands, T)."""
    T = best_f0.shape[0]
    vrm = int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1
    if T <= vrm:
        return jnp.zeros_like(best_f0)
    dtype = best_f0.dtype
    idx = jnp.arange(T)

    # Step1: zero the edges, kill jumps (dio.cpp:132-150)
    base = jnp.where((idx < vrm) | (idx >= T - vrm), 0.0, best_f0)
    prev = jnp.concatenate([jnp.zeros((1,), dtype), base[:-1]])
    jump = jnp.abs((base - prev) / (cfg.K_MY_SAFE_GUARD_MINIMUM + base))
    s1 = jnp.where((idx >= vrm) & (jump < allowed_range), base, 0.0)

    # Step2: zero any frame with a zero inside +/-center (dio.cpp:156-169)
    center = (vrm - 1) // 2
    has_zero = jnp.zeros(T, bool)
    for k in range(-center, center + 1):
        has_zero = has_zero | (jnp.roll(s1, -k) == 0.0)
    inner = (idx >= center) & (idx < T - center)
    s2 = jnp.where(inner & has_zero, 0.0, s1)

    cands_T = f0_candidates.T  # (T, bands)

    # Step3 (forward extension from negative boundaries, dio.cpp:215-231)
    neg_b = (s2[:-1] != 0.0) & (s2[1:] == 0.0)  # boundary at index j

    def fwd(carry, inp):
        active, p1, p2 = carry
        nb, s2_next, cands_next = inp
        active = active | nb
        v = _select_best_f0(p1, p2, cands_next, allowed_range)
        out = jnp.where(active, v, s2_next)
        return (active & (out != 0.0), out, p1), out

    zero = s2[0] * 0.0  # derives device-varying type under shard_map
    (_, _, _), ys = jax.lax.scan(
        fwd, (zero != 0.0, s2[0], zero), (neg_b, s2[1:], cands_T[1:]),
        unroll=32)
    s3 = jnp.concatenate([s2[:1], ys])

    # Step4 (backward extension from positive boundaries, dio.cpp:237-253)
    pos_b = (s2[1:] != 0.0) & (s2[:-1] == 0.0)  # boundary at index j (>=1)

    def bwd(carry, inp):
        active, p1, p2 = carry
        pb, s3_prev, cands_prev = inp
        active = active | pb
        v = _select_best_f0(p1, p2, cands_prev, allowed_range)
        out = jnp.where(active, v, s3_prev)
        return (active & (out != 0.0), out, p1), out

    (_, _, _), ys4 = jax.lax.scan(
        bwd, (zero != 0.0, s3[-1], zero),
        (pos_b[::-1], s3[:-1][::-1], cands_T[:-1][::-1]), unroll=32)
    s4 = jnp.concatenate([s3[-1:], ys4])[::-1]
    return s4


# ---------------------------------------------------------------------------
# DIO main body
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _band_filter_specs_np(fft_size: int, cutoff: int,
                          boundaries: tuple, actual_fs: float):
    """Static per-band filter spectra for the f32 fast path.

    The low-cut FIR (dio.cpp:40-53) and each band's Nuttall low-pass
    (dio.cpp:325-333) depend only on plan constants, so their rffts are
    numpy-precomputed (f64) and folded together — this removes 13 of the
    25 length-fft_size transforms the f64 path performs per utterance.
    Returns (bands, fft/2+1) complex128.
    """
    i = np.arange(1, cutoff * 2 + 2)
    lcf = np.zeros(fft_size)
    n = cutoff * 2 + 1
    lcf[:n] = 0.5 - 0.5 * np.cos(i * 2.0 * np.pi / (n + 1))
    lcf[:n] = -lcf[:n] / lcf[:n].sum()
    lcf = np.roll(lcf, -((n - 1) // 2))
    lcf[0] += 1.0
    lcf_spec = np.fft.rfft(lcf)
    specs = []
    for boundary in boundaries:
        half_avg = int(actual_fs / boundary / 2.0 + 0.5)
        m = half_avg * 4
        t = np.arange(m) / (m - 1.0)
        w = (0.355768 - 0.487396 * np.cos(2 * np.pi * t)
             + 0.144232 * np.cos(4 * np.pi * t)
             - 0.012604 * np.cos(6 * np.pi * t))
        lpf = np.zeros(fft_size)
        lpf[:m] = w
        specs.append(np.fft.rfft(lpf) * lcf_spec)
    return np.stack(specs)


def dio_plan(x_length: int, fs: int, frame_period: float = 5.0,
             f0_floor: float = cfg.K_FLOOR_F0, f0_ceil: float = cfg.K_CEIL_F0,
             channels_in_octave: float = 2.0, speed: int = 1):
    """Static shape plan (DioGeneralBody setup, dio.cpp:578-609)."""
    number_of_bands = 1 + int(math.log(f0_ceil / f0_floor) / cfg.K_LOG2
                              * channels_in_octave)
    boundary_f0 = [f0_floor * 2.0 ** ((i + 1) / channels_in_octave)
                   for i in range(number_of_bands)]
    ratio = max(min(speed, 12), 1)
    y_length = 1 + x_length // ratio
    actual_fs = fs / ratio
    fft_size = cfg.get_suitable_fft_size(
        y_length + 4 * int(1.0 + actual_fs / boundary_f0[0] / 2.0))
    f0_length = cfg.samples_for_dio(fs, x_length, frame_period)
    return dict(number_of_bands=number_of_bands, boundary_f0=boundary_f0,
                ratio=ratio, y_length=y_length, actual_fs=actual_fs,
                fft_size=fft_size, f0_length=f0_length)


@partial(jax.jit, static_argnames=("fs", "frame_period", "f0_floor",
                                   "f0_ceil", "channels_in_octave", "speed",
                                   "allowed_range"))
def dio(x, fs: int, frame_period: float = 5.0,
        f0_floor: float = cfg.K_FLOOR_F0, f0_ceil: float = cfg.K_CEIL_F0,
        channels_in_octave: float = 2.0, speed: int = 1,
        allowed_range: float = 0.1):
    """Dio (dio.cpp:642-647) -> (temporal_positions, f0, candidates, scores).

    candidates/scores: (bands, T) — also consumed by contour fixing and
    exposed for diagnostics.
    """
    dtype = x.dtype
    L = x.shape[0]
    plan = dio_plan(L, fs, frame_period, f0_floor, f0_ceil,
                    channels_in_octave, speed)
    y_length = plan["y_length"]
    actual_fs = plan["actual_fs"]
    fft_size = plan["fft_size"]
    T = plan["f0_length"]

    # --- GetSpectrumForEstimation (dio.cpp:60-106)
    if plan["ratio"] != 1:
        yd = prims.decimate(x, plan["ratio"])[:y_length]
        y = jnp.zeros(fft_size, dtype).at[:yd.shape[0]].set(yd)
    else:
        # ratio==1 quirk: y_length = L+1, the extra sample is a zero that
        # still participates in the mean (dio.cpp:69-79)
        y = jnp.zeros(fft_size, dtype).at[:L].set(x)
    mean_y = jnp.sum(y[:y_length]) / y_length
    y = y.at[:y_length].add(-mean_y)
    y_spec = jnp.fft.rfft(y)
    cutoff = int(actual_fs / 50.0 + 0.5)  # matlab_round, positive arg
    if dtype == jnp.float32:
        # fast path: filter spectra are compile-time constants and all 12
        # band filterings run as ONE batched irfft (see
        # _band_filter_specs_np); f64 keeps the reference's op-for-op
        # transform sequence for bit-level parity headroom
        specs = jnp.asarray(_band_filter_specs_np(
            fft_size, cutoff, tuple(plan["boundary_f0"]), actual_fs),
            jnp.complex64)
        filt_bands = jnp.fft.irfft(y_spec[None, :] * specs, fft_size,
                                   axis=-1) * fft_size
    else:
        lcf = prims.design_low_cut_filter(cutoff * 2 + 1, fft_size, dtype)
        y_spec = y_spec * jnp.fft.rfft(lcf)
        filt_bands = None

    temporal_positions = jnp.arange(T, dtype=dtype) * (frame_period / 1000.0)

    # --- per-band candidates (bands are static -> unrolled)
    cap = y_length // 2 + 2
    duration = y_length / actual_fs
    cands, scores = [], []
    for bi, boundary in enumerate(plan["boundary_f0"]):
        half_avg = int(actual_fs / boundary / 2.0 + 0.5)  # matlab_round
        if filt_bands is not None:
            filt = filt_bands[bi]
        else:
            lpf = jnp.zeros(fft_size, dtype).at[:half_avg * 4].set(
                prims.nuttall_window(half_avg * 4, dtype))
            filt = jnp.fft.irfft(y_spec * jnp.fft.rfft(lpf),
                                 fft_size) * fft_size
        # delay compensation (dio.cpp:335-337)
        filt = jax.lax.dynamic_slice(filt, (2 * half_avg,), (y_length,))
        if dtype == jnp.float32:
            # fast path: the Nuttall low-pass at boundary_f0 bounds the
            # zero-crossing rate of signal and derivative by ~boundary_f0
            # (a band-limited signal has <= 2BT sign changes); 2.5x margin
            # covers transition-band energy.  Shrinks the compaction /
            # gather extent ~10-100x per band.  f64 parity keeps the
            # worst-case cap (the C counts every crossing).
            band_cap = min(cap, int(2.5 * boundary * duration) + 64)
        else:
            band_cap = cap
        c, s = _band_candidate(filt, y_length, actual_fs, boundary, f0_floor,
                               f0_ceil, temporal_positions, band_cap,
                               fp_s=frame_period / 1000.0)
        cands.append(c)
        scores.append(s / (c + cfg.K_MY_SAFE_GUARD_MINIMUM))  # dio.cpp:563
    f0_candidates = jnp.stack(cands)
    f0_scores = jnp.stack(scores)

    best = f0_candidates[jnp.argmin(f0_scores, axis=0), jnp.arange(T)]
    f0 = fix_f0_contour(best, f0_candidates, frame_period, f0_floor,
                        allowed_range)
    return temporal_positions, f0, f0_candidates, f0_scores

"""D4C band-aperiodicity estimation — TPU-native reimplementation of
externs/WORLD_v2/src/d4c.cpp (SURVEY.md N8).

Two phases, both vmapped over frames:
- D4C LoveTrain (d4c.cpp:225-282): per-frame V/UV from cumulative band
  power ratios at 100/4000/7900 Hz;
- main body (d4c.cpp:290-316): static group delay from windowed centroids,
  coarse aperiodicity per 3 kHz band (sorted-cumsum power ratio), then
  interp1 onto the CheapTrick frequency axis.

The reference's reproducible noise (randn()*1e-12 inside every windowed
waveform; reseed at d4c.cpp:340) is consumed: first by LoveTrain over all
voiced frames, then by the main body over frames passing the threshold —
the stream offsets are computed in-graph from f0 and the LoveTrain result.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import fftmat, prims

MATMUL_FFT_LIMIT = fftmat.MATMUL_FFT_LIMIT


def d4c_stream_len(f0_length: int, fs: int) -> int:
    w_lt = 2 * int(1.5 * fs / 40.0 + 0.5) + 1
    w_b = 2 * int(2.0 * fs / cfg.K_FLOOR_F0_D4C + 0.5) + 1
    return f0_length * (w_lt + 3 * w_b) + 16


def _windowed_waveform(x, L: int, fs: int, f0i, pos, window_type: str,
                       ratio: float, noise, max_len: int, dtype,
                       xp=None, pad: int = 0):
    """GetWindowedWaveform (d4c.cpp:52-84): gather + window + tiny noise +
    weighted mean removal, zero-masked beyond 2h.

    Fast path: when `xp` (x edge-padded by `pad` >= h_max on both sides;
    padding replicates x[0]/x[-1], exactly the clip-gather semantics) is
    given, the window is one contiguous dynamic_slice instead of a
    per-element gather — ~2x cheaper on TPU."""
    # fast-mode trims pass max_len < fft size; clamp h there (only f0
    # below the WORLD floor would exceed it — out of contract)
    h = jnp.minimum(prims.matlab_round_i(ratio * fs / f0i / 2.0),
                    (max_len - 1) // 2)
    j = jnp.arange(max_len)
    valid = j <= 2 * h
    base_index = j - h
    origin = prims.matlab_round_i(pos * fs + 0.001)
    position = (2.0 * base_index.astype(dtype) / ratio) / fs
    if window_type == "hanning":
        w = 0.5 * jnp.cos(jnp.pi * position * f0i) + 0.5
    else:  # blackman
        w = (0.42 + 0.5 * jnp.cos(jnp.pi * position * f0i)
             + 0.08 * jnp.cos(jnp.pi * position * f0i * 2.0))
    w = jnp.where(valid, w, 0.0)
    if xp is not None:
        seg = jax.lax.dynamic_slice(xp, (origin - h + pad,), (max_len,))
    else:
        seg = jnp.take(x, jnp.clip(origin + base_index, 0, L - 1),
                       mode="clip")
    wave = jnp.where(valid, seg * w
                     + noise * cfg.K_MY_SAFE_GUARD_MINIMUM, 0.0)
    coef = jnp.sum(wave) / jnp.sum(w)
    return jnp.where(valid, wave - w * coef, 0.0), h


def _slab_frames(x, T: int, step: int, pad: int, width: int, dtype):
    """Regular frame slabs WITHOUT gathers: slab[f, m] = x_edgepad[f*step
    + m], built from ceil(width/step) STATIC slices of the frame-reshaped
    signal (slab[f, q*step + r] = F[f + q, r]).  The per-frame windows
    then float inside their slab row via elementwise masks — the whole
    windowed-waveform construction (d4c.cpp:52-84) becomes data
    movement XLA handles at full speed instead of 13M-element gathers
    (measured 135 ms -> ~0 for the bench batch)."""
    L = x.shape[0]
    n_q = -(-width // step)
    rows = T + n_q
    need = rows * step
    right = max(0, need - pad - L)
    xp2 = jnp.concatenate([
        jnp.full((pad,), x[0], dtype), x,
        jnp.full((right,), x[-1], dtype)])[:need]
    F = xp2.reshape(rows, step)
    slab = jnp.concatenate([F[q:q + T] for q in range(n_q)], axis=1)
    return slab[:, :width]


def _slab_window(slab_row, fs: int, f0i, s, window_type: str,
                 ratio: float, pad: int, width: int, dtype,
                 h_cap: int = 0):
    """GetWindowedWaveform on a slab row: the window of half-length
    h = round(ratio*fs/f0/2) sits at offset d = pad + s - h (s = the
    frame's rounded sample shift from its regular grid position).  All
    elementwise; the spectra downstream are offset-invariant (power /
    same-offset cross-products), so the floating offset needs no phase
    correction.  Returns (wave, ramp) with ramp = original window index
    + 1 (for the centroid's weighted transform)."""
    h = prims.matlab_round_i(ratio * fs / f0i / 2.0)
    if h_cap:
        h = jnp.minimum(h, h_cap)  # out-of-contract f0 trims (d4c fast)
    m = jnp.arange(width)
    c = pad + s                    # window center offset in the slab
    d = c - h
    valid = (m >= d) & (m <= d + 2 * h)
    position = (2.0 * (m - c).astype(dtype) / ratio) / fs
    if window_type == "hanning":
        w = 0.5 * jnp.cos(jnp.pi * position * f0i) + 0.5
    else:  # blackman
        w = (0.42 + 0.5 * jnp.cos(jnp.pi * position * f0i)
             + 0.08 * jnp.cos(jnp.pi * position * f0i * 2.0))
    w = jnp.where(valid, w, 0.0)
    wave = jnp.where(valid, slab_row * w, 0.0)
    coef = jnp.sum(wave) / jnp.sum(w)
    wave = jnp.where(valid, wave - w * coef, 0.0)
    return wave, (m - d + 1).astype(dtype)


def _love_train(x, fs: int, f0, temporal_positions, noise_lt,
                xp=None, pad: int = 0, wl: int = 0):
    """D4CLoveTrain (d4c.cpp:258-282) -> aperiodicity0 per frame."""
    dtype = x.dtype
    L = x.shape[0]
    n = cfg.d4c_love_train_fft_size(fs)
    wl = wl or n
    b0 = int(-(-100.0 * n // fs))   # ceil
    b1 = int(-(-4000.0 * n // fs))
    b2 = int(-(-7900.0 * n // fs))

    use_matmul = dtype == jnp.float32 and n <= MATMUL_FFT_LIMIT

    def frame(f0i, pos, noise):
        lf0 = jnp.maximum(f0i, 40.0)
        wave, _ = _windowed_waveform(x, L, fs, lf0, pos, "blackman", 3.0,
                                     noise, wl, dtype, xp, pad)
        if use_matmul:
            p = fftmat.rfft_power_matmul(wave, n)
        else:
            spec = jnp.fft.rfft(wave, n)
            p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        k = jnp.arange(n // 2 + 1)
        p = jnp.where(k <= b0, 0.0, p)
        c = jnp.cumsum(jnp.where(k <= b2, p, 0.0))
        return c[b1] / jnp.maximum(c[b2], prims.tiny_floor(dtype))

    ap0 = jax.vmap(frame)(f0, temporal_positions, noise_lt)
    return jnp.where(f0 == 0.0, 0.0, ap0)


def _love_train_slab(slab, fs: int, f0, s_lt, pad_lt: int, wl2: int,
                     h_cap: int, dtype):
    """D4CLoveTrain on slab rows (fast mode, no reference noise)."""
    n = cfg.d4c_love_train_fft_size(fs)
    b0 = int(-(-100.0 * n // fs))
    b1 = int(-(-4000.0 * n // fs))
    b2 = int(-(-7900.0 * n // fs))

    def frame(row, f0i, si):
        lf0 = jnp.maximum(f0i, 40.0)
        wave, _ = _slab_window(row, fs, lf0, si, "blackman", 3.0,
                               pad_lt, wl2, dtype, h_cap)
        p = fftmat.rfft_power_matmul(wave, n)
        k = jnp.arange(n // 2 + 1)
        p = jnp.where(k <= b0, 0.0, p)
        c = jnp.cumsum(jnp.where(k <= b2, p, 0.0))
        return c[b1] / jnp.maximum(c[b2], prims.tiny_floor(dtype))

    ap0 = jax.vmap(frame)(slab, f0, s_lt)
    return jnp.where(f0 == 0.0, 0.0, ap0)


def _coarse_aperiodicity(sgd, fs: int, fft_d: int, n_ap: int, window,
                         window_length: int):
    """GetCoarseAperiodicity (d4c.cpp:192-223) for one frame."""
    half = fft_d // 2
    boundary = int(fft_d * 8.0 / window_length + 0.5)  # matlab_round, >0
    hw = window_length // 2
    out = []
    for i in range(n_ap):
        center = int(cfg.K_FREQUENCY_INTERVAL * (i + 1) * fft_d / fs)
        seg = jax.lax.dynamic_slice(sgd, (center - hw,), (window_length,))
        if sgd.dtype == jnp.float32 and fft_d <= MATMUL_FFT_LIMIT:
            p = fftmat.rfft_power_matmul(seg * window, fft_d)
        else:
            spec = jnp.fft.rfft(seg * window, fft_d)
            p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        tiny = prims.tiny_floor(p.dtype)
        if p.dtype == jnp.float64:
            # parity: the C sorts ascending and cumsums (d4c.cpp:215-220)
            c = jnp.cumsum(jnp.sort(p))
            num = c[half - boundary - 1]
            den = c[half]
        else:
            # fast path: cum[half-b-1] = total - sum(top (b+1)); the
            # bit-search top-k sum is exact and ~3x cheaper than top_k
            den = jnp.sum(p)
            num = den - prims.sum_top_k(p, boundary + 1)
        out.append(10.0 * jnp.log10(jnp.maximum(num, tiny)
                                    / jnp.maximum(den, tiny)))
    if not out:  # fs <= 12 kHz: zero coarse bands (d4c.cpp:212-215 floor)
        return jnp.zeros((0,), sgd.dtype)
    return jnp.stack(out)


@partial(jax.jit,
         static_argnames=("fs", "fft_size", "threshold", "f0_floor",
                          "grid_step"))
def d4c(x, fs: int, temporal_positions, f0, fft_size: int,
        threshold: float = cfg.K_THRESHOLD, stream=None,
        f0_floor: float = cfg.K_FLOOR_F0, grid_step: int = 0):
    """D4C (d4c.cpp:337-397) -> aperiodicity (T, fft_size/2+1).

    fft_size is the OUTPUT (CheapTrick) fft size; internal analysis uses
    the D4C sizes.  `stream` is the reseeded randn stream (None -> no
    noise, fast mode).  `f0_floor` is the F0 estimator's floor — it only
    sizes the fast-mode window trim (voiced frames carry f0 >= f0_floor;
    the body itself clamps at kFloorF0D4C=47 Hz like d4c.cpp:381).

    grid_step > 0 (fast mode only) promises temporal_positions sit on
    the regular frame grid (round(t[f]*fs + 0.001) ~= f*grid_step, small
    deviations absorbed): enables the SLAB formulation — regular frame
    slabs from static slices, windows floating inside their row via
    elementwise masks, spectra via offset-invariant mod-N DFT matmuls —
    which removes every per-frame gather from the hot path.
    """
    dtype = x.dtype
    L = x.shape[0]
    T = f0.shape[0]
    fft_d = cfg.d4c_fft_size(fs)
    half_d = fft_d // 2
    n_lt = cfg.d4c_love_train_fft_size(fs)
    n_ap = cfg.number_of_aperiodicities(fs)
    fmax = max(fs / 12.0, cfg.K_CEIL_F0)
    ul_max = 2 + int(fmax * fft_d / fs) + 1
    b_max = int(fmax * fft_d / fs) + 1

    window_length = int(cfg.K_FREQUENCY_INTERVAL * fft_d / fs) * 2 + 1
    window = prims.nuttall_window(window_length, dtype)

    # fast mode: one contiguous dynamic_slice per window instead of
    # elementwise gathers — pad x with edge values (= clip semantics)
    fast = stream is None and dtype == jnp.float32
    if fast:
        pad = int(2.0 * fs / cfg.K_FLOOR_F0_D4C + 0.5) + 2  # >= any h
        xp = jnp.concatenate([
            jnp.full((pad,), x[0], dtype), x,
            jnp.full((pad + fft_d,), x[-1], dtype)])
        # window-width trims: processed frames carry f0 >= f0_floor and
        # the body clamps f0 at kFloorF0D4C, so the effective per-frame
        # f0 is >= max(f0_floor, 47 Hz) and the gather/trig width shrinks
        # to that worst case (lane-rounded); the FFTs stay at fft_d/n_lt
        # via implicit zero padding.  Love-train floors at 40 Hz always.
        eff_floor = max(float(f0_floor), cfg.K_FLOOR_F0_D4C)
        h_body_cap = int(2.0 * fs / eff_floor + 1.0)
        wl_body = min(fft_d, -(-(2 * h_body_cap + 1) // 128) * 128)
        h_lt_cap = int(1.5 * fs / 40.0 + 1.0)
        wl_lt = min(n_lt, -(-(2 * h_lt_cap + 1) // 128) * 128)
    else:
        xp, pad = None, 0
        wl_body, wl_lt = fft_d, n_lt

    use_slab = fast and grid_step > 0
    if use_slab:
        margin = int(0.25 * fs / eff_floor) + 2   # centroid +-0.25/f0
        pad_b = h_body_cap + margin
        wl2_b = -(-(2 * h_body_cap + 1 + 2 * margin) // 128) * 128
        slab_b = _slab_frames(x, T, grid_step, pad_b, wl2_b, dtype)
        pad_lt = h_lt_cap + 2
        wl2_lt = -(-(2 * h_lt_cap + 5) // 128) * 128
        slab_lt = _slab_frames(x, T, grid_step, pad_lt, wl2_lt, dtype)
        grid_base = jnp.arange(T, dtype=jnp.int32) * grid_step
        s_reg = jnp.clip(
            prims.matlab_round_i(temporal_positions * fs + 0.001)
            - grid_base, -2, 2)   # grid deviation (contract: tiny)

    # ---- noise stream slicing (exact consumption order) ----
    j_b = jnp.arange(fft_d)
    cf0 = jnp.maximum(cfg.K_FLOOR_F0_D4C, f0)
    if stream is None:
        # no reference noise: skip the offset bookkeeping entirely
        zt = jnp.zeros((T, 1), dtype)
        noise_lt = noise_c1 = noise_c2 = noise_sp = zt
    else:
        h_lt = prims.matlab_round_i(1.5 * fs / jnp.maximum(f0, 40.0))
        lt_counts = jnp.where(f0 == 0.0, 0, 2 * h_lt + 1)
        lt_off = jnp.cumsum(lt_counts) - lt_counts
        j_lt = jnp.arange(n_lt)
        noise_lt = jnp.where(
            j_lt[None, :] <= 2 * h_lt[:, None],
            jnp.take(stream, lt_off[:, None] + j_lt[None, :], mode="clip"),
            0.0)
        noise_lt = jnp.where((f0 == 0.0)[:, None], 0.0, noise_lt)

    if use_slab:
        ap0 = _love_train_slab(slab_lt, fs, f0, s_reg, pad_lt, wl2_lt,
                               h_lt_cap, dtype)
    else:
        ap0 = _love_train(x, fs, f0, temporal_positions, noise_lt, xp,
                          pad, wl_lt)
    process = (f0 != 0.0) & (ap0 > threshold)

    if stream is not None:
        h4 = prims.matlab_round_i(4.0 * fs / cf0 / 2.0)
        body_counts = jnp.where(process, 3 * (2 * h4 + 1), 0)
        body_off = jnp.sum(lt_counts) + jnp.cumsum(body_counts) - body_counts
        valid_b = j_b[None, :] <= 2 * h4[:, None]

        def slice_block(k):
            off = body_off + k * (2 * h4 + 1)
            nb = jnp.take(stream, off[:, None] + j_b[None, :], mode="clip")
            return jnp.where(valid_b & process[:, None], nb, 0.0)

        noise_c1, noise_c2, noise_sp = (slice_block(k) for k in range(3))

    # ---- main body ----
    use_matmul_d = dtype == jnp.float32 and fft_d <= MATMUL_FFT_LIMIT

    j_w = jnp.arange(wl_body)

    def centroid(f0i, pos, noise):
        """GetCentroid (d4c.cpp:90-119)."""
        wave, h = _windowed_waveform(x, L, fs, f0i, pos, "blackman", 4.0,
                                     noise, wl_body, dtype, xp, pad)
        # normalize over i <= 2*round(2fs/f0) (inclusive) — same 2h span
        power = jnp.sum(wave * wave)
        wave = wave / jnp.sqrt(power)
        if use_matmul_d:
            r1, i1 = fftmat.rfft_matmul(wave, fft_d)
            r2, i2 = fftmat.rfft_matmul(
                wave * (j_w.astype(dtype) + 1.0), fft_d)
            return r2 * r1 + i1 * i2
        s1 = jnp.fft.rfft(wave, fft_d)
        s2 = jnp.fft.rfft(wave * (j_w.astype(dtype) + 1.0), fft_d)
        return jnp.real(s2) * jnp.real(s1) + jnp.imag(s1) * jnp.imag(s2)

    def frame(f0i, pos, nc1, nc2, nsp):
        c1 = centroid(f0i, pos - 0.25 / f0i, nc1)
        c2 = centroid(f0i, pos + 0.25 / f0i, nc2)
        sc = prims.dc_correction(c1 + c2, f0i, fs, fft_d, ul_max)
        wave, _ = _windowed_waveform(x, L, fs, f0i, pos, "hanning", 4.0,
                                     nsp, wl_body, dtype, xp, pad)
        if use_matmul_d:
            sps = fftmat.rfft_power_matmul(wave, fft_d)
        else:
            spec = jnp.fft.rfft(wave, fft_d)
            sps = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        sps = prims.dc_correction(sps, f0i, fs, fft_d, ul_max)
        sps = prims.linear_smoothing(sps, f0i, fs, fft_d, b_max)
        # GetStaticGroupDelay (d4c.cpp:170-186).  float32 fast path:
        # noise-floor bins can underflow sps and blow the ratio to inf;
        # sanitize (finite everywhere in the f64 parity path)
        sgd = sc / sps
        sgd = jnp.where(jnp.isfinite(sgd), sgd, 0.0)
        sgd = prims.linear_smoothing(sgd, f0i / 2.0, fs, fft_d, b_max)
        sgd = sgd - prims.linear_smoothing(sgd, f0i, fs, fft_d, b_max)
        ca = _coarse_aperiodicity(sgd, fs, fft_d, n_ap, window, window_length)
        return jnp.minimum(0.0, ca + (f0i - 100.0) / 50.0)  # d4c.cpp:309-311

    # ---- slab main body (fast mode on the regular grid): the same
    # math with every window floating inside its regular slab row;
    # centroid cross-products and power spectra are offset-invariant,
    # so no per-frame phase correction is needed ----
    def centroid_slab(row, f0i, si):
        wave, ramp = _slab_window(row, fs, f0i, si, "blackman", 4.0,
                                  pad_b, wl2_b, dtype, h_body_cap)
        wave = wave / jnp.sqrt(jnp.sum(wave * wave))
        r1, i1 = fftmat.rfft_matmul(wave, fft_d)
        r2, i2 = fftmat.rfft_matmul(wave * ramp, fft_d)
        return r2 * r1 + i1 * i2

    def frame_slab(row, f0i, pos, s0, base):
        sm = prims.matlab_round_i((pos - 0.25 / f0i) * fs + 0.001) - base
        sp_ = prims.matlab_round_i((pos + 0.25 / f0i) * fs + 0.001) - base
        mx = pad_b - h_body_cap   # = margin; defensive for bad f0
        c1 = centroid_slab(row, f0i, jnp.clip(sm, -mx, mx))
        c2 = centroid_slab(row, f0i, jnp.clip(sp_, -mx, mx))
        sc = prims.dc_correction(c1 + c2, f0i, fs, fft_d, ul_max)
        wave, _ = _slab_window(row, fs, f0i, s0, "hanning", 4.0,
                               pad_b, wl2_b, dtype, h_body_cap)
        sps = fftmat.rfft_power_matmul(wave, fft_d)
        sps = prims.dc_correction(sps, f0i, fs, fft_d, ul_max)
        sps = prims.linear_smoothing(sps, f0i, fs, fft_d, b_max)
        sgd = sc / sps
        sgd = jnp.where(jnp.isfinite(sgd), sgd, 0.0)
        sgd = prims.linear_smoothing(sgd, f0i / 2.0, fs, fft_d, b_max)
        sgd = sgd - prims.linear_smoothing(sgd, f0i, fs, fft_d, b_max)
        ca = _coarse_aperiodicity(sgd, fs, fft_d, n_ap, window,
                                  window_length)
        return jnp.minimum(0.0, ca + (f0i - 100.0) / 50.0)

    cf0_safe = jnp.where(process, cf0, 100.0)
    if use_slab:
        coarse = jax.vmap(frame_slab)(slab_b, cf0_safe,
                                      temporal_positions, s_reg,
                                      grid_base)
    else:
        coarse = jax.vmap(frame)(cf0_safe, temporal_positions, noise_c1,
                                 noise_c2, noise_sp)

    # coarse -> full spectrum (GetAperiodicity, d4c.cpp:325-333)
    coarse_axis = jnp.concatenate([
        jnp.arange(n_ap + 1, dtype=dtype) * cfg.K_FREQUENCY_INTERVAL,
        jnp.asarray([fs / 2.0], dtype)])
    freq_axis = jnp.arange(fft_size // 2 + 1, dtype=dtype) * fs / fft_size

    def to_full(ca):
        vals = jnp.concatenate([jnp.asarray([-60.0], dtype), ca,
                                jnp.asarray([-cfg.K_MY_SAFE_GUARD_MINIMUM],
                                            dtype)])
        return 10.0 ** (prims.interp1(coarse_axis, vals, freq_axis) / 20.0)

    ap = jax.vmap(to_full)(coarse)
    default = jnp.full((T, fft_size // 2 + 1), 1.0 - cfg.K_MY_SAFE_GUARD_MINIMUM,
                       dtype)
    return jnp.where(process[:, None], ap, default), ap0

"""Harvest F0 estimation — TPU-native reimplementation of
externs/WORLD_v2/src/harvest.cpp (SURVEY.md N6; the hardest port).

Since round 4 the ENTIRE pipeline runs on device by default
(harvest(contour="device")): decimation to ~8 kHz, the 152-channel
band-pass filtering + zero-crossing candidate extraction (one MXU
convolution over a shared kernel bank), candidate consolidation /
overlap spreading / IF refinement / neighbour pruning, the four fix
steps incl. Extend/Merge (masked scans in ops/harvest_fix.py) and the
zero-lag Butterworth smoothing.  A faithful serial numpy transcription
of the contour logic (DetectOfficialF0Candidates harvest.cpp:348-412,
OverlapF0Candidates :417-429, RemoveUnreliableCandidates :652-688,
FixStep1-4/Extend/Merge :693-1044, SmoothF0Contour :1049-1113) is kept
in this file as the test oracle (contour="host").

Dispatch contract: `harvest`/`harvest_f0_batch` run TWO jitted stages
with ONE host scalar fetch in between (the true candidate count picks a
bucketed refine width; columns beyond 7*nc are all zero so slicing is
exact).  Under an enclosing jit the fetch is impossible, so the width
falls back to the static worst case `plan["nc_pad"]` — still exact,
just more refine work; `harvest_f0_trace` is the always-single-trace
variant.  `max_candidates` is the reference's padding bound
(n_ch/10*7, harvest.cpp:1179); `nc_pad` is the tighter device bound
(a detected run needs >= 10 voiced channels, so base candidates <=
(n_ch+1)//11).

Reference quirks reproduced: always runs at 1 ms frame period and
decimates to the target (harvest.cpp:1230-1251); ExtendSub's running
mean_f0 accumulator is never reset across sections (:845-851); boundary
lists store [start, end-1] pairs (:737); candidate refinement happens on
the DECIMATED signal (:1194).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import dio as dio_mod
from hts_train_world_tpu.ops import harvest_fix as hf
from hts_train_world_tpu.ops import prims

TARGET_FS = 8000.0
CHANNELS_IN_OCTAVE = 40.0
OVERLAP_PARAMETER = 7


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------


def harvest_plan(x_length: int, fs: int, f0_floor: float, f0_ceil: float):
    adj_floor = f0_floor * 0.9
    adj_ceil = f0_ceil * 1.1
    n_ch = 1 + int(math.log(adj_ceil / adj_floor) / cfg.K_LOG2
                   * CHANNELS_IN_OCTAVE)
    boundaries = [adj_floor * 2.0 ** ((i + 1) / CHANNELS_IN_OCTAVE)
                  for i in range(n_ch)]
    ratio = max(min(int(fs / TARGET_FS + 0.5), 12), 1)
    y_length = int(math.ceil(x_length / ratio))
    actual_fs = fs / ratio
    fft_size = cfg.get_suitable_fft_size(
        y_length + 5 + 2 * int(2.0 * actual_fs / boundaries[0]))
    max_candidates = int(n_ch / 10.0 + 0.5) * OVERLAP_PARAMETER
    # static candidate-column bound for the device path: a detected run
    # needs >= 10 voiced channels + 1 gap, so at most (n_ch+1)//11 base
    # candidates exist; x7 for the overlap spreading
    nc_pad = min(int(n_ch / 10.0 + 0.5), (n_ch + 1) // 11) \
        * OVERLAP_PARAMETER
    return dict(n_ch=n_ch, boundaries=boundaries, ratio=ratio,
                y_length=y_length, actual_fs=actual_fs, fft_size=fft_size,
                max_candidates=max_candidates, nc_pad=nc_pad)


# ---------------------------------------------------------------------------
# device: downsampled waveform + raw band candidates
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("x_length", "ratio", "y_length"))
def _waveform_sub(x, x_length: int, ratio: int, y_length: int):
    """GetWaveformAndSpectrumSub (harvest.cpp:43-66)."""
    if ratio == 1:
        return x[:y_length]
    lag = int(math.ceil(140.0 / ratio) * ratio)
    ext = jnp.concatenate([jnp.full(lag, x[0], x.dtype), x,
                           jnp.full(lag, x[-1], x.dtype)])
    dec = prims.decimate(ext, ratio)
    return jax.lax.dynamic_slice(dec, (lag // ratio,), (y_length,))


def band_filter_f32(y, y_length: int, hs: tuple, boundaries: tuple,
                    fs8: float):
    """All-channel Nuttall band-pass as ONE MXU convolution (f32 fast
    path for GetFilteredSignal, harvest.cpp:99-148).  Kernels are
    right-aligned into a shared (n_ch, 2*h_max+1) bank so every band
    shares the output alignment
        filtered[c, j] = sum_i K[c, i] * y[j - h_max + 1 + i],
    which equals the reference's circular spectrum product + roll since
    the zero padding prevents wrap-around."""
    dtype = y.dtype
    h_max = max(hs)
    K = 2 * h_max + 1
    hs_all = jnp.asarray(hs, jnp.int32)
    bnd_all = jnp.asarray(boundaries, dtype)
    i = jnp.arange(K)
    kk = h_max + hs_all[:, None] - i[None, :]
    valid_k = (kk >= 0) & (kk <= 2 * hs_all[:, None])
    tt = kk.astype(dtype) / (2.0 * hs_all[:, None]).astype(dtype)
    wk = (0.355768 - 0.487396 * jnp.cos(2 * jnp.pi * tt)
          + 0.144232 * jnp.cos(4 * jnp.pi * tt)
          - 0.012604 * jnp.cos(6 * jnp.pi * tt))
    wk = wk * jnp.cos(2 * jnp.pi * bnd_all[:, None]
                      * (kk - hs_all[:, None]).astype(dtype) / fs8)
    kmat = jnp.where(valid_k, wk, 0.0)              # (n_ch, K)
    ypad = jnp.concatenate([jnp.zeros(h_max - 1, dtype), y[:y_length],
                            jnp.zeros(h_max + 1, dtype)])
    return jax.lax.conv_general_dilated(
        ypad[None, None, :], kmat[:, None, :], (1,), "VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)[0]     # (n_ch, y_length)


def _zc_candidates(filt, boundary, y_length: int, temporal, fs8: float,
                   f0_floor: float, f0_ceil: float, cap: int):
    """GetF0CandidateContour for one filtered band (harvest.cpp:211-254):
    four zero-crossing interval streams interpolated to the frame grid,
    averaged, and gated to +-10% of the boundary frequency."""
    dtype = filt.dtype
    interped = []
    enough = boundary > -1.0  # varying-typed True
    t_limit = jnp.asarray(jnp.finfo(dtype).max, dtype)
    d = filt[1:] - filt[:-1]
    T = temporal.shape[0]
    for sig, ln in ((filt, y_length), (-filt, y_length),
                    (d, y_length - 1), (-d, y_length - 1)):
        locs, vals, n, tl = dio_mod.zero_crossings(sig, ln, fs8, cap)
        enough = enough & (n > 2)
        t_limit = jnp.minimum(t_limit, tl)
        if dtype == jnp.float32:
            # regular 1 ms query grid + ascending crossing times: the
            # scatter+cumsum formulation beats the sort-searchsorted
            # (~4x; the dominant cost of the raw-candidate stage)
            interped.append(prims.interp1_regular_grid(
                locs, vals, T, 0.001, n_valid=n))
        else:
            interped.append(prims.interp1(locs, vals, temporal,
                                          n_valid=n))
    f = jnp.stack(interped)
    cand = jnp.mean(f, axis=0)
    bad = ((cand > boundary * 1.1) | (cand < boundary * 0.9)
           | (cand > f0_ceil) | (cand < f0_floor)
           | (temporal > t_limit))
    return jnp.where(bad | ~enough, 0.0, cand)


@partial(jax.jit, static_argnames=("fs8", "fft_size", "y_length", "T",
                                   "boundaries", "f0_floor", "f0_ceil",
                                   "frame_period_ms"))
def _raw_candidates(y, fs8: float, fft_size: int, y_length: int, T: int,
                    boundaries: tuple, f0_floor: float, f0_ceil: float,
                    frame_period_ms: float):
    """GetRawF0Candidates (harvest.cpp:334-343) vmapped over channels."""
    dtype = y.dtype
    # y arrives mean-removed (GetWaveformAndSpectrum, harvest.cpp:81-86)
    yp = jnp.zeros(fft_size, dtype).at[:y_length].set(y)
    Y = jnp.fft.rfft(yp)
    temporal = jnp.arange(T, dtype=dtype) * (frame_period_ms / 1000.0)
    cap = y_length // 2 + 2
    h_max = int(fs8 / boundaries[0] * 2.0 + 0.5)
    wlen_max = 2 * h_max + 1

    j = jnp.arange(wlen_max)

    def channel(boundary, h, cap):
        valid = j <= 2 * h
        t = j / (2.0 * h.astype(dtype))  # Nuttall over window length 2h+1
        w = (0.355768 - 0.487396 * jnp.cos(2 * jnp.pi * t)
             + 0.144232 * jnp.cos(4 * jnp.pi * t)
             - 0.012604 * jnp.cos(6 * jnp.pi * t))
        w = w * jnp.cos(2 * jnp.pi * boundary * (j - h).astype(dtype) / fs8)
        w = jnp.where(valid, w, 0.0)
        W = jnp.fft.rfft(jnp.zeros(fft_size, dtype).at[:wlen_max].set(w))
        filt = jnp.fft.irfft(Y * W, fft_size) * fft_size
        filt = jnp.roll(filt, -(h + 1))[:y_length]  # index_bias = h+1
        return _zc_candidates(filt, boundary, y_length, temporal, fs8,
                              f0_floor, f0_ceil, cap)

    hs_np = [int(fs8 / b * 2.0 + 0.5) for b in boundaries]
    if dtype == jnp.float32:
        # fast path, two TPU-first moves:
        # (1) the per-band Nuttall band-pass runs as ONE MXU convolution
        #     instead of n_ch 32k-point FFT round trips: kernels are
        #     right-aligned into a shared (n_ch, 2*h_max+1) bank so every
        #     band shares the output alignment filtered[j] =
        #     sum_i K[c,i] * y[j - h_max + 1 + i]  (== the reference's
        #     circular spectrum product + roll, GetFilteredSignal
        #     harvest.cpp:99-148, since the zero padding prevents wrap);
        # (2) the cos-modulated band-pass at boundary_f0 oscillates at
        #     ~boundary_f0, so zero-crossing counts are ~boundary*dur:
        #     channels group per octave with tight static caps.
        filt_all = band_filter_f32(y, y_length, tuple(hs_np),
                                   tuple(boundaries), fs8)
        dur = y_length / fs8
        groups = {}
        for ci, b in enumerate(boundaries):
            gcap = min(cap, int(2.5 * 2.0 ** math.ceil(math.log2(b))
                                * dur) + 64)
            groups.setdefault(gcap, []).append(ci)
        rows = [None] * len(boundaries)
        for gcap, idxs in sorted(groups.items()):
            bnd_g = jnp.asarray([boundaries[i] for i in idxs], dtype)
            filt_g = filt_all[jnp.asarray(idxs)]
            out = jax.vmap(lambda f, b: _zc_candidates(
                f, b, y_length, temporal, fs8, f0_floor, f0_ceil,
                gcap))(filt_g, bnd_g)
            for r, i2 in enumerate(idxs):
                rows[i2] = out[r]
        return jnp.stack(rows)  # (n_ch, T)

    bnd = jnp.asarray(boundaries, dtype)
    hs = jnp.asarray(hs_np, jnp.int32)
    return jax.vmap(lambda b, h: channel(b, h, cap))(bnd, hs)  # (n_ch, T)


# ---------------------------------------------------------------------------
# device: candidate refinement (bucketed instantaneous frequency)
# ---------------------------------------------------------------------------


def _refine_buckets(fs8: float, f0_floor: float, f0_ceil: float):
    lo = 2 ** (2 + int(math.log(int(1.5 * fs8 / f0_ceil + 1.0) * 2 + 1)
                       / cfg.K_LOG2))
    hi = 2 ** (2 + int(math.log(int(1.5 * fs8 / f0_floor + 1.0) * 2 + 1)
                       / cfg.K_LOG2))
    out = []
    b = lo
    while b <= hi:
        out.append(b)
        b *= 2
    return out


@partial(jax.jit, static_argnames=("fs8", "B", "f0_floor", "f0_ceil"))
def _refine_bucket(y, positions, f0s, fs8: float, B: int, f0_floor: float,
                   f0_ceil: float):
    """GetRefinedF0 (harvest.cpp:589-617) for candidates whose fft size is
    B; others masked out by the caller."""
    dtype = y.dtype
    L = y.shape[0]
    W = B // 2

    fast = dtype == jnp.float32
    if fast:
        # contiguous window -> dynamic_slice from the edge-padded signal
        # (pad replicates y[0]/y[-1] = the clip-gather semantics)
        pad = int(1.5 * fs8 / f0_floor) + 8
        ypad = jnp.concatenate([
            jnp.full((pad,), y[0], dtype), y,
            jnp.full((pad + W,), y[-1], dtype)])

    def one(pos, f0i):
        h = (1.5 * fs8 / f0i + 1.0).astype(jnp.int32)
        jj = jnp.arange(W)
        valid = jj <= 2 * h
        wt = (2.0 * h.astype(dtype) + 1.0) / fs8
        base0 = prims.matlab_round_i(
            (pos + (-h).astype(dtype) / fs8) * fs8 + 0.001)
        base_index = base0 + jj
        tmp = (base_index.astype(dtype) - 1.0) / fs8 - pos
        mw = (0.42 + 0.5 * jnp.cos(2 * jnp.pi * tmp / wt)
              + 0.08 * jnp.cos(4 * jnp.pi * tmp / wt))
        mw = jnp.where(valid, mw, 0.0)
        mw_p = jnp.concatenate([mw[1:], jnp.zeros(1, dtype)])
        mw_m = jnp.concatenate([jnp.zeros(1, dtype), mw[:-1]])
        dw = jnp.where(valid, -(mw_p - mw_m) / 2.0, 0.0)
        if fast:
            seg = jax.lax.dynamic_slice(
                ypad, (jnp.clip(base0 - 1 + pad, 0, None),), (W,))
        else:
            seg = jnp.take(y, jnp.clip(base_index - 1, 0, L - 1),
                           mode="clip")
        sm = jnp.fft.rfft(seg * mw, B)
        sd = jnp.fft.rfft(seg * dw, B)
        power = jnp.real(sm) ** 2 + jnp.imag(sm) ** 2
        numer = (jnp.real(sm) * jnp.imag(sd) - jnp.imag(sm) * jnp.real(sd))
        nh = jnp.minimum((fs8 / 2.0 / f0i).astype(jnp.int32), 6)
        ks = jnp.arange(1, 7, dtype=dtype)
        idx = jnp.clip(prims.matlab_round_i(f0i * B / fs8 * ks), 0, B // 2)
        p = jnp.take(power, idx)
        nm = jnp.take(numer, idx)
        inst = jnp.where(p == 0.0, 0.0,
                         idx.astype(dtype) * fs8 / B
                         + nm / p * fs8 / (2.0 * jnp.pi))
        amp = jnp.sqrt(p)
        mask = (jnp.arange(6) < nh).astype(dtype)
        num = jnp.sum(amp * inst * mask)
        den = jnp.sum(amp * ks * mask)
        score_sum = jnp.sum(jnp.abs((inst / ks - f0i) / f0i) * mask)
        rf0 = num / (den + cfg.K_MY_SAFE_GUARD_MINIMUM)
        score = 1.0 / (score_sum / nh.astype(dtype)
                       + cfg.K_MY_SAFE_GUARD_MINIMUM)
        bad = (rf0 < f0_floor) | (rf0 > f0_ceil) | (score < 2.5)
        return jnp.where(bad, 0.0, rf0), jnp.where(bad, 0.0, score)

    return jax.vmap(one)(positions, f0s)


def _fft_size_for(f0, fs8):
    h = (1.5 * fs8 / f0 + 1.0).astype(np.int64)
    e = np.floor(np.log(h * 2.0 + 1.0) / cfg.K_LOG2).astype(np.int64)
    return (4 * (2 ** e)).astype(np.int64)


def _refine_all_slab(y, cands, fs8: float, f0_floor: float,
                     f0_ceil: float, frame_chunk: int = 128):
    """refine_all on per-frame SLABS (f32, integer samples-per-frame):
    one static-slice slab row per 1 ms frame, shared by all of the
    frame's candidates — no per-pair dynamic slices (the r5 D4C slab
    pattern; 182k vmapped 341-wide slices were the harvest profile's
    dominant cost).  The window floats inside the row; the IF readouts
    |sm|^2 and Im(conj(sm)*sd) are offset-invariant, so no phase
    correction is needed."""
    from hts_train_world_tpu.ops import d4c as _d4c
    from hts_train_world_tpu.ops import fftmat as _fm
    dtype = y.dtype
    T, NC = cands.shape
    step = int(fs8 * 0.001)
    h_cap = int(1.5 * fs8 / f0_floor + 1.0)
    W = 2 * h_cap + 1
    e_max = int(math.log(W * 1.0) / cfg.K_LOG2)
    B = 4 * (2 ** e_max)
    pad_slab = h_cap + 4
    W2 = -(-(2 * h_cap + 9) // 128) * 128
    slab = _d4c._slab_frames(y, T, step, pad_slab, W2, dtype)
    C, S = _fm.rfft_mats(B, dtype)
    if W2 <= B:
        C, S = C[:W2], S[:W2]
    else:  # mod-N extension (tiny f0_floor); power/cross are invariant
        Ce, Se = _fm._rfft_mats_ext_np(B, W2)
        C, S = jnp.asarray(Ce, dtype), jnp.asarray(Se, dtype)
    mm_i = jnp.arange(W2)
    ks = jnp.arange(1, 7, dtype=dtype)
    kmask6 = jnp.arange(6)

    def frame(row, t, f0row):
        pos = t.astype(dtype) * jnp.asarray(0.001, dtype)
        # identical int index stream as the generic path: the window
        # sample index (base_index - 1) = t*step - pad_slab + m
        idx_f = (t * step - pad_slab + mm_i).astype(dtype)
        tmp_all = idx_f / fs8 - pos            # shared across candidates

        def cand(f0i):
            ok = f0i > 0
            f0s = jnp.where(ok, f0i, 100.0)
            h = (1.5 * fs8 / f0s + 1.0).astype(jnp.int32)
            e_c = jnp.floor(jnp.log((h * 2.0 + 1.0).astype(dtype))
                            / cfg.K_LOG2).astype(jnp.int32)
            r = (B // 4) >> e_c
            bc_half = 2 * (1 << e_c)
            base0 = prims.matlab_round_i(
                (pos + (-h).astype(dtype) / fs8) * fs8 + 0.001)
            d = jnp.clip(base0 - 1 + pad_slab - t * step, 0, W2 - 1)
            valid = (mm_i >= d) & (mm_i <= d + 2 * h)
            wt = (2.0 * h.astype(dtype) + 1.0) / fs8
            mw = (0.42 + 0.5 * jnp.cos(2 * jnp.pi * tmp_all / wt)
                  + 0.08 * jnp.cos(4 * jnp.pi * tmp_all / wt))
            mw = jnp.where(valid, mw, 0.0)
            mw_p = jnp.concatenate([mw[1:], jnp.zeros(1, dtype)])
            mw_m = jnp.concatenate([jnp.zeros(1, dtype), mw[:-1]])
            dw = jnp.where(valid, -(mw_p - mw_m) / 2.0, 0.0)
            return row * mw, row * dw, f0s, h, e_c, r, bc_half, ok

        segmw, segdw, f0s, h, e_c, r, bc_half, ok = jax.vmap(cand)(f0row)
        sm_re, sm_im = _fm.mm(segmw, C), _fm.mm(segmw, S)
        sd_re, sd_im = _fm.mm(segdw, C), _fm.mm(segdw, S)

        def read(smr, smi, sdr, sdi, f0s, e_c, r, bc_half, ok):
            nh = jnp.minimum((fs8 / 2.0 / f0s).astype(jnp.int32), 6)
            idx_c = jnp.clip(prims.matlab_round_i(
                f0s * (4 * (1 << e_c)).astype(dtype) / fs8 * ks),
                0, bc_half)
            idx = idx_c * r
            p = jnp.take(smr, idx) ** 2 + jnp.take(smi, idx) ** 2
            nm = (jnp.take(smr, idx) * jnp.take(sdi, idx)
                  - jnp.take(smi, idx) * jnp.take(sdr, idx))
            inst = jnp.where(p == 0.0, 0.0,
                             idx_c.astype(dtype) * fs8
                             / (4 * (1 << e_c)).astype(dtype)
                             + nm / p * fs8 / (2.0 * jnp.pi))
            amp = jnp.sqrt(p)
            mask = (kmask6 < nh).astype(dtype)
            num = jnp.sum(amp * inst * mask)
            den = jnp.sum(amp * ks * mask)
            score_sum = jnp.sum(jnp.abs((inst / ks - f0s) / f0s) * mask)
            rf0 = num / (den + cfg.K_MY_SAFE_GUARD_MINIMUM)
            score = 1.0 / (score_sum / nh.astype(dtype)
                           + cfg.K_MY_SAFE_GUARD_MINIMUM)
            bad = ((rf0 < f0_floor) | (rf0 > f0_ceil) | (score < 2.5)
                   | ~ok)
            return jnp.where(bad, 0.0, rf0), jnp.where(bad, 0.0, score)

        return jax.vmap(read)(sm_re, sm_im, sd_re, sd_im, f0s, e_c, r,
                              bc_half, ok)

    padT = (-T) % frame_chunk
    slab_p = jnp.concatenate([slab, jnp.zeros((padT, W2), dtype)])
    tvals = jnp.arange(T + padT, dtype=jnp.int32)
    cands_p = jnp.concatenate([cands, jnp.zeros((padT, NC), dtype)])

    def block(args):
        rows, ts, frows = args
        return jax.vmap(frame)(rows, ts, frows)

    nb = (T + padT) // frame_chunk
    rf, sc = jax.lax.map(block, (
        slab_p.reshape(nb, frame_chunk, W2),
        tvals.reshape(nb, frame_chunk),
        cands_p.reshape(nb, frame_chunk, NC)))
    return (rf.reshape(-1, NC)[:T], sc.reshape(-1, NC)[:T])


def refine_all(y, positions, cands, fs8: float, f0_floor: float,
               f0_ceil: float, chunk: int = 8192):
    """GetRefinedF0 (harvest.cpp:589-617) for EVERY (frame, candidate)
    pair on device — the TPU replacement for the host bucket dispatch.

    The reference picks a per-candidate FFT size B_c = 4*2^floor(log2(w))
    (w = window length).  Instead of one dispatch per size, every pair is
    transformed once at the static worst-case size B (the B_c for
    f0_floor) and harmonic bins are read at stride r = B/B_c: for a
    signal that is zero beyond the window, DFT_B[m*r] == DFT_{B_c}[m]
    exactly, so the per-candidate size semantics are preserved to FFT
    rounding.  Pairs are processed in `chunk`-sized blocks via lax.map to
    bound memory; zero candidates are masked (cost: they still compute).
    """
    dtype = y.dtype
    L = y.shape[0]
    # slab fast path: f32 on the regular 1 ms grid with an integer
    # samples-per-frame step (`positions` IS that grid here — the only
    # caller is _harvest_back_trace)
    step_f = fs8 * 0.001
    if dtype == jnp.float32 and float(step_f).is_integer():
        return _refine_all_slab(y, cands, fs8, f0_floor, f0_ceil)
    h_cap = int(1.5 * fs8 / f0_floor + 1.0)
    W = 2 * h_cap + 1
    e_max = int(math.log(W * 1.0) / cfg.K_LOG2)
    B = 4 * (2 ** e_max)
    T, NC = cands.shape
    P = T * NC
    pad = (-P) % chunk
    flat_f0 = jnp.concatenate(
        [cands.reshape(-1), jnp.zeros(pad, dtype)])
    flat_pos = jnp.concatenate(
        [jnp.broadcast_to(positions[:, None], (T, NC)).reshape(-1),
         jnp.zeros(pad, dtype)])
    fast = dtype == jnp.float32
    if fast:
        from hts_train_world_tpu.ops import fftmat
        padn = h_cap + 8
        ypad = jnp.concatenate([jnp.full(padn, y[0], dtype), y,
                                jnp.full(padn + W, y[-1], dtype)])
        C, S = fftmat.rfft_mats(B, dtype)
        C, S = C[:W], S[:W]
    jj = jnp.arange(W)
    ks = jnp.arange(1, 7, dtype=dtype)
    kmask6 = jnp.arange(6)

    def one(pos, f0i):
        ok = f0i > 0
        f0s = jnp.where(ok, f0i, 100.0)
        h = (1.5 * fs8 / f0s + 1.0).astype(jnp.int32)
        e_c = jnp.floor(jnp.log((h * 2.0 + 1.0).astype(dtype))
                        / cfg.K_LOG2).astype(jnp.int32)
        r = (B // 4) >> e_c            # = B / B_c  (B_c = 4 * 2^e_c)
        bc_half = 2 * (1 << e_c)       # = B_c / 2
        valid = jj <= 2 * h
        wt = (2.0 * h.astype(dtype) + 1.0) / fs8
        base0 = prims.matlab_round_i(
            (pos + (-h).astype(dtype) / fs8) * fs8 + 0.001)
        base_index = base0 + jj
        tmp = (base_index.astype(dtype) - 1.0) / fs8 - pos
        mw = (0.42 + 0.5 * jnp.cos(2 * jnp.pi * tmp / wt)
              + 0.08 * jnp.cos(4 * jnp.pi * tmp / wt))
        mw = jnp.where(valid, mw, 0.0)
        mw_p = jnp.concatenate([mw[1:], jnp.zeros(1, dtype)])
        mw_m = jnp.concatenate([jnp.zeros(1, dtype), mw[:-1]])
        dw = jnp.where(valid, -(mw_p - mw_m) / 2.0, 0.0)
        if fast:
            seg = jax.lax.dynamic_slice(
                ypad, (jnp.clip(base0 - 1 + padn, 0, None),), (W,))
            from hts_train_world_tpu.ops import fftmat as _fm
            sm_re, sm_im = _fm.mm(seg * mw, C), _fm.mm(seg * mw, S)
            sd_re, sd_im = _fm.mm(seg * dw, C), _fm.mm(seg * dw, S)
        else:
            seg = jnp.take(y, jnp.clip(base_index - 1, 0, L - 1),
                           mode="clip")
            sm = jnp.fft.rfft(seg * mw, B)
            sd = jnp.fft.rfft(seg * dw, B)
            sm_re, sm_im = jnp.real(sm), jnp.imag(sm)
            sd_re, sd_im = jnp.real(sd), jnp.imag(sd)
        nh = jnp.minimum((fs8 / 2.0 / f0s).astype(jnp.int32), 6)
        idx_c = jnp.clip(prims.matlab_round_i(
            f0s * (4 * (1 << e_c)).astype(dtype) / fs8 * ks), 0, bc_half)
        idx = idx_c * r
        p = (jnp.take(sm_re, idx) ** 2 + jnp.take(sm_im, idx) ** 2)
        nm = (jnp.take(sm_re, idx) * jnp.take(sd_im, idx)
              - jnp.take(sm_im, idx) * jnp.take(sd_re, idx))
        inst = jnp.where(p == 0.0, 0.0,
                         idx_c.astype(dtype) * fs8
                         / (4 * (1 << e_c)).astype(dtype)
                         + nm / p * fs8 / (2.0 * jnp.pi))
        amp = jnp.sqrt(p)
        mask = (kmask6 < nh).astype(dtype)
        num = jnp.sum(amp * inst * mask)
        den = jnp.sum(amp * ks * mask)
        score_sum = jnp.sum(jnp.abs((inst / ks - f0s) / f0s) * mask)
        rf0 = num / (den + cfg.K_MY_SAFE_GUARD_MINIMUM)
        score = 1.0 / (score_sum / nh.astype(dtype)
                       + cfg.K_MY_SAFE_GUARD_MINIMUM)
        bad = ((rf0 < f0_floor) | (rf0 > f0_ceil) | (score < 2.5) | ~ok)
        return jnp.where(bad, 0.0, rf0), jnp.where(bad, 0.0, score)

    def block(args):
        return jax.vmap(one)(*args)

    rf, sc = jax.lax.map(block, (flat_pos.reshape(-1, chunk),
                                 flat_f0.reshape(-1, chunk)))
    return (rf.reshape(-1)[:P].reshape(T, NC),
            sc.reshape(-1)[:P].reshape(T, NC))


def refine_candidates(y, fs8: float, temporal, cands: np.ndarray,
                      f0_floor: float, f0_ceil: float):
    """RefineF0Candidates (harvest.cpp:622-631): flatten valid pairs,
    bucket by FFT size, run on device, scatter back."""
    T, NC = cands.shape
    refined = np.zeros_like(cands)
    scores = np.zeros_like(cands)
    ti, ci = np.nonzero(cands > 0.0)
    if len(ti) == 0:
        return refined, scores
    f0s = cands[ti, ci]
    poss = np.asarray(temporal)[ti]
    sizes = _fft_size_for(f0s, fs8)
    for B in _refine_buckets(fs8, f0_floor, f0_ceil):
        sel = sizes == B
        if not sel.any():
            continue
        m = int(sel.sum())
        pad = 1 << max(6, (m - 1).bit_length())  # quantize compile shapes
        p = np.zeros(pad)
        f = np.full(pad, 100.0)
        p[:m] = poss[sel]
        f[:m] = f0s[sel]
        r, s = _refine_bucket(y, jnp.asarray(p, y.dtype),
                              jnp.asarray(f, y.dtype), fs8, B, f0_floor,
                              f0_ceil)
        refined[ti[sel], ci[sel]] = np.asarray(r)[:m]
        scores[ti[sel], ci[sel]] = np.asarray(s)[:m]
    return refined, scores


# ---------------------------------------------------------------------------
# host: candidate consolidation + contour fixing (faithful serial logic)
# ---------------------------------------------------------------------------


def detect_official_candidates(raw: np.ndarray, max_candidates: int):
    """DetectOfficialF0Candidates (harvest.cpp:388-412)."""
    n_ch, T = raw.shape
    out = np.zeros((T, max_candidates))
    nc = 0
    for i in range(T):
        vuv = (raw[:, i] > 0).astype(np.int64)
        vuv[0] = vuv[-1] = 0
        d = np.diff(vuv)
        st = np.nonzero(d == 1)[0] + 1
        ed = np.nonzero(d == -1)[0] + 1
        k = 0
        for s, e in zip(st, ed):
            if e - s < 10:
                continue
            out[i, k] = raw[s:e, i].mean()
            k += 1
        nc = max(nc, k)
    return out, nc


def overlap_candidates(cands: np.ndarray, nc: int):
    """OverlapF0Candidates (harvest.cpp:417-429), n=3."""
    T = cands.shape[0]
    n = 3
    for i in range(1, n + 1):
        for j in range(nc):
            cands[i:, j + nc * i] = cands[:T - i, j]
            cands[:T - i, j + nc * (i + n)] = cands[i:, j]
    return cands


def remove_unreliable(cands: np.ndarray, scores: np.ndarray):
    """RemoveUnreliableCandidates (harvest.cpp:652-688), vectorized."""
    T, NC = cands.shape
    snapshot = cands.copy()
    for i in range(1, T - 1):
        ref = snapshot[i]  # (NC,)
        nonz = ref != 0
        if not nonz.any():
            continue
        e1 = np.abs(ref[:, None] - snapshot[i + 1][None, :]) \
            / np.where(nonz, ref, 1.0)[:, None]
        e2 = np.abs(ref[:, None] - snapshot[i - 1][None, :]) \
            / np.where(nonz, ref, 1.0)[:, None]
        min_err = np.minimum(np.minimum(e1.min(1), 1.0),
                             np.minimum(e2.min(1), 1.0))
        kill = nonz & (min_err > 0.05)
        cands[i, kill] = 0.0
        scores[i, kill] = 0.0
    return cands, scores


def _select_best_f0(reference, candidates, allowed_range):
    """SelectBestF0 (harvest.cpp:636-650): <= accepts, last-min wins."""
    best_f0, best_error = 0.0, allowed_range
    for c in candidates:
        tmp = abs(reference - c) / reference
        if tmp > best_error:
            continue
        best_f0, best_error = c, tmp
    return best_f0, best_error


def _boundary_list(f0):
    """GetBoundaryList (harvest.cpp:727-743): [st, ed-1] pairs."""
    vuv = (np.asarray(f0) > 0).astype(np.int64)
    vuv[0] = vuv[-1] = 0
    out = []
    n = 0
    for i in range(1, len(f0)):
        if vuv[i] != vuv[i - 1]:
            out.append(i - n % 2)
            n += 1
    return out


def fix_contour(cands: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """FixF0Contour (harvest.cpp:1027-1044)."""
    T, NC = cands.shape
    # SearchF0Base (:693-705): strict > keeps the first max; zero if none
    base = np.zeros(T)
    best = np.zeros(T)
    for j in range(NC):
        better = scores[:, j] > best
        base[better] = cands[better, j]
        best[better] = scores[better, j]

    # FixStep1 (:710-722), allowed_range 0.008; untouched entries are 0
    # (the reference leaves them uninitialized — zeros on a fresh heap);
    # zero divisors give inf in C, i.e. the condition holds
    s1 = np.zeros(T)
    for i in range(2, T):
        if base[i] == 0.0:
            continue
        ref = base[i - 1] * 2 - base[i - 2]
        c1 = True if ref == 0.0 else abs((base[i] - ref) / ref) > 0.008
        c2 = True if base[i - 1] == 0.0 else (
            abs(base[i] - base[i - 1]) / base[i - 1] > 0.008)
        s1[i] = 0.0 if (c1 and c2) else base[i]

    # FixStep2 (:748-762), voice_range_minimum 6
    s2 = s1.copy()
    bl = _boundary_list(s1)
    for i in range(len(bl) // 2):
        if bl[2 * i + 1] - bl[2 * i] < 6:
            s2[bl[2 * i]:bl[2 * i + 1] + 1] = 0.0

    # FixStep3 (:968-995): Extend + Merge
    s3 = _fix_step3(s2, cands, scores, allowed_range=0.18)

    # FixStep4 (:1000-1022), threshold 9
    s4 = s3.copy()
    bl = _boundary_list(s3)
    for i in range(len(bl) // 2 - 1):
        dist = bl[(i + 1) * 2] - bl[i * 2 + 1] - 1
        if dist >= 9:
            continue
        tmp0 = s3[bl[i * 2 + 1]] + 1
        tmp1 = s3[bl[(i + 1) * 2]] - 1
        coefficient = (tmp1 - tmp0) / (dist + 1.0)
        count = 1
        for jj in range(bl[i * 2 + 1] + 1, bl[(i + 1) * 2]):
            s4[jj] = tmp0 + coefficient * count
            count += 1
    return s4


def _extend_f0(extended, origin, last, shift, cands, allowed_range):
    """ExtendF0 (harvest.cpp:791-820); mutates `extended`, returns the
    shifted boundary."""
    threshold = 4
    tmp_f0 = extended[origin]
    shifted = origin
    count = 0
    for i in range(abs(last - origin) + 1):
        idx = origin + shift * i
        v, _ = _select_best_f0(tmp_f0, cands[idx + shift], allowed_range)
        extended[idx + shift] = v
        if v == 0.0:
            count += 1
        else:
            tmp_f0 = v
            count = 0
            shifted = idx + shift
        if count == threshold:
            break
    return shifted


def _fix_step3(s2, cands, scores, allowed_range):
    T = len(s2)
    s3 = s2.copy()
    bl = _boundary_list(s2)
    n_sec = len(bl) // 2
    if n_sec == 0:
        return s3
    multi = []
    for i in range(n_sec):
        ch = np.zeros(T)
        ch[bl[2 * i]:bl[2 * i + 1] + 1] = s2[bl[2 * i]:bl[2 * i + 1] + 1]
        multi.append(ch)
    bl = list(bl)

    # Extend (:861-878)
    for i in range(n_sec):
        bl[2 * i + 1] = _extend_f0(multi[i], bl[2 * i + 1],
                                   min(T - 2, bl[2 * i + 1] + 100), 1,
                                   cands, allowed_range)
        bl[2 * i] = _extend_f0(multi[i], bl[2 * i],
                               max(1, bl[2 * i] - 100), -1, cands,
                               allowed_range)

    # ExtendSub (:840-856) — note the running (never reset) mean_f0
    count = 0
    mean_f0 = 0.0
    for i in range(n_sec):
        st, ed = bl[2 * i], bl[2 * i + 1]
        for jv in multi[i][st:ed]:
            mean_f0 += jv
        mean_f0 /= ed - st
        if 2200.0 / mean_f0 < ed - st:
            multi[count], multi[i] = multi[i], multi[count]
            bl[2 * count], bl[2 * i] = bl[2 * i], bl[2 * count]
            bl[2 * count + 1], bl[2 * i + 1] = bl[2 * i + 1], bl[2 * count + 1]
            count += 1
    n_keep = count
    if n_keep == 0:
        return s3

    # MergeF0 (:937-963); MakeSortedOrder's literal insertion sort
    # (:883-896 — the comparison always reads the CURRENT order[i])
    order = list(range(n_keep))
    for i in range(1, n_keep):
        for j in range(i - 1, -1, -1):
            if bl[order[j] * 2] > bl[order[i] * 2]:
                order[i], order[j] = order[j], order[i]
            else:
                break
    # the base contour is array slot 0 (NOT order[0]) and the loop visits
    # order[1..] — reproduced literally (harvest.cpp:944-947)
    merged = multi[0].copy()
    for i in range(1, n_keep):
        o = order[i]
        if bl[o * 2] - bl[1] > 0:  # disjoint: append
            merged[bl[o * 2]:bl[o * 2 + 1] + 1] = \
                multi[o][bl[o * 2]:bl[o * 2 + 1] + 1]
            bl[0] = bl[o * 2]
            bl[1] = bl[o * 2 + 1]
        else:  # overlap: merge by score (:912-932)
            bl[1] = _merge_f0_sub(merged, bl[0], bl[1], multi[o],
                                  bl[o * 2], bl[o * 2 + 1], cands, scores)
    return merged


def _search_score(f0, cand_row, score_row):
    """SearchScore (harvest.cpp:901-907)."""
    score = 0.0
    for c, s in zip(cand_row, score_row):
        if f0 == c and score < s:
            score = s
    return score


def _merge_f0_sub(f0_1, st1, ed1, f0_2, st2, ed2, cands, scores):
    """MergeF0Sub (harvest.cpp:912-932); mutates f0_1 (merged contour)."""
    if st1 <= st2 and ed1 >= ed2:
        return ed1
    score1 = score2 = 0.0
    for i in range(st2, ed1 + 1):
        score1 += _search_score(f0_1[i], cands[i], scores[i])
        score2 += _search_score(f0_2[i], cands[i], scores[i])
    if score1 > score2:
        f0_1[ed1:ed2 + 1] = f0_2[ed1:ed2 + 1]
    else:
        f0_1[st2:ed2 + 1] = f0_2[st2:ed2 + 1]
    return ed2


def smooth_contour(f0: np.ndarray) -> np.ndarray:
    """SmoothF0Contour (harvest.cpp:1049-1113): per-section zero-lag
    2nd-order Butterworth with held edges."""
    b = (0.0078202080334971724, 0.015640416066994345)
    a = (1.7347257688092754, -0.76600660094326412)
    lag = 300
    T = len(f0)
    ext = np.zeros(T + 2 * lag)
    ext[lag:lag + T] = f0
    out = np.zeros(T)
    bl = _boundary_list(ext)

    def filt(x):
        w0 = w1 = 0.0
        y = np.empty_like(x)
        for i in range(len(x)):
            wt = x[i] + a[0] * w0 + a[1] * w1
            y[len(x) - i - 1] = b[0] * wt + b[1] * w0 + b[0] * w1
            w1, w0 = w0, wt
        return y

    for i in range(len(bl) // 2):
        st, ed = bl[2 * i], bl[2 * i + 1]
        ch = np.zeros(len(ext))
        ch[st:ed + 1] = ext[st:ed + 1]
        ch[:st] = ch[st]
        ch[ed + 1:] = ch[ed]
        sm = filt(filt(ch))
        out[st - lag:ed + 1 - lag] = sm[st:ed + 1]
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _harvest_front_trace(x, fs: int, f0_floor: float, f0_ceil: float):
    """Decimation -> band filtering -> candidate detection + overlap.
    Returns (y, cands (T1, nc_pad), nc)."""
    L = int(x.shape[0])
    plan = harvest_plan(L, fs, f0_floor, f0_ceil)
    T1 = cfg.samples_for_dio(fs, L, 1.0)
    y = _waveform_sub(x, L, plan["ratio"], plan["y_length"])
    y = y - jnp.mean(y)
    raw = _raw_candidates(
        y, plan["actual_fs"], plan["fft_size"], plan["y_length"], T1,
        tuple(plan["boundaries"]), f0_floor, f0_ceil, 1.0)
    cands, nc = hf.detect_candidates(raw, plan["nc_pad"])
    return y, hf.overlap_candidates(cands, nc), nc


def _harvest_back_trace(y, cands, fs8: float, f0_floor: float,
                        f0_ceil: float):
    """Refinement -> pruning -> contour fixing -> smoothing on a
    (T1, NC) candidate field (NC may be sliced to the true 7*nc)."""
    T1 = int(cands.shape[0])
    positions = jnp.arange(T1, dtype=y.dtype) * 0.001
    refined, scores = refine_all(y, positions, cands, fs8, f0_floor,
                                 f0_ceil)
    refined, scores = hf.remove_unreliable(refined, scores)
    s4 = hf.fix_contour(refined, scores, hf.step3_section_cap(T1))
    return hf.smooth_contour(s4, hf.smooth_section_cap(T1))


def harvest_f0_trace(x, fs: int, f0_floor: float = cfg.K_FLOOR_F0,
                     f0_ceil: float = cfg.K_CEIL_F0):
    """Jittable/vmappable Harvest: x (L,) -> f0 on the 1 ms grid, fully
    on device (HarvestGeneralBody, harvest.cpp:1155-1218) in a single
    trace (worst-case candidate width).  Use inside jit/vmap; `harvest`
    instead runs the two-stage dispatch below, which is faster."""
    plan = harvest_plan(int(x.shape[0]), fs, f0_floor, f0_ceil)
    y, cands, _ = _harvest_front_trace(x, fs, f0_floor, f0_ceil)
    return _harvest_back_trace(y, cands, plan["actual_fs"], f0_floor,
                               f0_ceil)


@partial(jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil"))
def _harvest_front(x, fs: int, f0_floor: float, f0_ceil: float):
    return _harvest_front_trace(x, fs, f0_floor, f0_ceil)


@partial(jax.jit, static_argnames=("fs8", "f0_floor", "f0_ceil"))
def _harvest_back(y, cands, fs8: float, f0_floor: float, f0_ceil: float):
    return _harvest_back_trace(y, cands, fs8, f0_floor, f0_ceil)


_NC_BUCKETS = (1, 2, 3, 4, 6, 8, 13)


@partial(jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil"))
def _harvest_front_b(xs, fs: int, f0_floor: float, f0_ceil: float):
    return jax.vmap(
        lambda x: _harvest_front_trace(x, fs, f0_floor, f0_ceil))(xs)


@partial(jax.jit, static_argnames=("fs8", "f0_floor", "f0_ceil"))
def _harvest_back_b(ys, candss, fs8: float, f0_floor: float,
                    f0_ceil: float):
    return jax.vmap(lambda y, c: _harvest_back_trace(
        y, c, fs8, f0_floor, f0_ceil))(ys, candss)


def _bucket_width(nc, plan) -> int:
    """Candidate-column width for the refine stage.  `nc` is the true
    base candidate count (host int or traced scalar).  Tracer-safe:
    under an enclosing jit the count cannot be fetched, so fall back to
    the static worst case (still exact, just more refine work).  Beyond
    the largest bucket, fall back to the exact bound rather than capping
    (custom f0 ranges can exceed 13 base candidates)."""
    if isinstance(nc, jax.core.Tracer):
        return plan["nc_pad"]
    nc_v = max(int(nc), 1)
    ncb = next((b for b in _NC_BUCKETS if b >= nc_v), None)
    if ncb is None:
        return plan["nc_pad"]
    return min(OVERLAP_PARAMETER * ncb, plan["nc_pad"])


def harvest_f0_batch(xs, fs: int, f0_floor: float = cfg.K_FLOOR_F0,
                     f0_ceil: float = cfg.K_CEIL_F0, width: int = None):
    """Batched Harvest: xs (B, L) -> f0 (B, T1) on the 1 ms grid, with
    the same two-stage width dispatch as `harvest` (the bucket follows
    the batch MAX candidate count, so every utterance stays exact).

    Jit-composable: under an enclosing jit the one-scalar width sync is
    impossible, so the dispatch falls back to the worst-case width
    (exact, slower).  Callers who know the width statically can pass
    `width=` to keep the fast path inside jit."""
    plan = harvest_plan(int(xs.shape[1]), fs, f0_floor, f0_ceil)
    ys, cs, ncs = _harvest_front_b(xs, fs, f0_floor, f0_ceil)
    if width is None:
        width = _bucket_width(jnp.max(ncs), plan)
    return _harvest_back_b(ys, cs[:, :, :width], plan["actual_fs"],
                           f0_floor, f0_ceil)


def _harvest_core(x, fs: int, f0_floor: float, f0_ceil: float):
    """Two-stage device dispatch: the front runs at the worst-case
    candidate width, then ONE scalar fetch of the true per-frame
    candidate count picks a bucketed column width for the expensive
    refinement (pairs beyond 7*nc are all zero, so slicing is exact) —
    3-6x less refine work on typical audio at the cost of one sync.
    The sync only happens for eager callers; under jit `_bucket_width`
    falls back to the worst-case width."""
    plan = harvest_plan(int(x.shape[0]), fs, f0_floor, f0_ceil)
    y, cands, nc = _harvest_front(x, fs, f0_floor, f0_ceil)
    width = _bucket_width(nc, plan)
    return _harvest_back(y, cands[:, :width], plan["actual_fs"],
                         f0_floor, f0_ceil)


def harvest(x, fs: int, frame_period: float = 5.0,
            f0_floor: float = cfg.K_FLOOR_F0, f0_ceil: float = cfg.K_CEIL_F0,
            contour: str = "device"):
    """Harvest (harvest.cpp:1223-1255) -> (temporal_positions, f0).

    contour="device" (default) runs everything — band filtering,
    candidate consolidation, IF refinement, the FixStep/Extend/Merge
    machinery and the Butterworth smoothing — as one jitted program
    (ops/harvest_fix.py).  contour="host" keeps the faithful serial
    numpy transcription used as the test oracle."""
    x = jnp.asarray(x)
    L = int(x.shape[0])
    plan = harvest_plan(L, fs, f0_floor, f0_ceil)
    fs8 = plan["actual_fs"]
    T1 = cfg.samples_for_dio(fs, L, 1.0)  # basic 1 ms grid

    if contour == "device":
        f0_1ms = _harvest_core(x, fs, f0_floor, f0_ceil)
    else:
        y = _waveform_sub(x, L, plan["ratio"], plan["y_length"])
        y = y - jnp.mean(y)
        raw = np.asarray(_raw_candidates(
            y, fs8, plan["fft_size"], plan["y_length"], T1,
            tuple(plan["boundaries"]), f0_floor, f0_ceil, 1.0))
        cands, nc = detect_official_candidates(raw, plan["max_candidates"])
        cands = overlap_candidates(cands, nc)
        nc_total = nc * OVERLAP_PARAMETER
        cands = cands[:, :nc_total] if nc_total else cands[:, :1]
        temporal1 = np.arange(T1) * 0.001
        refined, rscores = refine_candidates(y, fs8, temporal1, cands,
                                             f0_floor, f0_ceil)
        refined, rscores = remove_unreliable(refined, rscores)
        best = fix_contour(refined, rscores)
        f0_1ms = jnp.asarray(smooth_contour(best), x.dtype)

    # decimate the 1 ms contour to the target frame period (:1246-1251)
    T = cfg.samples_for_dio(fs, L, frame_period)
    temporal = np.arange(T) * frame_period / 1000.0
    idx = np.minimum(T1 - 1, np.trunc(temporal * 1000.0 + 0.5).astype(int))
    return (jnp.asarray(temporal, x.dtype),
            jnp.asarray(f0_1ms)[jnp.asarray(idx)].astype(x.dtype))

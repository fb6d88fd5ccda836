"""L0 math primitives — vectorized JAX equivalents of the reference's
Ooura-FFT wrappers and MATLAB-compat helpers.

References (all into /root/reference/externs/WORLD_v2/):
- src/matlabfunctions.cpp : interp1/histc (:136-182), interp1Q (:220-241),
  decimate (:27-125,184-210), matlab_round (:212-214), fftshift (:129-134)
- src/common.cpp : GetSuitableFFTSize (:51-54), DCCorrection (:56-75),
  LinearSmoothing (:77-111), NuttallWindow (:113-121),
  GetMinimumPhaseSpectrum (:182-220)
- src/fft.cpp : the wrapper's conventions map to numpy's as
    r2c forward  == jnp.fft.rfft
    c2r backward == jnp.fft.irfft(X) * n      (unnormalized, fft.cpp:26-47)
    c2c forward  == jnp.fft.fft
    c2c backward == jnp.fft.ifft(X) * n

Design: every function is shape-static and mask-driven so it vmaps over
frames/bands; per-frame dynamic extents (window lengths, smoothing
boundaries) are traced values used only in masks and gather indices, never
in shapes.  All math follows the input dtype (float64 in parity mode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# rounding / indexing
# ---------------------------------------------------------------------------


def tiny_floor(dtype):
    """Positivity floor for log/divide guards: far below any value the
    double-precision parity path produces (no-op there), but large enough
    to absorb float32 cancellation noise in the fast path."""
    return jnp.asarray(jnp.finfo(dtype).tiny * 8.0, dtype)


def exact_div(x, divisor: float):
    """IEEE-exact division by a compile-time constant.

    XLA folds division by a literal into multiply-by-reciprocal (1 ulp
    off C's `/`).  Hiding the divisor behind an optimization barrier
    forces a true divide — used where a single ulp changes discrete
    decisions (e.g. synthesis pulse positions)."""
    den = jax.lax.optimization_barrier(jnp.asarray(divisor, x.dtype))
    return x / den


# NOTE: a chunked-triangular-matmul "cumsum_mxu" was prototyped in r3 as
# a candidate replacement for jnp.cumsum on long rows; measured on the
# chip (tools/profile_zc.py) it was within noise of XLA's cumsum at the
# shapes this framework hits (608x16000: 25.3 vs 25.5 ms), so it was
# removed rather than wired in.


def compact_indices(mask, cap: int, fill_value: int):
    """Positions of True entries in ascending order, padded to `cap` with
    fill_value — semantically jnp.nonzero(mask, size=cap, fill_value=...).

    Implemented as lax.top_k over negated (masked) indices: the first
    `cap` ascending True positions are the top-k of -idx.  Exact (integer
    comparisons) on every backend, and 8x faster on TPU than the
    previous cumsum+searchsorted binary search (32 ms vs 254 ms for
    608x16000 at cap 2624 — tools/profile_zc.py), which lowered to a
    sequential while_loop of gathers."""
    n = mask.shape[-1]
    k = min(cap, n)
    idx = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    topv, _ = jax.lax.top_k(-idx, k)
    pos = -topv
    if k < cap:
        pos = jnp.concatenate(
            [pos, jnp.full(cap - k, n, jnp.int32)])
    n_true = jnp.sum(mask)
    return jnp.where(jnp.arange(cap) < n_true, pos, fill_value)


def matlab_round(x):
    """matlabfunctions.cpp:212-214 — round-half-away-from-zero via trunc."""
    return jnp.trunc(jnp.where(x > 0, x + 0.5, x - 0.5))


def matlab_round_i(x):
    return matlab_round(x).astype(jnp.int32)


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------


def interp1(x, y, xi, n_valid=None, exact=False):
    """MATLAB-style linear interpolation with end extrapolation.

    matlabfunctions.cpp:157-182 (histc bin search :136-155).  `x` must be
    ascending on its valid prefix; `n_valid` (traced ok) masks a padded
    tail.  Index selection matches histc: k = #(x <= xi) clipped to
    [1, n_valid-1]; out-of-range xi extrapolate linearly.

    exact=True blocks XLA's FMA contraction of the final multiply-add so
    the result is bit-identical to the C's separate mul/add — needed when
    downstream discrete decisions (synthesis pulse positions) hang on the
    last ulp.
    """
    n = x.shape[-1]
    if n_valid is None:
        xm = x
        kmax = n - 1
    else:
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
        xm = jnp.where(jnp.arange(n) < n_valid, x, big)
        kmax = jnp.maximum(n_valid - 1, 1)
    # method: the default binary search lowers to a sequential
    # while_loop of gathers on TPU; 'sort' is 3x faster there
    # (tools/profile_zc.py) and returns identical indices.  f64 parity
    # runs live on CPU where the binary search wins — keep it there.
    method = "sort" if x.dtype == jnp.float32 else "scan"
    k = jnp.searchsorted(xm, xi, side="right", method=method)
    k = jnp.clip(k, 1, kmax)
    x0 = jnp.take(x, k - 1, mode="clip")
    x1 = jnp.take(x, k, mode="clip")
    y0 = jnp.take(y, k - 1, mode="clip")
    y1 = jnp.take(y, k, mode="clip")
    if exact:
        # isolate every constituent from surrounding fusion/contraction so
        # the arithmetic is the C's plain sub/div/mul/add sequence
        xi, x0, x1, y0, y1 = jax.lax.optimization_barrier(
            (xi, x0, x1, y0, y1))
        s = jax.lax.optimization_barrier((xi - x0) / (x1 - x0))
        prod = jax.lax.optimization_barrier(s * (y1 - y0))
        return y0 + prod
    s = (xi - x0) / (x1 - x0)
    return y0 + s * (y1 - y0)


def interp1_regular_grid(x, y, T: int, fp: float, n_valid=None):
    """interp1(x, y, arange(T)*fp) for ASCENDING x and the REGULAR query
    grid t_q = float32(q)*fp — no searchsorted at all.

    The interpolant is piecewise linear: out_q = c_k + m_k * t_q with
    k = clip(#(x <= t_q), 1, n-1).  Each x_i owns a first-covered query
    qlo_i (the smallest q with x_i <= t_q, found EXACTLY by comparing
    against the f32 grid values), so the per-segment slope/intercept
    become cumulative sums of deltas scattered at qlo — one f32
    scatter-add + cumsum instead of a sort per call (~4x cheaper at the
    harvest zero-crossing shapes).  Arithmetic differs from interp1 by
    f32 reassociation (c + m*t vs y0 + s*dy), so this is a FAST-path
    primitive; parity paths keep interp1."""
    dtype = x.dtype
    n = x.shape[-1]
    kmax = (n - 1) if n_valid is None else jnp.maximum(n_valid - 1, 1)
    valid = jnp.arange(n) < (n if n_valid is None else n_valid)
    fpv = jnp.asarray(fp, dtype)

    # smallest q with x_i <= q*fp, exact on the f32 grid
    q0 = jnp.floor(x / fpv).astype(jnp.int32)
    q0 = jnp.clip(q0, 0, T)
    qlo = jnp.where(x <= q0.astype(dtype) * fpv, q0, q0 + 1)
    qlo = jnp.where(x <= 0.0, 0, qlo)           # negative x covers q=0
    qlo = jnp.where(valid, qlo, T + 1)          # masked tail: dropped

    # per-segment slope + LOCAL anchor (x0, y0); segment k spans
    # [x[k-1], x[k]).  out = y0 + m*(t - x0) keeps every cumsum
    # telescoping (the global-intercept form c + m*t cancels
    # catastrophically when closely spaced x make |m| huge)
    m = (y[1:] - y[:-1]) / (x[1:] - x[:-1])
    seg_ok = jnp.arange(1, n) <= kmax           # segments 1..kmax
    m = jnp.where(seg_ok, m, 0.0)
    # piecewise-constant (M, X0, Y0) over q: start at segment 1's
    # values, add deltas when the count reaches k+1 (at qlo of x_k)
    ok_t = seg_ok[1:]                            # transition target valid
    dm = jnp.where(ok_t, m[1:] - m[:-1], 0.0)
    dxa = jnp.where(ok_t, x[1:-1] - x[:-2], 0.0)
    dya = jnp.where(ok_t, y[1:-1] - y[:-2], 0.0)
    pos = qlo[1:-1]                              # qlo of x_k, k=1..n-2
    Mq = m[0] + jnp.cumsum(jnp.zeros(T, dtype).at[pos].add(dm, mode="drop"))
    X0 = x[0] + jnp.cumsum(jnp.zeros(T, dtype).at[pos].add(dxa, mode="drop"))
    Y0 = y[0] + jnp.cumsum(jnp.zeros(T, dtype).at[pos].add(dya, mode="drop"))
    t = jnp.arange(T, dtype=dtype) * fpv
    return Y0 + Mq * (t - X0)


def interp1q(x0, shift, y, xi, n_valid=None):
    """Uniform-grid linear interpolation, matlabfunctions.cpp:220-241.

    xi_base is trunc((xi-x0)/shift) with NO clamping in the reference (the
    caller guarantees range); we clip gathers for memory safety only.
    delta_y[last] = 0 (diff with trailing zero).
    """
    n = y.shape[-1]
    last = (n - 1) if n_valid is None else (n_valid - 1)
    pos = (xi - x0) / shift
    base = jnp.trunc(pos).astype(jnp.int32)
    frac = pos - base
    basec = jnp.clip(base, 0, n - 1)
    y0 = jnp.take(y, basec, mode="clip")
    y1 = jnp.take(y, jnp.clip(basec + 1, 0, n - 1), mode="clip")
    dy = jnp.where(basec < last, y1 - y0, jnp.zeros((), y.dtype))
    return y0 + dy * frac


# ---------------------------------------------------------------------------
# decimation (forward-backward order-3 IIR, hardcoded per-ratio coefficients)
# ---------------------------------------------------------------------------

_DECIMATE_COEF = {
    # r: (a0, a1, a2, b0, b1)  — matlabfunctions.cpp:27-113
    11: (2.450743295230728, -2.06794904601978, 0.59574774438332101,
         0.0026822508007163792, 0.0080467524021491377),
    12: (2.4981398605924205, -2.1368928194784025, 0.62187513816221485,
         0.0021097275904709001, 0.0063291827714127002),
    10: (2.3936475118069387, -1.9873904075111861, 0.5658879979027055,
         0.0034818622251927556, 0.010445586675578267),
    9: (2.3236003491759578, -1.8921545617463598, 0.53148928133729068,
        0.0046331164041389372, 0.013899349212416812),
    8: (2.2357462340187593, -1.7780899984041358, 0.49152555365968692,
        0.0063522763407111993, 0.019056829022133598),
    7: (2.1225239019534703, -1.6395144861046302, 0.44469707800587366,
        0.0090366882681608418, 0.027110064804482525),
    6: (1.9715352749512141, -1.4686795689225347, 0.3893908434965701,
        0.013469181309343825, 0.040407543928031475),
    5: (1.7610939654280557, -1.2554914843859768, 0.3237186507788215,
        0.021334858522387423, 0.06400457556716227),
    4: (1.4499664446880227, -0.98943497080950582, 0.24578252340690215,
        0.036710750339322612, 0.11013225101796784),
    3: (0.95039378983237421, -0.67429146741526791, 0.15412211621346475,
        0.071221945171178636, 0.21366583551353591),
    2: (0.041156734567757189, -0.42599112459189636, 0.041037215479961225,
        0.16797464681802227, 0.50392394045406674),
}


_AFFINE_KERNEL_CACHE: dict = {}


def _affine_kernel(coefs: tuple, d: int, block: int):
    """Host-precomputed (f64 numpy) operators for the block evaluation of
    s_t = A s_{t-1} + x_t: matrix powers F_k = A^k for k <= block, the
    lower-triangular block-Toeplitz kernel K[(i,:),(j,:)] = F_{i-j}, and
    the block-step matrix F_block."""
    key = (coefs, d, block)
    hit = _AFFINE_KERNEL_CACHE.get(key)
    if hit is not None:
        return hit
    A = np.zeros((d, d))
    A[0, :] = coefs
    A[1:, :-1] = np.eye(d - 1)
    F = np.empty((block + 1, d, d))
    F[0] = np.eye(d)
    for k in range(block):
        F[k + 1] = A @ F[k]
    K = np.zeros((block, d, block, d))
    for i in range(block):
        for j in range(i + 1):
            K[i, :, j, :] = F[i - j]
    out = (F[1:block + 1], K.reshape(block * d, block * d), F[block])
    _AFFINE_KERNEL_CACHE[key] = out
    return out


def affine_scan(coefs: tuple, x):
    """Prefix states of s_t = A s_{t-1} + x_t for the companion matrix A
    of `coefs` (s_t[0] = sum_k coefs[k] * s_{t-1}[k] + x_t[0]; the rest
    shift).  x: (L, d); returns (L, d) states with s_{-1} = 0.

    TPU-first block-Toeplitz evaluation: within each block of 512 steps,
    q_i = sum_j A^{i-j} x_j is ONE matmul against a host-precomputed f64
    power kernel (direct sums of decayed terms — numerically benign,
    unlike an associative scan of the non-normal companion matrices,
    whose transient growth amplified f32 roundoff to ~5% of signal
    scale); block-start states follow a tiny L/512-step carry scan, and
    s_i = F_{i+1} s_start + q_i finishes in parallel.  For f32 fast
    paths; f64 parity IIRs keep their exact sequential scans."""
    block = 512
    L, d = x.shape
    Fj, Kmat, Fb = _affine_kernel(tuple(float(c) for c in coefs), d, block)
    dtype = x.dtype
    pad = (-L) % block
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, block * d)
    nb = xb.shape[0]
    # HIGHEST: the TPU default matmul precision is bf16-class, which
    # would put ~1e-2 relative error straight into the filtered signal
    hi = jax.lax.Precision.HIGHEST
    q = jnp.matmul(xb, jnp.asarray(Kmat.T, dtype),
                   precision=hi).reshape(nb, block, d)

    Fb_j = jnp.asarray(Fb, dtype)

    def carry(s, q_last):
        s_next = Fb_j @ s + q_last
        return s_next, s

    _, starts = jax.lax.scan(carry, jnp.zeros(d, dtype), q[:, -1, :])
    s = jnp.einsum("kij,bj->bki", jnp.asarray(Fj, dtype), starts,
                   precision=hi) + q
    return s.reshape(-1, d)[:L]


def _iir_filter_for_decimate(x, r: int):
    """matlabfunctions.cpp:115-124 — order-3 IIR.  f64 keeps the exact
    sequential lax.scan; f32 runs the recurrence as a log-depth
    associative affine scan (the filter is stable, so reassociation
    error stays bounded) — ~50x faster on TPU for ~100 k samples."""
    a0, a1, a2, b0, b1 = _DECIMATE_COEF[r]
    dtype = x.dtype

    if dtype == jnp.float32:
        xin = jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)
        s = affine_scan((a0, a1, a2), xin)  # (L,3) = (w_t, w_t-1, w_t-2)
        w = s[:, 0]
        w1 = jnp.concatenate([jnp.zeros(1, dtype), w[:-1]])
        w2 = jnp.concatenate([jnp.zeros(2, dtype), w[:-2]])
        w3 = jnp.concatenate([jnp.zeros(3, dtype), w[:-3]])
        return b0 * w + b1 * w1 + b1 * w2 + b0 * w3

    def body(wc, xt):
        w0, w1, w2 = wc
        wt = xt + a0 * w0 + a1 * w1 + a2 * w2
        yt = b0 * wt + b1 * w0 + b1 * w1 + b0 * w2
        return (wt, w0, w1), yt

    zero = jnp.zeros((), dtype)
    _, y = jax.lax.scan(body, (zero, zero, zero), x, unroll=64)
    return y


def decimate(x, r: int):
    """matlabfunctions.cpp:184-210 — reflect-pad(9), filt-rev-filt-rev,
    strided pick.  `r` is static."""
    nfact = 9
    L = x.shape[0]
    head = 2 * x[0] - x[nfact - jnp.arange(nfact)]
    tail = 2 * x[L - 1] - x[L - 2 - jnp.arange(nfact)]
    tmp = jnp.concatenate([head, x, tail])
    tmp = _iir_filter_for_decimate(tmp, r)[::-1]
    tmp = _iir_filter_for_decimate(tmp, r)[::-1]
    nout = (L - 1) // r + 1
    nbeg = r - r * nout + L
    # The C loop (matlabfunctions.cpp:204-206) runs i in [nbeg, L+9) step r,
    # emitting up to 2 more values than the MATLAB nout; DIO reads
    # 1 + L//r values (dio.cpp:590), so we emit the full C count and let
    # callers slice.
    count = (L + nfact - 1 - nbeg) // r + 1
    idx = nbeg + np.arange(count) * r + nfact - 1
    return tmp[idx]


# ---------------------------------------------------------------------------
# windows / misc
# ---------------------------------------------------------------------------


def fftshift(x):
    """matlabfunctions.cpp:129-134 (even length)."""
    h = x.shape[-1] // 2
    return jnp.concatenate([x[..., h:], x[..., :h]], axis=-1)


def nuttall_window(n: int, dtype=jnp.float64):
    """common.cpp:113-121."""
    t = jnp.arange(n, dtype=dtype) / (n - 1.0)
    return (0.355768 - 0.487396 * jnp.cos(2 * jnp.pi * t)
            + 0.144232 * jnp.cos(4 * jnp.pi * t)
            - 0.012604 * jnp.cos(6 * jnp.pi * t))


def nuttall_window_masked(max_len: int, length, dtype=jnp.float64):
    """Nuttall window of traced `length` zero-padded to static `max_len`."""
    i = jnp.arange(max_len, dtype=dtype)
    t = i / (length - 1.0)
    w = (0.355768 - 0.487396 * jnp.cos(2 * jnp.pi * t)
         + 0.144232 * jnp.cos(4 * jnp.pi * t)
         - 0.012604 * jnp.cos(6 * jnp.pi * t))
    return jnp.where(jnp.arange(max_len) < length, w, jnp.zeros((), dtype))


# ---------------------------------------------------------------------------
# spectral helpers
# ---------------------------------------------------------------------------


def sum_top_k(p, k: int):
    """EXACT sum of the k largest entries of a non-negative f32 array
    (last axis), via binary search on the int32 bit pattern (monotone
    for non-negative floats) + a masked sum with tie correction — ~3x
    faster than jax.lax.top_k on TPU at D4C's shapes (no sorting
    network, just 32 masked reductions).  Ties share one exact float
    value, so (k - count_gt) * tie_value is exact."""
    b = jax.lax.bitcast_convert_type(p, jnp.int32)

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        gt = jnp.sum(b > mid[..., None], axis=-1) >= k
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    # derive the carry init from b (value: lo=-1 so zeros count as > lo)
    # so it inherits b's varying manual axes — a plain constant breaks
    # the scan carry typecheck under shard_map
    z = b[..., 0] & 0
    lo = z - 1
    hi = z + jnp.int32(0x7f7fffff)
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    thr = hi[..., None]
    gt_mask = b > thr
    n_gt = jnp.sum(gt_mask, axis=-1)
    s_gt = jnp.sum(jnp.where(gt_mask, p, 0.0), axis=-1)
    tie = jax.lax.bitcast_convert_type(hi, jnp.float32)
    return s_gt + (k - n_gt).astype(p.dtype) * tie


def dc_correction(ps, f0, fs: int, fft_size: int, ul_max: int):
    """common.cpp:56-75 — mirror sub-F0 power back below F0.

    ps: (..., fft_size/2+1) power spectrum; f0 traced per frame;
    ul_max: static bound on upper_limit (= 2 + f0_max*N/fs).
    """
    dtype = ps.dtype
    half = fft_size // 2
    i = jnp.arange(ul_max)
    if dtype == jnp.float32 and ps.ndim == 1:
        # fast path: the tap positions pos_i = f0*N/fs - i DESCEND by
        # exactly one bin per tap with a CONSTANT fraction, so the two
        # interp1Q gathers are one reversed contiguous slice; taps with
        # pos < 0 fall outside the used range (i <= int(f0*N/fs)) and
        # are masked, so the floor/trunc divergence there is irrelevant
        c = f0 * fft_size / fs
        ic = jnp.trunc(c).astype(jnp.int32)
        frac = c - jnp.trunc(c)
        psp = jnp.concatenate([jnp.full((ul_max,), ps[0], dtype), ps])
        s = jax.lax.dynamic_slice(psp, (ic,), (ul_max + 2,))
        y0 = jnp.flip(s[1:ul_max + 1])
        y1 = jnp.flip(s[2:ul_max + 2])
        replica = y0 + (y1 - y0) * frac
        add = jnp.where(i <= ic, replica, jnp.zeros((), dtype))
        return ps.at[..., :ul_max].add(add)
    upper_limit = 2 + (f0 * fft_size / fs).astype(jnp.int32)
    pos = f0 * fft_size / fs - i.astype(dtype)
    base = jnp.trunc(pos).astype(jnp.int32)
    basec = jnp.clip(base, 0, half)
    y0 = jnp.take(ps, basec, axis=-1, mode="clip")
    y1 = jnp.take(ps, jnp.clip(basec + 1, 0, half), axis=-1, mode="clip")
    # delta_y has x_length=UL+1 entries; last is zero (interp1Q semantics)
    dy = jnp.where(basec < upper_limit, y1 - y0, jnp.zeros((), dtype))
    frac = pos - jnp.trunc(pos)
    replica = y0 + dy * frac
    add = jnp.where(i < upper_limit - 1, replica, jnp.zeros((), dtype))
    return ps.at[..., :ul_max].add(add)


def linear_smoothing(ps, width, fs: int, fft_size: int, b_max: int):
    """common.cpp:77-111 — rectangular smoothing via mirrored cumsum and two
    interp1Q evaluations.  width traced per frame; b_max static bound on
    boundary = int(width*N/fs)+1.

    float32 fast path: the reference's per-frame mirror offset `b` cancels
    analytically in the high-low cumsum difference, so the mirror uses the
    STATIC b_max extent (constant indices -> slices/reverses, no gather)
    and the two interp1Q evaluations become per-frame dynamic_slice + lerp
    (contiguous, ~6x cheaper than elementwise gathers on TPU).  Not
    bit-identical to the C (different cumsum anchor); the f64 path below
    keeps the reference's exact evaluation order for parity."""
    dtype = ps.dtype
    half = fft_size // 2
    if dtype == jnp.float32:
        P = half + 2 * b_max + 1
        # static reflect o = half - |half - |m||, m in [-b_max, half+b_max],
        # spelled as flips + concat: index-array gathers serialize on TPU
        # while slices/reverses are free in the fusion
        mirror = jnp.concatenate([
            jnp.flip(ps[..., 1:b_max + 1], axis=-1), ps,
            jnp.flip(ps[..., half - b_max:half], axis=-1)], axis=-1)
        seg = jnp.cumsum(mirror * (fs / fft_size), axis=-1)
        wb = width * fft_size / fs / 2.0               # width in bins / 2
        s_lo = b_max - 0.5 - wb
        s_hi = b_max - 0.5 + wb

        def q(s):
            b0 = jnp.trunc(s).astype(jnp.int32)
            frac = s - jnp.trunc(s)
            win = jax.lax.dynamic_slice(
                seg, (jnp.clip(b0, 0, P - half - 2),), (half + 2,))
            return win[:-1] + frac * (win[1:] - win[:-1])

        return (q(s_hi) - q(s_lo)) / width
    b = (width * fft_size / fs).astype(jnp.int32) + 1
    P = half + 2 * b_max + 1
    p = jnp.arange(P)
    o = half - jnp.abs(half - jnp.abs(p - b))
    mirror = jnp.take(ps, jnp.clip(o, 0, half), axis=-1, mode="clip")
    seg = jnp.cumsum(mirror * (fs / fft_size), axis=-1)

    origin = -(b.astype(dtype) - 0.5) * fs / fft_size
    delta = fs / fft_size
    valid_last = half + 2 * b  # last valid index of seg

    def q(xi):
        pos = (xi - origin) / delta
        base = jnp.trunc(pos).astype(jnp.int32)
        frac = pos - base
        basec = jnp.clip(base, 0, P - 1)
        y0 = jnp.take(seg, basec, axis=-1, mode="clip")
        y1 = jnp.take(seg, jnp.clip(basec + 1, 0, P - 1), axis=-1, mode="clip")
        dy = jnp.where(basec < valid_last, y1 - y0, jnp.zeros((), dtype))
        return y0 + dy * frac

    freq = jnp.arange(half + 1, dtype=dtype) * fs / fft_size - width / 2.0
    return (q(freq + width) - q(freq)) / width


def minimum_phase_spectrum(log_half, fft_size: int):
    """common.cpp:182-220 — log half-spectrum -> complex min-phase spectrum.

    Input log_half: (..., N/2+1) = log|S| values (caller includes any /2);
    returns complex (..., N/2+1): exp of the causal-cepstrum spectrum.
    The reference mirrors, forward-rffts, conjugate-doubles the interior
    cepstrum bins, zeroes the anticausal half, c2c-forward-ffts, and
    exponentiates with 1/N scaling.
    """
    n = fft_size
    half = n // 2
    ls = jnp.concatenate([log_half, log_half[..., -2:0:-1]], axis=-1)
    C = jnp.conj(jnp.fft.rfft(ls, axis=-1))  # wrapper negates imag
    k = jnp.arange(half + 1)
    scale = jnp.where((k == 0) | (k == half), 1.0, 2.0).astype(log_half.dtype)
    cep_half = C * scale
    cep = jnp.concatenate(
        [cep_half, jnp.zeros(log_half.shape[:-1] + (n - half - 1,),
                             cep_half.dtype)], axis=-1)
    D = jnp.fft.fft(cep, axis=-1)[..., :half + 1]
    return jnp.exp(D / n)


def design_low_cut_filter(n: int, fft_size: int, dtype=jnp.float64):
    """dio.cpp:40-53 — zero-phase low-cut FIR (delta minus hanning LPF),
    already circularly rotated.  n, fft_size static."""
    i = np.arange(1, n + 1)
    lcf = np.zeros(fft_size)
    lcf[:n] = 0.5 - 0.5 * np.cos(i * 2.0 * np.pi / (n + 1))
    lcf[:n] = -lcf[:n] / lcf[:n].sum()
    lcf = np.roll(lcf, -((n - 1) // 2))
    lcf[0] += 1.0
    return jnp.asarray(lcf, dtype)

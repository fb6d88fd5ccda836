"""SPTK function subset — TPU-native equivalents of
test/sptkfunctions.cpp + test/theq.cpp (SURVEY.md N15/N16) and the SPTK
CLI tools driven by Training.pl (freqt/c2acr/mc2b/b2mc/mcep/mlpg).

All per-frame transforms are either cached matrices (the freqt/frqtr
recursions are linear) hitting the MXU, or batched FFT ops; mcep's
Newton-Raphson runs a fixed iteration count vectorized over frames with
the Toeplitz-plus-Hankel normal equations solved densely (vmapped
(m+1)x(m+1) solve — the reference's theq Levinson recursion computes the
same solution, theq.h:4-32).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops.codec import freqt_matrix  # noqa: F401 (re-export)


@functools.lru_cache(maxsize=None)
def frqtr_matrix(m1: int, m2: int, a: float):
    """frqtr (sptkfunctions.cpp:651-684) as a (m1+1, m2+1) matrix (the
    freqt recursion without the b*d[0] term)."""
    T = np.zeros((m1 + 1, m2 + 1))
    for u in range(m1 + 1):
        c1 = np.zeros(m1 + 1)
        c1[u] = 1.0
        g = np.zeros(m2 + 1)
        for i in range(-m1, 1):
            d = g.copy()
            gn = np.empty(m2 + 1)
            gn[0] = c1[-i]
            for j in range(1, m2 + 1):
                gn[j] = d[j - 1] + a * (d[j] - gn[j - 1])
            g = gn
        T[u] = g
    return T  # numpy: cached tables must not hold traced constants


def freqt(c, m2: int, a: float):
    """Frequency warping, batched: (..., m1+1) -> (..., m2+1)."""
    m1 = c.shape[-1] - 1
    return c @ freqt_matrix(m1, m2, a).astype(c.dtype)


def mc2b(mc, a: float):
    """mel-cepstrum -> MLSA filter coefficients: b[m]=c[m],
    b[i]=c[i]-a*b[i+1] (SPTK mc2b).  Linear -> cached matrix."""
    m = mc.shape[-1] - 1
    return mc @ _mc2b_matrix(m, a).astype(mc.dtype)


@functools.lru_cache(maxsize=None)
def _mc2b_matrix(m: int, a: float):
    M = np.zeros((m + 1, m + 1))
    for u in range(m + 1):
        c = np.zeros(m + 1)
        c[u] = 1.0
        b = np.zeros(m + 1)
        b[m] = c[m]
        for i in range(m - 1, -1, -1):
            b[i] = c[i] - a * b[i + 1]
        M[u] = b
    return M  # numpy: cached tables must not hold traced constants


def b2mc(b, a: float):
    """Inverse of mc2b: c[i] = b[i] + a*b[i+1] (SPTK b2mc)."""
    m = b.shape[-1] - 1
    shifted = jnp.concatenate(
        [b[..., 1:], jnp.zeros(b.shape[:-1] + (1,), b.dtype)], axis=-1)
    return b + a * shifted


def c2acr(c, m_out: int, fft_size: int):
    """cepstrum -> autocorrelation (SPTK c2acr): r = irfft(exp(2*Re C))."""
    spec = jnp.real(jnp.fft.rfft(c, fft_size, axis=-1))
    p = jnp.exp(2.0 * spec)
    r = jnp.fft.irfft(p, fft_size, axis=-1)
    return r[..., :m_out + 1]


def gnorm(c, g: float):
    """Gain normalization (sptkfunctions.cpp:313-328)."""
    if g != 0.0:
        k = 1.0 + g * c[..., :1]
        return jnp.concatenate([k ** (1.0 / g), c[..., 1:] / k], axis=-1)
    return jnp.concatenate([jnp.exp(c[..., :1]), c[..., 1:]], axis=-1)


def ignorm(c, g: float):
    """Inverse gain normalization (sptkfunctions.cpp:330-345)."""
    if g != 0.0:
        k = c[..., :1] ** g
        return jnp.concatenate([(k - 1.0) / g, k * c[..., 1:]], axis=-1)
    return jnp.concatenate([jnp.log(c[..., :1]), c[..., 1:]], axis=-1)


def theq_dense(t, h, b):
    """Solve (Toeplitz(t) + Hankel(h)) a = b (theq.cpp usage in mcep).

    t: (..., n) first column/row; h: (..., 2n-1) antidiagonals; b: (..., n).
    """
    n = t.shape[-1]
    i = jnp.arange(n)
    Ti = jnp.abs(i[:, None] - i[None, :])
    Hi = i[:, None] + i[None, :]
    A = jnp.take(t, Ti, axis=-1) + jnp.take(h, Hi, axis=-1)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def mcep(log_periodogram_half, order: int, alpha: float, fft_size: int,
         itr: int = 30):
    """Mel-cepstral analysis (sptkfunctions.cpp:11-184, itype-agnostic
    core): input log-periodogram (..., fft/2+1), fixed `itr` Newton steps
    (the reference stops early on convergence; a fixed count is the
    batched equivalent — pass the reference's itr2 for comparisons).
    """
    dtype = log_periodogram_half.dtype
    f2 = fft_size // 2
    m = order
    m2 = 2 * m
    logp = log_periodogram_half
    x_half = jnp.exp(logp)

    # initial cepstrum: c = irfft(log x) with ends halved
    cep = jnp.fft.irfft(logp, fft_size, axis=-1)
    cep = cep.at[..., 0].mul(0.5)
    cep = cep.at[..., f2].mul(0.5)
    mc = freqt(cep[..., :f2 + 1], m, alpha)

    al = jnp.asarray((-alpha) ** np.arange(m + 1), dtype)
    Tb = freqt_matrix(m, f2, -alpha).astype(dtype)
    Tr = frqtr_matrix(f2, m2, alpha).astype(dtype)

    def step(mc, _):
        c = mc @ Tb  # (..., f2+1) linear cepstrum
        spec = jnp.real(jnp.fft.rfft(c, fft_size, axis=-1))
        ratio_half = x_half / jnp.exp(2.0 * spec)
        r_full = jnp.fft.irfft(ratio_half, fft_size, axis=-1)
        r = r_full[..., :f2 + 1] @ Tr  # warped r(k), (..., 2m+1)
        b_vec = r[..., :m + 1] - al
        y = r[..., :m2 + 1]
        even = (jnp.arange(m2 + 1) % 2 == 0)
        y = jnp.where(even, y - r[..., :1], y)
        t = r[..., :m + 1]
        t_even = (jnp.arange(m + 1) % 2 == 0) & (jnp.arange(m + 1) >= 2)
        t = jnp.where(t_even, t + r[..., :1], t)
        t = t.at[..., 0].mul(2.0)
        d = theq_dense(t, y, b_vec)
        return mc + d, None

    mc, _ = jax.lax.scan(step, mc, None, length=itr)
    return mc


def gc2gc(c1, g1: float, m2: int, g2: float):
    """Generalized-cepstrum gamma conversion (sptkfunctions.cpp:347-385):
    c2[i] = ca[i] + (g2*ss2 - g1*ss1)/i with the serial in-index
    recurrence — run as a lax.scan over the output index, batched over
    leading dims."""
    m1 = c1.shape[-1] - 1
    ca = c1
    out0 = ca[..., 0]

    def step(c2_prev, i):
        # c2_prev: (..., m2+1) accumulating; compute c2[i] from entries < i
        k = jnp.arange(1, m2 + 1)
        valid = k <= jnp.minimum(m1, i - 1)
        cak = jnp.take(ca, jnp.clip(k, 0, m1), axis=-1)
        c2mk = jnp.take(c2_prev, jnp.clip(i - k, 0, m2), axis=-1)
        cc = jnp.where(valid, cak * c2mk, 0.0)
        ss2 = jnp.sum(k * cc, axis=-1)
        ss1 = jnp.sum((i - k) * cc, axis=-1)
        base = jnp.where(i <= m1,
                         jnp.take(ca, jnp.clip(i, 0, m1), axis=-1), 0.0)
        val = base + (g2 * ss2 - g1 * ss1) / i
        c2_new = c2_prev.at[..., i].set(val)
        return c2_new, None

    init = jnp.zeros(c1.shape[:-1] + (m2 + 1,), c1.dtype)
    init = init.at[..., 0].set(out0)
    out, _ = jax.lax.scan(step, init, jnp.arange(1, m2 + 1))
    return out


def mgc2mgc(c, a1: float, g1: float, m2: int, a2: float, g2: float):
    """mgc2mgc (sptkfunctions.cpp:221-254): frequency warp via freqt, then
    gnorm/gc2gc/ignorm for the gamma conversion."""
    a = (a2 - a1) / (1.0 - a1 * a2)
    if a == 0.0:
        m1 = c.shape[-1] - 1
        if m2 <= m1:
            w = c[..., :m2 + 1]
        else:
            pad = jnp.zeros(c.shape[:-1] + (m2 - m1,), c.dtype)
            w = jnp.concatenate([c, pad], axis=-1)
    else:
        w = freqt(c, m2, a)
    if g1 == g2:
        return w
    w = gnorm(w, g1)
    w = gc2gc(w, g1, m2, g2)
    return ignorm(w, g2)

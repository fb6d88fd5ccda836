"""MLPG (maximum-likelihood parameter generation) — the TPU-native
equivalent of SPTK `mlpg` (used by gen_param, Training.pl:2792-2804) and
the in-graph trajectory solve of DNNDefine.py:318-351.

Solves (W^T S W) c = W^T S mu per feature dimension, where W stacks the
delta windows over time and S is the diagonal precision.  For the standard
3-tap HTS windows the normal matrix is pentadiagonal, so instead of the
reference's dense [D, T, T] Cholesky (DNNDefine.py:345-351) we run a
banded LDL^T factorization as a lax.scan over frames (O(T) with tiny
carries), vmapped over dimensions.  Boundary taps outside [0, T) are
truncated (the reference's window-matrix slicing has the same effect,
DNNDefine.py:325-330).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WINDOWS = ((1.0,), (-0.5, 0.0, 0.5), (1.0, -2.0, 1.0))


def window_bandwidth(windows) -> int:
    return max((len(w) - 1) // 2 for w in windows)


def build_banded_normal(means, precisions, windows):
    """means/precisions: (T, n_win) for ONE dim.

    Returns (diags, rhs): diags[k] with diags[k][i] = A[i, i+k] for
    k = 0..2b (A symmetric, upper bands)."""
    T = means.shape[0]
    b2 = 2 * window_bandwidth(windows)
    dtype = means.dtype
    diags = jnp.zeros((b2 + 1, T), dtype)
    rhs = jnp.zeros(T, dtype)
    t = np.arange(T)
    for w_idx, w in enumerate(windows):
        nlr = (len(w) - 1) // 2
        p = precisions[:, w_idx]
        mu = means[:, w_idx]
        for ki, wk in enumerate(w):
            k = ki - nlr
            if wk == 0.0:
                continue
            vk = (t + k >= 0) & (t + k < T)
            ik = np.clip(t + k, 0, T - 1)
            rhs = rhs.at[ik].add(jnp.where(vk, p * mu * wk, 0.0))
            for kj, wj in enumerate(w):
                j = kj - nlr
                if wj == 0.0 or j < k:
                    continue
                off = j - k
                vj = vk & (t + j >= 0) & (t + j < T)
                diags = diags.at[off, ik].add(
                    jnp.where(vj, p * wk * wj, 0.0))
    return diags, rhs


def banded_ldlt_solve(diags, rhs):
    """Solve A c = rhs, A SPD pentadiagonal given as upper bands
    (diags: (3, T)).  LDL^T with unit lower L via forward scan, then
    back substitution via reverse scan."""
    assert diags.shape[0] == 3, "specialized to 3-tap windows (bandwidth 2)"
    T = diags.shape[1]
    dtype = diags.dtype
    zero = jnp.zeros((), dtype)
    a0 = diags[0]
    am1 = jnp.concatenate([zero[None], diags[1][:-1]])  # A[i, i-1]
    am2 = jnp.concatenate([zero[None], zero[None], diags[2][:-2]])

    def fwd(carry, inp):
        d1, d2, y1, y2, lp = carry  # d_{i-1}, d_{i-2}, y_{i-1}, y_{i-2},
        # lp = L[i-1, i-2]
        aii, ai1, ai2, r = inp
        l2 = ai2 / d2                       # L[i, i-2]
        l1 = (ai1 - l2 * d2 * lp) / d1      # L[i, i-1]
        d_i = aii - l1 * l1 * d1 - l2 * l2 * d2
        y_i = r - l1 * y1 - l2 * y2
        return (d_i, d1, y_i, y1, l1), (y_i, d_i, l1, l2)

    one = jnp.ones((), dtype)
    (_, _, _, _, _), (ys, ds, l1s, l2s) = jax.lax.scan(
        fwd, (one, one, zero, zero, zero), (a0, am1, am2, rhs), unroll=16)
    zs = ys / ds

    # back: c_i = z_i - L[i+1, i] c_{i+1} - L[i+2, i] c_{i+2}
    l1_next = jnp.concatenate([l1s[1:], zero[None]])
    l2_next2 = jnp.concatenate([l2s[2:], zero[None], zero[None]])

    def back(carry, inp):
        c1, c2 = carry
        z_i, ln1, ln2 = inp
        c_i = z_i - ln1 * c1 - ln2 * c2
        return (c_i, c1), c_i

    _, cs = jax.lax.scan(back, (zero, zero),
                         (zs[::-1], l1_next[::-1], l2_next2[::-1]),
                         unroll=16)
    return cs[::-1]


@partial(jax.jit, static_argnames=("windows",))
def mlpg(means, variances, windows=DEFAULT_WINDOWS):
    """means/variances: (T, n_win, D) -> statics (T, D)."""
    wins = tuple(tuple(w) for w in windows)
    if window_bandwidth(wins) == 0:
        # statics-only windows: W = I per window, so the normal system is
        # diagonal — the solution is the precision-weighted mean
        prec = 1.0 / variances
        return jnp.sum(means * prec, axis=1) / jnp.sum(prec, axis=1)

    def per_dim(mu, var):
        diags, rhs = build_banded_normal(mu, 1.0 / var, wins)
        return banded_ldlt_solve(diags, rhs)

    return jax.vmap(per_dim, in_axes=(2, 2), out_axes=1)(means, variances)


def mlpg_dense(means, variances, windows=DEFAULT_WINDOWS):
    """Dense reference solve (the DNNDefine.py formulation) for testing."""
    T, n_win, D = means.shape
    out = np.zeros((T, D))
    for d in range(D):
        A = np.zeros((T, T))
        r = np.zeros(T)
        for w_idx, w in enumerate(windows):
            nlr = (len(w) - 1) // 2
            W = np.zeros((T, T))
            for tt in range(T):
                for ki, wk in enumerate(w):
                    j = tt + ki - nlr
                    if 0 <= j < T:
                        W[tt, j] = wk
            p = 1.0 / np.asarray(variances)[:, w_idx, d]
            A += W.T @ (p[:, None] * W)
            r += W.T @ (p * np.asarray(means)[:, w_idx, d])
        out[:, d] = np.linalg.solve(A, r)
    return out

"""Delta-window expansion — TPU-native equivalent of
data/scripts/window.pl (SURVEY.md F3).

window.pl:100-139 semantics: for each window w of size 2n+1, the output at
frame t is sum_k w[k] * x[clamp(t+k, 0, T-1)]; if any tap inside the
window's nonzero support touches a frame equal to the -1e10 magic value the
output is -1e10 (MSD boundary propagation).  The default HTS windows are
[1], [-0.5, 0, 0.5], [1, -2, 1] (data/win/*.win1-3).

Vectorized as shifted adds on a (T, D) array; the clamp at the edges is a
gather on clipped frame indices; boundary propagation is an OR-reduce over
the same shifts.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAGIC = -1.0e10

DEFAULT_WINDOWS = (
    np.array([1.0]),
    np.array([-0.5, 0.0, 0.5]),
    np.array([1.0, -2.0, 1.0]),
)


def _support(win: np.ndarray):
    """chkbound flags (window.pl:81-91): taps between the first and last
    nonzero coefficient, inclusive.  Tap 0 (index -nlr) is always checked
    (the perl loop starts chkbound[0]... index j=0 stays 1)."""
    flags2 = np.ones(len(win), bool)
    for j in range(len(win)):
        if win[j] != 0.0:
            break
        flags2[j] = False
    for j in range(len(win) - 1, -1, -1):
        if win[j] != 0.0:
            break
        flags2[j] = False
    return flags2


def apply_window(x, win: np.ndarray):
    """One window over (T, D) statics -> (T, D)."""
    T = x.shape[0]
    nlr = (len(win) - 1) // 2
    support = _support(win)
    out = jnp.zeros_like(x)
    boundary = jnp.zeros(x.shape, bool)
    t = jnp.arange(T)
    for k in range(-nlr, nlr + 1):
        idx = jnp.clip(t + k, 0, T - 1)
        xi = x[idx]
        if win[k + nlr] != 0.0:
            out = out + win[k + nlr] * xi
        if support[k + nlr]:
            boundary = boundary | (xi == MAGIC)
    return jnp.where(boundary, MAGIC, out)


def expand(x, windows=DEFAULT_WINDOWS):
    """(T, D) statics -> (T, n_win*D) with per-window blocks in order
    [static | delta | delta-delta] (window.pl output layout)."""
    x = jnp.asarray(x)
    return jnp.concatenate([apply_window(x, np.asarray(w, x.dtype))
                            for w in windows], axis=-1)

"""Failure detection — the TPU analogue of the reference's per-utterance
NaN/clipping screening (data/Makefile.in:127-129,216-238) and its
die-on-error shell (Training.pl:1147-1156); see SURVEY.md §5.

- `clipping_ok`: int16 saturation check before analysis;
- `finite_mask`: per-utterance validity over a batch (aggregatable with
  psum in sharded runs) so bad utterances are dropped, not fatal;
- `debug_nans`: opt-in jax NaN debugging (the sanitizer analogue — the
  functional rewrite removed the reference's static-buffer data races,
  so NaN propagation is the remaining failure class).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def clipping_ok(x_int16_scale) -> bool:
    """data/Makefile.in:127-129: drop utterances touching the int16 rails."""
    import numpy as np
    v = np.asarray(x_int16_scale)
    return bool(v.min() > -32768 and v.max() < 32767)


def finite_mask(*arrays):
    """Per-utterance all-finite mask over batched (B, ...) arrays."""
    mask = None
    for a in arrays:
        m = jnp.all(jnp.isfinite(a), axis=tuple(range(1, a.ndim)))
        mask = m if mask is None else (mask & m)
    return mask


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)

"""Pallas TPU kernel: fused F0-adaptive frame windowing.

The hottest memory pattern in CheapTrick/D4C is building the (T, N)
windowed-waveform matrix: every frame gathers a variable-length,
F0-dependent slice of the utterance, multiplies a per-frame window, and
removes the window-weighted mean (cheaptrick.cpp:112-142, d4c.cpp:52-84).
XLA lowers the jnp formulation to a (T, N) gather with per-element
indices; this kernel instead issues ONE contiguous async copy per frame
(grid over frames, scalar-prefetched origins) from the edge-padded signal
in HBM into VMEM and fuses window synthesis + masking + the two
reductions.  Edge padding with replicated boundary samples implements the
reference's MyMinInt/MyMaxInt index clamp exactly.

The jnp formulation stays as the parity reference
(windowed_frames_reference) and the kernel is gated against it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS = 8  # sublane tile: 8 frames per grid step


def _kernel(origin_ref, h_ref, f0_ref, xpad_ref, out_ref, scratch, sems,
            *, N: int, fs: int, pad: int):
    i = pl.program_id(0)

    # start all 8 contiguous frame copies, overlapping their DMAs
    for k in range(ROWS):
        start = origin_ref[i * ROWS + k] - h_ref[i * ROWS + k] + pad
        pltpu.make_async_copy(xpad_ref.at[pl.ds(start, N)],
                              scratch.at[k], sems.at[k]).start()

    j = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 1)
    hs = jnp.stack([h_ref[i * ROWS + k] for k in range(ROWS)])[:, None]
    f0s = jnp.stack([f0_ref[i * ROWS + k] for k in range(ROWS)])[:, None]
    valid = j <= 2 * hs
    pos = (j.astype(jnp.float32) - hs.astype(jnp.float32)) \
        * (1.0 / (1.5 * fs))
    w = 0.5 * jnp.cos(jnp.pi * pos * f0s.astype(jnp.float32)) + 0.5
    w = jnp.where(valid, w, 0.0)
    w = w * jax.lax.rsqrt(jnp.sum(w * w, axis=1, keepdims=True))

    for k in range(ROWS):
        pltpu.make_async_copy(xpad_ref.at[pl.ds(0, N)], scratch.at[k],
                              sems.at[k]).wait()
    wave = jnp.where(valid, scratch[:, :] * w, 0.0)
    coef = (jnp.sum(wave, axis=1, keepdims=True)
            / jnp.sum(w, axis=1, keepdims=True))
    out_ref[:, :] = jnp.where(valid, wave - w * coef, 0.0)


@partial(jax.jit, static_argnames=("N", "fs", "interpret"))
def windowed_frames(x, origins, halfs, f0s, N: int, fs: int,
                    interpret: bool | None = None):
    """x (L,) f32; origins/halfs (T,) i32; f0s (T,) f32 -> (T, N)
    CheapTrick-windowed frames (Hann convention, noise-free fast path).

    interpret=None resolves at trace time: Mosaic on TPU, the Pallas
    interpreter elsewhere (so CPU tests exercise the same call path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = origins.shape[0]
    Tp = ((T + ROWS - 1) // ROWS) * ROWS
    if Tp != T:
        z = jnp.zeros(Tp - T, origins.dtype)
        origins = jnp.concatenate([origins, z])
        halfs = jnp.concatenate([halfs, z + 16])
        f0s = jnp.concatenate([f0s, jnp.full(Tp - T, 100.0, f0s.dtype)])
    pad = N
    xpad = jnp.pad(x, (pad, pad), mode="edge")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tp // ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, N), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, N), x.dtype),
                        pltpu.SemaphoreType.DMA((ROWS,))],
    )
    out = pl.pallas_call(
        partial(_kernel, N=N, fs=fs, pad=pad),
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins.astype(jnp.int32), halfs.astype(jnp.int32),
      f0s.astype(x.dtype), xpad)
    return out[:T]


def windowed_frames_reference(x, origins, halfs, f0s, N: int, fs: int):
    """The jnp formulation (parity reference for the kernel)."""
    L = x.shape[0]
    j = jnp.arange(N)

    def frame(origin, h, f0):
        valid = j <= 2 * h
        base = j - h
        safe = jnp.clip(origin + base, 0, L - 1)
        pos = base.astype(x.dtype) / 1.5 / fs
        w = 0.5 * jnp.cos(jnp.pi * pos * f0) + 0.5
        w = jnp.where(valid, w, 0.0)
        w = w / jnp.sqrt(jnp.sum(w * w))
        wave = jnp.where(valid, jnp.take(x, safe) * w, 0.0)
        coef = jnp.sum(wave) / jnp.sum(w)
        return jnp.where(valid, wave - w * coef, 0.0)

    return jax.vmap(frame)(origins, halfs, f0s.astype(x.dtype))

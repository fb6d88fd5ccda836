"""Batched, data-parallel WORLD analysis/synthesis over a device mesh.

The reference processes utterances in a shell loop (data/Makefile.in:125);
here a batch of equal-length utterances is one jitted program vmapped over
the batch axis and sharded over the mesh's `data` axis with shard_map.
Corpus statistics reduce with psum inside the mapped function, so the same
code runs 1-chip, 1-host-8-chip, and multi-host (BASELINE configs 4-5).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import cheaptrick as ct
from hts_train_world_tpu.ops import d4c as d4c_mod
from hts_train_world_tpu.ops import dio as dio_mod
from hts_train_world_tpu.ops import stonemask as sm
from hts_train_world_tpu.ops import synthesis as syn


def _grid_step(fs: int, frame_period: float) -> int:
    """Samples per frame when integral (enables d4c's slab fast path)."""
    gs = fs * frame_period / 1000.0
    return int(gs) if float(gs).is_integer() else 0


def _analyze_one(x, fs: int, frame_period: float, fft_size: int,
                 threshold: float):
    t, f0, _, _ = dio_mod.dio.__wrapped__(x, fs, frame_period)
    gs = _grid_step(fs, frame_period)
    f0 = sm.stonemask.__wrapped__(x, fs, t, f0, grid_step=gs)
    sp = ct.cheaptrick.__wrapped__(x, fs, t, f0, fft_size, grid_step=gs)
    ap, _ = d4c_mod.d4c.__wrapped__(x, fs, t, f0, fft_size, threshold,
                                    None, grid_step=gs)
    return t, f0, sp, ap


@partial(jax.jit, static_argnames=("fs", "frame_period", "d4c_threshold"))
def _batch_spectral(xs, ts, f0s, fs: int, frame_period: float,
                    d4c_threshold: float):
    N = cfg.cheaptrick_fft_size(fs)

    gs = _grid_step(fs, frame_period)

    def one(x, t, f0):
        sp = ct.cheaptrick.__wrapped__(x, fs, t, f0, N, grid_step=gs)
        ap, _ = d4c_mod.d4c.__wrapped__(x, fs, t, f0, N, d4c_threshold,
                                        None, grid_step=gs)
        return sp, ap

    return jax.vmap(one)(xs, ts, f0s)


def _batch_analyze_harvest(xs, fs: int, frame_period: float,
                           d4c_threshold: float):
    """Harvest lane: batched two-stage F0 (one host sync for the
    candidate-width dispatch) + batched CheapTrick/D4C."""
    from hts_train_world_tpu.ops import harvest as hv
    B, L = xs.shape
    f0_1ms = hv.harvest_f0_batch(xs, fs)
    T1 = cfg.samples_for_dio(fs, L, 1.0)
    T = cfg.samples_for_dio(fs, L, frame_period)
    tnp = np.arange(T) * frame_period / 1000.0
    idx = np.minimum(T1 - 1, np.trunc(tnp * 1000.0 + 0.5).astype(int))
    f0 = f0_1ms[:, jnp.asarray(idx)]
    t = jnp.broadcast_to(jnp.asarray(tnp, xs.dtype), (B, T))
    sp, ap = _batch_spectral(xs, t, f0, fs, frame_period, d4c_threshold)
    return t, f0, sp, ap


def _copy_synth_one(x, fs: int, frame_period: float, fft_size: int,
                    threshold: float, y_length: int, noise):
    t, f0, sp, ap = _analyze_one(x, fs, frame_period, fft_size, threshold)
    y = syn.synthesis.__wrapped__(f0, sp, ap, fft_size, frame_period, fs,
                                  y_length, noise, 0, False)
    return f0, sp, ap, y


@partial(jax.jit, static_argnames=("fs", "frame_period", "d4c_threshold"))
def _batch_analyze_dio(xs, fs: int, frame_period: float,
                       d4c_threshold: float):
    N = cfg.cheaptrick_fft_size(fs)
    return jax.vmap(lambda x: _analyze_one(x, fs, frame_period, N,
                                           d4c_threshold))(xs)


def batch_analyze(xs, fs: int, frame_period: float = 5.0,
                  d4c_threshold: float = 0.0, algorithm: str = "dio"):
    """xs: (B, L) equal-length utterances -> batched (t, f0, sp, ap).

    Fast mode (no reference noise stream): intended for TPU throughput;
    per-utterance parity runs use the single-utterance kernels.
    algorithm="harvest" swaps DIO+StoneMask for the device Harvest stack
    (ops/harvest_fix.py) — the WORLD library's harvest-based flow (two
    jitted stages + one scalar sync for the candidate-width dispatch).
    """
    if algorithm == "harvest":
        return _batch_analyze_harvest(xs, fs, frame_period, d4c_threshold)
    if algorithm != "dio":
        raise ValueError(f"unknown f0 algorithm {algorithm!r}")
    return _batch_analyze_dio(xs, fs, frame_period, d4c_threshold)


@partial(jax.jit, static_argnames=("fs", "frame_period", "y_length"))
def _count_pulses_b(f0s, fs: int, frame_period: float, y_length: int):
    N = cfg.cheaptrick_fft_size(fs)
    return jax.vmap(lambda f0: syn.count_pulses(
        f0, frame_period, fs, y_length, N))(f0s)


@partial(jax.jit, static_argnames=("fs", "frame_period", "d4c_threshold",
                                   "y_length"))
def _analyze_count_dio(xs, fs: int, frame_period: float,
                       d4c_threshold: float, y_length: int):
    """Analysis + pulse count in ONE program: the count is a tiny
    appendix to the analysis graph, and folding it in saves a whole
    relay round-trip per batch (~26-35 ms) on the two-stage path."""
    N = cfg.cheaptrick_fft_size(fs)
    t, f0, sp, ap = jax.vmap(lambda x: _analyze_one(
        x, fs, frame_period, N, d4c_threshold))(xs)
    ncs = jax.vmap(lambda f: syn.count_pulses(
        f, frame_period, fs, y_length, N))(f0)
    return t, f0, sp, ap, ncs


@partial(jax.jit, static_argnames=("fs", "frame_period", "y_length",
                                   "max_pulses"))
def _batch_synth(f0s, sps, aps, noise, fs: int, frame_period: float,
                 y_length: int, max_pulses: int):
    N = cfg.cheaptrick_fft_size(fs)
    return jax.vmap(lambda f0, sp, ap, nz: syn.synthesis.__wrapped__(
        f0, sp, ap, N, frame_period, fs, y_length, nz, max_pulses,
        False))(f0s, sps, aps, noise)


def _pulse_bucket(n: int, cap: int) -> int:
    """Smallest 128-aligned bucket >= n (bounded by the worst case)."""
    return min(cap, -(-max(n, 1) // 128) * 128)


def batch_copy_synth(xs, fs: int, frame_period: float = 5.0,
                     d4c_threshold: float = 0.0, algorithm: str = "dio",
                     noise=None, seed: int = 0):
    """Production batched copy-synthesis, two-stage: jitted batched
    analysis, ONE host fetch of the exact per-batch pulse count, then
    jitted synthesis at a bucketed max_pulses — typical audio carries
    2-4x fewer pulses than the worst-case static cap (f0_ceil-rate),
    and every per-pulse op scales with the cap (cf. harvest's
    candidate-width dispatch).  Exact: the bucket bounds the true count
    (+slack for cross-program f32 cumsum rounding); under an enclosing
    jit the dispatch falls back to the worst case.
    Returns (t, f0, sp, ap, y)."""
    B, L = xs.shape
    T = cfg.samples_for_dio(fs, L, frame_period)
    yl = int((T - 1) * frame_period / 1000.0 * fs) + 1
    if algorithm == "dio":
        t, f0, sp, ap, ncs = _analyze_count_dio(
            xs, fs, frame_period, d4c_threshold, yl)
    else:
        t, f0, sp, ap = batch_analyze(xs, fs, frame_period,
                                      d4c_threshold, algorithm)
        ncs = _count_pulses_b(f0, fs, frame_period, yl)
    cap = syn.default_max_pulses(yl, fs)
    mx = jnp.max(ncs)
    if isinstance(mx, jax.core.Tracer):
        bucket = cap
    else:
        bucket = _pulse_bucket(int(mx) + 8, cap)
    if noise is None:
        noise = synthesis_noise_batch(jax.random.PRNGKey(seed), B, yl,
                                      xs.dtype)
    y = _batch_synth(f0, sp, ap, noise, fs, frame_period, yl, bucket)
    return t, f0, sp, ap, y


def make_sharded_pipeline(mesh, fs: int, frame_period: float = 5.0,
                          d4c_threshold: float = 0.0, seed: int = 0):
    """Returns copy_synth(xs) jitted over the mesh: analysis -> stats
    (psum over data axis) -> resynthesis.  xs (B, L) must shard evenly
    over the `data` axis."""
    N = cfg.cheaptrick_fft_size(fs)

    def shard_fn(xs, noise):
        f0, sp, ap, y = jax.vmap(
            lambda x, nz: _copy_synth_one(
                x, fs, frame_period, N, d4c_threshold,
                int((cfg.samples_for_dio(fs, xs.shape[1], frame_period) - 1)
                    * frame_period / 1000.0 * fs) + 1, nz))(xs, noise)
        # corpus statistics: per-dim mean/var of log-envelope + voicing
        # rate, reduced across the mesh (the vstat/psum analogue)
        logsp = jnp.log(sp)
        s1 = jax.lax.psum(jnp.sum(logsp, axis=(0, 1)), "data")
        s2 = jax.lax.psum(jnp.sum(logsp * logsp, axis=(0, 1)), "data")
        n = jax.lax.psum(jnp.asarray(sp.shape[0] * sp.shape[1], logsp.dtype),
                         "data")
        voiced = jax.lax.psum(jnp.sum(f0 > 0), "data")
        mean = s1 / n
        var = s2 / n - mean * mean
        return f0, sp, ap, y, (mean, var, voiced)

    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P("data"), P("data")),
                           out_specs=(P("data"), P("data"), P("data"),
                                      P("data"), (P(), P(), P())))
    return jax.jit(mapped)


def synthesis_noise_batch(key, batch: int, y_length: int, dtype):
    import jax.random as jr
    return jr.normal(key, (batch, syn.synthesis_stream_len(y_length)), dtype)

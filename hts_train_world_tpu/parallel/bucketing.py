"""Length-bucketed batched analysis for heterogeneous corpora.

The reference analyzes one utterance per `analysis` process
(data/Makefile.in:125-241), so arbitrary lengths are free.  Our kernels
are shape-static (XLA compiles per (length, fs)); analyzing a corpus of
distinct lengths one-by-one would recompile per file.  This module
quantizes lengths into geometric buckets, zero-pads each utterance to
its bucket, runs the batched analyzer once per (bucket, batch-shape)
and trims results to the true frame counts — one compile per bucket
serves the whole corpus.

Padded analysis == analyzing the zero-padded audio (deterministic);
frames inside the true extent differ from exact-length analysis only
through DIO's utterance-level statistics (signal mean, band spectra),
which the padding perturbs marginally.  This is the fast corpus path;
per-utterance parity runs use exact lengths.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.parallel import batch as batch_mod


def bucket_length(n: int, growth: float = 1.26, align: int = 2048,
                  min_len: int = 4096) -> int:
    """Smallest bucket >= n on a geometric grid (aligned to `align`)."""
    if n <= min_len:
        return min_len
    steps = math.ceil(math.log(n / min_len) / math.log(growth))
    b = min_len * growth ** steps
    return int(math.ceil(b / align) * align)


def plan_buckets(lengths: Sequence[int], growth: float = 1.26,
                 align: int = 2048, min_len: int = 4096):
    """-> {bucket_len: [utterance indices]} with deterministic order."""
    plan = {}
    for i, n in enumerate(lengths):
        plan.setdefault(bucket_length(n, growth, align, min_len), []).append(i)
    return dict(sorted(plan.items()))


def bucketed_analyze(signals: Sequence[np.ndarray], fs: int,
                     frame_period: float = 5.0, d4c_threshold: float = 0.0,
                     growth: float = 1.26, max_batch: int = 16,
                     dtype=jnp.float32, algorithm: str = "dio",
                     pad_batch: bool = False) -> List[Tuple]:
    """Analyze a heterogeneous corpus with one compile per bucket shape.

    signals: list of 1-D float arrays (any lengths).  Returns a list of
    (temporal_positions, f0, spectrogram, aperiodicity) numpy tuples,
    each trimmed to the utterance's true frame count
    (cfg.samples_for_dio of the TRUE length — the `features` target's
    frame-count contract, data/Makefile.in:209-215).

    pad_batch=True pads every remainder group to max_batch rows (zero
    audio, results dropped), so each bucket compiles exactly ONE batch
    shape — worth it when compiles are expensive (the TPU relay) and
    the corpus is large relative to max_batch.
    """
    lengths = [len(s) for s in signals]
    plan = plan_buckets(lengths, growth)
    out: List[Tuple] = [None] * len(signals)
    for blen, idxs in plan.items():
        for at in range(0, len(idxs), max_batch):
            grp = idxs[at:at + max_batch]
            rows = max_batch if pad_batch else len(grp)
            xs = np.zeros((rows, blen), np.float64)
            for r, i in enumerate(grp):
                xs[r, :lengths[i]] = signals[i]
            t, f0, sp, ap = batch_mod.batch_analyze(
                jnp.asarray(xs, dtype), fs, frame_period, d4c_threshold,
                algorithm=algorithm)
            t, f0, sp, ap = (np.asarray(a) for a in (t, f0, sp, ap))
            for r, i in enumerate(grp):
                T = cfg.samples_for_dio(fs, lengths[i], frame_period)
                out[i] = (t[r, :T], f0[r, :T], sp[r, :T], ap[r, :T])
    return out


def bucket_compile_count(lengths: Sequence[int], growth: float = 1.26,
                         max_batch: int = 16) -> int:
    """Distinct (bucket_len, batch) shapes = number of XLA compiles."""
    plan = plan_buckets(lengths, growth)
    shapes = set()
    for blen, idxs in plan.items():
        n = len(idxs)
        while n > 0:
            shapes.add((blen, min(n, max_batch)))
            n -= max_batch
    return len(shapes)


def bucketed_extract(signals: Sequence[np.ndarray], fs: int,
                     frame_period: float = 5.0, d4c_threshold: float = 0.0,
                     growth: float = 1.26, max_batch: int = 16,
                     dtype=jnp.float32, algorithm: str = "dio",
                     pad_batch: bool = False, mgc_dim: int = 50,
                     bap_dim: int = 25) -> List[Tuple]:
    """The production FEATURE-EXTRACTION corpus path: bucketed batched
    analysis + on-device codec encoding, returning per-utterance
    (lf0, mgc, bap) numpy tuples trimmed to true frame counts — what the
    reference's `features` target writes per utterance
    (data/Makefile.in:209-215, analysis.cpp:293-358).  Encoding on
    device shrinks the host download from 2*(N/2+1) spectral bins to
    mgc_dim+bap_dim+1 floats per frame (~26x at 48 kHz) — the right
    production layout AND the difference between bandwidth-bound and
    compute-bound on a remote-attached TPU."""
    import jax
    from functools import partial as _partial
    from hts_train_world_tpu import cli as cli_mod

    N = cfg.cheaptrick_fft_size(fs)

    @_partial(jax.jit, static_argnames=())
    def encode_b(f0, sp, ap):
        import jax as _jax
        return _jax.vmap(lambda a, b, c: cli_mod.encode_features(
            a, b, c, fs, N, mgc_dim, bap_dim))(f0, sp, ap)

    lengths = [len(s) for s in signals]
    plan = plan_buckets(lengths, growth)
    out: List[Tuple] = [None] * len(signals)
    for blen, idxs in plan.items():
        for at in range(0, len(idxs), max_batch):
            grp = idxs[at:at + max_batch]
            rows = max_batch if pad_batch else len(grp)
            xs = np.zeros((rows, blen), np.float64)
            for r, i in enumerate(grp):
                xs[r, :lengths[i]] = signals[i]
            _, f0, sp, ap = batch_mod.batch_analyze(
                jnp.asarray(xs, dtype), fs, frame_period, d4c_threshold,
                algorithm=algorithm)
            lf0, mgc, bap = (np.asarray(a) for a in encode_b(f0, sp, ap))
            for r, i in enumerate(grp):
                T = cfg.samples_for_dio(fs, lengths[i], frame_period)
                out[i] = (lf0[r, :T], mgc[r, :T], bap[r, :T])
    return out

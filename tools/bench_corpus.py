#!/usr/bin/env python3
"""Corpus-scale TPU benchmark: native loader -> bucketed batched analysis.

Generates a mixed-length wav corpus, then measures wall time for the
full host+device path the pipeline's ANALYZE stage uses: C++ prefetch
loader -> length buckets -> batched WORLD analysis on the chip.
Prints one JSON line (audio-seconds of corpus per second of wall time).
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 16000
N_UTTS = 32


def make_corpus(d: str):
    from scipy.io import wavfile
    rng = np.random.default_rng(0)
    paths, total = [], 0.0
    for i in range(N_UTTS):
        n = int(FS * (1.0 + 2.0 * rng.random()))
        t = np.arange(n) / FS
        f0 = 150.0 + 80.0 * rng.random()
        x = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * t)
                for h, a in enumerate([0.5, 0.3, 0.15]))
        x = 0.7 * x / np.abs(x).max() + 0.005 * rng.standard_normal(n)
        p = os.path.join(d, f"u{i:03d}.wav")
        wavfile.write(p, FS, np.round(x * 30000).astype(np.int16))
        paths.append(p)
        total += n / FS
    return paths, total


def main():
    from hts_train_world_tpu.io import loader
    from hts_train_world_tpu.parallel import bucketing

    d = tempfile.mkdtemp(prefix="bench_corpus_")
    paths, audio_s = make_corpus(d)

    def run():
        sigs = loader.load_corpus(paths, loader.WAV, n_threads=8)
        res = bucketing.bucketed_analyze(sigs, FS, max_batch=8)
        # force a fetch per bucket result (relay is async)
        return float(sum(np.sum(r[1][:4]) for r in res))

    run()  # compile all bucket shapes
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "corpus_analysis_throughput",
        "value": round(audio_s / dt, 2),
        "unit": "audio_seconds/s/chip",
        "n_utts": N_UTTS,
        "audio_s": round(audio_s, 1),
        "wall_s": round(dt, 2),
        "buckets": bucketing.bucket_compile_count(
            [len(np.fromfile(p, "<i2")) - 22 for p in paths], max_batch=8),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Multi-host / multi-chip scaling run (BASELINE configs 4-5).

Runs the data-parallel WORLD copy-synthesis pipeline over the available
mesh, computes corpus statistics via psum, and reports throughput +
scaling efficiency at 1 chip vs N chips.

Real pod-slice usage: launch once per host with
  python tools/run_distributed.py --coordinator <host0>:1234 \
      --num-processes N --process-id i
Single-machine demo (8 virtual devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/run_distributed.py --virtual
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--virtual", action="store_true",
                    help="force CPU backend w/ virtual devices")
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--dur", type=float, default=2.0)
    ap.add_argument("--per-chip-batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    from hts_train_world_tpu.parallel import mesh as mesh_mod
    mesh_mod.distributed_init(args.coordinator, args.num_processes,
                              args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from hts_train_world_tpu import config as cfg
    from hts_train_world_tpu.parallel import batch as batch_mod

    n_dev = len(jax.devices())
    fs, dur = args.fs, args.dur
    L = int(fs * dur)
    T = cfg.samples_for_dio(fs, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * fs) + 1

    def corpus(n):
        rng = np.random.default_rng(0)
        t = np.arange(L) / fs
        return jnp.asarray(np.stack(
            [0.4 * np.sin(2 * np.pi * (170 + 7 * (i % 16)) * t)
             + 0.01 * rng.standard_normal(L) for i in range(n)]),
            jnp.float32)

    def measure(n_devices):
        m = mesh_mod.data_mesh(n_devices)
        fn = batch_mod.make_sharded_pipeline(m, fs)
        B = args.per_chip_batch * n_devices
        xs = corpus(B)
        noise = batch_mod.synthesis_noise_batch(
            jax.random.PRNGKey(0), B, yl, jnp.float32)
        out = fn(xs, noise)
        np.asarray(out[3][0, :4])  # force completion
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(xs, noise)
        np.asarray(out[3][0, :4])
        dt = (time.perf_counter() - t0) / args.iters
        return B * dur / dt, out[4]

    tput1, _ = measure(1)
    tputN, stats = measure(n_dev)
    eff = tputN / (tput1 * n_dev)
    report = {
        "devices": n_dev,
        "audio_s_per_s_1chip": round(tput1, 2),
        "audio_s_per_s_all": round(tputN, 2),
        "scaling_efficiency": round(eff, 3),
        "corpus_voiced_frames": int(stats[2]),
    }
    if args.process_id == 0:
        print(json.dumps(report))


if __name__ == "__main__":
    main()

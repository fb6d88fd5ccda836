#!/usr/bin/env python3
"""Multi-host / multi-process scaling run (BASELINE configs 4-5).

The reference's only concurrency is a local thread pool spawning shells
(data/scripts/parallel.py:17-56); the TPU-native replacement is the JAX
multi-process runtime: `jax.distributed.initialize` per host, one global
Mesh, shard_map + psum collectives.  This tool runs the data-parallel
WORLD copy-synthesis pipeline over that runtime and reports throughput,
psum-statistic invariance and scaling efficiency.

Modes:
  worker       one process of an N-process run (launched per host):
    python tools/run_distributed.py --coordinator host0:1234 \
        --num-processes N --process-id i [--virtual]
  --virtual    force the CPU backend with 4 virtual devices per process
               (the single-machine config-5 proxy: 2 OS processes,
               gloo/TCP collectives across the process boundary)
  --launch2    orchestrate the full config-5 proxy on this machine:
               a 1-process/8-device baseline, then a 2-process x
               4-device run with the SAME total batch, compare
               throughput + psum stats, write the JSON artifact
               (DISTRIBUTED_r05.json).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VIRT_DEVS = 4  # per process under --virtual


def run_worker(args) -> dict:
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.virtual_devices}")
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

    devs = jax.devices()
    n_dev = len(devs)
    fs, dur = args.fs, args.dur
    L = int(fs * dur)
    T = cfg.samples_for_dio(fs, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * fs) + 1
    B = args.total_batch
    assert B % n_dev == 0, f"total batch {B} must divide {n_dev} devices"

    # EVERY process builds the identical full corpus deterministically,
    # then feeds only its local shard — the multi-host data-loading
    # pattern (each host reads its slice of the scp).
    rng = np.random.default_rng(0)
    t = np.arange(L) / fs
    xs_full = np.stack(
        [0.4 * np.sin(2 * np.pi * (170 + 7 * (i % 16)) * t)
         + 0.01 * rng.standard_normal(L) for i in range(B)]).astype(
             np.float32)
    noise_full = np.asarray(batch_mod.synthesis_noise_batch(
        jax.random.PRNGKey(0), B, yl, jnp.float32))

    m = mesh_mod.data_mesh()
    sh = mesh_mod.batch_sharding(m)
    fn = batch_mod.make_sharded_pipeline(m, fs)

    def global_array(full):
        if args.num_processes == 1:
            return jnp.asarray(full)
        rows = B // args.num_processes
        lo = args.process_id * rows
        return jax.make_array_from_process_local_data(
            sh, full[lo:lo + rows])

    xs = global_array(xs_full)
    noise = global_array(noise_full)

    out = fn(xs, noise)
    # stats are replicated (out_specs P()) -> addressable on every
    # process; fetching them forces completion of the whole step
    stats = tuple(np.asarray(s) for s in out[4])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(xs, noise)
        _ = np.asarray(out[4][2])
    dt = (time.perf_counter() - t0) / args.iters
    report = {
        "processes": args.num_processes,
        "devices": n_dev,
        "total_batch": B,
        "audio_s_per_s": round(B * dur / dt, 3),
        "stat_mean_head": [round(float(v), 6) for v in stats[0][:4]],
        "stat_var_head": [round(float(v), 6) for v in stats[1][:4]],
        "voiced_frames": int(stats[2]),
    }
    return report


def launch2(args) -> None:
    """Single-machine config-5 proxy: 1x8 baseline vs 2x4 processes."""
    me = os.path.abspath(__file__)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    common = ["--virtual", "--fs", str(args.fs), "--dur", str(args.dur),
              "--total-batch", str(args.total_batch),
              "--iters", str(args.iters)]

    def run(cmd, **kw):
        return subprocess.run([sys.executable, me] + cmd, env=env,
                              capture_output=True, text=True,
                              timeout=1800, **kw)

    # Matched-utilization proxy on an n-core host: the baseline runs
    # 1 process x D devices IN-process; the distributed run splits the
    # SAME D devices over 2 OS processes (D/2 each) with gloo/TCP
    # collectives across the boundary.  Device count and total work are
    # identical, so the ratio isolates the cross-process runtime +
    # collective overhead (config 5's quantity of interest) instead of
    # core oversubscription.
    D = args.mesh_devices
    r1 = run(common + ["--virtual-devices", str(D), "--emit"])
    if r1.returncode != 0:
        sys.stderr.write(r1.stderr)
        raise SystemExit("baseline run failed")
    base = json.loads(r1.stdout.strip().splitlines()[-1])

    coord = f"127.0.0.1:{args.port}"
    procs = [subprocess.Popen(
        [sys.executable, me] + common + [
            "--virtual-devices", str(D // 2),
            "--coordinator", coord, "--num-processes", "2",
            "--process-id", str(i), "--emit"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=1800)
        if p.returncode != 0:
            sys.stderr.write(se)
            raise SystemExit("2-process run failed")
        outs.append(json.loads(so.strip().splitlines()[-1]))

    two = outs[0]
    # cross-process invariance: both processes must report identical
    # replicated psum statistics, and they must match the 1-process run
    assert outs[0]["voiced_frames"] == outs[1]["voiced_frames"]
    assert outs[0]["stat_mean_head"] == outs[1]["stat_mean_head"]
    voiced_invariant = two["voiced_frames"] == base["voiced_frames"]
    mean_dev = max(abs(a - b) / max(abs(b), 1e-9) for a, b in
                   zip(two["stat_mean_head"], base["stat_mean_head"]))
    eff = two["audio_s_per_s"] / base["audio_s_per_s"]
    report = {
        "config": f"BASELINE config 5 proxy: 2 OS processes x {D // 2} "
                  "virtual CPU devices, gloo/TCP collectives across the "
                  f"process boundary, vs 1 process x {D} devices, same "
                  "total work and device count",
        "baseline_1proc": base,
        "run_2proc": two,
        "voiced_count_invariant": bool(voiced_invariant),
        "psum_mean_rel_dev": float(f"{mean_dev:.3e}"),
        "scaling_efficiency_vs_1proc": round(eff, 3),
    }
    print(json.dumps(report, indent=1))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--virtual", action="store_true",
                    help="force CPU backend w/ virtual devices")
    ap.add_argument("--virtual-devices", type=int, default=VIRT_DEVS)
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--dur", type=float, default=1.0)
    ap.add_argument("--total-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--emit", action="store_true",
                    help="print the report JSON (workers)")
    ap.add_argument("--launch2", action="store_true",
                    help="run the full 2-process proxy + comparison")
    ap.add_argument("--mesh-devices", type=int, default=2,
                    help="launch2: total devices in both configurations "
                         "(default matches a 2-core host)")
    ap.add_argument("--port", type=int, default=23457)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.launch2:
        launch2(args)
        return
    report = run_worker(args)
    if args.emit or args.process_id == 0:
        print(json.dumps(report))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Stage-wise TPU profile of the device Harvest path (run on the chip).

Times cumulative prefixes of the pipeline so per-stage cost = difference:
  wave:    decimation to 8 kHz
  raw:     + 152-channel band filtering + zero-crossing candidates
  detect:  + DetectOfficialF0Candidates + Overlap
  refine:  + per-pair IF refinement
  fix:     + RemoveUnreliable + FixStep1-4 (Extend/Merge)
  smooth:  + Butterworth smoothing  (= full harvest_f0_trace)
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp  # noqa: E402

from hts_train_world_tpu import config as cfg  # noqa: E402
from hts_train_world_tpu.ops import harvest as hv  # noqa: E402
from hts_train_world_tpu.ops import harvest_fix as hf  # noqa: E402

FS = int(os.environ.get("PH_FS", 48000))
DUR = float(os.environ.get("PH_DUR", 2.0))
L = int(FS * DUR)


def make_x():
    t = np.arange(L) / FS
    f0c = 200 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    ph = np.cumsum(2 * np.pi * f0c / FS)
    x = (0.5 * np.sin(ph) + 0.25 * np.sin(2 * ph)
         + 0.01 * np.random.default_rng(0).standard_normal(L))
    return jnp.asarray(x, jnp.float32)


def stage_fns():
    plan = hv.harvest_plan(L, FS, cfg.K_FLOOR_F0, cfg.K_CEIL_F0)
    fs8 = plan["actual_fs"]
    T1 = cfg.samples_for_dio(FS, L, 1.0)

    def wave(x):
        y = hv._waveform_sub(x, L, plan["ratio"], plan["y_length"])
        return y - jnp.mean(y)

    def filt(x):
        y = wave(x)
        hs = tuple(int(fs8 / b * 2.0 + 0.5) for b in plan["boundaries"])
        return hv.band_filter_f32(y, plan["y_length"], hs,
                                  tuple(plan["boundaries"]), fs8)

    def raw(x):
        y = wave(x)
        return y, hv._raw_candidates(
            y, fs8, plan["fft_size"], plan["y_length"], T1,
            tuple(plan["boundaries"]), cfg.K_FLOOR_F0, cfg.K_CEIL_F0, 1.0)

    def detect(x):
        y, r = raw(x)
        cands, nc = hf.detect_candidates(r, plan["nc_pad"])
        return y, hf.overlap_candidates(cands, nc)

    def refine(x):
        y, cands = detect(x)
        pos = jnp.arange(T1, dtype=x.dtype) * 0.001
        return hv.refine_all(y, pos, cands, fs8, cfg.K_FLOOR_F0,
                             cfg.K_CEIL_F0)

    def fix(x):
        rf, sc = refine(x)
        rf, sc = hf.remove_unreliable(rf, sc)
        return hf.fix_contour(rf, sc, hf.step3_section_cap(T1))

    def smooth(x):
        return hf.smooth_contour(fix(x), hf.smooth_section_cap(T1))

    return dict(wave=wave, filt=filt, raw=raw, detect=detect,
                refine=refine, fix=fix, smooth=smooth)


def main():
    print("devices:", jax.devices())
    x = make_x()
    reps = int(os.environ.get("PH_REPS", 3))
    only = os.environ.get("PH_STAGES")
    fns = stage_fns()
    if only:
        fns = {k: v for k, v in fns.items() if k in only.split(",")}
    import jax.numpy as jnp
    prev = 0.0
    for name, fn in fns.items():
        # reduce on device: fetching full outputs would time the relay's
        # host<->device bandwidth, not the kernel
        jf = jax.jit(lambda x, f=fn: sum(
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(f(x))))
        np.asarray(jf(x))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(jf(x))
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:8s} cum {dt:8.1f} ms   delta {dt - prev:8.1f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()

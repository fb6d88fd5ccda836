#!/usr/bin/env python3
"""Generate golden parity files from the reference C++ WORLD build.

- builds the reference library (unmodified) out-of-tree in /tmp/worldref
- builds tools/golden_harness.cpp against it
- synthesizes deterministic test utterances (singing-like: vibrato F0,
  harmonics, breath noise, silence edges)
- dumps double-precision intermediates per utterance into tests/golden/

Run once; tests skip gracefully if goldens are missing, and this script is
invoked automatically by tests/conftest.py when the reference is available.
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/externs/WORLD_v2"
BUILD = "/tmp/worldref"
GOLDEN = os.path.join(REPO, "tests", "golden")


def build_reference():
    if not os.path.isdir(REF):
        raise SystemExit("reference not available")
    os.makedirs(BUILD, exist_ok=True)
    if not os.path.exists(os.path.join(BUILD, "build", "libworld.a")):
        subprocess.run(["cp", "-r", REF + "/.", BUILD], check=True)
        subprocess.run(["make", "default", "-j8"], cwd=BUILD, check=True,
                       capture_output=True)
    objs = os.path.join(BUILD, "build", "objs")
    if not os.path.exists(os.path.join(objs, "harvest.o")):
        # harvest isn't part of the reference's libworld target (makefile:9)
        subprocess.run(["g++", "-O1", "-fPIC", "-I", "src", "-c",
                        "src/harvest.cpp", "-o", "build/objs/harvest.o"],
                       cwd=BUILD, check=True)
        subprocess.run(["ar", "rv", "build/libworld.a",
                        "build/objs/harvest.o"], cwd=BUILD, check=True,
                       capture_output=True)
    harness = os.path.join(BUILD, "golden_harness")
    src = os.path.join(REPO, "tools", "golden_harness.cpp")
    if (not os.path.exists(harness)
            or os.path.getmtime(harness) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-I", os.path.join(BUILD, "src"), "-o", harness,
             src, os.path.join(BUILD, "build", "libworld.a"), "-lm"],
            check=True)
    dec = os.path.join(BUILD, "golden_decode")
    dsrc = os.path.join(REPO, "tools", "golden_decode.cpp")
    if (not os.path.exists(dec)
            or os.path.getmtime(dec) < os.path.getmtime(dsrc)):
        subprocess.run(
            ["g++", "-O2", "-I", os.path.join(BUILD, "src"),
             "-I", os.path.join(BUILD, "test"), "-o", dec, dsrc,
             os.path.join(BUILD, "build", "libworld.a"),
             os.path.join(BUILD, "build", "objs", "test", "sptkfunctions.o"),
             os.path.join(BUILD, "build", "objs", "test", "theq.o"), "-lm"],
            check=True)
    return harness


def synth_utterance(fs: int, dur: float, seed: int) -> np.ndarray:
    """Deterministic singing-like test signal (f64 in [-0.9, 0.9])."""
    rng = np.random.default_rng(seed)
    n = int(fs * dur)
    tm = np.arange(n) / fs
    # piecewise note track with vibrato
    notes = [220.0, 246.9, 293.7, 261.6]
    seg = n // len(notes)
    f0 = np.concatenate([
        np.full(seg, nt) for nt in notes] + [np.full(n - seg * len(notes),
                                                     notes[-1])])
    # glide between notes
    from scipy.ndimage import uniform_filter1d
    f0 = uniform_filter1d(f0, size=max(3, int(0.04 * fs)))
    vib = 1.0 + 0.02 * np.sin(2 * np.pi * 5.5 * tm)
    f0 = f0 * vib
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    for h, amp in enumerate([1.0, 0.6, 0.45, 0.3, 0.2, 0.12, 0.08, 0.05]):
        x += amp * np.sin(phase * (h + 1) + 0.1 * h)
    # formant-ish colouring + breath noise
    x += 0.01 * rng.standard_normal(n)
    # silence + fade at the edges (tests V/UV logic)
    env = np.ones(n)
    edge = int(0.15 * fs)
    env[:edge] = 0.0
    env[edge:2 * edge] = np.linspace(0, 1, edge)
    env[-edge:] = 0.0
    env[-2 * edge:-edge] = np.linspace(1, 0, edge)
    x *= env
    x += 0.002 * rng.standard_normal(n)  # low noise floor everywhere
    x = 0.8 * x / np.max(np.abs(x))
    # quantize to int16 grid like the wav round trip the pipeline uses
    return np.round(x * 32768.0) / 32768.0


UTTS = [("utt16k_a", 16000, 1.3, 0), ("utt16k_b", 16000, 0.9, 1),
        ("utt48k_a", 48000, 1.0, 2)]


def main():
    harness = build_reference()
    os.makedirs(GOLDEN, exist_ok=True)
    for name, fs, dur, seed in UTTS:
        outdir = os.path.join(GOLDEN, name)
        stamp = os.path.join(outdir, "done")
        if os.path.exists(stamp):
            continue
        os.makedirs(outdir, exist_ok=True)
        x = synth_utterance(fs, dur, seed)
        xpath = os.path.join(outdir, "x.f64")
        x.astype(np.float64).tofile(xpath)
        res = subprocess.run([harness, xpath, str(fs), outdir],
                             check=True, capture_output=True, text=True)
        # CLI-level goldens: the actual reference binaries on the wav
        from scipy.io import wavfile
        wav = os.path.join(outdir, "x.wav")
        wavfile.write(wav, fs, np.round(x * 32768.0).astype(np.int16))
        fftlen = 1024 if fs <= 25600 else 2048
        subprocess.run(
            [os.path.join(BUILD, "build", "analysis"), wav,
             os.path.join(outdir, "cli.lf0"), os.path.join(outdir, "cli.mgc"),
             os.path.join(outdir, "cli.bap"), "5", str(fftlen), "50", "25"],
            check=True, capture_output=True)
        subprocess.run(
            [os.path.join(BUILD, "build", "synth"),
             os.path.join(outdir, "cli.lf0"), os.path.join(outdir, "cli.mgc"),
             os.path.join(outdir, "cli.bap"), os.path.join(outdir, "cli.wav"),
             "5", str(fftlen), str(fs), "50", "25"],
            check=True, capture_output=True)
        meta = dict(p.split("=") for p in res.stdout.split()[1:] if "=" in p)
        subprocess.run(
            [os.path.join(BUILD, "golden_decode"),
             os.path.join(outdir, "cli.mgc"), os.path.join(outdir, "cli.bap"),
             meta["f0_length"], str(fs), meta["fft_size"], outdir],
            check=True, capture_output=True)
        with open(os.path.join(outdir, "meta.txt"), "w") as fh:
            fh.write(f"fs={fs}\n{res.stdout}")
        with open(stamp, "w") as fh:
            fh.write("ok\n")
        print(name, res.stdout.strip())


if __name__ == "__main__":
    sys.exit(main())

"""Gates for the Pallas fused window-gather kernel
(ops/pallas/window_gather.py) — interpret mode on the CPU backend; the
real-TPU ablation lives in tools/profile_pallas_window.py."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import cheaptrick as ct
from hts_train_world_tpu.ops.pallas import window_gather as wg


def _case(seed=0, L=4000, fs=16000, T=37):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(L), jnp.float32)
    f0 = np.clip(100 + 50 * rng.standard_normal(T), 70, 300)
    f0 = f0.astype(np.float32)
    h = np.round(1.5 * fs / f0).astype(np.int32)
    origins = np.round(np.arange(T) * 0.005 * fs).astype(np.int32)
    return x, jnp.asarray(origins), jnp.asarray(h), jnp.asarray(f0), fs


def test_kernel_matches_jnp_reference():
    x, origins, halfs, f0s, fs = _case()
    N = 1024
    out = wg.windowed_frames(x, origins, halfs, f0s, N, fs, interpret=True)
    ref = wg.windowed_frames_reference(x, origins, halfs, f0s, N, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-7, rtol=0)


def test_kernel_edge_clamp():
    # frames whose window extends past both signal edges: the kernel's
    # edge padding must reproduce the reference's index clamp exactly
    x, _, _, _, fs = _case(seed=1, L=1200)
    N = 1024
    origins = jnp.asarray(np.array([0, 5, 1195], np.int32))
    f0s = jnp.asarray(np.array([80.0, 75.0, 72.0], np.float32))
    halfs = jnp.asarray(np.round(1.5 * fs / np.asarray(f0s)).astype(np.int32))
    out = wg.windowed_frames(x, origins, halfs, f0s, N, fs, interpret=True)
    ref = wg.windowed_frames_reference(x, origins, halfs, f0s, N, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-7, rtol=0)


def test_cheaptrick_use_pallas_matches_fast_path():
    # full CheapTrick, pallas window path vs the dynamic-slice fast path
    # (identical math, different gather engine)
    rng = np.random.default_rng(2)
    fs, L = 16000, 6400
    t = np.arange(L) / fs
    x = (0.5 * np.sin(2 * np.pi * 150 * t)
         + 0.2 * np.sin(2 * np.pi * 450 * t)
         + 0.01 * rng.standard_normal(L)).astype(np.float32)
    from hts_train_world_tpu import config as cfg_mod
    from hts_train_world_tpu.ops import dio as dio_mod
    from hts_train_world_tpu.ops import stonemask as sm
    xj = jnp.asarray(x)
    tpos, f0, _, _ = dio_mod.dio(xj, fs)
    f0 = sm.stonemask(xj, fs, tpos, f0)
    N = cfg_mod.cheaptrick_fft_size(fs)
    sp_ref = np.asarray(ct.cheaptrick(xj, fs, tpos, f0, N))
    sp_pal = np.asarray(ct.cheaptrick(xj, fs, tpos, f0, N, use_pallas=True))
    # identical math up to f32 summation order: agreement is relative to
    # each frame's peak (deep nulls diverge at the 32-bit dynamic-range
    # floor in BOTH paths — same caveat as the matmul-FFT fast path)
    rel_peak = np.abs(sp_pal - sp_ref) / sp_ref.max(axis=1, keepdims=True)
    assert rel_peak.max() < 5e-4
    assert np.abs(np.log(sp_pal) - np.log(sp_ref)).max() < 0.1

"""Adversarial robustness sweep for the f32 fast paths.

The fast-mode band caps (ops/dio.py zero-crossing compaction caps,
harvest's per-octave channel caps) and the f32 smoothing mirrors are
correctness-by-argument; this suite drives them with hostile inputs —
silence, impulse clicks, hard-clipped harmonics, wideband noise — at
8 kHz, 48 kHz and 96 kHz, comparing the f32 fast path against the f64
parity path end-to-end."""
import jax.numpy as jnp
import numpy as np
import pytest

from hts_train_world_tpu import vocoder


def _signals(fs, dur=0.6, seed=0):
    L = int(fs * dur)
    t = np.arange(L) / fs
    rng = np.random.default_rng(seed)
    sigs = {}
    sigs["silence"] = np.zeros(L)
    clicks = np.zeros(L)
    clicks[:: fs // 50] = 0.9 * np.sign(rng.standard_normal(len(
        clicks[:: fs // 50])))
    sigs["clicks"] = clicks
    f0c = 180 * (1 + 0.02 * np.sin(2 * np.pi * 4 * t))
    ph = np.cumsum(2 * np.pi * f0c / fs)
    harm = (0.8 * np.sin(ph) + 0.5 * np.sin(2 * ph) + 0.3 * np.sin(3 * ph))
    sigs["clipped"] = np.clip(2.5 * harm, -1.0, 1.0)
    sigs["noise"] = 0.5 * rng.standard_normal(L)
    sigs["voiced"] = (0.6 * np.sin(ph) + 0.2 * np.sin(2 * ph)
                      + 0.01 * rng.standard_normal(L))
    return sigs


@pytest.mark.parametrize("fs", [8000, 48000, 96000])
def test_fast_vs_parity_stress(fs):
    for name, x in _signals(fs).items():
        a64 = vocoder.analyze(jnp.asarray(x, jnp.float64), fs, 5.0,
                              parity=False)
        a32 = vocoder.analyze(jnp.asarray(x, jnp.float32), fs, 5.0,
                              parity=False)
        f64v = np.asarray(a64.f0)
        f32v = np.asarray(a32.f0)
        msg = f"{name}@{fs}"
        assert np.isfinite(np.asarray(a32.spectrogram)).all(), msg
        assert np.isfinite(np.asarray(a32.aperiodicity)).all(), msg
        assert np.isfinite(f32v).all(), msg
        assert (np.asarray(a32.spectrogram) > 0).all(), msg
        ap = np.asarray(a32.aperiodicity)
        assert (ap >= 0).all() and (ap <= 1.0).all(), msg
        # V/UV decisions track the f64 fast path.  Pathological signals
        # (click trains, wideband noise) have no well-defined F0 and the
        # discrete V/UV decisions amplify last-ulp differences, so they
        # get a looser agreement bar; tonal signals a strict one.
        tonal = name in ("voiced", "clipped")
        agree = ((f64v > 0) == (f32v > 0)).mean()
        assert agree > (0.9 if tonal else 0.7), \
            f"{msg}: vuv agreement {agree}"
        both = (f64v > 0) & (f32v > 0)
        if both.any() and tonal:
            rel = np.abs(f32v[both] - f64v[both]) / f64v[both]
            assert np.median(rel) < 1e-3, f"{msg}: f0 med rel {rel}"
        # envelope: median log-spectral deviation stays small on bins
        # within 60 dB of each frame's peak (below that the f32 fast
        # path sits on its documented relative floor)
        sp64 = np.asarray(a64.spectrogram)
        live = (sp64 > sp64.max(axis=1, keepdims=True) * 1e-6) \
            & (sp64 > 1e-20)  # digital silence: both dtypes sit on floors
        if live.any():
            ls = np.abs(np.log(np.asarray(a32.spectrogram,
                                          np.float64)[live])
                        - np.log(sp64[live]))
            assert np.median(ls) < 0.1, f"{msg}: log-sp med {np.median(ls)}"


@pytest.mark.parametrize("fs", [8000, 48000])
def test_fast_harvest_stress(fs):
    for name, x in _signals(fs, seed=1).items():
        from hts_train_world_tpu.ops import harvest as hv
        _, h64 = hv.harvest(jnp.asarray(x, jnp.float64), fs)
        _, h32 = hv.harvest(jnp.asarray(x, jnp.float32), fs)
        h64 = np.asarray(h64)
        h32 = np.asarray(h32)
        msg = f"{name}@{fs}"
        tonal = name in ("voiced", "clipped")
        assert np.isfinite(h32).all(), msg
        agree = ((h64 > 0) == (h32 > 0)).mean()
        assert agree > (0.85 if tonal else 0.7), \
            f"{msg}: vuv agreement {agree}"
        both = (h64 > 0) & (h32 > 0)
        if both.any() and tonal:
            rel = np.abs(h32[both] - h64[both]) / h64[both]
            assert np.median(rel) < 2e-3, f"{msg}: med rel {np.median(rel)}"


def test_fast_synthesis_stress():
    fs = 48000
    x = _signals(fs)["clipped"]
    a = vocoder.analyze(jnp.asarray(x, jnp.float32), fs, 5.0, parity=False)
    y = vocoder.synthesize(a.f0, a.spectrogram, a.aperiodicity, fs,
                           a.fft_size, parity=False)
    yv = np.asarray(y)
    assert np.isfinite(yv).all()
    assert np.abs(yv).max() < 4.0  # no blowup from the clipped envelope
    assert np.abs(yv).max() > 0.05


def test_d4c_fast_trim_covers_low_f0():
    """ADVICE r4: the fast-mode window trim must cover every f0 the D4C
    body can clamp to (>= max(f0_floor, 47 Hz)), not just the Harvest
    floor.  At 48 kHz an ~50 Hz track with f0_floor=50 trims to a
    narrower window than f0_floor=47 (no trim); both must be identical
    because the 50 Hz windows fit either width."""
    import jax.numpy as jnp
    from hts_train_world_tpu import config as cfg
    from hts_train_world_tpu.ops import d4c as d4c_mod

    fs = 48000
    L = int(fs * 0.25)
    t = np.arange(L) / fs
    ph = np.cumsum(2 * np.pi * np.full(L, 52.0) / fs)
    x = (0.7 * np.sin(ph) + 0.2 * np.sin(2 * ph)).astype(np.float32)
    T = cfg.samples_for_dio(fs, L, 5.0)
    tp = jnp.asarray(np.arange(T) * 0.005, jnp.float32)
    f0 = jnp.full((T,), 52.0, jnp.float32)
    N = cfg.cheaptrick_fft_size(fs)
    xj = jnp.asarray(x)
    ap_trim, _ = d4c_mod.d4c(xj, fs, tp, f0, N, 0.0, None, f0_floor=50.0)
    ap_full, _ = d4c_mod.d4c(xj, fs, tp, f0, N, 0.0, None, f0_floor=47.0)
    # tolerance = f32 matmul-DFT reduction-order noise (the widths give
    # different contraction lengths); the pre-fix truncation erred ~0.7
    np.testing.assert_allclose(np.asarray(ap_trim), np.asarray(ap_full),
                               rtol=0, atol=1e-3)


def test_d4c_cheaptrick_slab_matches_generic_fast_path():
    """The slab formulations (grid_step>0) must track the generic f32
    fast paths within f32 reduction-order noise on regular-grid input —
    guards the offset-invariance argument (power spectra / same-offset
    centroid products) against future edits."""
    import jax.numpy as jnp
    from hts_train_world_tpu import config as cfg
    from hts_train_world_tpu.ops import cheaptrick as ct
    from hts_train_world_tpu.ops import d4c as d4c_mod

    fs = 16000
    L = int(fs * 0.4)
    t = np.arange(L) / fs
    rng = np.random.default_rng(5)
    ph = np.cumsum(2 * np.pi * 180 * (1 + 0.04 * np.sin(2 * np.pi * 3 * t)) / fs)
    x = (0.6 * np.sin(ph) + 0.2 * np.sin(2 * ph)
         + 0.01 * rng.standard_normal(L)).astype(np.float32)
    T = cfg.samples_for_dio(fs, L, 5.0)
    tp = jnp.asarray(np.arange(T) * 0.005, jnp.float32)
    f0 = jnp.asarray(np.where(np.arange(T) % 9 == 5, 0.0,
                              180 + 25 * np.sin(np.arange(T) * 0.4)),
                     jnp.float32)
    N = cfg.cheaptrick_fft_size(fs)
    xj = jnp.asarray(x)
    step = int(fs * 0.005)

    sp_g = np.asarray(ct.cheaptrick(xj, fs, tp, f0, N))
    sp_s = np.asarray(ct.cheaptrick(xj, fs, tp, f0, N, grid_step=step))
    assert np.abs(np.log(sp_s) - np.log(sp_g)).mean() < 1e-3

    ap_g, p_g = d4c_mod.d4c(xj, fs, tp, f0, N, 0.0, None)
    ap_s, p_s = d4c_mod.d4c(xj, fs, tp, f0, N, 0.0, None, grid_step=step)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_g), atol=1e-5)
    assert np.abs(np.asarray(ap_s) - np.asarray(ap_g)).max() < 5e-3

"""The test-demo voice-change knobs (test/test.cpp:200-237)."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import vocoder


def _ref_modification(f0, sp, fs, shift, ratio):
    """Literal numpy transcription of ParameterModification
    (test/test.cpp:200-237) used as the oracle."""
    f0 = f0 * shift
    half = sp.shape[1] - 1
    N = 2 * half
    axis1 = ratio * np.arange(half + 1) / N * fs
    axis2 = np.arange(half + 1) / N * fs
    out = np.empty_like(sp)
    for i in range(sp.shape[0]):
        s1 = np.log(sp[i])
        k = np.clip(np.searchsorted(axis1, axis2, side="right"), 1, half)
        x0, x1 = axis1[k - 1], axis1[k]
        y0, y1 = s1[k - 1], s1[k]
        out[i] = np.exp(y0 + (axis2 - x0) / (x1 - x0) * (y1 - y0))
        if ratio < 1.0:
            cut = int(N / 2.0 * ratio)
            out[i, cut:] = out[i, cut - 1]
    return f0, out


def test_modify_matches_reference_transcription():
    rng = np.random.default_rng(0)
    T, half = 7, 64
    fs = 16000
    f0 = rng.uniform(100, 300, T)
    sp = np.exp(rng.standard_normal((T, half + 1)))
    for shift, ratio in ((1.3, 1.0), (0.8, 1.2), (1.0, 0.7)):
        rf0, rsp = _ref_modification(f0.copy(), sp.copy(), fs, shift,
                                     ratio)
        df0, dsp = vocoder.modify_parameters(jnp.asarray(f0),
                                             jnp.asarray(sp), fs, shift,
                                             ratio)
        np.testing.assert_allclose(np.asarray(df0), rf0, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dsp), rsp, rtol=1e-10)


def test_copy_synthesis_with_knobs_runs():
    fs, L = 16000, 4800
    t = np.arange(L) / fs
    ph = np.cumsum(2 * np.pi * 200 * (1 + 0.02 * np.sin(2 * np.pi * 3 * t))
                   / fs)
    x = 0.5 * np.sin(ph) + 0.2 * np.sin(2 * ph)
    a, y = vocoder.copy_synthesis(jnp.asarray(x, jnp.float32), fs,
                                  parity=False, f0_scale=1.5,
                                  formant_ratio=1.1)
    yv = np.asarray(y)
    assert np.isfinite(yv).all() and np.abs(yv).max() > 0.05

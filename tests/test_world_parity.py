"""BASELINE config 1/2 parity gates: every WORLD stage vs. the reference
C++ double-precision dumps, ending in the headline waveform gate."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import (cheaptrick as ct, d4c as d4c_mod,
                                     dio as dio_mod, rand,
                                     stonemask as sm, synthesis as syn)


def test_dio(golden):
    t, f0, _, _ = dio_mod.dio(jnp.asarray(golden.x), golden.fs)
    np.testing.assert_allclose(np.asarray(t), golden.f64("dio_t"), atol=1e-14)
    np.testing.assert_allclose(np.asarray(f0), golden.f64("dio_f0"),
                               atol=1e-6)


def test_stonemask(golden):
    got = sm.stonemask(jnp.asarray(golden.x), golden.fs,
                       jnp.asarray(golden.f64("dio_t")),
                       jnp.asarray(golden.f64("dio_f0")))
    np.testing.assert_allclose(np.asarray(got), golden.f64("sm_f0"),
                               atol=1e-8)


def test_cheaptrick(golden):
    fs, N, T = golden.fs, golden.fft_size, golden.f0_length
    f0 = jnp.asarray(golden.f64("sm_f0"))
    stream = jnp.asarray(rand.randn_stream(ct.cheaptrick_stream_len(T, N)))
    nw, ns = ct.cheaptrick_noise(f0, fs, N, stream)
    got = np.asarray(ct.cheaptrick(jnp.asarray(golden.x), fs,
                                   jnp.asarray(golden.f64("dio_t")), f0, N,
                                   -0.15, nw, ns))
    np.testing.assert_allclose(got, golden.sp, rtol=1e-6)


def test_d4c(golden):
    fs, N, T = golden.fs, golden.fft_size, golden.f0_length
    stream = jnp.asarray(rand.randn_stream(d4c_mod.d4c_stream_len(T, fs)))
    ap, _ = d4c_mod.d4c(jnp.asarray(golden.x), fs,
                        jnp.asarray(golden.f64("dio_t")),
                        jnp.asarray(golden.f64("sm_f0")), N, 0.0, stream)
    np.testing.assert_allclose(np.asarray(ap), golden.ap, atol=1e-7)


def test_synthesis_waveform(golden):
    """The headline gate: resynthesized waveform allclose vs. C++."""
    fs, N = golden.fs, golden.fft_size
    ref = golden.f64("y")
    stream = jnp.asarray(rand.randn_stream(syn.synthesis_stream_len(len(ref))))
    y = np.asarray(syn.synthesis(
        jnp.asarray(golden.f64("sm_f0")), jnp.asarray(golden.sp),
        jnp.asarray(golden.ap), N, 5.0, fs, len(ref), stream))
    assert np.abs(y - ref).max() < 1e-10


def test_end_to_end_copy_synthesis(golden16):
    """Full chain x -> analyze -> synthesize vs. the C++ chain."""
    from hts_train_world_tpu import vocoder
    a, y = vocoder.copy_synthesis(jnp.asarray(golden16.x), golden16.fs)
    np.testing.assert_allclose(np.asarray(a.f0), golden16.f64("sm_f0"),
                               atol=1e-8)
    ref = golden16.f64("y")
    assert np.abs(np.asarray(y) - ref).max() < 1e-8


def test_fast_mode_close():
    """parity=False (TPU fast path) must stay audibly identical: analysis
    noise is ~1e-12-scale, so envelopes match tightly; synthesis noise is
    a different white sequence, so compare only coarse energy."""
    from hts_train_world_tpu import vocoder
    rng = np.random.default_rng(0)
    fs = 16000
    tm = np.arange(fs) / fs
    x = (0.5 * np.sin(2 * np.pi * 220 * tm * (1 + 0.01 * np.sin(2 * np.pi * 5 * tm)))
         + 0.01 * rng.standard_normal(fs))
    a_p = vocoder.analyze(jnp.asarray(x), fs, parity=True)
    a_f = vocoder.analyze(jnp.asarray(x), fs, parity=False)
    np.testing.assert_allclose(np.asarray(a_p.f0), np.asarray(a_f.f0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.log(np.asarray(a_p.spectrogram)),
                               np.log(np.asarray(a_f.spectrogram)), atol=1e-3)

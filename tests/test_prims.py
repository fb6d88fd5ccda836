"""Unit parity tests for L0 primitives vs. the reference dumps."""
import numpy as np
import jax.numpy as jnp

from hts_train_world_tpu.ops import prims, rand


def test_randn_stream_matches_reference(golden16):
    ref = golden16.f64("randn")
    got = rand.randn_stream(len(ref))
    np.testing.assert_array_equal(got, ref)


def test_decimate_matches_reference(golden16):
    ref = golden16.f64("decim4")
    got = np.asarray(prims.decimate(jnp.asarray(golden16.x), 4))
    assert got.shape[0] >= ref.shape[0]
    np.testing.assert_allclose(got[:len(ref)], ref, rtol=0, atol=1e-12)


def test_interp1_basic():
    x = jnp.array([0.0, 1.0, 3.0, 6.0])
    y = jnp.array([0.0, 2.0, 4.0, 10.0])
    xi = jnp.array([-1.0, 0.0, 0.5, 1.0, 2.0, 6.0, 8.0])
    got = prims.interp1(x, y, xi)
    # linear w/ extrapolation at both ends
    exp = np.array([-2.0, 0.0, 1.0, 2.0, 3.0, 10.0, 14.0])
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_interp1_masked_matches_unmasked():
    x = jnp.array([0.0, 1.0, 3.0, 6.0, 0.0, 0.0])
    y = jnp.array([0.0, 2.0, 4.0, 10.0, -1.0, -1.0])
    xi = jnp.linspace(-1, 8, 23)
    got = prims.interp1(x, y, xi, n_valid=4)
    exp = prims.interp1(x[:4], y[:4], xi)
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_interp1q_matches_interp1_on_uniform_grid():
    y = jnp.array([1.0, 3.0, 2.0, 5.0, 4.0])
    x0, shift = 2.0, 0.5
    xi = jnp.array([2.0, 2.2, 2.9, 3.4, 3.99])
    got = prims.interp1q(x0, shift, y, xi)
    x = x0 + shift * jnp.arange(5)
    exp = prims.interp1(x, y, xi)
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_minimum_phase_magnitude_preserved():
    # |exp(min-phase spectrum)| must equal the input magnitude
    n = 256
    rng = np.random.default_rng(0)
    mag = np.exp(rng.standard_normal(n // 2 + 1) * 0.3)
    log_half = jnp.asarray(np.log(mag))
    mps = prims.minimum_phase_spectrum(log_half, n)
    np.testing.assert_allclose(np.abs(np.asarray(mps)), mag, rtol=1e-10)
    # must equal the canonical folded-cepstrum construction exactly
    ls = np.log(mag)
    ceps = np.fft.irfft(ls, n)
    fold = np.concatenate([[ceps[0]], 2 * ceps[1:n // 2], [ceps[n // 2]],
                           np.zeros(n // 2 - 1)])
    mps_direct = np.exp(np.fft.fft(fold))[:n // 2 + 1]
    np.testing.assert_allclose(np.asarray(mps), mps_direct, atol=1e-14)
    # impulse response mostly causal (rough random spectrum -> loose bound)
    h = np.fft.irfft(np.asarray(mps), n)
    assert np.sum(h[n // 2:] ** 2) / np.sum(h ** 2) < 0.05


def test_suitable_fft_size():
    from hts_train_world_tpu import config
    assert config.get_suitable_fft_size(1000) == 1024
    assert config.get_suitable_fft_size(1024) == 2048
    assert config.cheaptrick_fft_size(16000) == 1024
    assert config.cheaptrick_fft_size(48000) == 2048
    assert config.d4c_fft_size(16000) == 2048
    assert config.d4c_fft_size(48000) == 4096
    assert config.number_of_aperiodicities(16000) == 1
    assert config.number_of_aperiodicities(48000) == 5

"""Matmul-FFT operators must match jnp.fft / the parity min-phase."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import fftmat, prims


def test_rfft_irfft_matmul():
    rng = np.random.default_rng(0)
    for N in (256, 1024):
        x = jnp.asarray(rng.standard_normal((4, N)))
        re, im = fftmat.rfft_matmul(x, N)
        X = np.fft.rfft(np.asarray(x), axis=-1)
        np.testing.assert_allclose(np.asarray(re), X.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(im), X.imag, atol=1e-9)
        y = fftmat.irfft_scaled_matmul(jnp.asarray(X.real),
                                       jnp.asarray(X.imag), N)
        np.testing.assert_allclose(np.asarray(y),
                                   np.fft.irfft(X, N) * N, atol=1e-7)


def test_minphase_matmul_matches_parity_kernel():
    rng = np.random.default_rng(1)
    N = 1024
    ls = jnp.asarray(rng.standard_normal((6, N // 2 + 1)) * 0.2)
    mr, mi = fftmat.minphase_matmul(ls, N)
    ref = np.asarray(prims.minimum_phase_spectrum(ls, N))
    np.testing.assert_allclose(np.asarray(mr), ref.real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mi), ref.imag, atol=1e-12)


def test_fast_synthesis_close_to_parity(golden16):
    """Matmul-FFT fast path: same pulses where non-degenerate, waveform
    close to the parity output overall (noise alignment differs only in
    cumsum-degenerate unvoiced regions)."""
    from hts_train_world_tpu.ops import rand, synthesis as syn
    fs, N = golden16.fs, golden16.fft_size
    ref = golden16.f64("y")
    yl = len(ref)
    stream = jnp.asarray(rand.randn_stream(syn.synthesis_stream_len(yl)))
    y = np.asarray(syn.synthesis(
        jnp.asarray(golden16.f64("sm_f0")), jnp.asarray(golden16.sp),
        jnp.asarray(golden16.ap), N, 5.0, fs, yl, stream,
        exact_phase=False))
    # voiced regions must still match tightly; global error bounded
    assert np.abs(y - ref).max() < 2e-3
    assert np.sqrt(np.mean((y - ref) ** 2)) < 2e-5

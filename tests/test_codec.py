"""Codec + CLI parity: encode vs the reference analysis binary's float32
outputs, decode vs double-precision dumps, and the end-to-end synth wav
bit-identity at int16."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from hts_train_world_tpu import cli, vocoder
from hts_train_world_tpu.io import rawio, wavio
from hts_train_world_tpu.ops import codec


def test_encode_features_match_cli(golden):
    fs, N, T = golden.fs, golden.fft_size, golden.f0_length
    lf0, mgc, bap = cli.encode_features(
        jnp.asarray(golden.f64("sm_f0")), jnp.asarray(golden.sp),
        jnp.asarray(golden.ap), fs, N)
    np.testing.assert_array_equal(np.asarray(lf0, np.float32),
                                  rawio.read_f32(golden.dir + "/cli.lf0"))
    np.testing.assert_array_equal(np.asarray(mgc, np.float32),
                                  rawio.read_f32(golden.dir + "/cli.mgc", 50))
    np.testing.assert_allclose(np.asarray(bap, np.float32),
                               rawio.read_f32(golden.dir + "/cli.bap", 25),
                               atol=1e-12)


def _decode_goldens(golden):
    """sp_dec/ap_dec dumps are produced lazily by tools/golden_decode.cpp."""
    p = os.path.join(golden.dir, "sp_dec.f64")
    if not os.path.exists(p):
        pytest.skip("decode goldens not generated")
    return (np.fromfile(p).reshape(golden.f0_length, golden.fft_size // 2 + 1),
            np.fromfile(os.path.join(golden.dir, "ap_dec.f64")).reshape(
                golden.f0_length, golden.fft_size // 2 + 1))


def test_decode_features(golden):
    fs, N = golden.fs, golden.fft_size
    sp_ref, ap_ref = _decode_goldens(golden)
    rmgc = rawio.read_f32(golden.dir + "/cli.mgc", 50).astype(np.float64)
    rbap = rawio.read_f32(golden.dir + "/cli.bap", 25).astype(np.float64)
    rlf0 = rawio.read_f32(golden.dir + "/cli.lf0").astype(np.float64)
    _, sp, ap = cli.decode_features(jnp.asarray(rlf0), jnp.asarray(rmgc),
                                    jnp.asarray(rbap), fs, N)
    np.testing.assert_allclose(np.asarray(sp), sp_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ap), ap_ref, atol=1e-14)


def test_synth_cli_bit_identical_wav(golden):
    """Features -> waveform matches the reference synth binary's wav
    EXACTLY at int16."""
    fs, N = golden.fs, golden.fft_size
    rmgc = rawio.read_f32(golden.dir + "/cli.mgc", 50).astype(np.float64)
    rbap = rawio.read_f32(golden.dir + "/cli.bap", 25).astype(np.float64)
    rlf0 = rawio.read_f32(golden.dir + "/cli.lf0").astype(np.float64)
    f0, sp, ap = cli.decode_features(jnp.asarray(rlf0), jnp.asarray(rmgc),
                                     jnp.asarray(rbap), fs, N)
    y = vocoder.synthesize(f0, sp, ap, fs, N, 5.0)
    ref, _ = wavio.wavread(golden.dir + "/cli.wav")
    ref16 = np.round(ref * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(wavio.float_to_int16(np.asarray(y)), ref16)


def test_codec_roundtrip_reasonable():
    """Code->decode roundtrip approximates the input envelope (smoke)."""
    rng = np.random.default_rng(0)
    fs, N = 16000, 1024
    T = 10
    logsp = rng.standard_normal((T, N // 2 + 1)) * 0.1
    from scipy.ndimage import uniform_filter1d
    logsp = uniform_filter1d(logsp, 80, axis=1) - 10.0
    sp = jnp.asarray(np.exp(logsp))
    mgc = codec.code_spectral_envelope(sp, fs, N, 50)
    sp2 = codec.decode_spectral_envelope(mgc, fs, N, 50)
    err = np.abs(np.log(np.asarray(sp2)) - logsp)[:, 5:-5]
    assert err.max() < 0.2

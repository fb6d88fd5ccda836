"""BASELINE config 2: Harvest F0 contour allclose vs. the reference."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import harvest as hv


def test_harvest_contour(golden):
    _, f0 = hv.harvest(jnp.asarray(golden.x), golden.fs)
    ref = golden.f64("harvest_f0")
    np.testing.assert_allclose(np.asarray(f0), ref, atol=1e-8)


def test_harvest_fast_f32_close(golden):
    """f32 fast path (octave-capped channels, slice windows) stays on the
    same contour: voiced agreement within 0.1% where both are voiced."""
    ref = golden.f64("harvest_f0")
    _, f0 = hv.harvest(jnp.asarray(golden.x, jnp.float32), golden.fs)
    f0 = np.asarray(f0)
    both = (ref > 0) & (f0 > 0)
    assert both.mean() > 0.8 * max((ref > 0).mean(), 1e-9) or \
        (ref > 0).sum() == 0
    if both.any():
        rel = np.abs(f0[both] - ref[both]) / ref[both]
        assert np.median(rel) < 1e-3
        assert (rel < 0.05).mean() > 0.95


def test_vocoder_analyze_harvest(golden):
    """vocoder.analyze(algorithm="harvest") wires Harvest F0 into the
    full analysis (the WORLD library's harvest-based flow)."""
    from hts_train_world_tpu import vocoder
    a = vocoder.analyze(jnp.asarray(golden.x), golden.fs, 5.0,
                        parity=False, algorithm="harvest")
    ref = golden.f64("harvest_f0")
    np.testing.assert_allclose(np.asarray(a.f0), ref, atol=1e-8)
    T = len(ref)
    assert a.spectrogram.shape[0] == T and a.aperiodicity.shape[0] == T
    assert np.isfinite(np.asarray(a.spectrogram)).all()


def test_cli_analysis_harvest_flag(golden, tmp_path):
    """analysis --harvest produces harvest-F0 lf0 output."""
    import os
    from hts_train_world_tpu import cli
    from hts_train_world_tpu.io import rawio, wavio
    wav = str(tmp_path / "in.wav")
    wavio.wavwrite(np.asarray(golden.x), golden.fs, wav)
    out = [str(tmp_path / n) for n in ("o.lf0", "o.mgc", "o.bap")]
    cli.analysis_main(["--harvest", wav, *out, "5.0", "0", "12", "3"])
    lf0 = rawio.read_f32(out[0])
    ref = golden.f64("harvest_f0")
    voiced = ref > 0
    # the wav round trip quantizes to 16 bits; the contour stays put
    both = voiced & (lf0 != 0)
    assert both.sum() > 0.9 * voiced.sum()
    rel = np.abs(np.exp(lf0[both].astype(np.float64)) - ref[both]) \
        / ref[both]
    assert np.median(rel) < 1e-3

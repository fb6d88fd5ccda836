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

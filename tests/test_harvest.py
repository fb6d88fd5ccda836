"""BASELINE config 2: Harvest F0 contour allclose vs. the reference."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import harvest as hv


def test_harvest_contour(golden):
    _, f0 = hv.harvest(jnp.asarray(golden.x), golden.fs)
    ref = golden.f64("harvest_f0")
    np.testing.assert_allclose(np.asarray(f0), ref, atol=1e-8)

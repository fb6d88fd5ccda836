"""GV generation: variance is pushed toward the GV model without leaving
the trajectory solution far behind."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import gv, mlpg


def test_gv_scale():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((100, 3)) * np.array([0.5, 1.0, 2.0])
    target = np.array([1.0, 1.0, 1.0])
    out = np.asarray(gv.gv_scale(jnp.asarray(c), jnp.asarray(target)))
    np.testing.assert_allclose(out.var(0), target, rtol=1e-5)


def test_gv_refine_increases_variance():
    rng = np.random.default_rng(1)
    T, D = 80, 2
    means = np.zeros((T, 3, D))
    means[:, 0] = np.cumsum(rng.standard_normal((T, D)) * 0.05, 0)
    var = np.full((T, 3, D), 1.0)
    c0 = np.asarray(mlpg.mlpg(jnp.asarray(means), jnp.asarray(var)))
    gv_mean = c0.var(0) * 3.0          # want 3x the MLPG variance
    gv_var = np.full(D, 0.01)
    out = np.asarray(gv.gv_refine(jnp.asarray(means), jnp.asarray(var),
                                  jnp.asarray(gv_mean), jnp.asarray(gv_var),
                                  n_iters=20, step=0.05))
    # variance moved toward the GV target
    assert (out.var(0) > c0.var(0) * 1.3).all()
    # trajectory not destroyed: still correlated with the MLPG statics
    for d in range(D):
        r = np.corrcoef(out[:, d], c0[:, d])[0, 1]
        assert r > 0.9

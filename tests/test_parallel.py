"""Data-parallel sharded pipeline on the 8-device virtual CPU mesh
(BASELINE config 4/5 logic: shard_map over utterance batches, psum stats)."""
import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.parallel import batch, mesh as mesh_mod


def _toy_corpus(n, L, fs):
    rng = np.random.default_rng(0)
    t = np.arange(L) / fs
    xs = []
    for i in range(n):
        f0 = 180.0 + 20 * (i % 4)
        x = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
            2 * np.pi * 2 * f0 * t) + 0.01 * rng.standard_normal(L)
        xs.append(x)
    return np.stack(xs)


def test_batch_analyze_matches_single():
    fs, L = 16000, 8000
    xs = _toy_corpus(2, L, fs)
    t, f0, sp, ap = batch.batch_analyze(jnp.asarray(xs), fs)
    from hts_train_world_tpu import vocoder
    a0 = vocoder.analyze(jnp.asarray(xs[0]), fs, parity=False)
    np.testing.assert_allclose(np.asarray(f0[0]), np.asarray(a0.f0),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sp[0]), np.asarray(a0.spectrogram),
                               rtol=1e-6)


def test_sharded_pipeline_8dev():
    assert len(jax.devices()) == 8
    m = mesh_mod.data_mesh(8)
    fs, L = 16000, 4000
    xs = jnp.asarray(_toy_corpus(8, L, fs))
    fn = batch.make_sharded_pipeline(m, fs)
    import hts_train_world_tpu.config as cfg
    T = cfg.samples_for_dio(fs, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * fs) + 1
    noise = batch.synthesis_noise_batch(jax.random.PRNGKey(0), 8, yl,
                                        xs.dtype)
    f0, sp, ap, y, (mean, var, voiced) = fn(xs, noise)
    assert f0.shape == (8, T)
    assert y.shape == (8, yl)
    assert np.isfinite(np.asarray(y)).all()
    assert np.asarray(voiced) > 0
    # psum stats equal the global computation
    np.testing.assert_allclose(np.asarray(mean),
                               np.log(np.asarray(sp)).mean((0, 1)),
                               rtol=1e-9)
    # and the sharded result equals the unsharded batch path
    _, f0_ref, sp_ref, _ = batch.batch_analyze(xs, fs)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f0_ref), rtol=1e-9)


def test_sharded_pipeline_f32_compiles_and_runs():
    """The f32 fast path under shard_map (the dryrun/production config):
    catches varying-manual-axes breaks like a constant fori_loop carry
    inside sum_top_k (r5) that the f64 suite default cannot see."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hts_train_world_tpu.parallel import batch as batch_mod
    from hts_train_world_tpu.parallel import mesh as mesh_mod

    fs, B, L = 16000, 4, 4800
    m = mesh_mod.data_mesh(4)
    fn = batch_mod.make_sharded_pipeline(m, fs)
    t = np.arange(L) / fs
    xs = jnp.asarray(np.stack(
        [0.5 * np.sin(2 * np.pi * (150 + 20 * i) * t) for i in range(B)]),
        jnp.float32)
    T = __import__("hts_train_world_tpu.config", fromlist=["c"]) \
        .samples_for_dio(fs, L, 5.0)
    yl = int((T - 1) * 5.0 / 1000.0 * fs) + 1
    noise = batch_mod.synthesis_noise_batch(
        jax.random.PRNGKey(0), B, yl, jnp.float32)
    f0, sp, ap, y, stats = fn(xs, noise)
    assert np.isfinite(np.asarray(y)).all()
    assert int(stats[2]) > 0

"""Acoustic model: training reduces NLL; trajectory cost's in-graph MLPG
matches the dense solve; dp x tp sharded step runs on the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.models import acoustic
from hts_train_world_tpu.ops import mlpg as mlpg_mod
from hts_train_world_tpu.parallel import mesh as mesh_mod


def _toy_batch(key, n, cfg):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, cfg.n_in))
    w = jax.random.normal(ky, (cfg.n_in, cfg.n_out)) / np.sqrt(cfg.n_in)
    y = jnp.tanh(x @ w)
    return {"x": x, "y": y, "spkr": jnp.zeros(n, jnp.int32)}


def test_train_step_learns():
    cfg = acoustic.ModelConfig(n_in=20, n_out=8, hidden=(32, 32),
                               dtype="float64")
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    opt = acoustic.make_optimizer(1e-2, variance_learning_rate=1e-3)
    opt_state = opt.init(params)
    step = acoustic.make_train_step(cfg, opt)
    batch = _toy_batch(jax.random.PRNGKey(1), 256, cfg)
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1


def test_sat_speaker_bias():
    cfg = acoustic.ModelConfig(n_in=10, n_out=4, hidden=(16,),
                               n_speakers=3, mode="SAT", dtype="float64")
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    assert "sd_w" in params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 10))
    y0, _ = acoustic.forward(params, x, jnp.zeros(5, jnp.int32), cfg)
    y1, _ = acoustic.forward(params, x, jnp.ones(5, jnp.int32), cfg)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 0


def test_trajectory_cost_mlpg_matches_dense():
    rng = np.random.default_rng(0)
    T = 30
    feature_dims = (3, 1)
    msd_flags = (0, 1)
    D = sum(feature_dims)
    ncol = sum(msd_flags) + 3 * D
    pred = rng.standard_normal((T, ncol))
    target = rng.standard_normal((T, ncol))
    var = np.exp(rng.standard_normal(ncol) * 0.2)
    gv_var = np.ones(D)
    cost, (c, msd) = acoustic.trajectory_cost(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(var),
        jnp.asarray(gv_var), feature_dims, msd_flags)
    assert np.isfinite(float(cost))
    # check the generated statics against the dense MLPG on the same data
    def split(mat):
        cols = [[] for _ in range(3)]
        off = 0
        for dim, flag in zip(feature_dims, msd_flags):
            off += flag
            for w in range(3):
                cols[w].append(mat[:, off:off + dim])
                off += dim
        return np.stack([np.concatenate(cc, 1) for cc in cols], 1)
    mu = split(pred)
    vv = np.broadcast_to(var, pred.shape)
    vs = split(vv)
    c_ref = mlpg_mod.mlpg_dense(mu, vs)
    np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)


def test_sharded_train_step_dp_tp():
    cfg = acoustic.ModelConfig(n_in=16, n_out=8, hidden=(32, 32),
                               dtype="float32")
    m = mesh_mod.dp_tp_mesh(4, 2)
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    params = acoustic.shard_params(params, m)
    opt = acoustic.make_optimizer(1e-3)
    opt_state = opt.init(params)
    step = acoustic.make_train_step(cfg, opt)
    batch = _toy_batch(jax.random.PRNGKey(1), 64, cfg)
    batch = {k: (jax.device_put(v, mesh_mod.batch_sharding(m))
                 if v.ndim else v) for k, v in batch.items()}
    batch = {"x": batch["x"].astype(jnp.float32),
             "y": batch["y"].astype(jnp.float32),
             "spkr": jnp.zeros(64, jnp.int32)}
    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_trajectory_training_runs(tmp_path):
    """Trajectory fine-tuning (DNNTraining TRAJ mode) over tiny utterances."""
    from hts_train_world_tpu.models import dataio, training
    rng = np.random.default_rng(5)
    feature_dims, msd_flags = (3, 1), (0, 1)
    ncol = sum(msd_flags) + 3 * sum(feature_dims)
    cfg = acoustic.ModelConfig(n_in=8, n_out=ncol, hidden=(16,),
                               dtype="float32")
    pairs = [dataio.UtterancePair(
        f"u{i}", rng.standard_normal((40, 8)).astype(np.float32),
        rng.standard_normal((40, ncol)).astype(np.float32))
        for i in range(2)]
    tc = training.TrainConfig(num_steps=6, batch_size=1, log_interval=3,
                              save_interval=6, trajectory=True,
                              valid_fraction=0.0)
    params = training.train(cfg, tc, pairs, str(tmp_path / "ck"),
                            feature_dims=feature_dims, msd_flags=msd_flags,
                            log=lambda m: None)
    out = training.forward_corpus(cfg, params, pairs[0].ffi)
    assert out.shape == (40, ncol) and np.isfinite(out).all()

#!/usr/bin/env python3
"""Acoustic-model training throughput on the chip.

Measures frames/s for the reference's default DNN recipe (3x2048
sigmoid, Adam, batch 256, frame-mode Gaussian NLL with trainable
variances; configure.ac:932-970) and for trajectory (MLPG-in-graph)
mode.  The reference trains this on CPU TF1 ("about 6 to 12 hours" for
the demo corpus, INSTALL:64-66).  Prints one JSON line per mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hts_train_world_tpu.models import acoustic

N_IN, N_OUT = 1186, 238
BATCH = 256


def bench_frame_mode():
    cfg = acoustic.ModelConfig(n_in=N_IN, n_out=N_OUT)
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    opt = acoustic.make_optimizer()
    opt_state = opt.init(params)
    step = jax.jit(acoustic.make_train_step(cfg, opt))
    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.standard_normal((BATCH, N_IN)), jnp.float32),
             "y": jnp.asarray(rng.standard_normal((BATCH, N_OUT)), jnp.float32),
             "spkr": jnp.zeros((BATCH,), jnp.int32)}
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)  # compile + fetch
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    lv = float(loss)  # force the chain
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "dnn_frame_training_throughput",
        "value": round(BATCH / dt, 0), "unit": "frames/s/chip",
        "step_ms": round(dt * 1e3, 2), "loss": round(lv, 3)}))


def bench_trajectory_mode():
    # utterance-mode MLPG-in-graph cost over one utterance of T frames
    dims = (50, 2, 25, 2)       # static dims per stream (mgc/lf0/bap/vib)
    msd = (0, 1, 0, 0)
    ncol = 3 * sum(dims) + sum(msd)   # 238
    T = 512
    cfg = acoustic.ModelConfig(n_in=N_IN, n_out=ncol)
    params = acoustic.init_params(jax.random.PRNGKey(0), cfg)
    opt = acoustic.make_optimizer()
    opt_state = opt.init(params)
    gv = jnp.ones(int(sum(dims)), jnp.float32)

    def loss_fn(p, batch):
        x, y, spk = batch
        pred, variances = acoustic.forward(p, x, spk, cfg)
        cost, _ = acoustic.trajectory_cost(pred, y, variances, gv,
                                           dims, msd)
        return cost

    @jax.jit
    def step(p, s, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        upd, s = opt.update(g, s, p)
        import optax
        return optax.apply_updates(p, upd), s, loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, N_IN)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((T, ncol)), jnp.float32)
    spk = jnp.zeros((T,), jnp.int32)
    params, opt_state, loss = step(params, opt_state, (x, y, spk))
    float(loss)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, (x, y, spk))
    lv = float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "dnn_trajectory_training_throughput",
        "value": round(T / dt, 0), "unit": "frames/s/chip",
        "step_ms": round(dt * 1e3, 2), "loss": round(lv, 3)}))


if __name__ == "__main__":
    bench_frame_mode()
    bench_trajectory_mode()

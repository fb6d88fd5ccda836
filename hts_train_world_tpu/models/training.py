"""Acoustic-model training driver — replaces DNNTraining.py (SURVEY.md D1).

Frame-mode Gaussian-NLL training and trajectory-mode fine-tuning with the
MLPG-in-graph cost, periodic orbax checkpoints with restore, validation
cost on save, and per-step logging (the reference's log_interval /
save_interval / restore_ckpt semantics, DNNTraining.py:314-379).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hts_train_world_tpu.models import acoustic, dataio
from hts_train_world_tpu.runtime.checkpoint import Checkpointer


@dataclasses.dataclass
class TrainConfig:
    """configure.ac:932-970 defaults: 3x2048 sigmoid, Adam 1e-3, batch 256."""
    num_steps: int = 10000
    batch_size: int = 256
    learning_rate: float = 1e-3
    variance_learning_rate: float = 1e-5
    adapt_learning_rate: float = 0.0
    optimizer: str = "adam"
    log_interval: int = 100
    save_interval: int = 1000
    max_to_keep: int = 5
    valid_fraction: float = 0.05
    seed: int = 12345
    # trajectory mode
    trajectory: bool = False
    msd_weight: float = 1.0
    gv_weight: float = 1e-6


def train(model_cfg: acoustic.ModelConfig, train_cfg: TrainConfig,
          pairs: Sequence[dataio.UtterancePair], ckpt_dir: str,
          feature_dims=None, msd_flags=None, gv_variances=None,
          log: Callable[[str], None] = print):
    """Returns the final params.  Resumes from the latest checkpoint."""
    params = acoustic.init_params(jax.random.PRNGKey(train_cfg.seed),
                                  model_cfg)
    opt = acoustic.make_optimizer(train_cfg.learning_rate,
                                  train_cfg.adapt_learning_rate,
                                  train_cfg.variance_learning_rate,
                                  train_cfg.optimizer)
    opt_state = opt.init(params)

    if train_cfg.trajectory:
        gv_var = jnp.asarray(gv_variances if gv_variances is not None
                             else np.ones(int(sum(feature_dims))),
                             jnp.float32)

        def loss_fn(params, batch):
            pred, var = acoustic.forward(params, batch["x"], batch["spkr"],
                                         model_cfg)
            cost, _ = acoustic.trajectory_cost(
                pred, batch["y"], var[0], gv_var, tuple(feature_dims),
                tuple(msd_flags), msd_weight=train_cfg.msd_weight,
                gv_weight=train_cfg.gv_weight)
            return cost

        @jax.jit
        def step_fn(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        data = iter(dataio.UtteranceDataset(list(pairs),
                                            seed=train_cfg.seed))
        valid_batches = []
    else:
        step_fn = acoustic.make_train_step(model_cfg, opt)
        tr, va = dataio.train_valid_split(list(pairs),
                                          train_cfg.valid_fraction,
                                          train_cfg.seed)
        data = iter(dataio.FrameDataset(tr, train_cfg.batch_size,
                                        train_cfg.seed))
        valid_batches = (list(dataio.FrameDataset(
            va, train_cfg.batch_size, 0).epoch_batches())[:8] if va else [])

    ckpt = Checkpointer(ckpt_dir, train_cfg.max_to_keep)
    start = ckpt.latest_step() or 0
    if start:
        restored = ckpt.restore({"params": params, "opt_state": opt_state})
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            log(f"restored checkpoint at step {start}")

    def valid_cost(params):
        if not valid_batches:
            return float("nan")
        costs = []
        for b in valid_batches:
            pred, var = acoustic.forward(params, jnp.asarray(b["x"]),
                                         jnp.asarray(b["spkr"]), model_cfg)
            costs.append(float(acoustic.frame_cost(
                pred, jnp.asarray(b["y"]), var)))
        return float(np.mean(costs))

    t0 = time.time()
    running = []
    for step in range(start + 1, train_cfg.num_steps + 1):
        batch = next(data)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if "spkr" in batch and batch["spkr"].ndim == 0:
            batch["spkr"] = batch["spkr"][None]
        params, opt_state, loss = step_fn(params, opt_state, batch)
        running.append(float(loss))
        if step % train_cfg.log_interval == 0:
            dt = time.time() - t0
            log(f"step {step}: cost={np.mean(running):.5f} "
                f"({train_cfg.log_interval / max(dt, 1e-9):.1f} steps/s)")
            running = []
            t0 = time.time()
        if step % train_cfg.save_interval == 0 \
                or step == train_cfg.num_steps:
            ckpt.save(step, {"params": params, "opt_state": opt_state})
            log(f"saved step {step}; valid cost={valid_cost(params):.5f}")
    return params


def forward_corpus(model_cfg: acoustic.ModelConfig, params, ffi: np.ndarray,
                   speaker: int = 0) -> np.ndarray:
    """DNNSynthesis.py equivalent: forward one utterance's inputs."""
    pred, _ = acoustic.forward(params, jnp.asarray(ffi, jnp.float32),
                               jnp.full((len(ffi),), speaker, jnp.int32),
                               model_cfg)
    return np.asarray(pred)

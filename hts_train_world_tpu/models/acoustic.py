"""DNN acoustic model — TPU-native replacement for the TF1 stack
(data/scripts/DNNDefine.py / DNNTraining.py, SURVEY.md D1-D4).

Same modeling capabilities, idiomatic JAX:
- MLP (default 3x2048 sigmoid, configure.ac:932-970) with per-speaker
  additive hidden biases for SAT/ADAPT (DNNDefine.py:143-155);
- trainable per-speaker per-dim output variances (DNNDefine.py:177-189);
- frame Gaussian-NLL cost (DNNDefine.py:231-237);
- trajectory cost with MLPG-in-the-graph + MSD binary term + GV penalty
  (DNNDefine.py:240-399) — the dense [D,T,T] Cholesky becomes the banded
  scan of ops.mlpg;
- split learning rates via optax multi_transform (si / sd / variance,
  DNNDefine.py:194-228).

Sharding: batch over the mesh `data` axis; hidden layers tensor-parallel
over `model` (column-parallel then row-parallel; XLA inserts the psum).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from hts_train_world_tpu.ops import mlpg as mlpg_mod

LOG_2PI = float(np.log(2.0 * np.pi))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    n_in: int = 1186
    n_out: int = 238
    hidden: Tuple[int, ...] = (2048, 2048, 2048)
    n_speakers: int = 1
    hidden_activation: str = "sigmoid"
    output_activation: str = "linear"
    mode: str = "SD"  # SD | SAT | ADAPT (DNNTraining.py:102-108)
    dropout_keep: float = 1.0
    dtype: str = "float32"


_ACT = {"linear": lambda x: x, "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh, "relu": jax.nn.relu}


def init_params(key, cfg: ModelConfig):
    """Truncated-normal 1/sqrt(fan_in) init (DNNDefine.py:135-141)."""
    dtype = jnp.dtype(cfg.dtype)
    dims = [cfg.n_in, *cfg.hidden, cfg.n_out]
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        w = (jax.random.truncated_normal(k1, -2, 2, (dims[i], dims[i + 1]))
             / np.sqrt(dims[i])).astype(dtype)
        layer = {"si_w": w, "si_b": jnp.zeros(dims[i + 1], dtype)}
        if cfg.mode in ("SAT", "ADAPT") and i < len(dims) - 2:
            layer["sd_w"] = (jax.random.truncated_normal(
                k2, -2, 2, (cfg.n_speakers, dims[i + 1]))
                / np.sqrt(cfg.n_speakers)).astype(dtype)
        layers.append(layer)
    return {"layers": layers,
            "variance": {"log_var": jnp.zeros((cfg.n_speakers, cfg.n_out),
                                              dtype)}}


def forward(params, x, spkr_ids, cfg: ModelConfig, dropout_key=None):
    """inference (DNNDefine.py:113-191) -> (outputs, variances)."""
    act = _ACT[cfg.hidden_activation]
    out_act = _ACT[cfg.output_activation]
    onehot = jax.nn.one_hot(spkr_ids, cfg.n_speakers, dtype=x.dtype)
    h = x
    n_hidden = len(cfg.hidden)
    for i, layer in enumerate(params["layers"]):
        z = h @ layer["si_w"] + layer["si_b"]
        if "sd_w" in layer:
            z = z + onehot @ layer["sd_w"]
        if i < n_hidden:
            h = act(z)
            if dropout_key is not None and cfg.dropout_keep < 1.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, i), cfg.dropout_keep,
                    h.shape)
                h = jnp.where(keep, h / cfg.dropout_keep, 0.0)
        else:
            h = out_act(z)
    variances = onehot @ jnp.exp(params["variance"]["log_var"])
    return h, variances


def frame_cost(pred, target, variances):
    """Gaussian NLL per frame (DNNDefine.py:231-237)."""
    covdet = jnp.mean(jnp.log(variances))
    mahala = jnp.mean((target - pred) ** 2 / variances)
    return 0.5 * (LOG_2PI + covdet + mahala)


def trajectory_cost(pred, target, variances, gv_variances,
                    feature_dims: Sequence[int], msd_flags: Sequence[int],
                    n_win: int = 3, windows=mlpg_mod.DEFAULT_WINDOWS,
                    msd_weight: float = 1.0, gv_weight: float = 1e-6):
    """Trajectory-training cost (DNNDefine.py:240-399).

    pred/target: (T, D_total) laid out stream-wise as
    [msd? | static | deltas...] per feature type (make_config_dnn order).
    Returns (cost, generated_outputs) where generated statics come from
    the in-graph MLPG solve.
    """
    T = pred.shape[0]
    D = int(sum(feature_dims))
    msd_D = int(sum(msd_flags))

    # split columns into per-type [msd][win0..winN] blocks
    def split_streams(mat):
        msd_cols, per_win = [], [[] for _ in range(n_win)]
        off = 0
        for dim, flag in zip(feature_dims, msd_flags):
            if flag:
                msd_cols.append(mat[:, off:off + 1])
                off += 1
            for w in range(n_win):
                per_win[w].append(mat[:, off:off + dim])
                off += dim
        msd = (jnp.concatenate(msd_cols, 1) if msd_cols
               else jnp.zeros((T, 0), mat.dtype))
        wins = jnp.stack([jnp.concatenate(c, 1) for c in per_win], 1)
        return msd, wins  # (T, msd_D), (T, n_win, D)

    msd_pred, mu = split_streams(pred)
    msd_obs, obs_wins = split_streams(target)
    msd_var, var_wins = split_streams(
        jnp.broadcast_to(variances, pred.shape))
    static_obs = obs_wins[:, 0, :]

    c = mlpg_mod.mlpg(mu, var_wins, tuple(tuple(w) for w in windows))

    # trajectory NLL: (target_c - c)^T (W^T S W) (target_c - c) + logdet
    prec = 1.0 / var_wins
    diff = static_obs - c

    def quad_per_dim(dmu, dprec, ddiff):
        diags, _ = mlpg_mod.build_banded_normal(dmu, dprec,
                                                tuple(tuple(w) for w in
                                                      windows))
        # banded quadratic form d^T A d
        q = jnp.sum(diags[0] * ddiff * ddiff)
        for k in (1, 2):
            q = q + 2.0 * jnp.sum(diags[k][:-k] * ddiff[:-k] * ddiff[k:])
        # log det via LDL^T d values
        _, ds, _, _ = _ldlt_ds(diags)
        return q, jnp.sum(jnp.log(ds))

    qs, lds = jax.vmap(quad_per_dim, in_axes=(2, 2, 1))(mu, prec, diff)
    # NLL of the statics under N(c, (W^T S W)^-1): covdet = -log det(W^T S W)
    trj_cost = (D * T * LOG_2PI - jnp.sum(lds) + jnp.sum(qs)) \
        / (2.0 * D * T)

    if msd_D:
        msd_prec = 1.0 / msd_var
        # literal DNNDefine.py:362-366 (incl. its extra factor of T on the
        # covdet term — reproduced as-is)
        msd_cost = (msd_D * T * LOG_2PI
                    - T * jnp.sum(jnp.log(msd_prec))
                    + jnp.sum((msd_pred - msd_obs) ** 2 * msd_prec)) \
            / (2.0 * msd_D * T)
    else:
        msd_cost = 0.0

    # GV penalty (DNNDefine.py:368-383)
    pv = jnp.var(c, axis=0)
    ov = jnp.var(static_obs, axis=0)
    gv_prec = 1.0 / gv_variances
    gv_cost = (D * LOG_2PI + jnp.sum(jnp.log(gv_variances))
               + jnp.sum((pv - ov) ** 2 * gv_prec)) / (2.0 * D)

    cost = trj_cost + msd_weight * msd_cost + gv_weight * gv_cost
    return cost, (c, msd_pred)


def _ldlt_ds(diags):
    """d values of the banded LDL^T (for log-det)."""
    from hts_train_world_tpu.ops.mlpg import banded_ldlt_solve  # noqa
    # re-run the forward factorization capturing d
    T = diags.shape[1]
    dtype = diags.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    a0 = diags[0]
    am1 = jnp.concatenate([zero[None], diags[1][:-1]])
    am2 = jnp.concatenate([zero[None], zero[None], diags[2][:-2]])

    def fwd(carry, inp):
        d1, d2, lp = carry
        aii, ai1, ai2 = inp
        l2 = ai2 / d2
        l1 = (ai1 - l2 * d2 * lp) / d1
        d_i = aii - l1 * l1 * d1 - l2 * l2 * d2
        return (d_i, d1, l1), (d_i, l1, l2)

    _, (ds, l1s, l2s) = jax.lax.scan(fwd, (one, one, zero), (a0, am1, am2))
    return None, ds, l1s, l2s


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def make_optimizer(learning_rate=1e-3, adapt_learning_rate=0.0,
                   variance_learning_rate=1e-5, optimizer: str = "adam"):
    """Split si/sd/variance optimizers (DNNDefine.py:194-228)."""
    make = {"adam": optax.adam, "sgd": optax.sgd,
            "momentum": lambda lr: optax.sgd(lr, momentum=0.9),
            "adagrad": optax.adagrad, "adadelta": optax.adadelta,
            "rmsprop": optax.rmsprop}[optimizer]

    def label_fn(params):
        def lab(path, _):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "variance" in keys:
                return "variance"
            if any(str(k).startswith("sd_") for k in keys):
                return "sd"
            return "si"
        return jax.tree_util.tree_map_with_path(lab, params)

    return optax.multi_transform(
        {"si": make(learning_rate),
         "sd": make(adapt_learning_rate or learning_rate),
         "variance": make(variance_learning_rate)}, label_fn)


def make_train_step(cfg: ModelConfig, optimizer):
    def loss_fn(params, batch):
        pred, var = forward(params, batch["x"], batch["spkr"], cfg)
        return frame_cost(pred, batch["y"], var)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def shard_params(params, mesh):
    """Tensor-parallel layout: alternate column/row parallel hidden
    layers over the `model` axis; variances replicated."""
    def spec(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if "variance" in keys:
            return NamedSharding(mesh, P())
        idx = next((int(p.idx) for p in path if hasattr(p, "idx")), 0)
        if keys[-1] == "si_w":
            return NamedSharding(
                mesh, P(None, "model") if idx % 2 == 0 else P("model", None))
        if keys[-1] in ("si_b", "sd_w"):
            return NamedSharding(
                mesh, P("model") if idx % 2 == 0 and keys[-1] == "si_b"
                else P())
        return NamedSharding(mesh, P())

    specs = jax.tree_util.tree_map_with_path(spec, params)
    return jax.device_put(params, specs)

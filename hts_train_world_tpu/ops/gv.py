"""Global-variance (GV) parameter generation — the HMGenS GV / trajectory
GV-term counterpart (Training.pl MCDGV stage, DNNDefine.py:368-383).

Two modes:
- variance scaling (the fast closed form): rescale each dimension's
  deviation from its utterance mean so its variance equals the GV model
  mean;
- gradient refinement: a few steps maximizing the combined trajectory +
  GV log-likelihood (the standard GV generation update), staying close to
  the MLPG solution.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hts_train_world_tpu.ops import mlpg as mlpg_mod


def gv_scale(statics, gv_mean, weight: float = 1.0):
    """c' = mean + sqrt(gv_mean/var(c))^w * (c - mean)."""
    mu = jnp.mean(statics, axis=0, keepdims=True)
    var = jnp.var(statics, axis=0, keepdims=True)
    ratio = jnp.sqrt(gv_mean[None] / jnp.maximum(var, 1e-12)) ** weight
    return mu + ratio * (statics - mu)


@partial(jax.jit, static_argnames=("n_iters", "windows"))
def gv_refine(means, variances, gv_mean, gv_var, n_iters: int = 10,
              step: float = 0.1, gv_weight: float = 1.0,
              windows=mlpg_mod.DEFAULT_WINDOWS):
    """Gradient GV generation: start from the MLPG solution and ascend
    L = L_trajectory(c) + w * L_gv(var(c)); means/variances (T, W, D)."""
    wins = tuple(tuple(w) for w in windows)
    c0 = mlpg_mod.mlpg(means, variances, wins)
    T = c0.shape[0]

    def neg_ll(c):
        # trajectory term: -(o - Wc)^T S (o - Wc) accumulated per window
        total = 0.0
        for w_idx, w in enumerate(wins):
            nlr = (len(w) - 1) // 2
            pred = jnp.zeros_like(c)
            for ki, wk in enumerate(w):
                if wk == 0.0:
                    continue
                k = ki - nlr
                rolled = jnp.roll(c, -k, axis=0)
                mask = jnp.arange(T)[:, None]
                ok = ((mask + k >= 0) & (mask + k < T))
                pred = pred + jnp.where(ok, wk * rolled, 0.0)
            diff = pred - means[:, w_idx]
            total = total + jnp.sum(diff * diff / variances[:, w_idx])
        v = jnp.var(c, axis=0)
        gv = jnp.sum((v - gv_mean) ** 2 / gv_var)
        return 0.5 * total + 0.5 * gv_weight * T * gv

    grad = jax.grad(neg_ll)

    def body(c, _):
        g = grad(c)
        return c - step * g / jnp.maximum(jnp.abs(g).max(), 1e-6), None

    c, _ = jax.lax.scan(body, gv_scale(c0, gv_mean, 0.5), None,
                        length=n_iters)
    return c

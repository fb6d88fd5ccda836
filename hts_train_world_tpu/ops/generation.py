"""Parameter generation from acoustic-model outputs — the gen_param
equivalent (Training.pl:2755-2810): split the ffo frame into streams,
decide V/UV from MSD flags, run MLPG per stream with corpus variances,
and restore the -1e10 magic on unvoiced frames of MSD streams.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.features.compose import StreamLayout
from hts_train_world_tpu.ops import mlpg as mlpg_mod

MAGIC = -1.0e10


@dataclasses.dataclass
class GeneratedParams:
    mgc: jnp.ndarray   # (T, mgc_dim)
    lf0: jnp.ndarray   # (T, lf0_dim), MAGIC where unvoiced
    bap: jnp.ndarray
    vib: jnp.ndarray
    vuv: jnp.ndarray   # (T,) bool


def _stream_cols(layout: StreamLayout):
    """Column layout of the ffo frame: [mgc-win | lf0-msd | lf0-win |
    bap-win | vib-win] (data/Makefile.in:360-409; vib carries no flag —
    its V/UV follows lf0's, closing the reference's missing-flag gap)."""
    w = layout.n_win
    cols = {}
    off = 0
    cols["mgc"] = (None, slice(off, off + w * layout.mgc_dim))
    off += w * layout.mgc_dim
    cols["lf0"] = (off, slice(off + 1, off + 1 + w * layout.lf0_dim))
    off += 1 + w * layout.lf0_dim
    cols["bap"] = (None, slice(off, off + w * layout.bap_dim))
    off += w * layout.bap_dim
    cols["vib"] = (None, slice(off, off + w * layout.vib_dim))
    return cols


def generate_parameters(ffo, ffo_var, layout: StreamLayout = StreamLayout(),
                        windows=mlpg_mod.DEFAULT_WINDOWS) -> GeneratedParams:
    """ffo: (T, ffo_dim) model means; ffo_var: (ffo_dim,) corpus variances
    (stats/ffo.var).  MLPG runs over all frames (as the reference's SPTK
    mlpg does) and MSD masking is applied afterwards."""
    ffo = jnp.asarray(ffo)
    ffo_var = jnp.asarray(ffo_var, ffo.dtype)
    T = ffo.shape[0]
    w = layout.n_win
    cols = _stream_cols(layout)
    dims = dict(mgc=layout.mgc_dim, lf0=layout.lf0_dim, bap=layout.bap_dim,
                vib=layout.vib_dim)

    flag_col = cols["lf0"][0]
    vuv = ffo[:, flag_col] > 0.5  # SOPR -s 0.5 -UNIT (Training.pl:2782)

    out = {}
    for name in ("mgc", "lf0", "bap", "vib"):
        _, sl = cols[name]
        D = dims[name]
        mean = ffo[:, sl].reshape(T, w, D)
        var = jnp.broadcast_to(ffo_var[sl].reshape(1, w, D), (T, w, D))
        statics = mlpg_mod.mlpg(mean, var,
                                tuple(tuple(x) for x in windows))
        if name in ("lf0", "vib"):
            statics = jnp.where(vuv[:, None], statics, MAGIC)
        out[name] = statics
    return GeneratedParams(out["mgc"], out["lf0"], out["bap"], out["vib"],
                           vuv)


def lf0_to_f0(lf0_static, vuv) -> jnp.ndarray:
    """First lf0 dim -> f0 contour for the synthesizer (0 = unvoiced)."""
    return jnp.where(jnp.asarray(vuv), jnp.exp(lf0_static[:, 0]), 0.0)

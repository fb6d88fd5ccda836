"""HMGenS-equivalent parameter generation from a clustered HSMM voice —
the reference's PGEN/WGEN stages (Training.pl:730-759, gen_wave
:2813-2947) and HMGenS's three generation algorithms:

  pgtype 0  ML generation given the state sequence from the duration
            pdfs (Tokuda et al. 2000 case 1) — durations
            d_k = mu_k + rho * sigma^2_k with the speaking-rate rho
            (HMGenS -r; rho solved from a target length when given);
  pgtype 1  EM over state sequences (case 2): E-step = HSMM
            forward-backward of the CURRENT windowed trajectory against
            the chain states, M-step = MLPG with gamma-mixed precisions;
  pgtype 2  EM over state + space (mixture) sequences (case 3) — with
            single-Gaussian streams the mixture posterior is the MSD
            space posterior, re-estimated each iteration.

TPU mapping: the E-step reuses models/hsmm.forward_backward_segment
(one lax.scan over chain states); the M-step's precision mixing is two
(T, K) @ (K, D) matmuls per stream — MXU work — followed by the banded
LDL^T MLPG solve (ops/mlpg).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.models import context_clustered as cc
from hts_train_world_tpu.models import hsmm
from hts_train_world_tpu.ops import mlpg as mlpg_mod

MAGIC = -1.0e10


# ---------------------------------------------------------------------------
# durations (HMGenS -r / -m)
# ---------------------------------------------------------------------------


def state_durations(model: cc.ClusteredModel, label_seq: Sequence[str],
                    rho: float = 0.0) -> np.ndarray:
    """(K,) integer state durations d_k = round(mu_k + rho*sigma^2_k),
    floored at 1 — HMGenS's duration decision (-r rho; HGen.c uses the
    duration pdf variance as the rate sensitivity)."""
    out = []
    for ctx in label_seq:
        dm, dv = model.durations(ctx)
        out.append(np.maximum(1, np.round(dm + rho * dv)).astype(int))
    return np.concatenate(out)


def rho_for_total(model: cc.ClusteredModel, label_seq: Sequence[str],
                  total_frames: int) -> float:
    """Solve rho so sum(mu_k + rho*sigma^2_k) == total_frames (HMGenS's
    total-length constraint when an utterance length is imposed)."""
    mu = 0.0
    v = 0.0
    for ctx in label_seq:
        dm, dv = model.durations(ctx)
        mu += float(dm.sum())
        v += float(dv.sum())
    return (total_frames - mu) / max(v, 1e-8)


# ---------------------------------------------------------------------------
# chain-state frame expansion
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FrameParams:
    """Frame-level generation inputs: per stream (T, w*D) mean/var in the
    cmp column layout, plus the frame V/UV decision and state spans."""
    means: Dict[str, np.ndarray]
    vars: Dict[str, np.ndarray]
    vuv: np.ndarray            # (T,) bool
    durs: np.ndarray           # (K,)
    frame_state: np.ndarray    # (T,) chain-state index


def frame_params(model: cc.ClusteredModel, label_seq: Sequence[str],
                 durs: np.ndarray) -> FrameParams:
    """Expand chain-state pdfs to frames under explicit state durations
    (HMGenS with -m model alignment, or pgtype-0 durations)."""
    S = model.n_states
    means = {st.name: [] for st in model.streams}
    vars_ = {st.name: [] for st in model.streams}
    vuv = []
    k = 0
    for ctx in label_seq:
        params = [model.state_params(ctx, s) for s in range(S)]
        for s in range(S):
            d = int(durs[k])
            k += 1
            for st in model.streams:
                mean, var, _ = params[s][st.name]
                means[st.name].append(np.repeat(mean[None], d, 0))
                vars_[st.name].append(np.repeat(var[None], d, 0))
            w = params[s]["lf0"][2] if "lf0" in means else 1.0
            vuv.append(np.full(d, w > 0.5))
    frame_state = np.repeat(np.arange(len(durs)), durs)
    return FrameParams({n: np.concatenate(v) for n, v in means.items()},
                       {n: np.concatenate(v) for n, v in vars_.items()},
                       np.concatenate(vuv), np.asarray(durs), frame_state)


# ---------------------------------------------------------------------------
# per-stream MLPG
# ---------------------------------------------------------------------------


def mlpg_streams(fp: FrameParams, streams, n_win: int = 3,
                 windows=mlpg_mod.DEFAULT_WINDOWS) -> Dict[str, np.ndarray]:
    """Run MLPG per stream -> statics {name: (T, D)}.  MSD streams:
    unvoiced frames get near-zero precision (the HMGenS equivalent of
    generating only over voiced segments — the solution interpolates
    smoothly through unvoiced gaps) and are masked to MAGIC after."""
    wins = tuple(tuple(w) for w in windows[:n_win])
    out = {}
    T = len(fp.vuv)
    for st in streams:
        mean = jnp.asarray(fp.means[st.name])
        var = jnp.asarray(fp.vars[st.name])
        D = mean.shape[1] // n_win
        mean = mean.reshape(T, n_win, D)
        var = var.reshape(T, n_win, D)
        if st.msd:
            uv = ~jnp.asarray(fp.vuv)
            var = jnp.where(uv[:, None, None], var * 1e8, var)
        statics = mlpg_mod.mlpg(mean, var, wins)
        if st.msd:
            statics = jnp.where(jnp.asarray(fp.vuv)[:, None], statics,
                                MAGIC)
        out[st.name] = np.asarray(statics)
    return out


# ---------------------------------------------------------------------------
# EM generation (pgtype 1 / 2)
# ---------------------------------------------------------------------------


def _windowed_obs(statics: Dict[str, np.ndarray], streams, vuv,
                  n_win: int = 3):
    """Assemble the cmp-layout windowed observation of the current
    trajectory: per stream expand statics by the delta windows; MSD
    streams zero their unvoiced frames (flag column semantics)."""
    from hts_train_world_tpu.features import windows as win_mod
    parts = []
    for st in streams:
        x = np.where(statics[st.name] == MAGIC, 0.0, statics[st.name])
        w = np.asarray(win_mod.expand(x, win_mod.DEFAULT_WINDOWS[:n_win]))
        if st.msd:
            w = np.where(vuv[:, None], w, 0.0)
        parts.append(w)
    return np.concatenate(parts, axis=1)


def generate_em(model: cc.ClusteredModel, label_seq: Sequence[str],
                durs: Optional[np.ndarray] = None, n_iters: int = 3,
                max_dur: int = 60, n_win: int = 3, pgtype: int = 1,
                windows=mlpg_mod.DEFAULT_WINDOWS):
    """pgtype 1/2 generation (Tokuda et al. 2000 cases 2-3; HMGenS -c 1/2).

    Start from the pgtype-0 trajectory, then iterate
      E: gamma = HSMM forward-backward of the current windowed trajectory
         against the composed chain (duration pdfs included);
      M: per-frame mixed precision P_t = sum_k gamma_tk / var_k and
         mean-precision b_t = sum_k gamma_tk mu_k / var_k -> MLPG on
         (b/P, 1/P).
    pgtype 2 additionally re-estimates the MSD space (voicing) posterior
    each iteration: vuv_t = sum_k gamma_tk w_k > 0.5.

    Returns (statics, vuv, gamma, log_evidence_history)."""
    if durs is None:
        durs = state_durations(model, label_seq)
    fp = frame_params(model, label_seq, durs)
    statics = mlpg_streams(fp, model.streams, n_win, windows)
    vuv = fp.vuv.copy()
    T = len(vuv)
    K = len(durs)

    ch = cc._chain_arrays(model, label_seq)
    means, vars_, msd_w, _, _, dmean, dvar = ch
    sls = []
    off = 0
    for st in model.streams:
        w = st.sl.stop - st.sl.start
        sls.append((off, off + w))
        off += w
    sls = tuple(sls)
    flags = tuple(st.msd for st in model.streams)
    wts = tuple(st.weight for st in model.streams)
    wins = tuple(tuple(w) for w in windows[:n_win])

    history = []
    gamma = None
    for _ in range(n_iters):
        obs = _windowed_obs(statics, model.streams, vuv, n_win)
        obs_ll = hsmm.frame_loglik(
            jnp.asarray(obs),
            tuple(jnp.asarray(means[st.name]) for st in model.streams),
            tuple(jnp.asarray(vars_[st.name]) for st in model.streams),
            tuple(jnp.asarray(msd_w[st.name]) for st in model.streams),
            sls, flags, wts)
        ll, gamma, _ = hsmm.forward_backward_segment(
            obs_ll, jnp.asarray(dmean), jnp.asarray(dvar), max_dur)
        history.append(float(ll))
        gamma = jnp.maximum(gamma, 0.0)
        gsum = jnp.maximum(jnp.sum(gamma, axis=1, keepdims=True), 1e-12)
        gamma = gamma / gsum                              # (T, K)
        if pgtype >= 2 and "lf0" in [s.name for s in model.streams]:
            li = [s.name for s in model.streams].index("lf0")
            w_k = jnp.asarray(msd_w[model.streams[li].name])  # (K,)
            vuv = np.asarray(gamma @ w_k > 0.5)
        out = {}
        for si, st in enumerate(model.streams):
            mu = jnp.asarray(means[st.name])              # (K, wD)
            va = jnp.asarray(vars_[st.name])
            prec = gamma @ (1.0 / va)                     # (T, wD) MXU
            mp = gamma @ (mu / va)
            var_eff = 1.0 / jnp.maximum(prec, 1e-12)
            mean_eff = mp * var_eff
            D = mu.shape[1] // n_win
            var_eff = var_eff.reshape(T, n_win, D)
            mean_eff = mean_eff.reshape(T, n_win, D)
            if st.msd:
                uv = ~jnp.asarray(vuv)
                var_eff = jnp.where(uv[:, None, None], var_eff * 1e8,
                                    var_eff)
            stat = mlpg_mod.mlpg(mean_eff, var_eff, wins)
            if st.msd:
                stat = jnp.where(jnp.asarray(vuv)[:, None], stat, MAGIC)
            out[st.name] = np.asarray(stat)
        statics = out
    return statics, vuv, np.asarray(gamma), history


# ---------------------------------------------------------------------------
# full PGEN: durations -> MLPG -> GV -> postfilter
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GenConfig:
    pgtype: int = 0
    rho: float = 0.0
    em_iters: int = 3
    max_dur: int = 60
    n_win: int = 3
    use_gv: bool = False
    gv_weight: float = 1.0
    gv_streams: Sequence[str] = ("mgc", "lf0")
    postfilter_mcp: float = 0.0     # mcep postfilter strength (ref 1.4)
    alpha: float = 0.42
    fft_size: int = 1024


def generate_parameters(model: cc.ClusteredModel, label_seq: Sequence[str],
                        cfg: GenConfig = GenConfig(), gv_model=None,
                        durs: Optional[np.ndarray] = None,
                        mspf=None, mspf_weight: float = 1.0):
    """The PGEN stage for one utterance: statics per stream + vuv.

    gv_model: models/gv_model.GVModel (applied via ops.gv.gv_scale to
    cfg.gv_streams; lf0 GV runs over voiced frames only).  mspf:
    (nat, gen) ops/postfilter.MspfStats pair for the modulation-spectrum
    postfilter on mgc (Training.pl:2950-3000)."""
    from hts_train_world_tpu.ops import gv as gv_mod
    from hts_train_world_tpu.ops import postfilter as pf_mod

    if durs is None:
        durs = state_durations(model, label_seq, cfg.rho)
    if cfg.pgtype == 0:
        fp = frame_params(model, label_seq, durs)
        statics = mlpg_streams(fp, model.streams, cfg.n_win)
        vuv = fp.vuv
    else:
        statics, vuv, _, _ = generate_em(
            model, label_seq, durs, cfg.em_iters, cfg.max_dur, cfg.n_win,
            cfg.pgtype)

    if cfg.use_gv and gv_model is not None:
        ctx0 = label_seq[0]   # make_data_gv labels GV by the first label
        for name in cfg.gv_streams:
            if name not in gv_model.trees or name not in statics:
                continue
            gmean, _ = gv_model.params(name, ctx0)
            x = statics[name]
            if name == "lf0":
                v = vuv & (x[:, 0] != MAGIC)
                if v.sum() > 2:
                    xv = gv_mod.gv_scale(jnp.asarray(x[v]),
                                         jnp.asarray(gmean), cfg.gv_weight)
                    x = x.copy()
                    x[v] = np.asarray(xv)
            else:
                x = np.asarray(gv_mod.gv_scale(jnp.asarray(x),
                                               jnp.asarray(gmean),
                                               cfg.gv_weight))
            statics[name] = x

    if mspf is not None and "mgc" in statics:
        nat, gen = mspf
        statics["mgc"] = np.asarray(pf_mod.apply_mspf(
            jnp.asarray(statics["mgc"]), nat, gen, mspf_weight))
    elif cfg.postfilter_mcp > 0 and "mgc" in statics:
        statics["mgc"] = np.asarray(pf_mod.mcep_postfilter(
            jnp.asarray(statics["mgc"]), cfg.alpha, cfg.postfilter_mcp,
            cfg.fft_size))
    return statics, vuv, durs


def generate_waveform(statics: Dict[str, np.ndarray], vuv, fs: int,
                      fft_size: int = 0, frame_period: float = 5.0,
                      engine: str = "world", alpha: float = 0.42):
    """WGEN for one utterance.  engine="world": decode the compressed
    features and run the WORLD synthesizer (gen_wave's WORLD branch —
    the path the reference omits, runtime/pipeline.py closes the same
    gap for the DNN path).  engine="sptk": the excite|mglsadf mixed-
    excitation branch (Training.pl:2873-2899, ops/excitation.py) — the
    reference's actual non-STRAIGHT/WORLD synthesis."""
    from hts_train_world_tpu import cli as cli_mod
    from hts_train_world_tpu import config as wcfg
    from hts_train_world_tpu import vocoder
    N = fft_size or wcfg.cheaptrick_fft_size(fs)
    lf0 = statics["lf0"]
    if engine == "sptk":
        from hts_train_world_tpu.features import filters
        from hts_train_world_tpu.ops import excitation as ex_mod
        low, high = filters.band_split_filters(fs)
        shift = int(fs * frame_period / 1000.0)
        lf0_m = np.where(vuv & (lf0[:, 0] != MAGIC), lf0[:, 0], MAGIC)
        return np.asarray(ex_mod.synthesize_sptk(
            lf0_m, statics["mgc"].astype(np.float64), fs, shift, alpha,
            low, high, fft_size=N))
    lf0_1 = np.where((lf0[:, 0] == MAGIC) | ~vuv, 0.0, lf0[:, 0])
    f0, sp, ap = cli_mod.decode_features(
        jnp.asarray(lf0_1), jnp.asarray(statics["mgc"].astype(np.float64)),
        jnp.asarray(statics["bap"].astype(np.float64)), fs, N)
    y = vocoder.synthesize(f0, sp, ap, fs, N, frame_period, parity=False)
    return np.asarray(y)

"""MSD-HSMM acoustic modeling — the TPU-native replacement for the
external HTS binaries the reference drives (HCompV / HInit / HRest /
HERest / HSMMAlign / HMGenS; SURVEY.md T3, Training.pl:264-741).

Model: left-to-right, no-skip hidden semi-Markov chains, one model per
(context) label, n_states per model (HTS default 5).  Each state has
- per-stream diagonal Gaussians over the windowed observation blocks
  (mgc 150 / lf0 6 / bap 75 / vib 6 in the WORLD layout);
- MSD (multi-space) streams carry a voiced-space weight; unvoiced frames
  contribute log(1-w) only (lf0/vib, Config.pm.in:117-121);
- an explicit Gaussian state-duration model (the HSMM part).

Compute split:
- per-frame, per-state observation log-likelihoods and their prefix sums
  are batched device ops (the E-step's hot part);
- the segmental Viterbi DP over the composed utterance chain runs as
  vectorized per-state updates (O(S) python loop of O(T*Dmax) jnp ops);
- accumulation (occupancy-weighted moments) is psum-friendly: per
  utterance sufficient statistics add across shards/hosts.

Training uses segmental EM (Viterbi alignment E-step, exact M-step) —
the HTS recipe's HInit/HRest are uniform segmentation + segmental
k-means too; HERest's full Baum-Welch differs only in soft counts.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = float(np.log(2.0 * np.pi))
LOG_ZERO = -1.0e10


@dataclasses.dataclass(frozen=True)
class StreamDef:
    name: str
    sl: slice            # columns in the cmp frame
    msd: bool = False
    msd_flag_col: int = -1   # column whose !=0 decides "present" (static)
    weight: float = 1.0      # stream weight (Config.pm.in:123-127)


def world_streams(layout=None) -> Tuple[StreamDef, ...]:
    """The WORLD cmp layout: mgc 150 | lf0 6 | bap 75 | vib 6 with
    stream weights mgc/lf0/vib=1, bap=0 (Config.pm.in:123-127)."""
    from hts_train_world_tpu.features.compose import StreamLayout
    lay = layout or StreamLayout()
    w = lay.n_win
    o = 0
    out = []
    for name, dim, msd, wt in (("mgc", lay.mgc_dim, False, 1.0),
                               ("lf0", lay.lf0_dim, True, 1.0),
                               ("bap", lay.bap_dim, False, 0.0),
                               ("vib", lay.vib_dim, True, 1.0)):
        out.append(StreamDef(name, slice(o, o + w * dim), msd, o, wt))
        o += w * dim
    return tuple(out)


@dataclasses.dataclass
class ModelSet:
    """Parameters for all models, stacked: (n_models, n_states, ...)."""
    names: List[str]
    means: Dict[str, np.ndarray]      # per stream: (M, S, D)
    variances: Dict[str, np.ndarray]  # per stream: (M, S, D)
    msd_weights: Dict[str, np.ndarray]  # msd streams: (M, S)
    dur_mean: np.ndarray              # (M, S)
    dur_var: np.ndarray               # (M, S)
    streams: Tuple[StreamDef, ...]

    @property
    def n_states(self) -> int:
        return self.dur_mean.shape[1]

    def index(self, name: str) -> int:
        return self.names.index(name)


def global_stats(frames: np.ndarray, streams: Sequence[StreamDef]):
    """HCompV equivalent: global mean/variance (-> variance floors)."""
    mean = frames.mean(0)
    var = frames.var(0)
    return mean, var


def init_modelset(names: Sequence[str], frames_by_model, streams,
                  n_states: int = 5, var_floor_scale: float = 0.01):
    """HInit-style init: uniform segmentation of every occurrence, then
    per-state moments.  frames_by_model: {name: list of (T_i, D) arrays
    (one per occurrence)}."""
    all_frames = np.concatenate([f for fl in frames_by_model.values()
                                 for f in fl])
    gmean, gvar = global_stats(all_frames, streams)
    floor = gvar * var_floor_scale + 1e-8

    M = len(names)
    D = all_frames.shape[1]
    means = {s.name: np.zeros((M, n_states, s.sl.stop - s.sl.start))
             for s in streams}
    variances = {s.name: np.ones((M, n_states, s.sl.stop - s.sl.start))
                 for s in streams}
    msd_weights = {s.name: np.full((M, n_states), 0.5)
                   for s in streams if s.msd}
    dur_mean = np.full((M, n_states), 3.0)
    dur_var = np.full((M, n_states), 10.0)

    for mi, name in enumerate(names):
        occs = frames_by_model.get(name, [])
        per_state = [[] for _ in range(n_states)]
        for f in occs:
            T = len(f)
            bounds = np.linspace(0, T, n_states + 1).astype(int)
            for s in range(n_states):
                per_state[s].append(f[bounds[s]:bounds[s + 1]])
        for s in range(n_states):
            seg = (np.concatenate(per_state[s])
                   if per_state[s] and sum(len(p) for p in per_state[s])
                   else all_frames)
            durs = [max(1, len(p)) for p in per_state[s]] or [3]
            dur_mean[mi, s] = float(np.mean(durs))
            dur_var[mi, s] = float(np.var(durs)) + 1.0
            for st in streams:
                block = seg[:, st.sl]
                if st.msd:
                    present = seg[:, st.msd_flag_col] != 0.0
                    msd_weights[st.name][mi, s] = \
                        float(present.mean()) if len(present) else 0.5
                    block = block[present] if present.any() else block
                mu = block.mean(0) if len(block) else gmean[st.sl]
                va = block.var(0) if len(block) > 1 else gvar[st.sl]
                means[st.name][mi, s] = mu
                variances[st.name][mi, s] = np.maximum(va, floor[st.sl])
    return ModelSet(list(names), means, variances, msd_weights,
                    dur_mean, dur_var, tuple(streams))


# ---------------------------------------------------------------------------
# observation log-likelihood (device)
# ---------------------------------------------------------------------------


def _gauss_ll(x, mu, var):
    """Diag-Gaussian log density: x (T, D) vs mu/var (S, D) -> (T, S)."""
    d2 = (x[:, None, :] - mu[None]) ** 2 / var[None]
    return -0.5 * (jnp.sum(d2, -1)
                   + jnp.sum(jnp.log(var), -1)[None]
                   + x.shape[-1] * LOG_2PI)


@partial(jax.jit, static_argnames=("stream_slices", "msd_flags",
                                   "weights_static"))
def frame_loglik(frames, means, variances, msd_w, stream_slices,
                 msd_flags, weights_static):
    """frames (T, D); means/variances: dict-ordered tuples of (S, D_s);
    returns (T, S) total weighted log-likelihood (HTS stream weights)."""
    total = 0.0
    for i, (sl, is_msd, wt) in enumerate(
            zip(stream_slices, msd_flags, weights_static)):
        x = frames[:, sl[0]:sl[1]]
        ll = _gauss_ll(x, means[i], variances[i])
        if is_msd:
            present = (frames[:, sl[0]] != 0.0)[:, None]
            w = jnp.clip(msd_w[i], 1e-4, 1.0 - 1e-4)[None]
            ll = jnp.where(present, jnp.log(w) + ll, jnp.log1p(-w))
        total = total + wt * ll
    return total


def _dur_ll(d, mean, var):
    """Gaussian duration log-prob of integer d (HTS dur models)."""
    return -0.5 * ((d - mean) ** 2 / var + jnp.log(var) + LOG_2PI)


# ---------------------------------------------------------------------------
# segmental Viterbi over a composed utterance chain
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_dur",))
def viterbi_segment(obs_ll, dur_mean, dur_var, max_dur: int = 40):
    """obs_ll: (T, S) state observation log-liks in chain order;
    dur_mean/var: (S,).  Left-to-right, no skip; every state visited.
    Returns (best_ll, end_times (S,)) where end_times[s] is the exclusive
    frame index where state s ends."""
    T, S = obs_ll.shape
    csum = jnp.concatenate([jnp.zeros((1, S), obs_ll.dtype),
                            jnp.cumsum(obs_ll, 0)], 0)  # (T+1, S)
    ds = jnp.arange(1, max_dur + 1, dtype=obs_ll.dtype)

    NEG = jnp.asarray(LOG_ZERO, obs_ll.dtype)
    delta0 = jnp.full(T + 1, NEG, obs_ll.dtype).at[0].set(0.0)

    def state_step(carry, s):
        delta_prev, _ = carry
        # ending state s at time t: max over duration d of
        # delta_prev[t-d] + dur_ll(s,d) + sum obs_ll[t-d:t, s]
        dll = _dur_ll(ds, dur_mean[s], dur_var[s])  # (Dmax,)
        t = jnp.arange(T + 1)
        td = t[:, None] - ds.astype(jnp.int32)[None, :]      # (T+1, Dmax)
        valid = td >= 0
        tdc = jnp.clip(td, 0, T)
        prev = jnp.take(delta_prev, tdc)
        seg = jnp.take(csum[:, s], t)[:, None] - jnp.take(csum[:, s], tdc)
        cand = jnp.where(valid, prev + dll[None, :] + seg, NEG)
        best_d = jnp.argmax(cand, axis=1).astype(jnp.int32)
        delta = jnp.max(cand, axis=1)
        return (delta, best_d), (delta, best_d)

    (_, _), (deltas, best_ds) = jax.lax.scan(
        state_step, (delta0, jnp.zeros(T + 1, jnp.int32)), jnp.arange(S))
    best_ll = deltas[-1, T]

    # backtrack durations
    def back(t_end, s):
        d = best_ds[s, t_end] + 1
        return t_end - d, t_end

    t_end = T
    ends = []
    for s in range(S - 1, -1, -1):
        t_start, te = back(t_end, s)
        ends.append(te)
        t_end = t_start
    ends = jnp.stack(ends[::-1])
    return best_ll, ends


def chain_loglik(modelset: ModelSet, frames: np.ndarray,
                 label_seq: Sequence[str]):
    """Per-frame observation log-likelihoods for the utterance's composed
    state chain: returns (obs_ll (T, n_labels*S), dur_mean, dur_var)."""
    S = modelset.n_states
    idxs = [modelset.index(n) for n in label_seq]
    sls = tuple((s.sl.start, s.sl.stop) for s in modelset.streams)
    flags = tuple(s.msd for s in modelset.streams)
    wts = tuple(s.weight for s in modelset.streams)
    obs = []
    for mi in idxs:
        means = tuple(jnp.asarray(modelset.means[s.name][mi])
                      for s in modelset.streams)
        vars_ = tuple(jnp.asarray(modelset.variances[s.name][mi])
                      for s in modelset.streams)
        msd_w = tuple(
            jnp.asarray(modelset.msd_weights[s.name][mi]) if s.msd
            else jnp.zeros(S) for s in modelset.streams)
        obs.append(frame_loglik(jnp.asarray(frames), means, vars_, msd_w,
                                sls, flags, wts))
    obs_ll = jnp.concatenate(obs, axis=1)  # (T, n_labels*S)
    dmean = jnp.concatenate([jnp.asarray(modelset.dur_mean[mi])
                             for mi in idxs])
    dvar = jnp.concatenate([jnp.asarray(modelset.dur_var[mi])
                            for mi in idxs])
    return obs_ll, dmean, dvar


def align_utterance(modelset: ModelSet, frames: np.ndarray,
                    label_seq: Sequence[str], max_dur: int = 40):
    """HSMMAlign equivalent: Viterbi state boundaries for the utterance's
    label sequence.  Returns (loglik, state_end_frames (n_labels*S,)).

    Raises ValueError when the utterance is shorter than its composed
    chain (every state needs >=1 frame) — the reference's HSMMAlign
    likewise fails on infeasible utterances rather than emitting
    garbage boundaries (Training.pl:601-618 drops them)."""
    n_chain = len(label_seq) * modelset.n_states
    if len(frames) < n_chain:
        raise ValueError(
            f"utterance has {len(frames)} frames but the label chain needs "
            f">= {n_chain} ({len(label_seq)} labels x {modelset.n_states} "
            f"states); alignment is infeasible")
    obs_ll, dmean, dvar = chain_loglik(modelset, frames, label_seq)
    ll, ends = viterbi_segment(obs_ll, dmean, dvar, max_dur)
    return float(ll), np.asarray(ends)


# ---------------------------------------------------------------------------
# full (soft-occupancy) HSMM forward-backward — HERest's Baum-Welch E-step
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_dur",))
def forward_backward_segment(obs_ll, dur_mean, dur_var, max_dur: int = 40,
                             temper: float = 1.0, t_len=None, k_len=None):
    """Soft-occupancy E-step over the composed left-to-right chain — the
    exact counterpart of HERest's full Baum-Welch (the reference's HERest,
    Training.pl:248-258, differs from HSMMAlign only in soft vs. hard
    counts).  `temper` is the DAEM temperature k in HERest's `-k` flag
    (Training.pl:428-429): log-likelihoods are scaled by k, annealing the
    posterior from flat (k->0) to exact (k=1).

    obs_ll (T, S), dur_mean/var (S,).  Returns
    (log_evidence, gamma (T, S) frame occupancies,
     dur_stats (S, 3) = [segment mass, E[d]*mass, E[d^2]*mass]).

    Padded-batch support (the vmapped corpus E-step pads utterances to a
    bucket shape): `t_len`/`k_len` are the TRUE frame/chain-state counts
    (traced scalars).  The DP then terminates at t_len (segments may not
    cross it; backward starts there) and chain states >= k_len pass
    through both recursions unchanged, so the result is bit-identical to
    running the unpadded shapes.  None (default) means fully valid.
    """
    T, S = obs_ll.shape
    t_len = T if t_len is None else t_len
    k_len = S if k_len is None else k_len
    obs_ll = obs_ll * temper
    csum = jnp.concatenate([jnp.zeros((1, S), obs_ll.dtype),
                            jnp.cumsum(obs_ll, 0)], 0)  # (T+1, S)
    ds = jnp.arange(1, max_dur + 1, dtype=obs_ll.dtype)
    NEG = jnp.asarray(LOG_ZERO, obs_ll.dtype)
    t = jnp.arange(T + 1)

    def seg_term(s):
        """(T+1, Dmax): [t0, d-1] -> dur_ll + sum obs_ll[t0:t0+d, s],
        masked where t0+d > t_len."""
        dll = _dur_ll(ds, dur_mean[s], dur_var[s]) * temper
        te = t[:, None] + ds.astype(jnp.int32)[None, :]
        valid = te <= t_len
        tec = jnp.clip(te, 0, T)
        seg = jnp.take(csum[:, s], tec) - csum[:, s][:, None]
        return jnp.where(valid, dll[None, :] + seg, NEG), tec, valid

    # forward: F[s, t] = log P(states 0..s-1 complete at t, obs[0:t]).
    # (+ obs_ll[0,0]*0 derives the device-varying type under shard_map —
    # scan carries must match their computed types, cf. fix_f0_contour)
    f0 = (jnp.full(T + 1, NEG, obs_ll.dtype) + obs_ll[0, 0] * 0.0
          ).at[0].set(0.0)

    def fwd_step(f_prev, s):
        terms, tec, valid = seg_term(s)
        # F[s][t0+d] <- LSE over (t0, d): f_prev[t0] + terms[t0, d]
        cand = jnp.where(valid, f_prev[:, None] + terms, NEG)
        # log-space scatter-LSE: per-destination max, then exp/add/log
        mdest = jnp.full(T + max_dur + 2, NEG, obs_ll.dtype).at[
            tec.ravel()].max(cand.ravel())
        p = jnp.where(valid, jnp.exp(cand - jnp.take(mdest, tec)), 0.0)
        acc = jnp.zeros(T + max_dur + 2, obs_ll.dtype).at[
            tec.ravel()].add(p.ravel())
        f_next = jnp.where(acc > 0,
                           jnp.log(jnp.maximum(acc, 1e-300)) + mdest,
                           NEG)[:T + 1]
        f_next = jnp.where(s < k_len, f_next, f_prev)  # padded state: skip
        return f_next, f_next

    _, F = jax.lax.scan(fwd_step, f0, jnp.arange(S))  # (S, T+1)

    # backward: B[s, t0] = log P(obs[t0:t_len] | states s..S-1 start at t0)
    t_len_i = jnp.asarray(t_len, jnp.int32)
    bS = (jnp.full(T + 1, NEG, obs_ll.dtype) + obs_ll[0, 0] * 0.0
          ).at[t_len_i].set(0.0)

    def bwd_step(b_next, s):
        terms, tec, valid = seg_term(s)
        cand = jnp.where(valid, terms + jnp.take(b_next, tec), NEG)
        b = jax.scipy.special.logsumexp(cand, axis=1)
        b = jnp.where(s < k_len, b, b_next)            # padded state: skip
        return b, b

    _, Brev = jax.lax.scan(bwd_step, bS, jnp.arange(S - 1, -1, -1))
    B = Brev[::-1]  # (S, T+1); B[s, t0] includes state s itself

    logZ = B[0, 0]

    # segment posteriors per state: xi[s](t0, d)
    Fin = jnp.concatenate([f0[None], F[:-1]], 0)   # (S, T+1): F before s
    Bout = jnp.concatenate([B[1:], bS[None]], 0)   # (S, T+1): B after s
    # (padded rows of B hold bS via the pass-through, so Bout[k_len-1]
    # is the t_len terminal as required)

    def gamma_state(s):
        terms, tec, valid = seg_term(s)
        xi = Fin[s][:, None] + terms + jnp.take(Bout[s], tec) - logZ
        p = jnp.where(valid, jnp.exp(jnp.minimum(xi, 0.0)), 0.0)
        p = jnp.where(s < k_len, p, 0.0)
        # occupancy via the start/end difference trick
        starts = jnp.sum(p, axis=1)                       # add at t0
        ends = jnp.zeros(T + max_dur + 2, obs_ll.dtype).at[
            tec.ravel()].add(p.ravel())                   # subtract at t0+d
        diff = starts - ends[:T + 1]
        gam = jnp.cumsum(diff)[:T]
        mass = jnp.sum(p)
        ed = jnp.sum(p * ds[None, :])
        ed2 = jnp.sum(p * (ds ** 2)[None, :])
        return gam, jnp.stack([mass, ed, ed2])

    gamma, dstats = jax.vmap(gamma_state, out_axes=(1, 0))(jnp.arange(S))
    return logZ, gamma, dstats


def occupancy_utterance(modelset: ModelSet, frames: np.ndarray,
                        label_seq: Sequence[str], max_dur: int = 40,
                        temper: float = 1.0):
    """Soft E-step for one utterance: (log_evidence, gamma (T, K),
    dur_stats (K, 3)) over the K = n_labels*S chain states."""
    obs_ll, dmean, dvar = chain_loglik(modelset, frames, label_seq)
    ll, gamma, dstats = forward_backward_segment(
        obs_ll, dmean, dvar, max_dur, temper)
    return float(ll), np.asarray(gamma), np.asarray(dstats)


# ---------------------------------------------------------------------------
# segmental EM (embedded re-estimation)
# ---------------------------------------------------------------------------


def _soft_reestimate_iter(modelset: ModelSet, utterances, floor,
                          max_dur: int, temper: float) -> float:
    """One full-Baum-Welch iteration: soft occupancies from the HSMM
    forward-backward, closed-form M-step on the weighted moments."""
    S = modelset.n_states
    acc: Dict = {}
    total_ll = 0.0
    for frames, label_seq in utterances:
        ll, gamma, dstats = occupancy_utterance(
            modelset, frames, label_seq, max_dur, temper)
        if ll <= LOG_ZERO / 2:
            # infeasible chain (e.g. fewer frames than states, or every
            # duration beyond max_dur): the posterior is undefined, so the
            # occupancies are garbage — drop the utterance from the counts
            # like the reference's screening gates do
            continue
        total_ll += ll
        x2 = frames ** 2
        occ_x = gamma.T @ frames                  # (K, D)
        occ_x2 = gamma.T @ x2
        occ = gamma.sum(0)                        # (K,)
        masked = {}
        for st in modelset.streams:
            if st.msd:
                pm = (frames[:, st.msd_flag_col] != 0.0).astype(float)
                gm = gamma * pm[:, None]
                masked[st.name] = (gm.sum(0), gm.T @ frames[:, st.sl],
                                   gm.T @ x2[:, st.sl])
        for li, name in enumerate(label_seq):
            for s in range(S):
                k = li * S + s
                a = acc.setdefault((name, s), {
                    "occ": 0.0, "x": 0.0, "x2": 0.0, "dur": np.zeros(3)})
                a["occ"] += occ[k]
                a["x"] = a["x"] + occ_x[k]
                a["x2"] = a["x2"] + occ_x2[k]
                a["dur"] += dstats[k]
                for st in modelset.streams:
                    if st.msd:
                        mo, mx, mx2 = masked[st.name]
                        m = a.setdefault(st.name, [0.0, 0.0, 0.0])
                        m[0] += mo[k]
                        m[1] = m[1] + mx[k]
                        m[2] = m[2] + mx2[k]
    for (name, s), a in acc.items():
        mi = modelset.index(name)
        if a["occ"] < 1e-6:
            continue
        mass, ed, ed2 = a["dur"]
        if mass > 1e-6:
            dm = ed / mass
            modelset.dur_mean[mi, s] = dm
            modelset.dur_var[mi, s] = max(ed2 / mass - dm * dm, 0.0) + 1.0
        for st in modelset.streams:
            if st.msd:
                mo, mx, mx2 = a[st.name]
                modelset.msd_weights[st.name][mi, s] = float(
                    np.clip(mo / a["occ"], 1e-3, 1 - 1e-3))
                if mo < 2.0:
                    continue
                mu = mx / mo
                va = mx2 / mo - mu ** 2
            else:
                mu = a["x"][st.sl] / a["occ"]
                va = a["x2"][st.sl] / a["occ"] - mu ** 2
            modelset.means[st.name][mi, s] = mu
            modelset.variances[st.name][mi, s] = np.maximum(
                va, floor[st.sl])
    return total_ll


def embedded_reestimate(modelset: ModelSet, utterances, n_iters: int = 3,
                        var_floor_scale: float = 0.01, max_dur: int = 40,
                        log=print, mode: str = "viterbi",
                        temper: float = 1.0):
    """HERest-style embedded training.  utterances: list of
    (frames (T, D), label_seq).

    mode="viterbi": segmental EM (hard alignment, HInit/HRest style).
    mode="baum_welch": full soft-occupancy HSMM EM — the exact
    counterpart of the reference's HERest embedded re-estimation
    (Training.pl:248-258, 433-440).
    temper: DAEM temperature k (HERest -k, Training.pl:428-429); use
    daem_reestimate for the full annealing schedule."""
    all_frames = np.concatenate([u[0] for u in utterances])
    _, gvar = global_stats(all_frames, modelset.streams)
    floor = gvar * var_floor_scale + 1e-8
    S = modelset.n_states

    if mode == "baum_welch":
        for it in range(n_iters):
            total_ll = _soft_reestimate_iter(
                modelset, utterances, floor, max_dur, temper)
            log(f"embedded BW iter {it}: total loglik {total_ll:.1f}")
        return modelset
    if mode != "viterbi":
        raise ValueError(f"unknown mode {mode!r}")

    for it in range(n_iters):
        seg_frames = {}   # (model, state) -> list of frame arrays
        seg_durs = {}
        total_ll = 0.0
        for frames, label_seq in utterances:
            try:
                ll, ends = align_utterance(modelset, frames, label_seq,
                                           max_dur)
            except ValueError:
                continue  # unalignable utterance: drop from the counts
            total_ll += ll
            starts = np.concatenate([[0], ends[:-1]])
            for li, name in enumerate(label_seq):
                for s in range(S):
                    k = li * S + s
                    key = (name, s)
                    seg = frames[starts[k]:ends[k]]
                    seg_frames.setdefault(key, []).append(seg)
                    seg_durs.setdefault(key, []).append(ends[k] - starts[k])
        # M-step
        for mi, name in enumerate(modelset.names):
            for s in range(S):
                segs = seg_frames.get((name, s))
                if not segs:
                    continue
                seg = np.concatenate(segs)
                if not len(seg):
                    continue
                durs = np.asarray(seg_durs[(name, s)], float)
                modelset.dur_mean[mi, s] = durs.mean()
                modelset.dur_var[mi, s] = durs.var() + 1.0
                for st in modelset.streams:
                    block = seg[:, st.sl]
                    if st.msd:
                        present = seg[:, st.msd_flag_col] != 0.0
                        modelset.msd_weights[st.name][mi, s] = float(
                            np.clip(present.mean(), 1e-3, 1 - 1e-3))
                        if present.sum() < 2:
                            continue
                        block = block[present]
                    modelset.means[st.name][mi, s] = block.mean(0)
                    modelset.variances[st.name][mi, s] = np.maximum(
                        block.var(0), floor[st.sl])
        log(f"embedded EM iter {it}: total loglik {total_ll:.1f}")
    return modelset


def daem_reestimate(modelset: ModelSet, utterances, n_outer: int = 10,
                    n_inner: int = 1, alpha: float = 1.0,
                    var_floor_scale: float = 0.01, max_dur: int = 40,
                    log=print, batched: bool = False, mesh=None):
    """DAEM-annealed embedded training (Training.pl:421-431,
    configure.ac:701-703 defaults DAEMNITER=10, DAEMALPHA=1.0): outer
    iteration i runs n_inner Baum-Welch sweeps at temperature
    k = (i / n_outer)**alpha, deterministically annealing the posterior
    entropy from high to exact (k=1) — HERest's `-k` flag.

    batched=True runs each sweep on the device-side corpus E-step
    (models/hsmm_batch), optionally psumming over `mesh`."""
    for i in range(1, n_outer + 1):
        k = (i / n_outer) ** alpha
        log(f"DAEM outer {i}/{n_outer}: temperature k={k:.4f}")
        if batched:
            from hts_train_world_tpu.models import hsmm_batch
            hsmm_batch.reestimate_modelset_batched(
                modelset, utterances, n_iters=n_inner,
                var_floor_scale=var_floor_scale, max_dur=max_dur,
                temper=k, mesh=mesh, log=log)
        else:
            embedded_reestimate(modelset, utterances, n_iters=n_inner,
                                var_floor_scale=var_floor_scale,
                                max_dur=max_dur, log=log,
                                mode="baum_welch", temper=k)
    return modelset


# ---------------------------------------------------------------------------
# parameter generation (HMGenS equivalent)
# ---------------------------------------------------------------------------


def generate_from_models(modelset: ModelSet, label_seq: Sequence[str],
                         speaking_rate: float = 1.0):
    """HMGenS pgtype-0 equivalent: state durations from the duration
    Gaussians (mean * rate, >=1), then frame-level means/variances per
    stream ready for MLPG (ops.mlpg / ops.generation)."""
    S = modelset.n_states
    durs = []
    for name in label_seq:
        mi = modelset.index(name)
        d = np.maximum(1, np.round(
            modelset.dur_mean[mi] * speaking_rate)).astype(int)
        durs.append(d)
    durs = np.concatenate(durs)
    means = {st.name: [] for st in modelset.streams}
    vars_ = {st.name: [] for st in modelset.streams}
    vuv = []
    k = 0
    for name in label_seq:
        mi = modelset.index(name)
        for s in range(S):
            d = durs[k]
            k += 1
            for st in modelset.streams:
                means[st.name].append(
                    np.repeat(modelset.means[st.name][mi, s][None], d, 0))
                vars_[st.name].append(
                    np.repeat(modelset.variances[st.name][mi, s][None],
                              d, 0))
            w = (modelset.msd_weights["lf0"][mi, s]
                 if "lf0" in modelset.msd_weights else 1.0)
            vuv.append(np.full(d, w > 0.5))
    return ({k: np.concatenate(v) for k, v in means.items()},
            {k: np.concatenate(v) for k, v in vars_.items()},
            np.concatenate(vuv), durs)

"""HSMM training variants: mixture upmixing (UPMIX/ERST5) and semi-tied
covariance transforms (SEMIT) — the reference's final model-refinement
stages (Training.pl:1017-1144).

UPMIX: HHEd's `MU +1 {*.state[i].stream[a-b].mix}` edit doubles the
number of mixture components per stream (Training.pl:2155-2177,
make_edfile_upmix), splitting each Gaussian into two at mean +/- 0.2
stddev with halved weights (HTK's MU heuristic), followed by embedded
re-estimation (ERST5, Training.pl:1086-1098).

SEMIT: HERest's `-u smvdmv ... TRANSKIND = SEMIT` stage
(Training.pl:1017-1035) estimates one semi-tied (block-diagonal) linear
transform per stream base class (make_stc_base, Training.pl:1726-1779;
blocks per stream from NMGCTRANSBLK etc., configure.ac:706-709 — one
block per delta window by default) using Gales' row-wise cofactor
update, MAXSEMITIEDITER=20 (Training.pl:1826).  Gaussians keep diagonal
variances in the transformed space; the per-frame likelihood gains a
log|det A| Jacobian term per stream.

Everything is pure-jnp and batched over Gaussians; the row update is a
`lax.fori_loop` so the trace stays O(1) in the block size.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.models.hsmm import (
    LOG_2PI, ModelSet, StreamDef, _gauss_ll, global_stats, viterbi_segment)


# ---------------------------------------------------------------------------
# mixtures (UPMIX -> ERST5)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MixtureModelSet:
    """Per-stream mixture-of-diagonal-Gaussians models, stacked
    (n_models, n_states, n_comps, dim); duration models stay single
    Gaussians (the reference copies the dur mmf unchanged,
    Training.pl:1082-1083)."""
    names: List[str]
    means: Dict[str, np.ndarray]       # (M, S, C, D)
    variances: Dict[str, np.ndarray]   # (M, S, C, D)
    mix_logw: Dict[str, np.ndarray]    # (M, S, C)
    msd_weights: Dict[str, np.ndarray]  # msd streams: (M, S)
    dur_mean: np.ndarray
    dur_var: np.ndarray
    streams: Tuple[StreamDef, ...]

    @property
    def n_states(self) -> int:
        return self.dur_mean.shape[1]

    @property
    def n_comps(self) -> int:
        return next(iter(self.mix_logw.values())).shape[2]

    def index(self, name: str) -> int:
        return self.names.index(name)


def upmix(ms: ModelSet, perturb: float = 0.2) -> MixtureModelSet:
    """HHEd `MU +1` equivalent: 1 -> 2 components per stream, means split
    at +/- perturb * stddev, weights halved."""
    means, variances, logw = {}, {}, {}
    for st in ms.streams:
        mu = ms.means[st.name]           # (M, S, D)
        va = ms.variances[st.name]
        sd = np.sqrt(va)
        means[st.name] = np.stack([mu + perturb * sd, mu - perturb * sd], 2)
        variances[st.name] = np.stack([va, va], 2)
        M, S = mu.shape[:2]
        logw[st.name] = np.full((M, S, 2), np.log(0.5))
    return MixtureModelSet(list(ms.names), means, variances, logw,
                           {k: v.copy() for k, v in ms.msd_weights.items()},
                           ms.dur_mean.copy(), ms.dur_var.copy(),
                           ms.streams)


@partial(jax.jit, static_argnames=("stream_slices", "msd_flags",
                                   "weights_static"))
def frame_loglik_mix(frames, means, variances, logws, msd_w,
                     stream_slices, msd_flags, weights_static):
    """Mixture analogue of hsmm.frame_loglik: means/variances per stream
    are (S, C, D), logws (S, C); returns (T, S)."""
    total = 0.0
    for i, (sl, is_msd, wt) in enumerate(
            zip(stream_slices, msd_flags, weights_static)):
        x = frames[:, sl[0]:sl[1]]
        ll_c = jax.vmap(lambda m, v: _gauss_ll(x, m, v),
                        in_axes=(1, 1), out_axes=2)(
            means[i], variances[i])                       # (T, S, C)
        ll = jax.scipy.special.logsumexp(
            logws[i][None] + ll_c, axis=2)                # (T, S)
        if is_msd:
            present = (frames[:, sl[0]] != 0.0)[:, None]
            w = jnp.clip(msd_w[i], 1e-4, 1.0 - 1e-4)[None]
            ll = jnp.where(present, jnp.log(w) + ll, jnp.log1p(-w))
        total = total + wt * ll
    return total


def _mix_args(mms: MixtureModelSet, mi: int):
    S = mms.n_states
    means = tuple(jnp.asarray(mms.means[s.name][mi]) for s in mms.streams)
    vars_ = tuple(jnp.asarray(mms.variances[s.name][mi])
                  for s in mms.streams)
    logws = tuple(jnp.asarray(mms.mix_logw[s.name][mi])
                  for s in mms.streams)
    msd_w = tuple(jnp.asarray(mms.msd_weights[s.name][mi]) if s.msd
                  else jnp.zeros(S) for s in mms.streams)
    return means, vars_, logws, msd_w


def align_utterance_mix(mms: MixtureModelSet, frames: np.ndarray,
                        label_seq: Sequence[str], max_dur: int = 40):
    """Viterbi alignment under the mixture models.

    Raises ValueError on infeasible utterances (fewer frames than chain
    states), matching hsmm.align_utterance."""
    n_chain = len(label_seq) * mms.n_states
    if len(frames) < n_chain:
        raise ValueError(
            f"utterance has {len(frames)} frames but the label chain needs "
            f">= {n_chain}; alignment is infeasible")
    idxs = [mms.index(n) for n in label_seq]
    sls = tuple((s.sl.start, s.sl.stop) for s in mms.streams)
    flags = tuple(s.msd for s in mms.streams)
    wts = tuple(s.weight for s in mms.streams)
    fx = jnp.asarray(frames)
    obs = [frame_loglik_mix(fx, *_mix_args(mms, mi), sls, flags, wts)
           for mi in idxs]
    obs_ll = jnp.concatenate(obs, axis=1)
    dmean = jnp.concatenate([jnp.asarray(mms.dur_mean[mi]) for mi in idxs])
    dvar = jnp.concatenate([jnp.asarray(mms.dur_var[mi]) for mi in idxs])
    ll, ends = viterbi_segment(obs_ll, dmean, dvar, max_dur)
    return float(ll), np.asarray(ends)


def _responsibilities(x, mu, va, logw):
    """Component posteriors for one (state, stream): x (T, D),
    mu/va (C, D), logw (C,) -> (T, C)."""
    ll = _gauss_ll(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(va))
    z = logw[None] + np.asarray(ll)
    z = z - z.max(1, keepdims=True)
    r = np.exp(z)
    return r / r.sum(1, keepdims=True)


def embedded_reestimate_mix(mms: MixtureModelSet, utterances,
                            n_iters: int = 3, var_floor_scale: float = 0.01,
                            max_dur: int = 40, log=print,
                            min_mix_w: float = 1e-3):
    """ERST5 equivalent: embedded re-estimation of the upmixed models —
    Viterbi state alignment, then per-segment mixture EM (component
    responsibilities -> weighted moments)."""
    all_frames = np.concatenate([u[0] for u in utterances])
    _, gvar = global_stats(all_frames, mms.streams)
    floor = gvar * var_floor_scale + 1e-8
    S, C = mms.n_states, mms.n_comps

    for it in range(n_iters):
        segs: Dict = {}
        durs: Dict = {}
        total_ll = 0.0
        for frames, label_seq in utterances:
            try:
                ll, ends = align_utterance_mix(mms, frames, label_seq,
                                               max_dur)
            except ValueError:
                continue  # infeasible utterance: drop from the counts
            total_ll += ll
            starts = np.concatenate([[0], ends[:-1]])
            for li, name in enumerate(label_seq):
                for s in range(S):
                    k = li * S + s
                    segs.setdefault((name, s), []).append(
                        frames[starts[k]:ends[k]])
                    durs.setdefault((name, s), []).append(
                        int(ends[k] - starts[k]))
        for (name, s), fl in segs.items():
            seg = np.concatenate(fl)
            if not len(seg):
                continue
            mi = mms.index(name)
            d = np.asarray(durs[(name, s)], float)
            mms.dur_mean[mi, s] = d.mean()
            mms.dur_var[mi, s] = d.var() + 1.0
            for st in mms.streams:
                block = seg[:, st.sl]
                if st.msd:
                    present = seg[:, st.msd_flag_col] != 0.0
                    mms.msd_weights[st.name][mi, s] = float(
                        np.clip(present.mean(), 1e-3, 1 - 1e-3))
                    if present.sum() < 2:
                        continue
                    block = block[present]
                r = _responsibilities(block, mms.means[st.name][mi, s],
                                      mms.variances[st.name][mi, s],
                                      mms.mix_logw[st.name][mi, s])
                occ = r.sum(0) + 1e-10                      # (C,)
                w = np.clip(occ / occ.sum(), min_mix_w, 1.0)
                mms.mix_logw[st.name][mi, s] = np.log(w / w.sum())
                mu = (r.T @ block) / occ[:, None]
                va = (r.T @ block ** 2) / occ[:, None] - mu ** 2
                keep = occ > 1.0   # don't update starved components
                mms.means[st.name][mi, s][keep] = mu[keep]
                mms.variances[st.name][mi, s][keep] = np.maximum(
                    va[keep], floor[st.sl][None])
        log(f"mixture EM iter {it}: total loglik {total_ll:.1f}")
    return mms


def generate_from_models_mix(mms: MixtureModelSet,
                             label_seq: Sequence[str],
                             speaking_rate: float = 1.0):
    """HMGenS on mixture models: per state/stream take the dominant
    component's Gaussian (the EM-based generation's fixed point for
    well-separated mixtures)."""
    S = mms.n_states
    means = {st.name: [] for st in mms.streams}
    vars_ = {st.name: [] for st in mms.streams}
    vuv, durs = [], []
    for name in label_seq:
        mi = mms.index(name)
        d = np.maximum(1, np.round(
            mms.dur_mean[mi] * speaking_rate)).astype(int)
        durs.append(d)
        for s in range(S):
            for st in mms.streams:
                c = int(np.argmax(mms.mix_logw[st.name][mi, s]))
                means[st.name].append(np.repeat(
                    mms.means[st.name][mi, s, c][None], d[s], 0))
                vars_[st.name].append(np.repeat(
                    mms.variances[st.name][mi, s, c][None], d[s], 0))
            w = (mms.msd_weights["lf0"][mi, s]
                 if "lf0" in mms.msd_weights else 1.0)
            vuv.append(np.full(d[s], w > 0.5))
    durs = np.concatenate(durs)
    return ({k: np.concatenate(v) for k, v in means.items()},
            {k: np.concatenate(v) for k, v in vars_.items()},
            np.concatenate(vuv), durs)


# ---------------------------------------------------------------------------
# semi-tied covariance (SEMIT)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_iter",))
def semitied_block(betas, scatters, n_iter: int = 20):
    """Gales' semi-tied covariance estimation for one block.

    betas (G,): per-Gaussian occupancies; scatters (G, d, d): per-Gaussian
    scatter (covariance) matrices.  Returns (A (d, d), sigmas (G, d),
    aux (n_iter,)) where aux is the per-iteration auxiliary objective
    beta_tot*log|det A| - 0.5 * sum_g beta_g * sum_j log sigma_gj
    (monotone non-decreasing).
    """
    G, d, _ = scatters.shape
    beta_tot = jnp.sum(betas)
    A0 = jnp.eye(d, dtype=scatters.dtype)

    def diag_sig(A):
        s = jax.vmap(lambda w: jnp.diag(A @ w @ A.T))(scatters)
        return jnp.maximum(s, 1e-10)

    def outer(A, _):
        sig = diag_sig(A)

        def row(r, A):
            Gr = jnp.einsum("g,gij->ij", betas / jnp.take(sig, r, axis=1),
                            scatters)
            # cofactor row r of A: det(A) * inv(A)^T[r] = det(A)*inv(A)[:,r]
            cof = jnp.linalg.det(A) * jnp.linalg.inv(A)[:, r]
            u = jnp.linalg.solve(Gr, cof)
            scale = jnp.sqrt(beta_tot / jnp.maximum(cof @ u, 1e-300))
            return A.at[r].set(u * scale)

        A = jax.lax.fori_loop(0, d, row, A)
        sig2 = diag_sig(A)
        aux = (beta_tot * jnp.log(jnp.abs(jnp.linalg.det(A)))
               - 0.5 * jnp.sum(betas[:, None] * jnp.log(sig2)))
        return A, aux

    A, auxs = jax.lax.scan(outer, A0, None, length=n_iter)
    return A, diag_sig(A), auxs


def _stream_blocks(st: StreamDef, n_blocks: int):
    """Split a stream's column span into n_blocks equal blocks (one per
    delta window by default, configure.ac:706-709)."""
    dim = st.sl.stop - st.sl.start
    assert dim % n_blocks == 0, (st.name, dim, n_blocks)
    b = dim // n_blocks
    return [(st.sl.start + i * b, st.sl.start + (i + 1) * b)
            for i in range(n_blocks)]


@dataclasses.dataclass
class SemiTiedModelSet:
    """A ModelSet plus one block-diagonal transform per (non-excluded)
    stream.  Likelihood of frame x: N(A x; A mu, sigma) + log|det A|
    per stream; sigma are the re-estimated diagonal variances in the
    transformed space."""
    base: ModelSet
    transforms: Dict[str, np.ndarray]   # stream -> (D, D) block-diagonal
    logdets: Dict[str, float]

    def transformed_modelset(self) -> ModelSet:
        """ModelSet in the transformed feature space (means A mu,
        variances already transformed): align/EM machinery from hsmm.py
        applies to transform_frames()'d observations."""
        ms = self.base
        means = {}
        for st in ms.streams:
            A = self.transforms.get(st.name)
            mu = ms.means[st.name]
            means[st.name] = mu if A is None else mu @ A.T
        return ModelSet(ms.names, means, ms.variances, ms.msd_weights,
                        ms.dur_mean, ms.dur_var, ms.streams)

    def transform_frames(self, frames: np.ndarray) -> np.ndarray:
        out = frames.copy()
        for st in self.base.streams:
            A = self.transforms.get(st.name)
            if A is not None:
                out[:, st.sl] = frames[:, st.sl] @ A.T
        return out

    def loglik_constant(self, n_frames: int) -> float:
        """Jacobian term: T * sum_streams wt * log|det A|."""
        return n_frames * sum(
            st.weight * self.logdets.get(st.name, 0.0)
            for st in self.base.streams)


def estimate_semitied(ms: ModelSet, utterances,
                      n_blocks: Dict[str, int] | None = None,
                      n_iter: int = 20, max_dur: int = 40,
                      var_floor_scale: float = 0.01,
                      log=print) -> SemiTiedModelSet:
    """SEMIT stage: Viterbi-align under the current models, collect
    per-Gaussian scatter statistics per stream, estimate block-diagonal
    semi-tied transforms (one base class per stream — make_stc_base,
    Training.pl:1726-1779), and replace variances with the transformed
    diagonals.  MSD streams use voiced frames only (the reference's base
    classes target mix[1], the voiced space).

    n_blocks defaults to one block per delta window (n_win) per stream,
    matching NMGCTRANSBLK=3/NBAPTRANSBLK=3, NLF0TRANSBLK=1 on the 2-dim
    lf0 stream's windows... — callers may override per stream."""
    from hts_train_world_tpu.models import hsmm

    S = ms.n_states
    if n_blocks is None:
        n_blocks = {}
        for st in ms.streams:
            dim = st.sl.stop - st.sl.start
            nb = 3 if dim % 3 == 0 else 1
            n_blocks[st.name] = nb

    # E-step: hard-align, collect occupancy + scatter per (model, state)
    stats: Dict = {}
    for frames, label_seq in utterances:
        try:
            _, ends = hsmm.align_utterance(ms, frames, label_seq, max_dur)
        except ValueError:
            continue  # infeasible utterance: drop, like the other E-steps
        starts = np.concatenate([[0], ends[:-1]])
        for li, name in enumerate(label_seq):
            for s in range(S):
                k = li * S + s
                seg = frames[starts[k]:ends[k]]
                if not len(seg):
                    continue
                key = (name, s)
                stats.setdefault(key, []).append(seg)

    transforms, logdets = {}, {}
    all_frames = np.concatenate([u[0] for u in utterances])
    _, gvar = global_stats(all_frames, ms.streams)
    floor = gvar * var_floor_scale + 1e-8

    for st in ms.streams:
        dim = st.sl.stop - st.sl.start
        blocks = _stream_blocks(st, n_blocks.get(st.name, 1))
        # gather per-Gaussian scatters around the CURRENT means
        keys, betas, segs_by_key = [], [], []
        for key, fl in stats.items():
            seg = np.concatenate(fl)
            if st.msd:
                seg = seg[seg[:, st.msd_flag_col] != 0.0]
            if len(seg) < dim + 1:
                continue
            keys.append(key)
            betas.append(float(len(seg)))
            segs_by_key.append(seg[:, st.sl])
        if not keys:
            continue
        betas_a = np.asarray(betas)
        A_full = np.zeros((dim, dim))
        aux_last = []
        for (b0, b1) in blocks:
            lo, hi = b0 - st.sl.start, b1 - st.sl.start
            scat = np.stack([
                np.cov(seg[:, lo:hi].T, bias=True).reshape(hi - lo, hi - lo)
                for seg in segs_by_key])
            A, sig, auxs = semitied_block(
                jnp.asarray(betas_a), jnp.asarray(scat), n_iter=n_iter)
            A_full[lo:hi, lo:hi] = np.asarray(A)
            aux_last.append(np.asarray(auxs))
            # M-step (HERest -u smvdmv): means to the aligned sample
            # means, variances to the transformed diagonals
            for ki, key in enumerate(keys):
                mi = ms.index(key[0])
                ms.means[st.name][mi, key[1], lo:hi] = \
                    segs_by_key[ki][:, lo:hi].mean(0)
                ms.variances[st.name][mi, key[1], lo:hi] = np.maximum(
                    np.asarray(sig)[ki], floor[b0:b1])
        transforms[st.name] = A_full
        logdets[st.name] = float(
            np.log(np.abs(np.linalg.det(A_full))))
        aux = np.stack(aux_last).sum(0)
        assert np.all(np.diff(aux) >= -1e-6 * np.abs(aux[:-1]) - 1e-8), \
            "semi-tied auxiliary objective must be monotone"
        log(f"SEMIT {st.name}: logdet {logdets[st.name]:+.4f}, "
            f"aux {aux[0]:.1f} -> {aux[-1]:.1f}")
    return SemiTiedModelSet(ms, transforms, logdets)

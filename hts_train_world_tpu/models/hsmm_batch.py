"""Batched, device-side HSMM EM — the corpus-scale HERest E-step
(Training.pl:433-446) as one XLA program per bucket shape instead of a
per-utterance Python loop.

Formulation: every trainable pdf row (a (model, state) for the monophone
set; a (stream, state, leaf) for the tied model) lives in one global
table per stream.  Each utterance is a chain of K states, each carrying
row ids into those tables.  The E-step is

  vmap over the padded batch of
    gather rows -> frame_loglik -> forward_backward_segment
                                   (with true t_len/k_len, exact)

and accumulation is

  per-utterance (K, D) occupancy moments  = gamma^T @ frames   (MXU)
  segment_sum by row id into (R, D) tables

which adds across data-parallel shards with one psum — the same
accumulators the loop version builds in Python dicts, computed on
device.  Utterances are bucketed by (frames, chain) shape on geometric
grids so a heterogeneous corpus costs a handful of compiles.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.models import hsmm

LOG_ZERO = hsmm.LOG_ZERO


# ---------------------------------------------------------------------------
# global row tables
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RowTables:
    """Global pdf tables: per stream (R_s, D_s) mean/var (+ (R_s,) msd
    weight), plus flat (R_d,) duration mean/var."""
    means: Dict[str, np.ndarray]
    vars: Dict[str, np.ndarray]
    msd_w: Dict[str, np.ndarray]
    dur_mean: np.ndarray
    dur_var: np.ndarray
    streams: Sequence[hsmm.StreamDef]


def tables_from_modelset(ms: hsmm.ModelSet) -> RowTables:
    """Row (mi, s) -> mi*S + s."""
    M, S = ms.dur_mean.shape
    return RowTables(
        {st.name: ms.means[st.name].reshape(M * S, -1) for st in ms.streams},
        {st.name: ms.variances[st.name].reshape(M * S, -1)
         for st in ms.streams},
        {st.name: ms.msd_weights[st.name].reshape(M * S)
         for st in ms.streams if st.msd},
        ms.dur_mean.reshape(M * S), ms.dur_var.reshape(M * S), ms.streams)


def chain_rows_modelset(ms: hsmm.ModelSet, label_seq) -> np.ndarray:
    """(K,) row ids for an utterance chain under the monophone table."""
    S = ms.n_states
    idxs = np.asarray([ms.index(n) for n in label_seq])
    return (idxs[:, None] * S + np.arange(S)[None, :]).reshape(-1)


def tables_from_clustered(model) -> Tuple[RowTables, dict, np.ndarray]:
    """Stack the tied model's leaves: stream row (s, leaf) -> offs[s]+leaf
    where offs accumulates leaves over states; duration row (dl, s) ->
    dl*S + s.  Returns (tables, {stream: offsets (S,)}, dur row count)."""
    S = model.n_states
    means, vars_, msd_w, offsets = {}, {}, {}, {}
    for st in model.streams:
        ms_, vs_, ws_ = [], [], []
        offs = np.zeros(S, np.int64)
        at = 0
        for s in range(S):
            tree = model.trees[st.name][s]
            offs[s] = at
            for leaf in range(tree.n_leaves):
                m, v = tree.leaf_params[leaf]
                ms_.append(np.asarray(m, float))
                vs_.append(np.asarray(v, float))
                if st.msd:
                    ws_.append(float(model.msd_weights[st.name][s][leaf]))
            at += tree.n_leaves
        means[st.name] = np.stack(ms_)
        vars_[st.name] = np.stack(vs_)
        if st.msd:
            msd_w[st.name] = np.asarray(ws_)
        offsets[st.name] = offs
    Ld = model.dur_tree.n_leaves
    dmean = np.zeros(Ld * S)
    dvar = np.zeros(Ld * S)
    for leaf in range(Ld):
        m, v = model.dur_tree.leaf_params[leaf]
        dmean[leaf * S:(leaf + 1) * S] = np.asarray(m, float)
        dvar[leaf * S:(leaf + 1) * S] = np.asarray(v, float)
    return (RowTables(means, vars_, msd_w, dmean, dvar, model.streams),
            offsets, Ld * S)


def chain_rows_clustered(model, ctx_seq, offsets):
    """Per-stream (K,) row ids + (K,) duration row ids for the tied model."""
    S = model.n_states
    K = len(ctx_seq) * S
    rows = {st.name: np.zeros(K, np.int64) for st in model.streams}
    dur_rows = np.zeros(K, np.int64)
    for li, ctx in enumerate(ctx_seq):
        dl = model.dur_tree.leaf_of(ctx)
        for s in range(S):
            k = li * S + s
            dur_rows[k] = dl * S + s
            for st in model.streams:
                leaf = model.trees[st.name][s].leaf_of(ctx)
                rows[st.name][k] = offsets[st.name][s] + leaf
    return rows, dur_rows


# ---------------------------------------------------------------------------
# bucketed batch assembly
# ---------------------------------------------------------------------------


def _bucket(n: int, growth: float = 1.26, align: int = 8) -> int:
    if n <= align:
        return align
    steps = math.ceil(math.log(n / align) / math.log(growth))
    b = align * growth ** steps
    return int(math.ceil(b / align) * align)


@dataclasses.dataclass
class ChainedUtterance:
    frames: np.ndarray                 # (T, D)
    rows: Dict[str, np.ndarray]        # per stream (K,)
    dur_rows: np.ndarray               # (K,)


def _pad_group(group: List[ChainedUtterance], Tb: int, Kb: int, D: int,
               stream_names, batch_pad: int = 1):
    """Pad a same-bucket group to (B, Tb, D) / (B, Kb) arrays; weight 0
    marks batch-padding dummies (B rounded up to batch_pad)."""
    B = len(group)
    Bp = int(math.ceil(B / batch_pad) * batch_pad)
    frames = np.zeros((Bp, Tb, D))
    rows = {n: np.zeros((Bp, Kb), np.int64) for n in stream_names}
    dur_rows = np.zeros((Bp, Kb), np.int64)
    t_len = np.ones(Bp, np.int32)
    k_len = np.ones(Bp, np.int32)
    w = np.zeros(Bp)
    for i, u in enumerate(group):
        T, K = len(u.frames), len(u.dur_rows)
        frames[i, :T] = u.frames
        for n in stream_names:
            rows[n][i, :K] = u.rows[n]
        dur_rows[i, :K] = u.dur_rows
        t_len[i] = T
        k_len[i] = K
        w[i] = 1.0
    return frames, rows, dur_rows, t_len, k_len, w


# ---------------------------------------------------------------------------
# the bucketed E-step kernel
# ---------------------------------------------------------------------------


@partial(jax.jit,
         static_argnames=("sls", "flags", "wts", "max_dur", "n_rows",
                          "n_dur_rows", "axis_name"))
def _bucket_estep(frames, rows, dur_rows, t_len, k_len, w,
                  means, vars_, msd_w, dur_mean, dur_var,
                  sls, flags, wts,
                  max_dur: int, n_rows: Tuple[int, ...], n_dur_rows: int,
                  temper: float = 1.0, axis_name: str = ""):
    """One padded bucket -> accumulators.

    frames (B,T,D); rows: tuple per stream (B,K); dur_rows (B,K);
    t_len/k_len/w (B,).  means/vars_/msd_w: tuples of (R_s, D_s)/(R_s,).
    Returns (total_ll, per-stream (occ, x, x2[, p_occ, p_tot]) tables,
    dur (R_d, 3))."""
    n_streams = len(sls)

    def one(frames_u, rows_u, dur_rows_u, t_u, k_u):
        mu = tuple(jnp.take(means[i], rows_u[i], axis=0)
                   for i in range(n_streams))
        va = tuple(jnp.take(vars_[i], rows_u[i], axis=0)
                   for i in range(n_streams))
        mw = tuple(jnp.take(msd_w[i], rows_u[i], axis=0) if flags[i]
                   else jnp.zeros(rows_u[i].shape) for i in range(n_streams))
        obs_ll = hsmm.frame_loglik(frames_u, mu, va, mw, sls, flags, wts)
        dm = jnp.take(dur_mean, dur_rows_u)
        dv = jnp.take(dur_var, dur_rows_u)
        return hsmm.forward_backward_segment(obs_ll, dm, dv, max_dur,
                                             temper, t_u, k_u)

    ll, gamma, dstats = jax.vmap(one)(
        frames, rows, dur_rows, t_len, k_len)      # (B,), (B,T,K), (B,K,3)

    # infeasible utterances (chain longer than frames / durations beyond
    # max_dur): posterior undefined -> drop, like the loop version
    ok = w * (ll > LOG_ZERO / 2)
    total_ll = jnp.sum(jnp.where(ok > 0, ll * w, 0.0))
    n_ok = jnp.sum(ok)
    gamma = gamma * ok[:, None, None]
    dstats = dstats * ok[:, None, None]

    out = []
    x2 = frames * frames
    for i, (a, b) in enumerate(sls):
        blk = frames[:, :, a:b]
        blk2 = x2[:, :, a:b]
        g = gamma
        acc = {}
        if flags[i]:
            pm = (frames[:, :, a] != 0.0).astype(frames.dtype)  # (B,T)
            acc["p_occ"] = jax.ops.segment_sum(
                (gamma * pm[:, :, None]).sum(1).reshape(-1),
                rows[i].reshape(-1), n_rows[i])
            acc["p_tot"] = jax.ops.segment_sum(
                gamma.sum(1).reshape(-1), rows[i].reshape(-1), n_rows[i])
            g = gamma * pm[:, :, None]
        occ_k = g.sum(1)                                  # (B, K)
        x_k = jnp.einsum("btk,btd->bkd", g, blk)          # MXU
        x2_k = jnp.einsum("btk,btd->bkd", g, blk2)
        ids = rows[i].reshape(-1)
        acc["occ"] = jax.ops.segment_sum(occ_k.reshape(-1), ids, n_rows[i])
        acc["x"] = jax.ops.segment_sum(
            x_k.reshape(-1, x_k.shape[-1]), ids, n_rows[i])
        acc["x2"] = jax.ops.segment_sum(
            x2_k.reshape(-1, x2_k.shape[-1]), ids, n_rows[i])
        out.append(acc)
    dur_acc = jax.ops.segment_sum(
        dstats.reshape(-1, 3), dur_rows.reshape(-1), n_dur_rows)
    if axis_name:
        total_ll = jax.lax.psum(total_ll, axis_name)
        n_ok = jax.lax.psum(n_ok, axis_name)
        out = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), out)
        dur_acc = jax.lax.psum(dur_acc, axis_name)
    return total_ll, n_ok, out, dur_acc


@dataclasses.dataclass
class EStepAccumulators:
    total_ll: float
    n_ok: float
    streams: List[dict]        # per stream: occ/x/x2 (+ p_occ/p_tot)
    dur: np.ndarray            # (R_d, 3)


def corpus_estep(tables: RowTables, utts: Sequence[ChainedUtterance],
                 n_rows: Dict[str, int], n_dur_rows: int, max_dur: int = 40,
                 temper: float = 1.0, growth: float = 1.26,
                 max_batch: int = 32, mesh=None) -> EStepAccumulators:
    """Full-corpus soft E-step: bucket -> pad -> _bucket_estep -> merge.

    mesh: an optional jax Mesh with a "data" axis; buckets then run under
    shard_map with the batch dim sharded and accumulators psummed — the
    multi-chip HERest (each shard sees its slice of every bucket)."""
    sts = tables.streams
    names = [st.name for st in sts]
    sls = tuple((st.sl.start, st.sl.stop) for st in sts)
    flags = tuple(st.msd for st in sts)
    wts = tuple(st.weight for st in sts)
    nr = tuple(n_rows[n] for n in names)
    D = utts[0].frames.shape[1]
    n_dev = mesh.shape["data"] if mesh is not None else 1

    groups: Dict[Tuple[int, int], List[ChainedUtterance]] = {}
    for u in utts:
        key = (_bucket(len(u.frames), growth, 16),
               _bucket(len(u.dur_rows), growth, 4))
        groups.setdefault(key, []).append(u)

    acc = None
    total_ll, n_ok = 0.0, 0.0
    m_t = tuple(jnp.asarray(tables.means[n]) for n in names)
    v_t = tuple(jnp.asarray(tables.vars[n]) for n in names)
    w_t = tuple(jnp.asarray(tables.msd_w[n]) if f else jnp.zeros(1)
                for n, f in zip(names, flags))
    dm_t = jnp.asarray(tables.dur_mean)
    dv_t = jnp.asarray(tables.dur_var)

    for (Tb, Kb), group in sorted(groups.items()):
        for at in range(0, len(group), max_batch):
            sub = group[at:at + max_batch]
            frames, rows, dur_rows, t_len, k_len, w = _pad_group(
                sub, Tb, Kb, D, names, batch_pad=n_dev)
            args = (jnp.asarray(frames),
                    tuple(jnp.asarray(rows[n]) for n in names),
                    jnp.asarray(dur_rows), jnp.asarray(t_len),
                    jnp.asarray(k_len), jnp.asarray(w))
            if mesh is None:
                ll, ok, accs, dur = _bucket_estep(
                    *args, m_t, v_t, w_t, dm_t, dv_t, sls, flags, wts,
                    max_dur, nr, n_dur_rows, temper)
            else:
                from jax.sharding import PartitionSpec as P

                def body(fr, ro, dr, tl, kl, ww):
                    return _bucket_estep(
                        fr, ro, dr, tl, kl, ww, m_t, v_t, w_t, dm_t, dv_t,
                        sls, flags, wts, max_dur, nr, n_dur_rows,
                        temper, axis_name="data")

                # batch dim sharded over "data"; every accumulator comes
                # back psummed and replicated.  Shapes for out_specs come
                # from the psum-free variant (identical structure).
                shapes = jax.eval_shape(
                    lambda fr, ro, dr, tl, kl, ww: _bucket_estep(
                        fr, ro, dr, tl, kl, ww, m_t, v_t, w_t, dm_t, dv_t,
                        sls, flags, wts, max_dur, nr, n_dur_rows, temper),
                    *args)
                out_specs = jax.tree.map(lambda _: P(), shapes)
                fn = jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P("data"), tuple(P("data") for _ in names),
                              P("data"), P("data"), P("data"), P("data")),
                    out_specs=out_specs)
                ll, ok, accs, dur = fn(*args)
            total_ll += float(ll)
            n_ok += float(ok)
            new = (accs, dur)
            acc = new if acc is None else jax.tree.map(
                lambda a, b: a + b, acc, new)
    accs, dur = acc
    accs = jax.tree.map(np.asarray, accs)
    return EStepAccumulators(total_ll, n_ok, accs, np.asarray(dur))


# ---------------------------------------------------------------------------
# M-steps
# ---------------------------------------------------------------------------


def mstep_modelset(ms: hsmm.ModelSet, acc: EStepAccumulators, floor,
                   min_occ: float = 1e-6):
    """Write the batched accumulators back into the (M, S, ...) model
    arrays — the same update _soft_reestimate_iter applies from dicts."""
    M, S = ms.dur_mean.shape
    mass = acc.dur[:, 0]
    upd = mass > min_occ
    dm = np.where(upd, acc.dur[:, 1] / np.maximum(mass, 1e-30),
                  ms.dur_mean.reshape(-1))
    dv = np.where(upd,
                  np.maximum(acc.dur[:, 2] / np.maximum(mass, 1e-30)
                             - dm * dm, 0.0) + 1.0,
                  ms.dur_var.reshape(-1))
    ms.dur_mean[:] = dm.reshape(M, S)
    ms.dur_var[:] = dv.reshape(M, S)
    for i, st in enumerate(ms.streams):
        a = acc.streams[i]
        if st.msd:
            tot = a["p_tot"]
            upd_w = tot > min_occ
            w = np.clip(a["p_occ"] / np.maximum(tot, 1e-30), 1e-3, 1 - 1e-3)
            flat_w = ms.msd_weights[st.name].reshape(-1)
            ms.msd_weights[st.name][:] = np.where(
                upd_w, w, flat_w).reshape(M, S)
            occ = a["occ"]
            upd_g = occ > 2.0
        else:
            occ = a["occ"]
            upd_g = occ > min_occ
        den = np.maximum(occ, 1e-30)[:, None]
        mu = a["x"] / den
        va = np.maximum(a["x2"] / den - mu * mu, floor[st.sl][None])
        mflat = ms.means[st.name].reshape(M * S, -1)
        vflat = ms.variances[st.name].reshape(M * S, -1)
        ms.means[st.name][:] = np.where(
            upd_g[:, None], mu, mflat).reshape(ms.means[st.name].shape)
        ms.variances[st.name][:] = np.where(
            upd_g[:, None], va, vflat).reshape(ms.variances[st.name].shape)
    return ms


def mstep_clustered(model, offsets, acc: EStepAccumulators, floors,
                    min_occ: float = 1e-6):
    """Write accumulators back into tree leaf params + msd weights +
    the joint duration tree."""
    S = model.n_states
    for i, st in enumerate(model.streams):
        a = acc.streams[i]
        for s in range(S):
            tree = model.trees[st.name][s]
            off = offsets[st.name][s]
            for leaf in range(tree.n_leaves):
                r = off + leaf
                occ = a["occ"][r]
                if st.msd:
                    tot = a["p_tot"][r]
                    if tot > min_occ:
                        model.msd_weights[st.name][s][leaf] = float(
                            np.clip(a["p_occ"][r] / tot, 1e-3, 1 - 1e-3))
                    if occ <= 2.0:
                        continue
                elif occ <= min_occ:
                    continue
                mu = a["x"][r] / occ
                va = np.maximum(a["x2"][r] / occ - mu * mu,
                                floors[st.name])
                tree.leaf_params[leaf] = (mu, va)
    Ld = model.dur_tree.n_leaves
    for leaf in range(Ld):
        rows = acc.dur[leaf * S:(leaf + 1) * S]
        mass = rows[:, 0]
        if (mass <= min_occ).any():
            continue
        dm = rows[:, 1] / mass
        dv = np.maximum(rows[:, 2] / mass - dm * dm, 0.0) + 1.0
        model.dur_tree.leaf_params[leaf] = (dm, dv)
    return model


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def reestimate_modelset_batched(ms: hsmm.ModelSet, utterances,
                                n_iters: int = 3,
                                var_floor_scale: float = 0.01,
                                max_dur: int = 40, temper: float = 1.0,
                                max_batch: int = 32, mesh=None, log=print):
    """Batched HERest for the (monophone / untied full-context) modelset:
    device E-step + table M-step.  Same accumulators as
    hsmm.embedded_reestimate(mode="baum_welch"), corpus-scalable."""
    all_frames = np.concatenate([u[0] for u in utterances])
    _, gvar = hsmm.global_stats(all_frames, ms.streams)
    floor = gvar * var_floor_scale + 1e-8
    M, S = ms.dur_mean.shape
    chained = []
    for f, seq in utterances:
        r = chain_rows_modelset(ms, seq)   # same rows for every stream
        chained.append(ChainedUtterance(
            np.asarray(f, float), {st.name: r for st in ms.streams}, r))
    n_rows = {st.name: M * S for st in ms.streams}
    history = []
    for it in range(n_iters):
        tables = tables_from_modelset(ms)
        acc = corpus_estep(tables, chained, n_rows, M * S, max_dur,
                           temper, max_batch=max_batch, mesh=mesh)
        mstep_modelset(ms, acc, floor)
        log(f"batched BW iter {it}: total loglik {acc.total_ll:.1f} "
            f"({acc.n_ok:.0f} utts)")
        history.append(acc.total_ll)
    return history


def reestimate_clustered_batched(model, utterances, n_iters: int = 2,
                                 max_dur: int = 40,
                                 var_floor_scale: float = 0.01,
                                 max_batch: int = 32, mesh=None,
                                 log=print):
    """Batched soft-count ERST2/ERST4: HERest on the tied mmf
    (Training.pl:538-551) — full Baum-Welch occupancies accumulated per
    tree leaf on device, replacing the hard Viterbi counts of
    context_clustered.reestimate_clustered."""
    all_frames = np.concatenate([u[0] for u in utterances])
    _, gvar = hsmm.global_stats(all_frames, model.streams)
    floors = {st.name: gvar[st.sl] * var_floor_scale + 1e-8
              for st in model.streams}
    history = []
    for it in range(n_iters):
        tables, offsets, n_dur = tables_from_clustered(model)
        n_rows = {n: len(tables.means[n]) for n in tables.means}
        chained = []
        for f, ctx_seq in utterances:
            rows, dur_rows = chain_rows_clustered(model, ctx_seq, offsets)
            chained.append(ChainedUtterance(np.asarray(f, float), rows,
                                            dur_rows))
        acc = corpus_estep(tables, chained, n_rows, n_dur, max_dur,
                           max_batch=max_batch, mesh=mesh)
        mstep_clustered(model, offsets, acc, floors)
        log(f"batched tied BW iter {it}: total loglik {acc.total_ll:.1f} "
            f"({acc.n_ok:.0f} utts)")
        history.append(acc.total_ll)
    return history

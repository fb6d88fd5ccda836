"""Device-side (jit/vmap-able) Harvest contour stack.

TPU-native reformulation of the serial contour logic of
externs/WORLD_v2/src/harvest.cpp:

- DetectOfficialF0Candidates (:388-412)  -> per-frame run compaction
- OverlapF0Candidates (:417-429)         -> one masked gather
- RemoveUnreliableCandidates (:652-688)  -> (T,NC,NC) masked neighbour-min
- FixF0Contour / FixStep1..4 (:693-1044) -> vectorized steps 1/2/4 + the
  Extend/Merge section machinery (:791-963) as masked scans and
  while_loops over a statically-capped section axis
- SmoothF0Contour / FilteringF0 (:1049-1113) -> per-section zero-lag
  Butterworth as a vmapped lax.scan

Semantics match `ops/harvest.py`'s host transcription (the test oracle)
bit-for-bit in float64 except where noted (np.mean pairwise summation in
candidate means; ~1e-16 relative).  All shapes are static: NC (candidate
columns) and the section caps S are compile-time bounds derived from T
(sections need >= 7 frames of footprint after FixStep2, >= 10 after
FixStep4), so no input can overflow them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hts_train_world_tpu.ops import prims


# ---------------------------------------------------------------------------
# section bounds on a voicing mask (GetBoundaryList, harvest.cpp:727-743)
# ---------------------------------------------------------------------------


def _forced_voicing(f0):
    """vuv with first/last frames forced unvoiced (harvest.cpp:731-733)."""
    v = f0 > 0
    return v.at[0].set(False).at[-1].set(False)


def _start_end_masks(v):
    """Per-frame masks: run starts (v rises) and inclusive run ends."""
    vprev = jnp.concatenate([jnp.zeros(1, bool), v[:-1]])
    vnext = jnp.concatenate([v[1:], jnp.zeros(1, bool)])
    return v & ~vprev, v & ~vnext


def _sections(v, cap: int):
    """(starts, inclusive_ends, n_sections) padded to `cap`."""
    st_m, ed_m = _start_end_masks(v)
    st = prims.compact_indices(st_m, cap, 0)
    ed = prims.compact_indices(ed_m, cap, 0)
    return st, ed, jnp.sum(st_m)


def step3_section_cap(T: int) -> int:
    """FixStep2 output sections span >= 6 voiced frames + 1 gap."""
    return max((T + 6) // 7 + 1, 2)


def smooth_section_cap(T: int) -> int:
    """Post-FixStep4 gaps are >= 9 frames (shorter ones were filled)."""
    return max((T + 9) // 10 + 2, 2)


# ---------------------------------------------------------------------------
# candidate consolidation
# ---------------------------------------------------------------------------


def detect_candidates(raw, nc_cap: int):
    """DetectOfficialF0Candidates (harvest.cpp:388-412) vmapped over
    frames.  raw: (n_ch, T) per-channel candidates; runs of >= 10 voiced
    channels become one candidate (the run mean).  Returns
    ((T, nc_cap) candidates, max per-frame count)."""
    n_ch = raw.shape[0]
    rcap = n_ch // 2 + 1
    kk = jnp.arange(rcap)

    def frame(col):
        v = _forced_voicing(col)
        st_m, ed_m = _start_end_masks(v)
        st = prims.compact_indices(st_m, rcap, 0)
        # ed_m marks the last voiced channel; host uses exclusive ends
        ed = prims.compact_indices(ed_m, rcap, 0) + 1
        nruns = jnp.sum(st_m)
        ok = (kk < nruns) & (ed - st >= 10)
        csum = jnp.concatenate(
            [jnp.zeros(1, col.dtype), jnp.cumsum(col)])
        means = (jnp.take(csum, ed, mode="clip")
                 - jnp.take(csum, st, mode="clip")) \
            / jnp.maximum(ed - st, 1).astype(col.dtype)
        sel = prims.compact_indices(ok, nc_cap, 0)
        k = jnp.sum(ok)
        out = jnp.where(jnp.arange(nc_cap) < k,
                        jnp.take(means, sel, mode="clip"), 0.0)
        return out, k

    cands, counts = jax.vmap(frame, in_axes=1)(raw)
    return cands, jnp.max(counts)


def overlap_candidates(cands, nc):
    """OverlapF0Candidates (harvest.cpp:417-429), n=3: column j + nc*i of
    frame t reads candidate j of frame t-i (i=1..3) or t+i (i=4..6).
    nc is traced; columns beyond 7*nc are zero."""
    T, NC = cands.shape
    nc = jnp.maximum(nc, 1)
    cols = jnp.arange(NC)
    blk = cols // nc
    j = cols - blk * nc
    shift = jnp.where(blk == 0, 0,
                      jnp.where(blk <= 3, blk, -(blk - 3)))
    src_t = jnp.arange(T)[:, None] - shift[None, :]
    ok = (blk[None, :] < 7) & (src_t >= 0) & (src_t < T)
    g = cands[jnp.clip(src_t, 0, T - 1),
              jnp.broadcast_to(jnp.clip(j, 0, NC - 1)[None, :], (T, NC))]
    return jnp.where(ok, g, 0.0)


def remove_unreliable(cands, scores, chunk: int = 256):
    """RemoveUnreliableCandidates (harvest.cpp:652-688): kill candidates
    whose best relative match against EVERY neighbour-frame candidate
    (zeros included -> error 1, capped) exceeds 0.05.  Snapshot
    semantics: all frames judged against the pre-pass arrays."""
    T, NC = cands.shape
    dtype = cands.dtype
    nxt = jnp.concatenate([cands[1:], jnp.zeros((1, NC), dtype)])
    prv = jnp.concatenate([jnp.zeros((1, NC), dtype), cands[:-1]])
    safe = jnp.where(cands != 0, cands, 1.0)

    pad = (-T) % chunk
    padded = [jnp.pad(a, ((0, pad), (0, 0)))
              for a in (cands, nxt, prv, safe)]
    stacked = [a.reshape(-1, chunk, NC) for a in padded]

    def block(args):
        c, n, p, s = args
        e1 = jnp.min(jnp.abs(c[:, :, None] - n[:, None, :])
                     / s[:, :, None], axis=2)
        e2 = jnp.min(jnp.abs(c[:, :, None] - p[:, None, :])
                     / s[:, :, None], axis=2)
        return jnp.minimum(jnp.minimum(e1, 1.0), jnp.minimum(e2, 1.0))

    min_err = jax.lax.map(block, tuple(stacked)).reshape(-1, NC)[:T]
    tt = jnp.arange(T)
    interior = (tt >= 1) & (tt <= T - 2)
    kill = (cands != 0) & (min_err > 0.05) & interior[:, None]
    return (jnp.where(kill, 0.0, cands), jnp.where(kill, 0.0, scores))


# ---------------------------------------------------------------------------
# FixStep1/2 (vectorized) — harvest.cpp:710-762
# ---------------------------------------------------------------------------


def _search_f0_base(cands, scores):
    """SearchF0Base (harvest.cpp:693-705): best score per frame, strict >
    keeps the FIRST max; zero when every score is <= 0."""
    j = jnp.argmax(scores, axis=1)
    best = jnp.take_along_axis(scores, j[:, None], axis=1)[:, 0]
    f0 = jnp.take_along_axis(cands, j[:, None], axis=1)[:, 0]
    return jnp.where(best > 0, f0, 0.0)


def _fix_step1(base):
    """FixStep1 (harvest.cpp:710-722), allowed_range 0.008.  s1[i] only
    reads base[i-2:i+1], so the loop is fully parallel; a zero divisor
    means the condition holds (inf > 0.008 in the C)."""
    T = base.shape[0]
    b1 = jnp.concatenate([jnp.zeros(1, base.dtype), base[:-1]])
    b2 = jnp.concatenate([jnp.zeros(2, base.dtype), base[:-2]])
    ref = b1 * 2 - b2
    c1 = jnp.where(ref == 0, True, jnp.abs((base - ref)
                                           / jnp.where(ref == 0, 1.0, ref))
                   > 0.008)
    c2 = jnp.where(b1 == 0, True,
                   jnp.abs(base - b1) / jnp.where(b1 == 0, 1.0, b1) > 0.008)
    keep = (jnp.arange(T) >= 2) & (base != 0) & ~(c1 & c2)
    return jnp.where(keep, base, 0.0)


def _fix_step2(s1):
    """FixStep2 (harvest.cpp:748-762): zero voiced runs spanning < 7
    frames (ed - st < 6 on the inclusive boundary list)."""
    T = s1.shape[0]
    v = _forced_voicing(s1)
    tt = jnp.arange(T)
    st_m, ed_m = _start_end_masks(v)
    first = jax.lax.cummax(jnp.where(st_m, tt, -1))
    last = jax.lax.cummin(jnp.where(ed_m, tt, T + 1), reverse=True)
    short = v & (last - first < 6)
    return jnp.where(short, 0.0, s1)


# ---------------------------------------------------------------------------
# FixStep3: Extend + ExtendSub + MakeSortedOrder + MergeF0
# ---------------------------------------------------------------------------


def _select_best_f0(ref, row, allowed_range):
    """SelectBestF0 (harvest.cpp:636-650): <= accepts, last-min wins."""
    e = jnp.abs(ref - row) / ref
    m = jnp.min(e)
    jstar = (row.shape[0] - 1) - jnp.argmin(e[::-1])
    return jnp.where(m <= allowed_range, row[jstar], 0.0)


def _extend_one(extended, origin, last, sign: int, cands, allowed_range,
                active):
    """ExtendF0 (harvest.cpp:791-820) as a 101-step masked scan over one
    section channel.  Writes origin+sign .. last+sign; stops after 4
    consecutive failed selections.  Returns (channel, new boundary)."""
    T = extended.shape[0]
    span = jnp.abs(last - origin)

    def body(carry, i):
        ext, tmp_f0, count, shifted, done = carry
        act = active & ~done & (i <= span)
        idx = origin + sign * (i + 1)
        idxc = jnp.clip(idx, 0, T - 1)
        best = _select_best_f0(tmp_f0, cands[idxc], allowed_range)
        val = jnp.where(act, best, ext[idxc])
        ext = ext.at[idxc].set(val)
        zero = best == 0.0
        count = jnp.where(act, jnp.where(zero, count + 1, 0), count)
        tmp_f0 = jnp.where(act & ~zero, best, tmp_f0)
        shifted = jnp.where(act & ~zero, idx, shifted)
        done = done | (act & (count == 4))
        return (ext, tmp_f0, count, shifted, done), None

    init = (extended, jnp.maximum(extended[jnp.clip(origin, 0, T - 1)],
                                  jnp.asarray(1e-30, extended.dtype)),
            jnp.zeros((), jnp.int32), origin, ~active)
    (ext, _, _, shifted, _), _ = jax.lax.scan(
        body, init, jnp.arange(101, dtype=jnp.int32))
    return ext, shifted


def _sorted_order(starts, n_keep, cap: int):
    """MakeSortedOrder (harvest.cpp:883-896) — the literal insertion sort
    including its quirk: the comparison reads the CURRENT order[i], which
    changes as swaps occur.  Reproduced with nested while_loops so the
    step count tracks the true n_keep, not the static cap."""
    order0 = jnp.arange(cap, dtype=jnp.int32)

    def outer_body(c):
        i, order = c

        def inner_body(c2):
            j, order, brk = c2
            cond = jnp.take(starts, order[j], mode="clip") \
                > jnp.take(starts, order[i], mode="clip")
            oi, oj = order[i], order[j]
            order = jnp.where(cond, order.at[i].set(oj).at[j].set(oi),
                              order)
            return (j - 1, order, ~cond)

        _, order, _ = jax.lax.while_loop(
            lambda c2: (c2[0] >= 0) & ~c2[2], inner_body,
            (i - 1, order, False))
        return (i + 1, order)

    _, order = jax.lax.while_loop(lambda c: c[0] < n_keep, outer_body,
                                  (jnp.asarray(1, jnp.int32), order0))
    return order


def _row_match_score(f0vec, cands, scores):
    """SearchScore (harvest.cpp:901-907) for every frame at once: the best
    score among candidates equal to f0vec[t] (0 when none match)."""
    eq = cands == f0vec[:, None]
    return jnp.max(jnp.where(eq, scores, 0.0), axis=1)


def _merge_sections(multi, st, ed, order, n_keep, cands, scores):
    """MergeF0 (harvest.cpp:937-963): serial accumulation over kept
    sections in sorted order.  The base contour is array slot 0 (NOT
    order[0]) and the loop visits order[1..] — reference quirk kept."""
    T = multi.shape[1]
    tt = jnp.arange(T)

    def body(c):
        i, merged, bl0, bl1 = c
        o = order[i]
        st2 = jnp.take(st, o, mode="clip")
        ed2 = jnp.take(ed, o, mode="clip")
        ch = jnp.take(multi, o, axis=0, mode="clip")
        disjoint = st2 - bl1 > 0
        contained = (bl0 <= st2) & (bl1 >= ed2)
        app = jnp.where((tt >= st2) & (tt <= ed2), ch, merged)
        rng = (tt >= st2) & (tt <= bl1)
        sc1 = jnp.sum(jnp.where(rng, _row_match_score(merged, cands,
                                                      scores), 0.0))
        sc2 = jnp.sum(jnp.where(rng, _row_match_score(ch, cands, scores),
                                0.0))
        lo = jnp.where(sc1 > sc2, bl1, st2)  # f0_1[ed1:...] incl. ed1
        mrg = jnp.where((tt >= lo) & (tt <= ed2), ch, merged)
        merged = jnp.where(disjoint, app,
                           jnp.where(contained, merged, mrg))
        bl0 = jnp.where(disjoint, st2, bl0)
        bl1 = jnp.where(disjoint, ed2,
                        jnp.where(contained, bl1, ed2))
        return (i + 1, merged, bl0, bl1)

    init = (jnp.asarray(1, jnp.int32), multi[0], st[0], ed[0])
    _, merged, _, _ = jax.lax.while_loop(lambda c: c[0] < n_keep, body,
                                         init)
    return merged


def _fix_step3(s2, cands, scores, cap: int, allowed_range=0.18):
    """FixStep3 (harvest.cpp:968-995)."""
    T = s2.shape[0]
    dtype = s2.dtype
    v = _forced_voicing(s2)
    st, ed, n_sec = _sections(v, cap)
    kk = jnp.arange(cap)
    sec_valid = kk < n_sec
    tt = jnp.arange(T)
    in_sec = ((tt[None, :] >= st[:, None]) & (tt[None, :] <= ed[:, None])
              & sec_valid[:, None])
    multi = jnp.where(in_sec, s2[None, :], 0.0)

    # Extend (:861-878): forward from each end, backward from each start
    fwd_last = jnp.minimum(T - 2, ed + 100)
    bwd_last = jnp.maximum(1, st - 100)
    multi, ed = jax.vmap(
        lambda ch, o, l, a: _extend_one(ch, o, l, 1, cands, allowed_range,
                                        a))(multi, ed, fwd_last, sec_valid)
    multi, st = jax.vmap(
        lambda ch, o, l, a: _extend_one(ch, o, l, -1, cands, allowed_range,
                                        a))(multi, st, bwd_last, sec_valid)

    # ExtendSub (:840-856): running (never reset) mean accumulator
    span = (tt[None, :] >= st[:, None]) & (tt[None, :] < ed[:, None])
    ssum = jnp.sum(jnp.where(span & sec_valid[:, None], multi, 0.0),
                   axis=1)

    def sub_body(mean_f0, xs):
        ssum_i, st_i, ed_i, act = xs
        den = jnp.maximum(ed_i - st_i, 1).astype(dtype)
        new_mean = (mean_f0 + ssum_i) / den
        mean_f0 = jnp.where(act, new_mean, mean_f0)
        keep = act & (2200.0 / new_mean < (ed_i - st_i).astype(dtype))
        return mean_f0, keep

    _, keep = jax.lax.scan(sub_body, jnp.zeros((), dtype),
                           (ssum, st, ed, sec_valid))
    n_keep = jnp.sum(keep)
    sel = prims.compact_indices(keep, cap, 0)
    multi_k = jnp.take(multi, sel, axis=0, mode="clip")
    st_k = jnp.take(st, sel, mode="clip")
    ed_k = jnp.take(ed, sel, mode="clip")

    order = _sorted_order(st_k, n_keep, cap)
    merged = _merge_sections(multi_k, st_k, ed_k, order, n_keep, cands,
                             scores)
    return jnp.where(n_keep == 0, s2, merged)


def _fix_step4(s3):
    """FixStep4 (harvest.cpp:1000-1022): linear fill of inter-section
    gaps shorter than 9 frames; vectorized via nearest-voiced indices."""
    T = s3.shape[0]
    v = _forced_voicing(s3)
    tt = jnp.arange(T)
    prev_end = jax.lax.cummax(jnp.where(v, tt, -1))
    next_st = jax.lax.cummin(jnp.where(v, tt, T + 1), reverse=True)
    dist = next_st - prev_end - 1
    fill = (~v) & (prev_end >= 0) & (next_st <= T - 1) & (dist < 9)
    tmp0 = jnp.take(s3, jnp.clip(prev_end, 0, T - 1), mode="clip") + 1.0
    tmp1 = jnp.take(s3, jnp.clip(next_st, 0, T - 1), mode="clip") - 1.0
    coef = (tmp1 - tmp0) / (dist + 1.0).astype(s3.dtype)
    return jnp.where(fill,
                     tmp0 + coef * (tt - prev_end).astype(s3.dtype), s3)


def fix_contour(cands, scores, cap: int):
    """FixF0Contour (harvest.cpp:1027-1044) on device."""
    base = _search_f0_base(cands, scores)
    s1 = _fix_step1(base)
    s2 = _fix_step2(s1)
    s3 = _fix_step3(s2, cands, scores, cap)
    return _fix_step4(s3)


# ---------------------------------------------------------------------------
# SmoothF0Contour (harvest.cpp:1049-1113)
# ---------------------------------------------------------------------------

_BUTTER_B = (0.0078202080334971724, 0.015640416066994345)
_BUTTER_A = (1.7347257688092754, -0.76600660094326412)


def _butter_pass(x):
    """FilteringF0's single pass (harvest.cpp:1055-1074): forward biquad
    whose output is written back-to-front (the caller applies it twice
    for zero phase).  f32 fast path runs the recurrence as a log-depth
    associative affine scan (stable filter -> bounded reassociation
    error); f64 keeps the exact sequential order."""
    b0, b1 = _BUTTER_B
    a0, a1 = _BUTTER_A
    dtype = x.dtype

    if dtype == jnp.float32:
        xin = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
        s = prims.affine_scan((a0, a1), xin)  # (L, 2) = (w_t, w_{t-1})
        w = s[:, 0]
        w1 = jnp.concatenate([jnp.zeros(1, dtype), w[:-1]])
        w2 = jnp.concatenate([jnp.zeros(2, dtype), w[:-2]])
        return (b0 * w + b1 * w1 + b0 * w2)[::-1]

    def body(wc, xt):
        w0, w1 = wc
        wt = xt + a0 * w0 + a1 * w1
        yt = b0 * wt + b1 * w0 + b0 * w1
        return (wt, w0), yt

    zero = jnp.zeros((), dtype)
    _, y = jax.lax.scan(body, (zero, zero), x, unroll=32)
    return y[::-1]


def smooth_contour(f0, cap: int):
    """SmoothF0Contour: per voiced section, hold edges across a 300-frame
    apron and apply the zero-lag Butterworth twice."""
    T = f0.shape[0]
    lag = 300
    L = T + 2 * lag
    ext = jnp.zeros(L, f0.dtype).at[lag:lag + T].set(f0)
    v = _forced_voicing(ext)
    st, ed, n_sec = _sections(v, cap)
    sec_valid = jnp.arange(cap) < n_sec
    tt = jnp.arange(L)

    def one(st_i, ed_i):
        ch = jnp.take(ext, jnp.clip(tt, st_i, ed_i), mode="clip")
        return _butter_pass(_butter_pass(ch))

    sm = jax.vmap(one)(st, ed)
    mask = ((tt[None, :] >= st[:, None]) & (tt[None, :] <= ed[:, None])
            & sec_valid[:, None])
    out_ext = jnp.sum(jnp.where(mask, sm, 0.0), axis=0)
    return out_ext[lag:lag + T]

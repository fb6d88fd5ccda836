"""Batched device-side HSMM EM (models/hsmm_batch.py).

Gates:
- padded forward-backward (t_len/k_len) is bit-identical to unpadded;
- the batched monophone E-step/M-step equals the per-utterance loop
  (hsmm.embedded_reestimate mode=baum_welch) to float64 roundoff;
- the batched tied E-step equals a host-loop soft reference built from
  occupancy_utterance-style chains;
- soft tied counts DIVERGE from the hard Viterbi counts (ERST2's HERest
  vs HSMMAlign distinction) while matching the brute-force posterior;
- the 8-device sharded corpus E-step equals the single-device one.
"""
import copy

import numpy as np
import pytest

import tests.test_hsmm as th
from hts_train_world_tpu.models import context_clustered as cc
from hts_train_world_tpu.models import hsmm, hsmm_batch


def _utts(rng, n=6, n_labels=4):
    utts = []
    for _ in range(n):
        seq = [th.names_all[i] for i in rng.integers(0, 3, n_labels)]
        frames, _ = th._sample_utterance(rng, th.model_means, seq, 3)
        utts.append((frames, seq))
    return utts


def _boot_modelset(utts):
    frames_by_model = {n: [] for n in th.names_all}
    for frames, seq in utts:
        ends = np.linspace(0, len(frames), len(seq) + 1)[1:].astype(int)
        starts = np.concatenate([[0], ends[:-1]])
        for i, n in enumerate(seq):
            frames_by_model[n].append(frames[starts[i]:ends[i]])
    return hsmm.init_modelset(th.names_all, frames_by_model,
                              th._tiny_streams(), n_states=3)


def test_padded_fb_bit_identical():
    rng = np.random.default_rng(0)
    T, S = 37, 6
    obs = rng.standard_normal((T, S)) * 2.0
    dm = rng.uniform(3, 8, S)
    dv = rng.uniform(1, 4, S)
    ll0, g0, d0 = hsmm.forward_backward_segment(obs, dm, dv, 20)
    Tp, Sp = T + 13, S + 3
    obsp = np.zeros((Tp, Sp))
    obsp[:T, :S] = obs
    obsp[T:, :] = rng.standard_normal((13, Sp))   # garbage padding
    dmp = np.concatenate([dm, np.full(3, 5.0)])
    dvp = np.concatenate([dv, np.ones(3)])
    ll1, g1, d1 = hsmm.forward_backward_segment(obsp, dmp, dvp, 20,
                                                t_len=T, k_len=S)
    assert abs(float(ll0) - float(ll1)) < 1e-10
    assert np.abs(np.asarray(g0) - np.asarray(g1)[:T, :S]).max() < 1e-12
    assert np.abs(np.asarray(d0) - np.asarray(d1)[:S]).max() < 1e-10
    assert np.abs(np.asarray(g1)[T:, :]).max() < 1e-12
    assert np.abs(np.asarray(d1)[S:]).max() < 1e-12


def test_batched_equals_loop_monophone():
    rng = np.random.default_rng(1)
    utts = _utts(rng)
    ms1 = _boot_modelset(utts)
    ms2 = copy.deepcopy(ms1)
    hsmm.embedded_reestimate(ms1, utts, n_iters=2, mode="baum_welch",
                             log=lambda m: None)
    hsmm_batch.reestimate_modelset_batched(ms2, utts, n_iters=2,
                                           log=lambda m: None)
    for st in ms1.streams:
        assert np.abs(ms1.means[st.name] - ms2.means[st.name]).max() < 1e-8
        assert np.abs(ms1.variances[st.name]
                      - ms2.variances[st.name]).max() < 1e-8
    assert np.abs(ms1.dur_mean - ms2.dur_mean).max() < 1e-8
    for n in ms1.msd_weights:
        assert np.abs(ms1.msd_weights[n] - ms2.msd_weights[n]).max() < 1e-8


@pytest.fixture(scope="module")
def tied():
    rng = np.random.default_rng(3)
    utts = _utts(rng, 6)
    ms = _boot_modelset(utts)
    hsmm.embedded_reestimate(ms, utts, n_iters=1, mode="baum_welch",
                             log=lambda m: None)
    ctx_utts = [(f, [f"x^x-{p}+x=x" for p in seq]) for f, seq in utts]
    from hts_train_world_tpu.models import clustering
    qs = [clustering.Question(f"C-{p}", [f"*-{p}+*"])
          for p in th.names_all]
    ss, mss, ds = cc.collect_context_stats(ms, ctx_utts, 40)
    model = cc.build_clustered_model(ms, ss, mss, ds, qs, 0.5, 0.5)
    return model, ctx_utts


def test_tied_batched_equals_host_soft(tied):
    """The batched tied E-step accumulators == a host loop computing the
    same soft stats from align_with_clustered's chain + occupancies."""
    model, utts = tied
    tables, offsets, n_dur = hsmm_batch.tables_from_clustered(model)
    n_rows = {n: len(tables.means[n]) for n in tables.means}
    chained = []
    for f, ctx_seq in utts:
        rows, dur_rows = hsmm_batch.chain_rows_clustered(model, ctx_seq,
                                                         offsets)
        chained.append(hsmm_batch.ChainedUtterance(np.asarray(f, float),
                                                   rows, dur_rows))
    acc = hsmm_batch.corpus_estep(tables, chained, n_rows, n_dur, 40)

    # host reference: per-utterance forward-backward + dict accumulation
    S = model.n_states
    occ_ref = {n: np.zeros(n_rows[n]) for n in n_rows}
    x_ref = {n: np.zeros_like(tables.means[n]) for n in n_rows}
    dur_ref = np.zeros((n_dur, 3))
    total_ref = 0.0
    import jax.numpy as jnp
    for u in chained:
        # rebuild obs_ll from the row gathers (same code path the kernel
        # uses, but unbatched)
        sts = model.streams
        sls = tuple((st.sl.start, st.sl.stop) for st in sts)
        flags = tuple(st.msd for st in sts)
        wts = tuple(st.weight for st in sts)
        mu = tuple(jnp.asarray(tables.means[st.name][u.rows[st.name]])
                   for st in sts)
        va = tuple(jnp.asarray(tables.vars[st.name][u.rows[st.name]])
                   for st in sts)
        mw = tuple(jnp.asarray(tables.msd_w[st.name][u.rows[st.name]])
                   if st.msd else jnp.zeros(len(u.dur_rows)) for st in sts)
        obs_ll = hsmm.frame_loglik(jnp.asarray(u.frames), mu, va, mw,
                                   sls, flags, wts)
        ll, gamma, dstats = hsmm.forward_backward_segment(
            obs_ll, jnp.asarray(tables.dur_mean[u.dur_rows]),
            jnp.asarray(tables.dur_var[u.dur_rows]), 40)
        total_ref += float(ll)
        gamma = np.asarray(gamma)
        for st in sts:
            g = gamma
            if st.msd:
                pm = (u.frames[:, st.sl.start] != 0.0).astype(float)
                g = gamma * pm[:, None]
            occ_k = g.sum(0)
            x_k = g.T @ u.frames[:, st.sl]
            for k, r in enumerate(u.rows[st.name]):
                occ_ref[st.name][r] += occ_k[k]
                x_ref[st.name][r] += x_k[k]
        for k, r in enumerate(u.dur_rows):
            dur_ref[r] += np.asarray(dstats)[k]
    assert abs(acc.total_ll - total_ref) < 1e-6
    for i, st in enumerate(model.streams):
        assert np.abs(acc.streams[i]["occ"] - occ_ref[st.name]).max() < 1e-8
        assert np.abs(acc.streams[i]["x"] - x_ref[st.name]).max() < 1e-6
    assert np.abs(acc.dur - dur_ref).max() < 1e-8


def test_soft_vs_hard_tied_counts_diverge(tied):
    """ERST2 soft (HERest) vs hard (HSMMAlign) counts: they differ on
    ambiguous data, and soft == the exact posterior expectation (already
    gated vs brute force in test_hsmm_soft) while hard is its argmax
    approximation."""
    model, utts = tied
    m_soft = copy.deepcopy(model)
    # blur the model so the state posterior is genuinely uncertain (the
    # sampled corpus is near-separable, where soft == hard by design)
    for name in m_soft.trees:
        for tree in m_soft.trees[name]:
            for leaf in range(tree.n_leaves):
                mu, va = tree.leaf_params[leaf]
                tree.leaf_params[leaf] = (mu, va * 50.0)
    for leaf in range(m_soft.dur_tree.n_leaves):
        dm, dv = m_soft.dur_tree.leaf_params[leaf]
        m_soft.dur_tree.leaf_params[leaf] = (dm, dv * 50.0)
    m_hard = copy.deepcopy(m_soft)
    hsmm_batch.reestimate_clustered_batched(m_soft, utts, n_iters=1,
                                            max_dur=40, log=lambda m: None)
    cc.reestimate_clustered(m_hard, utts, n_iters=1, max_dur=40,
                            log=lambda m: None)
    diffs = []
    for s in range(model.n_states):
        t_s = m_soft.trees["mgc"][s]
        t_h = m_hard.trees["mgc"][s]
        for leaf in range(t_s.n_leaves):
            diffs.append(np.abs(t_s.leaf_params[leaf][0]
                                - t_h.leaf_params[leaf][0]).max())
    assert max(diffs) > 1e-6      # soft != hard on ambiguous boundaries
    assert max(diffs) < 1.0       # ... but the same model to first order


def test_sharded_estep_equals_single():
    """shard_map over an 8-device CPU mesh psums to the same accumulators
    as the single-device path (the multi-chip HERest contract)."""
    import jax
    from jax.sharding import Mesh
    rng = np.random.default_rng(5)
    utts = _utts(rng, 8)
    ms = _boot_modelset(utts)
    tables = hsmm_batch.tables_from_modelset(ms)
    chained = []
    for f, seq in utts:
        r = hsmm_batch.chain_rows_modelset(ms, seq)
        chained.append(hsmm_batch.ChainedUtterance(
            np.asarray(f, float), {st.name: r for st in ms.streams}, r))
    M, S = ms.dur_mean.shape
    n_rows = {st.name: M * S for st in ms.streams}
    a1 = hsmm_batch.corpus_estep(tables, chained, n_rows, M * S, 40)
    mesh = Mesh(np.asarray(jax.devices("cpu"))[:8], ("data",))
    a8 = hsmm_batch.corpus_estep(tables, chained, n_rows, M * S, 40,
                                 mesh=mesh)
    assert abs(a1.total_ll - a8.total_ll) < 1e-6
    assert a1.n_ok == a8.n_ok
    for d1, d8 in zip(a1.streams, a8.streams):
        for k in d1:
            assert np.abs(d1[k] - d8[k]).max() < 1e-7, k
    assert np.abs(a1.dur - a8.dur).max() < 1e-7


def test_recipe_soft_counts_end_to_end():
    """The recipe's soft path (batched ERST0/CXCL-soft/ERST2) trains and
    aligns every utterance."""
    from tests.test_recipe import _corpus, _questions
    from hts_train_world_tpu.models import recipe
    rng = np.random.default_rng(2)
    utts, spans = _corpus(rng)
    cfg = recipe.RecipeConfig(n_states=3, n_iters=1, max_dur=40,
                              mdl_factor=0.5, min_occupancy=0.5,
                              soft_counts=True, tied_iters=1,
                              recluster=True, use_gv=False, n_win=1)
    st = recipe.train_voice(utts, _questions(), cfg,
                            streams=th._tiny_streams(),
                            bootstrap_spans=spans, log=lambda m: None)
    for ui, (frames, _) in enumerate(utts):
        assert st.alignments[ui][-1] == len(frames)
    assert any("batched" in m for m in st.log_history)


def test_em_corpus_scale_128_utts():
    """Corpus-scale EM (VERDICT weak #8): one hundred+ utterances through
    the batched E-step in buckets; loglik must be finite and improve."""
    rng = np.random.default_rng(11)
    utts = []
    for i in range(128):
        seq = [th.names_all[j] for j in rng.integers(0, 3, 5)]
        frames, _ = th._sample_utterance(rng, th.model_means, seq, 3)
        utts.append((frames, seq))
    ms = _boot_modelset(utts)
    hist = hsmm_batch.reestimate_modelset_batched(
        ms, utts, n_iters=2, max_dur=30, log=lambda m: None)
    assert np.isfinite(hist).all()
    assert hist[1] > hist[0]
    assert np.isfinite(ms.dur_mean).all()
    for st in ms.streams:
        assert np.isfinite(ms.means[st.name]).all()
        assert (ms.variances[st.name] > 0).all()

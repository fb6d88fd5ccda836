"""Soft-occupancy (full Baum-Welch) HSMM E-step, DAEM annealing.

Gates:
- exactness: forward-backward log-evidence and frame occupancies match a
  brute-force enumeration over all segmentations of a small chain;
- occupancies are a proper posterior (rows sum to 1, per-state segment
  mass 1, evidence >= Viterbi);
- soft EM improves corpus likelihood and matches the Viterbi-EM fixed
  point on well-separated data;
- DAEM schedule anneals k to 1 and trains.
"""
import itertools

import numpy as np
import pytest

from hts_train_world_tpu.models import hsmm

from test_hsmm import (_tiny_streams, _sample_utterance, _true_modelset,
                       names_all, model_means, corpus)


def _brute_force(obs_ll, dur_mean, dur_var, max_dur):
    """Enumerate all segmentations of T frames into S ordered nonempty
    states (duration <= max_dur); exact evidence + occupancies."""
    T, S = obs_ll.shape
    csum = np.concatenate([np.zeros((1, S)), np.cumsum(obs_ll, 0)])

    def dur_ll(d, s):
        return -0.5 * ((d - dur_mean[s]) ** 2 / dur_var[s]
                       + np.log(dur_var[s]) + np.log(2 * np.pi))

    lls = []
    gammas = []
    for cuts in itertools.combinations(range(1, T), S - 1):
        b = (0,) + cuts + (T,)
        durs = np.diff(b)
        if durs.max() > max_dur:
            continue
        ll = sum(csum[b[s + 1], s] - csum[b[s], s] + dur_ll(durs[s], s)
                 for s in range(S))
        g = np.zeros((T, S))
        for s in range(S):
            g[b[s]:b[s + 1], s] = 1.0
        lls.append(ll)
        gammas.append(g)
    lls = np.asarray(lls)
    m = lls.max()
    w = np.exp(lls - m)
    logZ = m + np.log(w.sum())
    gamma = np.tensordot(w / w.sum(), np.stack(gammas), axes=1)
    return logZ, gamma


def test_forward_backward_exact_vs_bruteforce():
    rng = np.random.default_rng(7)
    T, S, max_dur = 12, 3, 8
    obs_ll = rng.standard_normal((T, S)) * 2.0
    dm = np.array([3.0, 4.0, 5.0])
    dv = np.array([2.0, 2.0, 2.0])
    logZ_bf, gamma_bf = _brute_force(obs_ll, dm, dv, max_dur)
    logZ, gamma, dstats = hsmm.forward_backward_segment(
        obs_ll, dm, dv, max_dur)
    assert abs(float(logZ) - logZ_bf) < 1e-8
    assert np.abs(np.asarray(gamma) - gamma_bf).max() < 1e-8
    # proper posterior: every frame covered once, every state mass 1
    assert np.abs(np.asarray(gamma).sum(1) - 1.0).max() < 1e-8
    assert np.abs(np.asarray(dstats)[:, 0] - 1.0).max() < 1e-8
    # evidence dominates the Viterbi path
    best, _ = hsmm.viterbi_segment(obs_ll, dm, dv, max_dur)
    assert float(logZ) >= float(best) - 1e-9


def test_tempering_flattens_posterior():
    rng = np.random.default_rng(3)
    obs_ll = rng.standard_normal((20, 3)) * 3.0
    dm = np.array([5.0, 7.0, 8.0])
    dv = np.array([3.0, 3.0, 3.0])
    _, g_cold, _ = hsmm.forward_backward_segment(obs_ll, dm, dv, 15,
                                                 temper=0.05)
    _, g_hot, _ = hsmm.forward_backward_segment(obs_ll, dm, dv, 15,
                                                temper=1.0)
    ent = lambda g: float(-(np.asarray(g) * np.log(np.asarray(g) + 1e-12))
                          .sum(1).mean())
    assert ent(g_cold) > ent(g_hot)
    assert np.abs(np.asarray(g_cold).sum(1) - 1.0).max() < 1e-6


def test_soft_em_improves_and_aligns(corpus):
    streams = _tiny_streams()
    frames_by_model = {n: [] for n in names_all}
    for frames, seq, bounds in corpus:
        phone_ends = bounds[2::3]
        starts = np.concatenate([[0], phone_ends[:-1]])
        for i, n in enumerate(seq):
            frames_by_model[n].append(frames[starts[i]:phone_ends[i]])
    ms = hsmm.init_modelset(names_all, frames_by_model, streams, n_states=3)

    utts = [(f, s) for f, s, _ in corpus]
    lls = []
    for it in range(3):
        ms = hsmm.embedded_reestimate(ms, utts, n_iters=1,
                                      mode="baum_welch",
                                      log=lambda m: None)
        ll = sum(hsmm.occupancy_utterance(ms, f, s)[0] for f, s in utts)
        lls.append(ll)
    assert lls[-1] >= lls[0] - 1e-6

    # soft occupancies under the trained model track the true boundaries
    frames, seq, bounds = corpus[0]
    _, gamma, _ = hsmm.occupancy_utterance(ms, frames, seq)
    hard = np.argmax(gamma, 1)
    true_state = np.zeros(len(frames), int)
    prev = 0
    for k, e in enumerate(bounds):
        true_state[prev:e] = k
        prev = e
    assert (hard == true_state).mean() > 0.85

    # msd weights recovered as in the hard-EM gate
    assert ms.msd_weights["lf0"][ms.index("b")].max() < 0.2
    assert ms.msd_weights["lf0"][ms.index("a")].min() > 0.8


def test_infeasible_utterances_dropped(corpus):
    """Utterances shorter than their composed chain are unalignable:
    align_utterance raises, and both E-step modes drop them from the
    counts instead of accumulating garbage occupancies (the reference's
    screening gates drop such utterances, data/Makefile.in:216-238)."""
    ms = _true_modelset()
    frames, seq, _ = corpus[0]
    short = frames[: len(seq) * ms.n_states - 1]
    with pytest.raises(ValueError, match="infeasible"):
        hsmm.align_utterance(ms, short, seq)
    utts = [(short, seq), (frames, seq)]
    for mode in ("baum_welch", "viterbi"):
        m = _true_modelset()
        hsmm.embedded_reestimate(m, utts, n_iters=1, mode=mode,
                                 log=lambda s: None)
        for st in m.streams:
            assert np.all(np.isfinite(m.means[st.name]))
            assert np.all(m.variances[st.name] > 0)


def test_daem_anneals(corpus):
    ms = _true_modelset()
    utts = [(f, s) for f, s, _ in corpus]
    temps = []
    hsmm.daem_reestimate(ms, utts, n_outer=3, n_inner=1,
                         log=lambda m: temps.append(m))
    ks = [float(t.split("k=")[1]) for t in temps if "k=" in t]
    assert ks == sorted(ks) and abs(ks[-1] - 1.0) < 1e-9
    ll = sum(hsmm.occupancy_utterance(ms, f, s)[0] for f, s in utts)
    assert np.isfinite(ll)

"""UPMIX mixtures + semi-tied covariance (Training.pl:1017-1144).

Gates:
- a 2-component mixture with identical components reproduces the
  single-Gaussian likelihood exactly;
- upmix + mixture EM separates genuinely bimodal state emissions and
  beats the single-Gaussian likelihood;
- semi-tied estimation's auxiliary objective is monotone (asserted in
  the estimator), the recovered transform whitens the shared
  correlation structure, and the transformed-space likelihood (with the
  log|det A| Jacobian) beats the diagonal model's.
"""
import copy

import numpy as np
import pytest

from hts_train_world_tpu.models import hsmm, hsmm_variants as hv

from test_hsmm import _tiny_streams, names_all, corpus


def _fit_base(corpus):
    streams = _tiny_streams()
    frames_by_model = {n: [] for n in names_all}
    for frames, seq, bounds in corpus:
        phone_ends = bounds[2::3]
        starts = np.concatenate([[0], phone_ends[:-1]])
        for i, n in enumerate(seq):
            frames_by_model[n].append(frames[starts[i]:phone_ends[i]])
    ms = hsmm.init_modelset(names_all, frames_by_model, streams, n_states=3)
    return hsmm.embedded_reestimate(ms, [(f, s) for f, s, _ in corpus],
                                    n_iters=2, log=lambda m: None)


def test_identical_components_match_single_gaussian(corpus):
    ms = _fit_base(corpus)
    mms = hv.upmix(ms, perturb=0.0)   # identical split
    frames, seq, _ = corpus[0]
    ll1, ends1 = hsmm.align_utterance(ms, frames, seq)
    ll2, ends2 = hv.align_utterance_mix(mms, frames, seq)
    assert abs(ll1 - ll2) < 1e-6
    assert (ends1 == ends2).all()


def test_upmix_em_separates_bimodal_data():
    rng = np.random.default_rng(5)
    streams = _tiny_streams()
    S = 2
    # one model, state emissions bimodal in the mgc stream
    centers = np.array([[2.0, -2.0, 1.0, 0.0], [-2.0, 2.0, -1.0, 0.5]])
    utts = []
    for _ in range(8):
        fr = []
        for s in range(S):
            d = 14 + int(rng.integers(0, 4))
            pick = rng.integers(0, 2, d)
            base = centers[pick] + (3.0 * s)
            f = np.zeros((d, 10))
            f[:, :4] = base + 0.2 * rng.standard_normal((d, 4))
            f[:, 4] = 1.0 + 0.1 * rng.standard_normal(d)   # voiced lf0
            f[:, 5] = 0.2 * rng.standard_normal(d)
            f[:, 6:8] = 0.2 * rng.standard_normal((d, 2))
            f[:, 8] = 1.0 + 0.1 * rng.standard_normal(d)
            f[:, 9] = 0.2 * rng.standard_normal(d)
            fr.append(f)
        utts.append((np.concatenate(fr), ["a"]))
    ms = hsmm.init_modelset(
        ["a"], {"a": [u[0] for u in utts]}, streams, n_states=S)
    ms = hsmm.embedded_reestimate(ms, utts, n_iters=2, log=lambda m: None)
    ll_single = sum(hsmm.align_utterance(ms, f, sq)[0] for f, sq in utts)

    mms = hv.upmix(ms)
    mms = hv.embedded_reestimate_mix(mms, utts, n_iters=4,
                                     log=lambda m: None)
    ll_mix = sum(hv.align_utterance_mix(mms, f, sq)[0] for f, sq in utts)
    assert ll_mix > ll_single + 10.0

    # the two components straddle the two true clusters (state 0)
    mu = mms.means["mgc"][0, 0]          # (2, 4)
    d00 = np.abs(mu[0] - centers[0]).mean()
    d01 = np.abs(mu[0] - centers[1]).mean()
    d10 = np.abs(mu[1] - centers[0]).mean()
    d11 = np.abs(mu[1] - centers[1]).mean()
    assert min(d00 + d11, d01 + d10) < 1.0
    # weights stay balanced-ish
    w = np.exp(mms.mix_logw["mgc"][0, 0])
    assert w.min() > 0.2

    # mixture generation uses the dominant component
    means, vars_, vuv, durs = hv.generate_from_models_mix(mms, ["a"])
    assert means["mgc"].shape[0] == durs.sum()
    assert np.isfinite(means["mgc"]).all() and (vars_["mgc"] > 0).all()


def test_semitied_whitens_and_improves():
    rng = np.random.default_rng(11)
    streams = _tiny_streams()
    S = 3
    # shared mixing L in the mgc stream; per-state diagonal scales
    L = np.eye(4) + 0.6 * rng.standard_normal((4, 4)) * (1 - np.eye(4))
    mus = rng.standard_normal((S, 4)) * 3.0
    utts = []
    for _ in range(6):
        fr = []
        for s in range(S):
            d = 20 + int(rng.integers(0, 6))
            scale = np.array([1.0, 0.5, 0.25, 0.75]) * (1 + 0.3 * s)
            z = rng.standard_normal((d, 4)) * scale
            f = np.zeros((d, 10))
            f[:, :4] = mus[s] + z @ L.T
            f[:, 4] = 1.0 + 0.1 * rng.standard_normal(d)
            f[:, 5] = 0.2 * rng.standard_normal(d)
            f[:, 6:8] = 0.2 * rng.standard_normal((d, 2))
            f[:, 8] = 1.0 + 0.1 * rng.standard_normal(d)
            f[:, 9] = 0.2 * rng.standard_normal(d)
            fr.append(f)
        utts.append((np.concatenate(fr), ["a"]))
    ms = hsmm.init_modelset(
        ["a"], {"a": [u[0] for u in utts]}, streams, n_states=S)
    ms = hsmm.embedded_reestimate(ms, utts, n_iters=3, log=lambda m: None)
    ll_diag = sum(hsmm.align_utterance(ms, f, sq)[0] for f, sq in utts)

    ms_stc = copy.deepcopy(ms)
    stc = hv.estimate_semitied(ms_stc, utts, n_iter=20,
                               log=lambda m: None)
    A = stc.transforms["mgc"]
    assert A.shape == (4, 4)

    # whitening: A (L D L^T) A^T has small off-diagonals for every state
    for s in range(S):
        scale = np.array([1.0, 0.5, 0.25, 0.75]) * (1 + 0.3 * s)
        cov = L @ np.diag(scale ** 2) @ L.T
        W = A @ cov @ A.T
        off = W - np.diag(np.diag(W))
        assert np.abs(off).max() < 0.15 * np.diag(W).max()

    # likelihood (with the Jacobian term) improves over the diagonal fit
    tms = stc.transformed_modelset()
    ll_stc = sum(
        hsmm.align_utterance(tms, stc.transform_frames(f), sq)[0]
        + stc.loglik_constant(len(f))
        for f, sq in utts)
    assert ll_stc > ll_diag + 1.0

    # alignment in the transformed space still segments the chain fully
    f0, sq0 = utts[0]
    _, ends = hsmm.align_utterance(tms, stc.transform_frames(f0), sq0)
    assert ends[-1] == len(f0)

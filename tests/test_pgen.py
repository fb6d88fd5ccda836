"""HMGenS-equivalent generation (models/pgen.py): rho duration control,
pgtype-0 frame expansion, and the pgtype-1 EM M-step gated against the
hand-computed mixed-precision formula."""
import numpy as np
import pytest

import tests.test_hsmm as th
from tests.test_recipe import _corpus, _questions
from hts_train_world_tpu.models import pgen, recipe


@pytest.fixture(scope="module")
def voice_state():
    rng = np.random.default_rng(2)
    utts, spans = _corpus(rng)
    cfg = recipe.RecipeConfig(n_states=3, n_iters=1, max_dur=40,
                              mdl_factor=0.5, min_occupancy=0.5, n_win=1,
                              tied_iters=1, recluster=False,
                              use_gv=True, cdgv=True, nosilgv=False,
                              use_mspf=False)
    st = recipe.train_voice(utts, _questions(), cfg,
                            streams=th._tiny_streams(),
                            bootstrap_spans=spans, log=lambda m: None)
    return st, utts


def test_rho_speaking_rate(voice_state):
    """HMGenS -r: d_k = mu_k + rho*sigma^2_k; rho>0 lengthens, rho<0
    shortens, rho_for_total hits a target length."""
    st, utts = voice_state
    labels = utts[0][1]
    d0 = pgen.state_durations(st.clustered, labels)
    dplus = pgen.state_durations(st.clustered, labels, rho=0.5)
    dminus = pgen.state_durations(st.clustered, labels, rho=-0.5)
    assert dplus.sum() > d0.sum() > dminus.sum()
    target = int(d0.sum() * 1.4)
    rho = pgen.rho_for_total(st.clustered, labels, target)
    dt = pgen.state_durations(st.clustered, labels, rho)
    assert abs(int(dt.sum()) - target) <= len(dt)  # rounding slack


def test_em_mstep_matches_hand_formula(voice_state):
    """With the gamma the E-step returns, the pgtype-1 trajectory (n_win=1,
    identity MLPG, non-MSD stream) must equal the hand-computed
    mixed-precision mean (gamma @ mu/var) / (gamma @ 1/var)."""
    st, utts = voice_state
    labels = utts[0][1]
    statics, vuv, gamma, hist = pgen.generate_em(
        st.clustered, labels, n_iters=1, max_dur=40, n_win=1)
    from hts_train_world_tpu.models import context_clustered as cc
    means, vars_, _, _, _, _, _ = cc._chain_arrays(st.clustered, labels)
    mu, va = means["mgc"], vars_["mgc"]
    prec = gamma @ (1.0 / va)
    hand = (gamma @ (mu / va)) / prec
    np.testing.assert_allclose(statics["mgc"], hand, rtol=1e-6, atol=1e-8)
    assert len(hist) == 1 and np.isfinite(hist[0])


def test_em_improves_evidence(voice_state):
    """The pgtype-1 EM is a likelihood ascent: the chain evidence of the
    trajectory must be non-decreasing over iterations."""
    st, utts = voice_state
    labels = utts[1][1]
    _, _, _, hist = pgen.generate_em(st.clustered, labels, n_iters=4,
                                     max_dur=40, n_win=1)
    assert len(hist) == 4
    assert hist[-1] >= hist[0] - 1e-6


def test_aligned_duration_generation(voice_state):
    """frame_params under explicit durations (HMGenS -m model alignment)
    reproduces the chain expansion exactly."""
    st, utts = voice_state
    labels = utts[2][1]
    durs = pgen.state_durations(st.clustered, labels)
    fp = pgen.frame_params(st.clustered, labels, durs)
    T = int(durs.sum())
    assert fp.means["mgc"].shape[0] == T
    assert fp.frame_state.shape == (T,)
    # frame k of state j carries state j's tied mean
    k0 = int(durs[:4].sum())  # first frame of chain state 4
    ctx, s = labels[1], 1     # chain state 4 = label 1, state 1
    mean, _, _ = st.clustered.state_params(ctx, s)["mgc"]
    np.testing.assert_allclose(fp.means["mgc"][k0], mean)

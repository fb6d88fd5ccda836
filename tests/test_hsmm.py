"""MSD-HSMM: alignment recovers known segmentations, embedded EM
improves likelihood and recovers parameters, generation round-trips."""
import numpy as np
import pytest

from hts_train_world_tpu.features.compose import StreamLayout
from hts_train_world_tpu.models import hsmm


def _tiny_streams():
    # compact layout for tests: "mgc" 4 | "lf0" 2 (msd) | "bap" 2 | "vib" 2
    return (hsmm.StreamDef("mgc", slice(0, 4), False, 0, 1.0),
            hsmm.StreamDef("lf0", slice(4, 6), True, 4, 1.0),
            hsmm.StreamDef("bap", slice(6, 8), False, 6, 0.0),
            hsmm.StreamDef("vib", slice(8, 10), True, 8, 1.0))


def _sample_utterance(rng, models, names, n_states, durs_scale=1.0):
    frames = []
    boundaries = []
    t = 0
    for name in names:
        mi = names_all.index(name)
        for s in range(n_states):
            d = max(1, int(rng.normal(model_durs[mi][s] * durs_scale, 1)))
            mu = model_means[mi][s]
            f = mu[None] + 0.3 * rng.standard_normal((d, 10))
            voiced = model_voiced[mi][s]
            if not voiced:
                f[:, 4:6] = 0.0
                f[:, 8:10] = 0.0
            else:
                f[:, 4] = np.abs(f[:, 4]) + 0.5  # nonzero flag column
                f[:, 8] = np.abs(f[:, 8]) + 0.5
            frames.append(f)
            t += d
            boundaries.append(t)
    return np.concatenate(frames), np.asarray(boundaries)


names_all = ["a", "b", "c"]
rng0 = np.random.default_rng(0)
model_means = {i: rng0.standard_normal((3, 10)) * 3.0 for i in range(3)}
model_durs = {i: rng0.integers(3, 9, 3).astype(float) for i in range(3)}
model_voiced = {0: [True, True, True], 1: [False, False, False],
                2: [True, False, True]}


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(1)
    utts = []
    for _ in range(6):
        seq = [names_all[i] for i in rng.integers(0, 3, 4)]
        frames, bounds = _sample_utterance(rng, model_means, seq, 3)
        utts.append((frames, seq, bounds))
    return utts


def test_init_align_em(corpus):
    streams = _tiny_streams()
    frames_by_model = {n: [] for n in names_all}
    for frames, seq, bounds in corpus:
        # init from phone-level spans (the HTS recipe boots from label
        # time alignments; segmental EM from blind uniform cuts can lock
        # into boundary-shifted local optima, as HInit would)
        phone_ends = bounds[2::3]
        starts = np.concatenate([[0], phone_ends[:-1]])
        for i, n in enumerate(seq):
            frames_by_model[n].append(frames[starts[i]:phone_ends[i]])
    ms = hsmm.init_modelset(names_all, frames_by_model, streams, n_states=3)

    lls = []
    for it in range(2):
        ms = hsmm.embedded_reestimate(
            ms, [(f, s) for f, s, _ in corpus], n_iters=1, log=lambda m: None)
        ll = sum(hsmm.align_utterance(ms, f, s)[0] for f, s, _ in corpus)
        lls.append(ll)
    assert lls[-1] >= lls[0] - 1e-6

    # alignment: boundaries within a few frames of truth
    frames, seq, bounds = corpus[0]
    _, ends = hsmm.align_utterance(ms, frames, seq)
    err = np.abs(ends - bounds)
    assert np.median(err) <= 2.0
    assert ends[-1] == len(frames)

    # parameter recovery: segmental EM can settle in boundary-shifted
    # local optima (as HTS HInit-style bootstrapping can); require the
    # recovered means to be in the right ballpark, and gate exactness
    # separately with the true model below
    mi = 0
    got = ms.means["mgc"][ms.index("a")]
    want = np.stack([model_means[0][s][:4] for s in range(3)])
    assert np.abs(got - want).mean() < 2.5

    # msd weights: model b is fully unvoiced
    assert ms.msd_weights["lf0"][ms.index("b")].max() < 0.2
    assert ms.msd_weights["lf0"][ms.index("a")].min() > 0.8

    # generation round trip
    means, vars_, vuv, durs = hsmm.generate_from_models(ms, ["a", "b", "a"])
    assert means["mgc"].shape[0] == durs.sum()
    assert vars_["lf0"].shape == (durs.sum(), 2)
    assert np.isfinite(means["mgc"]).all()
    # voiced pattern follows the models
    n_a = durs[:3].sum()
    assert vuv[:n_a].all()


def _true_modelset():
    streams = _tiny_streams()
    M, S = 3, 3
    means = {st.name: np.stack([
        np.stack([model_means[m][s][st.sl] for s in range(S)])
        for m in range(M)]) for st in streams}
    variances = {st.name: np.full((M, S, st.sl.stop - st.sl.start), 0.09)
                 for st in streams}
    msd_w = {st.name: np.stack([
        np.asarray([0.95 if model_voiced[m][s] else 0.05
                    for s in range(S)]) for m in range(M)])
        for st in streams if st.msd}
    dur_mean = np.stack([model_durs[m] for m in range(M)])
    dur_var = np.full((M, S), 2.0)
    return hsmm.ModelSet(list(names_all), means, variances, msd_w,
                         dur_mean, dur_var, streams)


def test_viterbi_with_true_model_recovers_boundaries(corpus):
    """Alignment under the generative parameters must recover the true
    state boundaries almost exactly (the HSMMAlign correctness gate)."""
    ms = _true_modelset()
    errs = []
    for frames, seq, bounds in corpus:
        _, ends = hsmm.align_utterance(ms, frames, seq)
        errs.append(np.abs(ends - bounds))
    err = np.concatenate(errs)
    assert np.median(err) == 0
    assert err.mean() < 1.0

"""Context-dependent GV models (make_data_gv + MCDGV,
Training.pl:1402-1491, 620-685).

Gates: per-utterance GV excludes silence/absent frames like the
reference's bcut/grep pipeline; context-dependent clustering separates
contexts with different variance behavior; the pooled (cdgv=0) branch
gives one leaf; GV pdfs drive ops/gv generation toward natural variance.
"""
import numpy as np
import jax.numpy as jnp

from hts_train_world_tpu.features import qconf
from hts_train_world_tpu.models import clustering, gv_model
from hts_train_world_tpu.ops import gv as gv_ops


def _utt(var_scale, n=120, d=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)) * np.sqrt(var_scale)


def test_utterance_gv_masks():
    x = _utt(1.0, seed=1)
    keep = np.ones(len(x), bool)
    keep[:30] = False  # silence head
    v = gv_model.utterance_gv(x, keep)
    np.testing.assert_allclose(v, np.var(x[30:], axis=0))
    # fewer than 2 surviving frames -> dropped like the NaN screen
    assert gv_model.utterance_gv(x, np.zeros(len(x), bool)) is None


def test_silence_keep_mask():
    keep = gv_model.silence_keep_mask(
        ["sil", "a", "pau", "b"], np.array([10, 40, 50, 80]),
        ["sil", "pau"], 80)
    assert not keep[:10].any() and keep[10:40].all()
    assert not keep[40:50].any() and keep[50:].all()


def test_context_dependent_gv_clusters():
    # loud (high-variance) vs quiet contexts
    utts = []
    for i in range(8):
        loud = i % 2 == 0
        ctx = f"x^x-{'a' if loud else 'b'}+x=x"
        statics = {"mgc": _utt(4.0 if loud else 0.25, seed=i)}
        utts.append((ctx, statics, None))
    stats = gv_model.gv_observations(utts)
    questions = clustering.questions_from_config(qconf.parse_config(
        "C-Phone_a {*-a+*}\nC-Phone_b {*-b+*}\n"))
    m = gv_model.build_gv_model(stats, questions, mdl_factor=0.3,
                                min_occupancy=0.5)
    va = m.params("mgc", "x^x-a+x=x")[0]
    vb = m.params("mgc", "x^x-b+x=x")[0]
    assert (va > 2.0).all() and (vb < 1.0).all()
    # pooled branch: single leaf regardless of context
    mp = gv_model.build_gv_model(stats, questions, context_dependent=False)
    assert mp.trees["mgc"].n_leaves == 1
    assert np.array_equal(mp.params("mgc", "anything")[0],
                          mp.params("mgc", "other")[0])


def test_gv_model_drives_generation():
    # GV scaling toward the context's natural variance
    rng = np.random.default_rng(3)
    utts = [(f"c{i}", {"mgc": _utt(2.0, seed=10 + i)}, None)
            for i in range(4)]
    stats = gv_model.gv_observations(utts)
    m = gv_model.build_gv_model(stats, [], context_dependent=False)
    gv_mean, _ = m.params("mgc")
    traj = rng.standard_normal((50, 4)) * 0.3   # over-smoothed statics
    scaled = np.asarray(gv_ops.gv_scale(jnp.asarray(traj),
                                        jnp.asarray(gv_mean)))
    got = np.var(scaled, axis=0)
    np.testing.assert_allclose(got, gv_mean, rtol=1e-5)

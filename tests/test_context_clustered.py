"""Full-context tied-model flow: stats from alignment -> MDL trees ->
tied generation -> voice export."""
import numpy as np

import tests.test_hsmm as th
from hts_train_world_tpu.features import qconf
from hts_train_world_tpu.models import clustering, context_clustered as cc
from hts_train_world_tpu.models import hsmm


def test_cluster_generate_export(tmp_path):
    rng = np.random.default_rng(3)
    # contexts x^x-<phone>+x=x/E:<note>] ; phone drives the acoustics
    utts = []
    for _ in range(6):
        seq = [th.names_all[i] for i in rng.integers(0, 3, 4)]
        frames, bounds = th._sample_utterance(rng, th.model_means, seq, 3)
        ctx = [f"x^x-{n}+x=x/E:{3 + i % 2}]" for i, n in enumerate(seq)]
        utts.append((frames, ctx))

    ms = th._true_modelset()
    stream_stats, msd_stats, dur_stats = cc.collect_context_stats(ms, utts)
    feats = qconf.parse_config("""
C-Phone_a {*-a+*}
C-Phone_b {*-b+*}
C-Phone_c {*-c+*}
C-Note {*/E:%d]*} MIN=0 MAX=7
""")
    questions = clustering.questions_from_config(feats)
    model = cc.build_clustered_model(ms, stream_stats, msd_stats,
                                     dur_stats, questions, mdl_factor=0.5,
                                     min_occupancy=0.5)
    # phone questions should split the mgc trees into >= 2 leaves
    assert model.trees["mgc"][0].n_leaves >= 2
    # tied params for an 'a' context resemble model a's state mean
    mean, var, w = model.state_params("x^x-a+x=x/E:3]", 0)["mgc"], None, None
    got = model.state_params("x^x-a+x=x/E:3]", 0)["mgc"][0]
    want = th.model_means[0][0][:4]
    assert np.abs(got - want).mean() < 0.5
    # model b is unvoiced -> low lf0 weight
    wb = model.state_params("x^x-b+x=x/E:3]", 0)["lf0"][2]
    wa = model.state_params("x^x-a+x=x/E:3]", 0)["lf0"][2]
    assert wb < 0.3 < 0.7 < wa

    means, vars_, vuv, durs = model.generate(
        ["x^x-a+x=x/E:3]", "x^x-b+x=x/E:4]"])
    assert means["mgc"].shape[0] == durs.sum()
    assert vuv[:durs[:3].sum()].all() and not vuv[durs[:3].sum():].any()

    out = tmp_path / "v.htsvoice"
    cc.export_voice(model, str(out), 16000, 80,
                    {"mgc": 4, "lf0": 2, "bap": 2, "vib": 2})
    from hts_train_world_tpu.models.voice import read_htsvoice_header
    hdr = read_htsvoice_header(str(out))
    assert hdr["VOCODER"] == "WORLD"


def test_tied_reestimation_and_recluster():
    """ERST2/UNTIE/CXCL2/ERST4: embedded EM on the tied model improves
    corpus likelihood and the reclustered model still resolves contexts."""
    rng = np.random.default_rng(9)
    utts = []
    for _ in range(6):
        seq = [th.names_all[i] for i in rng.integers(0, 3, 4)]
        frames, bounds = th._sample_utterance(rng, th.model_means, seq, 3)
        ctx = [f"x^x-{n}+x=x/E:{3 + i % 2}]" for i, n in enumerate(seq)]
        utts.append((frames, ctx))
    ms = th._true_modelset()
    ss, msd, ds = cc.collect_context_stats(ms, utts)
    feats = qconf.parse_config("""
C-Phone_a {*-a+*}
C-Phone_b {*-b+*}
C-Phone_c {*-c+*}
""")
    questions = clustering.questions_from_config(feats)
    model = cc.build_clustered_model(ms, ss, msd, ds, questions,
                                     mdl_factor=0.1, min_occupancy=0.5)
    lls = cc.reestimate_clustered(model, utts, n_iters=3,
                                  log=lambda m: None)
    assert len(lls) == 3 and lls[-1] >= lls[0] - 1e-6

    # tied alignment is valid on every utterance
    for frames, ctx in utts:
        _, ends, _ = cc.align_with_clustered(model, frames, ctx)
        assert ends[-1] == len(frames) and np.all(np.diff(ends) >= 1)

    # UNTIE -> CXCL2 round
    ss2, msd2, ds2 = cc.collect_context_stats_tied(model, utts)
    model2 = cc.build_clustered_model(ms, ss2, msd2, ds2, questions,
                                      mdl_factor=0.1, min_occupancy=0.5)
    lls2 = cc.reestimate_clustered(model2, utts, n_iters=2,
                                   log=lambda m: None)
    assert np.isfinite(lls2).all()
    # reclustered model still separates voiced/unvoiced phones
    wa = model2.state_params("x^x-a+x=x/E:3]", 0)["lf0"][2]
    wb = model2.state_params("x^x-b+x=x/E:3]", 0)["lf0"][2]
    assert wb < 0.5 < wa

"""End-to-end HMM recipe driver (models/recipe.py) — the Training.pl
equivalent: bootstrap -> embedded BW (plain + DAEM) -> SEMIT -> UPMIX ->
clustering -> alignment, all from one config."""
import numpy as np

import tests.test_hsmm as th
from hts_train_world_tpu.features import qconf
from hts_train_world_tpu.models import clustering, recipe


def _corpus(rng, n=6):
    utts, spans = [], {}
    for ui in range(n):
        seq = [th.names_all[i] for i in rng.integers(0, 3, 4)]
        frames, bounds = th._sample_utterance(rng, th.model_means, seq, 3)
        ctx = [f"x^x-{p}+x=x/E:{3 + i % 2}]" for i, p in enumerate(seq)]
        utts.append((frames, ctx))
        spans[ui] = bounds[2::3]
    return utts, spans


def _questions():
    feats = qconf.parse_config("""
C-Phone_a {*-a+*}
C-Phone_b {*-b+*}
C-Phone_c {*-c+*}
C-Note {*/E:%d]*} MIN=0 MAX=7
""")
    return clustering.questions_from_config(feats)


def test_recipe_plain(tmp_path):
    rng = np.random.default_rng(2)
    utts, spans = _corpus(rng)
    cfg = recipe.RecipeConfig(n_states=3, n_iters=2, max_dur=40,
                              mdl_factor=0.5, min_occupancy=0.5)
    st = recipe.train_voice(utts, _questions(), cfg,
                            streams=th._tiny_streams(),
                            bootstrap_spans=spans, log=lambda m: None)
    assert st.monophone is not None and st.clustered is not None
    assert st.mixture is None and st.semitied is None
    # clustering split on phones; alignment covers every utterance
    assert st.clustered.trees["mgc"][0].n_leaves >= 2
    for ui, (frames, _) in enumerate(utts):
        assert st.alignments[ui][-1] == len(frames)
    # monophone model b is unvoiced
    ms = st.monophone
    assert ms.msd_weights["lf0"][ms.index("b")].max() < 0.2


def test_recipe_all_variants():
    rng = np.random.default_rng(4)
    utts, spans = _corpus(rng)
    cfg = recipe.RecipeConfig(n_states=3, n_iters=1, max_dur=40,
                              daem=True, daem_n_iter=2,
                              upmix=True, upmix_iters=1,
                              semitied=True, semitied_iters=5,
                              mdl_factor=0.5, min_occupancy=0.5)
    st = recipe.train_voice(utts, _questions(), cfg,
                            streams=th._tiny_streams(),
                            bootstrap_spans=spans, log=lambda m: None)
    assert st.mixture is not None and st.mixture.n_comps == 2
    assert st.semitied is not None and "mgc" in st.semitied.transforms
    assert any("DAEM" in m for m in st.log_history)
    assert any("SEMIT" in m for m in st.log_history)
    # mixture generation still produces a full parameter track
    from hts_train_world_tpu.models import hsmm_variants as hv
    means, vars_, vuv, durs = hv.generate_from_models_mix(
        st.mixture, ["a", "b"])
    assert means["mgc"].shape[0] == durs.sum()
    assert np.isfinite(means["mgc"]).all()

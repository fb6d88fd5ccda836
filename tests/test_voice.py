"""Voice packaging: htsvoice container structure + payload positions."""
import numpy as np

from hts_train_world_tpu.models import clustering, voice


def _tree(dim, n_leaves):
    rng = np.random.default_rng(dim * 7 + n_leaves)
    if n_leaves == 1:
        return clustering.Tree(clustering.Node(leaf_id=0),
                               [(rng.standard_normal(dim),
                                 np.abs(rng.standard_normal(dim)) + 0.1)])
    q = clustering.Question("C-a", ["*-a+*"])
    leaves = [(rng.standard_normal(dim),
               np.abs(rng.standard_normal(dim)) + 0.1)
              for _ in range(2)]
    root = clustering.Node(q, clustering.Node(leaf_id=0),
                           clustering.Node(leaf_id=1))
    return clustering.Tree(root, leaves)


def test_export_and_positions(tmp_path):
    n_states = 3
    streams = [
        voice.StreamPack("mgc", 50, False, 3,
                         [_tree(150, 2) for _ in range(n_states)]),
        voice.StreamPack("lf0", 2, True, 3,
                         [_tree(6, 2) for _ in range(n_states)],
                         msd_weights=[np.array([0.9, 0.2])] * n_states),
        voice.StreamPack("bap", 25, False, 3,
                         [_tree(75, 1) for _ in range(n_states)]),
        voice.StreamPack("vib", 2, True, 3,
                         [_tree(6, 1) for _ in range(n_states)],
                         msd_weights=[np.array([0.5])] * n_states),
    ]
    dur = voice.StreamPack("dur", n_states, False, 1,
                           [_tree(n_states, 2)])
    p = tmp_path / "test.htsvoice"
    voice.export_htsvoice(str(p), 48000, 240, n_states, streams, dur)
    hdr = voice.read_htsvoice_header(str(p))
    assert hdr["HTS_VOICE_VERSION"] == "1.0"
    assert hdr["VOCODER"] == "WORLD"
    assert hdr["STREAM_TYPE"] == "MGC,LF0,BAP,VIB"
    assert hdr["VECTOR_LENGTH[MGC]"] == "50"
    assert hdr["IS_MSD[LF0]"] == "1"
    # positions must tile the payload contiguously
    data = open(p, "rb").read()
    body = data[data.index(b"[DATA]\n") + 7:]
    spans = []
    for k, v in hdr.items():
        if "-" in v and (k.startswith("STREAM_") or k.startswith("DURATION")):
            s, e = v.split("-")
            spans.append((int(s), int(e)))
    spans.sort()
    assert spans[0][0] == 0
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 == e1 + 1
    assert spans[-1][1] == len(body) - 1


def test_voice_roundtrip(tmp_path):
    """Export -> load must reproduce tied lookups exactly."""
    import numpy as np
    from hts_train_world_tpu.models import voice
    n_states = 2
    streams = [
        voice.StreamPack("mgc", 4, False, 3,
                         [_tree(12, 2), _tree(12, 1)]),
        voice.StreamPack("lf0", 2, True, 3,
                         [_tree(6, 2), _tree(6, 2)],
                         msd_weights=[np.array([0.9, 0.2]),
                                      np.array([0.7, 0.4])]),
    ]
    dur = voice.StreamPack("dur", n_states, False, 1, [_tree(n_states, 2)])
    p = tmp_path / "rt.htsvoice"
    voice.export_htsvoice(str(p), 16000, 80, n_states, streams, dur)
    loaded = voice.load_htsvoice(str(p))
    assert set(loaded["streams"]) == {"mgc", "lf0"}
    for st in streams:
        got = loaded["streams"][st.name]
        assert len(got["trees"]) == n_states
        for s in range(n_states):
            src = st.trees[s]
            dst = got["trees"][s]
            assert dst.n_leaves == src.n_leaves
            for ctx in ("x^x-a+x", "x^x-k+x"):
                li_s, li_d = src.leaf_of(ctx), dst.leaf_of(ctx)
                np.testing.assert_allclose(dst.leaf_params[li_d][0],
                                           src.leaf_params[li_s][0],
                                           rtol=1e-6)
            if st.is_msd:
                np.testing.assert_allclose(got["msd_weights"][s],
                                           st.msd_weights[s], atol=1e-6)

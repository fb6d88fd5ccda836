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

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
        if "-" in v and (k.startswith("STREAM_") or k.startswith("DURATION")
                         or k.startswith("GV_")):
            for r in v.split(","):
                s, e = r.split("-")
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


def test_gv_sections_roundtrip(tmp_path):
    """GV_PDF/GV_TREE export + loader round trip (Training.pl:2496-2516)."""
    n_states = 2
    streams = [
        voice.StreamPack("mgc", 4, False, 3,
                         [_tree(12, 2), _tree(12, 1)],
                         use_gv=True, gv_tree=_tree(4, 2)),
        voice.StreamPack("lf0", 1, True, 3,
                         [_tree(3, 2), _tree(3, 2)],
                         msd_weights=[np.array([0.9, 0.2]),
                                      np.array([0.7, 0.4])],
                         use_gv=True, gv_tree=_tree(1, 1)),
    ]
    dur = voice.StreamPack("dur", n_states, False, 1, [_tree(n_states, 2)])
    p = tmp_path / "gv.htsvoice"
    voice.export_htsvoice(str(p), 16000, 80, n_states, streams, dur,
                          gv_off_context=("sil", "pau"))
    hdr = voice.read_htsvoice_header(str(p))
    assert hdr["USE_GV[MGC]"] == "1" and hdr["USE_GV[LF0]"] == "1"
    assert hdr["GV_OFF_CONTEXT"] == '"*-sil+*","*-pau+*"'
    loaded = voice.load_htsvoice(str(p))
    for st in streams:
        gv = loaded["streams"][st.name]["gv_tree"]
        assert gv is not None and gv.n_leaves == st.gv_tree.n_leaves
        for ctx in ("x^x-a+x", "x^x-k+x"):
            src = st.gv_tree.leaf_params[st.gv_tree.leaf_of(ctx)]
            dst = gv.leaf_params[gv.leaf_of(ctx)]
            np.testing.assert_allclose(dst[0], src[0], rtol=1e-6)
            np.testing.assert_allclose(dst[1], src[1], rtol=1e-6)
        # loaded delta windows reproduce the shipped win files
        assert loaded["streams"][st.name]["windows"] == [
            (1.0,), (-0.5, 0.0, 0.5), (1.0, -2.0, 1.0)]


def test_header_matches_training_pl_convention(tmp_path):
    """Byte-convention gate: the exported header must equal a golden
    built by transcribing make_htsvoice's print statements literally
    (Training.pl:2303-2609) — [GLOBAL] line order incl. the blank
    GV_OFF_CONTEXT line and empty COMMENT, [STREAM] grouping, and the
    [POSITION] order DURATION_PDF/TREE -> per-stream WIN (per-window
    ranges) -> all PDFs -> all TREEs -> GV PDFs -> GV TREEs."""
    import struct
    n_states = 2
    streams = [
        voice.StreamPack("mgc", 4, False, 3,
                         [_tree(12, 2), _tree(12, 1)],
                         use_gv=True, option="ALPHA=0.42,GAMMA=0,LN_GAIN=1",
                         gv_tree=_tree(4, 2)),
        voice.StreamPack("lf0", 1, True, 3,
                         [_tree(3, 2), _tree(3, 2)],
                         msd_weights=[np.array([0.9, 0.2]),
                                      np.array([0.7, 0.4])],
                         use_gv=True, gv_tree=_tree(1, 1)),
    ]
    dur = voice.StreamPack("dur", n_states, False, 1, [_tree(n_states, 2)])
    p = tmp_path / "conv.htsvoice"
    voice.export_htsvoice(str(p), 48000, 240, n_states, streams, dur)
    data = open(str(p), "rb").read()
    header = data[:data.index(b"[DATA]\n") + 7].decode()

    # --- independent transcription of make_htsvoice ---------------------
    # payload sizes computed from first principles (hts_engine pdf layout:
    # int32 count per tree, then per leaf float32 [mean|var(|w,1-w)]);
    # win files are the literal data/win/*.win bytes; tree text sizes are
    # taken from the tree serializer (format proven by the round trips).
    def pdf_size(trees, dim, msd):
        per_leaf = (2 * dim + (2 if msd else 0)) * 4
        return 4 * len(trees) + sum(t.n_leaves for t in trees) * per_leaf

    win_bytes = [b"1 1.0\n", b"3 -0.5 0.0 0.5\n", b"3 1.0 -2.0 1.0\n"]
    from hts_train_world_tpu.models.voice import _pdf_payload, _tree_payload

    lines = ["[GLOBAL]", "HTS_VOICE_VERSION:1.0",
             "SAMPLING_FREQUENCY:48000", "FRAME_PERIOD:240",
             "NUM_STATES:2", "NUM_STREAMS:2", "STREAM_TYPE:MGC,LF0",
             "FULLCONTEXT_FORMAT:HTS_TTS_JPN", "FULLCONTEXT_VERSION:1.0",
             "VOCODER:WORLD",
             "",            # the unconditional newline after GV_OFF_CONTEXT
             "COMMENT:",
             "[STREAM]",
             "VECTOR_LENGTH[MGC]:4", "VECTOR_LENGTH[LF0]:1",
             "IS_MSD[MGC]:0", "IS_MSD[LF0]:1",
             "NUM_WINDOWS[MGC]:3", "NUM_WINDOWS[LF0]:3",
             "USE_GV[MGC]:1", "USE_GV[LF0]:1",
             "OPTION[MGC]:ALPHA=0.42,GAMMA=0,LN_GAIN=1", "OPTION[LF0]:",
             "[POSITION]"]
    pos = [0]

    def rng(size):
        s = pos[0]
        pos[0] += size
        return f"{s}-{s + size - 1}"

    lines.append("DURATION_PDF:" + rng(pdf_size(dur.trees, 2, False)))
    lines.append("DURATION_TREE:" + rng(len(_tree_payload(dur.trees,
                                                          "dur"))))
    for st, tag in ((streams[0], "MGC"), (streams[1], "LF0")):
        lines.append(f"STREAM_WIN[{tag}]:" + ",".join(
            rng(len(w)) for w in win_bytes))
    for st, tag, dim in ((streams[0], "MGC", 12), (streams[1], "LF0", 3)):
        lines.append(f"STREAM_PDF[{tag}]:"
                     + rng(pdf_size(st.trees, dim, st.is_msd)))
    for st, tag in ((streams[0], "MGC"), (streams[1], "LF0")):
        lines.append(f"STREAM_TREE[{tag}]:"
                     + rng(len(_tree_payload(st.trees, st.name))))
    for st, tag, gdim in ((streams[0], "MGC", 4), (streams[1], "LF0", 1)):
        lines.append(f"GV_PDF[{tag}]:"
                     + rng(pdf_size([st.gv_tree], gdim, False)))
    for st, tag in ((streams[0], "MGC"), (streams[1], "LF0")):
        lines.append(f"GV_TREE[{tag}]:"
                     + rng(len(_tree_payload([st.gv_tree],
                                             f"gv-{st.name}"))))
    lines.append("[DATA]")
    golden = "\n".join(lines) + "\n"
    assert header == golden
    # and the win payloads are byte-identical to the shipped files
    body = data[data.index(b"[DATA]\n") + 7:]
    hdr = voice.read_htsvoice_header(str(p))
    got = b"".join(body[int(r.split("-")[0]):int(r.split("-")[1]) + 1]
                   for r in hdr["STREAM_WIN[MGC]"].split(","))
    assert got == b"".join(win_bytes)

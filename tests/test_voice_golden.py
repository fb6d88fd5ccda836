"""Independent structural golden for the `.htsvoice` container.

Everything here is derived directly from the make_htsvoice layout
(Training.pl:2303-2609: [GLOBAL] line order :2327-2352, [STREAM] block
order :2354-2373, [POSITION] tag order + byte ranges :2375-2440, GV pdf
blocks :2496-2516) and the hts_engine pdf conventions — WITHOUT calling
any of models/voice.py's writer helpers — so a self-consistent-but-wrong
writer/reader pair cannot pass."""
import struct

import numpy as np
import pytest

from hts_train_world_tpu.models.clustering import Node, Question, Tree
from hts_train_world_tpu.models import voice


def _leaf_tree(means):
    """Single-leaf tree per state with known params."""
    return Tree(Node(leaf_id=0), [(np.asarray(m, float),
                                   np.ones(len(m))) for m in means])


def _tiny_voice(tmp_path):
    n_states = 2
    mgc_trees = [_leaf_tree([[1.0, 2.0, 3.0]]), _leaf_tree([[4.0, 5.0, 6.0]])]
    lf0_trees = [_leaf_tree([[0.5]]), _leaf_tree([[0.25]])]
    gv_tree = _leaf_tree([[9.0, 8.0, 7.0]])
    dur_trees = [_leaf_tree([[3.0, 4.0]])]
    streams = [
        voice.StreamPack("mgc", 3, False, 3, mgc_trees, use_gv=True,
                         gv_tree=gv_tree),
        voice.StreamPack("lf0", 1, True, 3, lf0_trees,
                         msd_weights=[np.asarray([0.9]),
                                      np.asarray([0.8])]),
    ]
    dur = voice.StreamPack("dur", n_states, False, 1, dur_trees)
    p = str(tmp_path / "tiny.htsvoice")
    voice.export_htsvoice(p, 48000, 240, n_states, streams, dur)
    return p, n_states


def test_container_structure_matches_trainingpl_layout(tmp_path):
    p, n_states = _tiny_voice(tmp_path)
    raw = open(p, "rb").read()

    # ---- header/DATA split (hts_engine reads up to the [DATA] marker)
    marker = raw.index(b"[DATA]\n")
    header = raw[:marker + 7].decode()
    body = raw[marker + 7:]
    lines = header.splitlines()

    # ---- [GLOBAL] line order, Training.pl:2327-2352
    gi = lines.index("[GLOBAL]")
    expect_global = [
        "HTS_VOICE_VERSION:1.0",
        "SAMPLING_FREQUENCY:48000",
        "FRAME_PERIOD:240",
        "NUM_STATES:2",
        "NUM_STREAMS:2",
        "STREAM_TYPE:MGC,LF0",
        "FULLCONTEXT_FORMAT:HTS_TTS_JPN",
        "FULLCONTEXT_VERSION:1.0",
        "VOCODER:WORLD",
        "",             # GV_OFF_CONTEXT printed blank when nosilgv off
        "COMMENT:",
    ]
    assert lines[gi + 1:gi + 1 + len(expect_global)] == expect_global

    # ---- [STREAM] block order, :2354-2373
    si = lines.index("[STREAM]")
    assert lines[si + 1:si + 11] == [
        "VECTOR_LENGTH[MGC]:3", "VECTOR_LENGTH[LF0]:1",
        "IS_MSD[MGC]:0", "IS_MSD[LF0]:1",
        "NUM_WINDOWS[MGC]:3", "NUM_WINDOWS[LF0]:3",
        "USE_GV[MGC]:1", "USE_GV[LF0]:0",
        "OPTION[MGC]:", "OPTION[LF0]:",
    ]

    # ---- [POSITION] tag order, :2375-2440
    pi = lines.index("[POSITION]")
    pos_lines = lines[pi + 1:lines.index("[DATA]")]
    tags = [ln.split(":", 1)[0] for ln in pos_lines]
    assert tags == [
        "DURATION_PDF", "DURATION_TREE",
        "STREAM_WIN[MGC]", "STREAM_WIN[LF0]",
        "STREAM_PDF[MGC]", "STREAM_PDF[LF0]",
        "STREAM_TREE[MGC]", "STREAM_TREE[LF0]",
        "GV_PDF[MGC]", "GV_TREE[MGC]",
    ]

    # ---- byte ranges: contiguous from 0, covering the body exactly
    ranges = []
    for ln in pos_lines:
        for r in ln.split(":", 1)[1].split(","):
            s, e = (int(v) for v in r.split("-"))
            ranges.append((s, e))
    cursor = 0
    for s, e in ranges:
        assert s == cursor and e >= s, (s, e, cursor)
        cursor = e + 1
    assert cursor == len(body)

    pos = {ln.split(":", 1)[0]: ln.split(":", 1)[1] for ln in pos_lines}

    def grab(tag, idx=0):
        s, e = (int(v) for v in pos[tag].split(",")[idx].split("-"))
        return body[s:e + 1]

    # ---- duration pdf: S leaf-count int32s then f32 [mean|var] rows
    # (hts_engine pdf convention; dur vector length = n_states)
    exp_dur = struct.pack("<i", 1) + np.asarray(
        [3.0, 4.0, 1.0, 1.0], "<f4").tobytes()
    assert grab("DURATION_PDF") == exp_dur

    # ---- window payloads: the literal data/win/*.win file bytes
    assert grab("STREAM_WIN[MGC]", 0) == b"1 1.0\n"
    assert grab("STREAM_WIN[MGC]", 1) == b"3 -0.5 0.0 0.5\n"
    assert grab("STREAM_WIN[MGC]", 2) == b"3 1.0 -2.0 1.0\n"

    # ---- stream pdfs: counts-per-state then per-leaf
    # [mean | var (| w, 1-w for MSD)] float32 rows
    exp_mgc = (struct.pack("<ii", 1, 1)
               + np.asarray([1, 2, 3, 1, 1, 1], "<f4").tobytes()
               + np.asarray([4, 5, 6, 1, 1, 1], "<f4").tobytes())
    assert grab("STREAM_PDF[MGC]") == exp_mgc
    exp_lf0 = (struct.pack("<ii", 1, 1)
               + np.asarray([0.5, 1.0, 0.9, 0.1], "<f4").tobytes()
               + np.asarray([0.25, 1.0, 0.8, 0.2], "<f4").tobytes())
    assert grab("STREAM_PDF[LF0]") == exp_lf0

    # ---- GV pdf block (Training.pl:2496-2516): single state
    exp_gv = struct.pack("<i", 1) + np.asarray(
        [9, 8, 7, 1, 1, 1], "<f4").tobytes()
    assert grab("GV_PDF[MGC]") == exp_gv

    # ---- tree payloads are ASCII HHEd text naming the right stream
    assert b"mgc" in grab("STREAM_TREE[MGC]")
    assert grab("STREAM_TREE[MGC]").decode().strip()


def test_reader_round_trip_and_fuzz(tmp_path):
    p, _ = _tiny_voice(tmp_path)
    v = voice.load_htsvoice(p)
    assert set(v["streams"]) == {"mgc", "lf0"}
    np.testing.assert_allclose(
        v["streams"]["mgc"]["trees"][0].leaf_params[0][0], [1, 2, 3])
    np.testing.assert_allclose(v["streams"]["lf0"]["msd_weights"][1],
                               [0.8], atol=1e-6)
    np.testing.assert_allclose(
        v["streams"]["mgc"]["gv_tree"].leaf_params[0][0], [9, 8, 7])
    assert v["streams"]["mgc"]["windows"][1] == (-0.5, 0.0, 0.5)

    raw = open(p, "rb").read()
    marker = raw.index(b"[DATA]\n") + 7

    # truncation anywhere in DATA must raise, not mis-load
    for cut in (marker + 1, marker + 9, len(raw) - 5, len(raw) - 1):
        q = str(tmp_path / f"cut{cut}.htsvoice")
        open(q, "wb").write(raw[:cut])
        with pytest.raises((ValueError, struct.error)):
            voice.load_htsvoice(q)

    # POSITION line reorder: tag-keyed lookup must still load identically
    head = raw[:marker].decode()
    lines = head.splitlines()
    pi = lines.index("[POSITION]")
    di = lines.index("[DATA]")
    reordered = (lines[:pi + 1] + list(reversed(lines[pi + 1:di]))
                 + lines[di:])
    q = str(tmp_path / "reorder.htsvoice")
    open(q, "wb").write(("\n".join(reordered) + "\n").encode()
                        + raw[marker:])
    v2 = voice.load_htsvoice(q)
    np.testing.assert_allclose(
        v2["streams"]["mgc"]["trees"][1].leaf_params[0][0], [4, 5, 6])

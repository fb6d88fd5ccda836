"""Voice packaging — the make_htsvoice equivalent (Training.pl:2303-2609,
SURVEY.md T6): one `.htsvoice` file with [GLOBAL]/[STREAM]/[POSITION]
sections and concatenated binary payloads (duration pdf/tree, per-stream
pdfs/trees, delta windows, optional GV pdfs).

The container layout (section headers, POSITION byte ranges, VOCODER:WORLD
tag) follows the reference exactly; payloads use the hts_engine
conventions: trees in HHEd text form, pdfs as little-endian float32 blocks
of [mean | variance (| msd-weight)] per leaf per state, preceded by an
int32 leaf count per state.
"""
from __future__ import annotations

import dataclasses
import io
import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

from hts_train_world_tpu.models.clustering import Tree, tree_to_hts_text

STREAM_NAMES = {"mgc": "MGC", "lf0": "LF0", "bap": "BAP", "vib": "VIB",
                "dur": "DUR"}


@dataclasses.dataclass
class StreamPack:
    name: str                     # mgc | lf0 | bap | vib
    vector_length: int            # static order (e.g. 50 for mgc)
    is_msd: bool
    n_windows: int
    trees: List[Tree]             # one per state
    msd_weights: Optional[List[np.ndarray]] = None  # per state, per leaf
    use_gv: bool = False
    option: str = ""


def _pdf_payload(trees: Sequence[Tree], msd_weights=None) -> bytes:
    buf = io.BytesIO()
    for tree in trees:
        buf.write(struct.pack("<i", tree.n_leaves))
    for s, tree in enumerate(trees):
        for li, (mean, var) in enumerate(tree.leaf_params):
            buf.write(np.asarray(mean, "<f4").tobytes())
            buf.write(np.asarray(var, "<f4").tobytes())
            if msd_weights is not None:
                w = float(msd_weights[s][li])
                buf.write(struct.pack("<ff", w, 1.0 - w))
    return buf.getvalue()


def _tree_payload(trees: Sequence[Tree], name: str) -> bytes:
    return "".join(tree_to_hts_text(t, name, s)
                   for s, t in enumerate(trees)).encode()


def _window_payload(windows) -> bytes:
    out = []
    for w in windows:
        out.append((f"{len(w)} " + " ".join(f"{v:g}" for v in w)).encode())
    return b"\n".join(out) + b"\n"


def export_htsvoice(path: str, fs: int, frame_shift: int, n_states: int,
                    streams: Sequence[StreamPack], dur: StreamPack,
                    windows=((1.0,), (-0.5, 0.0, 0.5), (1.0, -2.0, 1.0)),
                    fullcontext_format: str = "HTS_TTS_JPN",
                    fullcontext_version: str = "1.0",
                    gv_off_context: Sequence[str] = ()) -> None:
    payloads: List[bytes] = []
    positions: List[str] = []

    def add(tag: str, data: bytes):
        start = sum(len(p) for p in payloads)
        payloads.append(data)
        positions.append(f"{tag}:{start}-{start + len(data) - 1}")

    add("DURATION_PDF", _pdf_payload(dur.trees))
    add("DURATION_TREE", _tree_payload(dur.trees, "dur"))
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        add(f"STREAM_WIN[{tag}]", _window_payload(windows[:st.n_windows]))
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        add(f"STREAM_PDF[{tag}]",
            _pdf_payload(st.trees,
                         st.msd_weights if st.is_msd else None))
        add(f"STREAM_TREE[{tag}]", _tree_payload(st.trees, st.name))

    header = io.StringIO()
    header.write("[GLOBAL]\n")
    header.write("HTS_VOICE_VERSION:1.0\n")
    header.write(f"SAMPLING_FREQUENCY:{fs}\n")
    header.write(f"FRAME_PERIOD:{frame_shift}\n")
    header.write(f"NUM_STATES:{n_states}\n")
    header.write(f"NUM_STREAMS:{len(streams)}\n")
    header.write("STREAM_TYPE:" + ",".join(
        STREAM_NAMES.get(s.name, s.name.upper()) for s in streams) + "\n")
    header.write(f"FULLCONTEXT_FORMAT:{fullcontext_format}\n")
    header.write(f"FULLCONTEXT_VERSION:{fullcontext_version}\n")
    header.write("VOCODER:WORLD\n")
    if gv_off_context:
        header.write("GV_OFF_CONTEXT:" + ",".join(
            f'"*-{s}+*"' for s in gv_off_context) + "\n")
    header.write("COMMENT:hts_train_world_tpu\n")
    header.write("[STREAM]\n")
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        header.write(f"VECTOR_LENGTH[{tag}]:{st.vector_length}\n")
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        header.write(f"IS_MSD[{tag}]:{int(st.is_msd)}\n")
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        header.write(f"NUM_WINDOWS[{tag}]:{st.n_windows}\n")
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        header.write(f"USE_GV[{tag}]:{int(st.use_gv)}\n")
    for st in streams:
        tag = STREAM_NAMES.get(st.name, st.name.upper())
        header.write(f"OPTION[{tag}]:{st.option}\n")
    header.write("[POSITION]\n")
    for p in positions:
        header.write(p + "\n")
    header.write("[DATA]\n")

    with open(path, "wb") as f:
        f.write(header.getvalue().encode())
        for p in payloads:
            f.write(p)


def read_htsvoice_header(path: str) -> Dict[str, str]:
    """Parse the text header back (sanity / tests)."""
    out = {}
    with open(path, "rb") as f:
        data = f.read()
    text = data[:data.index(b"[DATA]\n") + 7].decode()
    for line in text.splitlines():
        if ":" in line and not line.startswith("["):
            k, v = line.split(":", 1)
            out[k] = v
    return out

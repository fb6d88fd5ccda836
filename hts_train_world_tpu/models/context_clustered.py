"""Context-dependent tied models — the HTS full-context flow
(Training.pl MN2FL/CXCL/ERST/FALGN/CONVM stages, SURVEY.md T3):
monophone bootstrap -> full-context statistics from alignments ->
per-(stream, state) MDL tree clustering -> tied parameter lookup ->
HMGenS-style generation and .htsvoice export.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Sequence

import numpy as np

from hts_train_world_tpu.models import clustering, hsmm, voice

_PHONE_RE = re.compile(r"-(.+?)\+")


def phone_of(context: str) -> str:
    m = _PHONE_RE.search(context)
    return m.group(1) if m else context


@dataclasses.dataclass
class ClusteredModel:
    streams: Sequence[hsmm.StreamDef]
    n_states: int
    trees: Dict[str, List[clustering.Tree]]       # stream -> per-state
    dur_trees: List[clustering.Tree]              # per-state (dim 1)
    msd_weights: Dict[str, List[np.ndarray]]      # stream -> per-state/leaf

    def state_params(self, context: str, state: int):
        out = {}
        for st in self.streams:
            tree = self.trees[st.name][state]
            leaf = tree.leaf_of(context)
            mean, var = tree.leaf_params[leaf]
            w = (self.msd_weights[st.name][state][leaf]
                 if st.msd else 1.0)
            out[st.name] = (mean, var, w)
        return out

    def duration(self, context: str, state: int):
        tree = self.dur_trees[state]
        mean, var = tree.leaf_params[tree.leaf_of(context)]
        return float(mean[0]), float(var[0])

    def generate(self, label_seq: Sequence[str], speaking_rate: float = 1.0):
        """Frame-level means/vars per stream + V/UV, MLPG-ready."""
        means = {st.name: [] for st in self.streams}
        vars_ = {st.name: [] for st in self.streams}
        vuv = []
        durs = []
        for ctx in label_seq:
            for s in range(self.n_states):
                dm, _ = self.duration(ctx, s)
                d = max(1, int(round(dm * speaking_rate)))
                durs.append(d)
                params = self.state_params(ctx, s)
                for st in self.streams:
                    mean, var, w = params[st.name]
                    means[st.name].append(np.repeat(mean[None], d, 0))
                    vars_[st.name].append(np.repeat(var[None], d, 0))
                lw = params["lf0"][2] if "lf0" in means else 1.0
                vuv.append(np.full(d, lw > 0.5))
        return ({k: np.concatenate(v) for k, v in means.items()},
                {k: np.concatenate(v) for k, v in vars_.items()},
                np.concatenate(vuv), np.asarray(durs))


def collect_context_stats(modelset: hsmm.ModelSet, utterances,
                          max_dur: int = 40):
    """Align with the (monophone) modelset and accumulate per-(context,
    state) sufficient statistics for every stream + durations.

    utterances: list of (frames, full_context_seq).  Returns
    {stream: [ {context: SuffStats} per state ]}, plus duration stats."""
    S = modelset.n_states
    stream_stats = {st.name: [dict() for _ in range(S)]
                    for st in modelset.streams}
    msd_stats = {st.name: [dict() for _ in range(S)]
                 for st in modelset.streams if st.msd}
    dur_stats = [dict() for _ in range(S)]
    for frames, ctx_seq in utterances:
        mono = [phone_of(c) for c in ctx_seq]
        try:
            _, ends = hsmm.align_utterance(modelset, frames, mono, max_dur)
        except ValueError:
            # utterance shorter than its chain: unalignable, skip (the
            # reference's screening drops such utterances up front,
            # data/Makefile.in:216-238)
            continue
        starts = np.concatenate([[0], ends[:-1]])
        for li, ctx in enumerate(ctx_seq):
            for s in range(S):
                k = li * S + s
                seg = frames[starts[k]:ends[k]]
                d = float(ends[k] - starts[k])
                ds = clustering.SuffStats(1.0, np.array([d]),
                                          np.array([d * d]))
                dur_stats[s][ctx] = (dur_stats[s][ctx] + ds
                                     if ctx in dur_stats[s] else ds)
                for st in modelset.streams:
                    block = seg[:, st.sl]
                    if st.msd:
                        present = seg[:, st.msd_flag_col] != 0.0
                        pres = clustering.SuffStats(
                            float(len(seg)), np.array([present.sum()]),
                            np.array([float(present.sum())]))
                        m = msd_stats[st.name][s]
                        m[ctx] = m[ctx] + pres if ctx in m else pres
                        block = block[present]
                        if not len(block):
                            continue
                    ss = clustering.SuffStats.from_frames(block)
                    d_ = stream_stats[st.name][s]
                    d_[ctx] = d_[ctx] + ss if ctx in d_ else ss
    return stream_stats, msd_stats, dur_stats


def build_clustered_model(modelset: hsmm.ModelSet, stream_stats, msd_stats,
                          dur_stats, questions, mdl_factor: float = 1.0,
                          min_occupancy: float = 1.0) -> ClusteredModel:
    S = modelset.n_states
    trees = {}
    msd_weights = {}
    for st in modelset.streams:
        trees[st.name] = [clustering.cluster_states(
            stream_stats[st.name][s], questions, mdl_factor, min_occupancy)
            for s in range(S)]
        if st.msd:
            per_state = []
            for s in range(S):
                tree = trees[st.name][s]
                # voiced weight per leaf from the msd counts routed
                # through the same tree
                w = np.full(tree.n_leaves, 0.5)
                acc = [[0.0, 0.0] for _ in range(tree.n_leaves)]
                for ctx, ss in msd_stats[st.name][s].items():
                    leaf = tree.leaf_of(ctx)
                    acc[leaf][0] += float(ss.s1[0])
                    acc[leaf][1] += ss.gamma
                for li, (v, n) in enumerate(acc):
                    if n > 0:
                        w[li] = np.clip(v / n, 1e-3, 1 - 1e-3)
                per_state.append(w)
            msd_weights[st.name] = per_state
    dur_trees = [clustering.cluster_states(dur_stats[s], questions,
                                           mdl_factor, min_occupancy)
                 for s in range(S)]
    return ClusteredModel(modelset.streams, S, trees, dur_trees,
                          msd_weights)


def export_voice(model: ClusteredModel, path: str, fs: int,
                 frame_shift: int, static_dims: Dict[str, int]) -> None:
    packs = []
    for st in model.streams:
        packs.append(voice.StreamPack(
            st.name, static_dims.get(st.name, 1), st.msd, 3,
            model.trees[st.name],
            msd_weights=model.msd_weights.get(st.name)))
    dur = voice.StreamPack("dur", model.n_states, False, 1,
                           model.dur_trees)
    voice.export_htsvoice(path, fs, frame_shift, model.n_states, packs, dur)

"""HMM-voice training recipe — the TPU-native Training.pl.

One typed config with the reference's stage switches
(Config.pm.in:310-349) and training knobs (nIte, DAEM, UPMIX, SEMIT,
configure.ac:698-713), and one driver that runs the full HTS flow on
the MSD-HSMM stack:

  IN_RE   init_modelset (HInit/HRest bootstrap from label spans)
  ERST0   monophone embedded re-estimation — full Baum-Welch, plain or
          DAEM-annealed (Training.pl:417-446)
  CXCL/ERST2   full-context stats -> MDL tree clustering -> tied model
  FALGN   Viterbi forced alignment under the CLUSTERED model
          (HSMMAlign on the tied mmf, Training.pl:601-618)
  SEMIT   semi-tied covariance transforms (Training.pl:1017-1035)
  UPMIX/ERST5  1->2 mixture split + embedded mixture EM
          (Training.pl:1076-1098)
  MCDGV   context-dependent GV models from per-utterance static
          variances (Training.pl:620-685, make_data_gv :1402-1491)
  MSPF    modulation-spectrum postfilter statistics from aligned
          generations (Training.pl:687-724, make_mspf :3133-3221)
  PGEN/WGEN  parameter generation + WORLD synthesis for unseen labels
          (synthesize_utterance; Training.pl:730-759)
  CONVM   .htsvoice export incl. GV sections (export;
          Training.pl:761-797)

Each stage is idempotent over an in-memory `RecipeState`; callers can
run stages selectively exactly like the reference's Config.pm switches.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hts_train_world_tpu.models import context_clustered, gv_model, hsmm
from hts_train_world_tpu.models import hsmm_batch as hb
from hts_train_world_tpu.models import hsmm_variants as hv
from hts_train_world_tpu.models import pgen as pgen_mod


@dataclasses.dataclass(frozen=True)
class RecipeConfig:
    """Stage switches + knobs (Config.pm.in:310-349, configure.ac)."""
    n_states: int = 5            # $nState
    n_iters: int = 5             # $nIte embedded EM sweeps
    max_dur: int = 60            # HSMM duration cap (MAXSTDDEVCOEF analog)
    var_floor_scale: float = 0.01   # $vflr
    # DAEM (configure.ac:701-703)
    daem: bool = False
    daem_n_iter: int = 10        # DAEMNITER
    daem_alpha: float = 1.0      # DAEMALPHA
    # clustering (Config.pm.in:69-97)
    mdl_factor: float = 1.0
    min_occupancy: float = 1.0
    # tied-model refinement (ERST2 / UNTIE->CXCL2 / ERST4)
    tied_iters: int = 1          # embedded EM sweeps on the tied model
    recluster: bool = True       # UNTIE + second clustering round
    # variants
    upmix: bool = False          # UPMIX + ERST5
    upmix_iters: int = 2
    semitied: bool = False       # SEMIT
    semitied_iters: int = 20     # MAXSEMITIEDITER
    # E-step flavor for embedded stages
    soft_counts: bool = True     # full BW (HERest) vs segmental (HInit)
    # voice building (MCDGV/MSPF/PGEN/WGEN/CONVM, Training.pl:620-797)
    n_win: int = 3               # delta windows in the cmp layout
    use_gv: bool = True          # $useHmmGV
    cdgv: bool = True            # $cdgv (context-dependent GV trees)
    nosilgv: bool = True         # $nosilgv (drop silence frames from GV)
    silence_phones: Tuple[str, ...] = ("sil", "pau")   # @slnt
    use_mspf: bool = False       # $useMSPF
    mspf_weight: float = 1.0
    pgtype: int = 0              # HMGenS -c {0,1,2}
    postfilter_mcp: float = 0.0  # mcep postfilter strength (ref 1.4)
    alpha: float = 0.42          # frequency warping for the postfilter


@dataclasses.dataclass
class RecipeState:
    monophone: Optional[hsmm.ModelSet] = None
    clustered: Optional[context_clustered.ClusteredModel] = None
    mixture: Optional[hv.MixtureModelSet] = None
    semitied: Optional[hv.SemiTiedModelSet] = None
    alignments: Optional[Dict[int, np.ndarray]] = None
    gv: Optional[gv_model.GVModel] = None
    mspf: Optional[tuple] = None     # (nat, gen) MspfStats
    log_history: List[str] = dataclasses.field(default_factory=list)


def train_voice(corpus, questions, cfg: RecipeConfig = RecipeConfig(),
                streams: Sequence[hsmm.StreamDef] | None = None,
                bootstrap_spans=None, log=print, mesh=None) -> RecipeState:
    """Run the full recipe.

    corpus: list of (frames (T, D), full_context_label_seq).
    questions: clustering questions (features/qconf or models/clustering
    format).  bootstrap_spans: optional {utt_index: phone end frames}
    for HInit-style supervised bootstrapping; uniform cuts otherwise.
    mesh: optional jax Mesh with a "data" axis — the soft-count E-steps
    then shard the corpus batch and psum their accumulators (multi-chip
    HERest).
    """
    streams = tuple(streams or hsmm.world_streams())
    state = RecipeState()

    def say(msg):
        state.log_history.append(msg)
        log(msg)

    # ---- IN_RE: monophone bootstrap --------------------------------
    say("IN_RE: monophone initialization")
    mono_seqs = [[context_clustered.phone_of(c) for c in seq]
                 for _, seq in corpus]
    names = sorted({p for seq in mono_seqs for p in seq})
    frames_by_model: Dict[str, list] = {n: [] for n in names}
    for ui, (frames, _) in enumerate(corpus):
        seq = mono_seqs[ui]
        if bootstrap_spans and ui in bootstrap_spans:
            ends = np.asarray(bootstrap_spans[ui])
        else:
            ends = np.linspace(0, len(frames), len(seq) + 1)[1:].astype(int)
        starts = np.concatenate([[0], ends[:-1]])
        for i, p in enumerate(seq):
            frames_by_model[p].append(frames[starts[i]:ends[i]])
    ms = hsmm.init_modelset(names, frames_by_model, streams,
                            n_states=cfg.n_states,
                            var_floor_scale=cfg.var_floor_scale)

    # ---- ERST0: monophone embedded re-estimation -------------------
    utts_mono = [(f, mono_seqs[ui]) for ui, (f, _) in enumerate(corpus)]
    if cfg.daem:
        say(f"ERST0: DAEM-annealed embedded re-estimation "
            f"({cfg.daem_n_iter} x {cfg.n_iters})")
        hsmm.daem_reestimate(ms, utts_mono, n_outer=cfg.daem_n_iter,
                             n_inner=cfg.n_iters, alpha=cfg.daem_alpha,
                             var_floor_scale=cfg.var_floor_scale,
                             max_dur=cfg.max_dur, log=say,
                             batched=cfg.soft_counts, mesh=mesh)
    elif cfg.soft_counts:
        say("ERST0: embedded re-estimation (batched Baum-Welch)")
        hb.reestimate_modelset_batched(
            ms, utts_mono, n_iters=cfg.n_iters,
            var_floor_scale=cfg.var_floor_scale, max_dur=cfg.max_dur,
            mesh=mesh, log=say)
    else:
        say("ERST0: embedded re-estimation (viterbi)")
        hsmm.embedded_reestimate(ms, utts_mono, n_iters=cfg.n_iters,
                                 var_floor_scale=cfg.var_floor_scale,
                                 max_dur=cfg.max_dur, log=say,
                                 mode="viterbi")
    state.monophone = ms

    # ---- SEMIT ------------------------------------------------------
    if cfg.semitied:
        say("SEMIT: semi-tied covariance transforms")
        # estimate_semitied updates the modelset it is given with
        # transformed-space variances; downstream stages (UPMIX, CXCL,
        # FALGN) consume UNtransformed frames, so they must keep the
        # original-space model — run the estimation on a deepcopy and
        # keep the SemiTiedModelSet as the stage's side product (its
        # transformed_modelset()/transform_frames() pair is the coherent
        # space for semi-tied likelihoods).
        import copy
        state.semitied = hv.estimate_semitied(
            copy.deepcopy(ms), utts_mono, n_iter=cfg.semitied_iters,
            max_dur=cfg.max_dur, var_floor_scale=cfg.var_floor_scale,
            log=say)

    # ---- UPMIX + ERST5 ----------------------------------------------
    if cfg.upmix:
        say("UPMIX: 1 -> 2 mixture components + embedded mixture EM")
        mms = hv.upmix(ms)
        hv.embedded_reestimate_mix(mms, utts_mono,
                                   n_iters=cfg.upmix_iters,
                                   var_floor_scale=cfg.var_floor_scale,
                                   max_dur=cfg.max_dur, log=say)
        state.mixture = mms

    # ---- MN2FL/ERST1/CXCL: full-context clustering -------------------
    say("CXCL: full-context statistics + MDL tree clustering")
    utts_full = [(f, seq) for f, seq in corpus]
    if cfg.soft_counts:
        # reference-true flow (Training.pl:449-494): clone untied
        # full-context models, HERest them, cluster from THEIR counts
        contexts = sorted({c for _, seq in corpus for c in seq})
        full_ms = context_clustered.clone_full_context(ms, contexts)
        stream_stats, msd_stats, dur_stats = \
            context_clustered.collect_context_stats_soft(
                full_ms, utts_full, cfg.max_dur, n_reest=1,
                var_floor_scale=cfg.var_floor_scale, mesh=mesh, log=say)
    else:
        stream_stats, msd_stats, dur_stats = \
            context_clustered.collect_context_stats(ms, utts_full,
                                                    cfg.max_dur)
    state.clustered = context_clustered.build_clustered_model(
        ms, stream_stats, msd_stats, dur_stats, questions,
        mdl_factor=cfg.mdl_factor, min_occupancy=cfg.min_occupancy)

    # ---- ERST2: embedded re-estimation of the tied model -------------
    if cfg.tied_iters > 0:
        if cfg.soft_counts:
            say("ERST2: tied-model re-estimation (batched Baum-Welch)")
            hb.reestimate_clustered_batched(
                state.clustered, utts_full, n_iters=cfg.tied_iters,
                max_dur=cfg.max_dur, var_floor_scale=cfg.var_floor_scale,
                mesh=mesh, log=say)
        else:
            say("ERST2: tied-model embedded re-estimation (viterbi)")
            context_clustered.reestimate_clustered(
                state.clustered, utts_full, n_iters=cfg.tied_iters,
                max_dur=cfg.max_dur, var_floor_scale=cfg.var_floor_scale,
                log=say)

    # ---- UNTIE -> CXCL2 -> ERST4 --------------------------------------
    if cfg.recluster:
        say("UNTIE/CXCL2: untied statistics from the tied model "
            "+ second clustering round")
        if cfg.soft_counts:
            contexts = sorted({c for _, seq in corpus for c in seq})
            untied = context_clustered.clone_from_clustered(
                state.clustered, contexts)
            ss2, ms2_, ds2 = context_clustered.collect_context_stats_soft(
                untied, utts_full, cfg.max_dur, n_reest=1,
                var_floor_scale=cfg.var_floor_scale, mesh=mesh, log=say)
        else:
            ss2, ms2_, ds2 = context_clustered.collect_context_stats_tied(
                state.clustered, utts_full, cfg.max_dur)
        state.clustered = context_clustered.build_clustered_model(
            ms, ss2, ms2_, ds2, questions,
            mdl_factor=cfg.mdl_factor, min_occupancy=cfg.min_occupancy)
        if cfg.tied_iters > 0:
            say("ERST4: re-estimation of the reclustered model")
            if cfg.soft_counts:
                hb.reestimate_clustered_batched(
                    state.clustered, utts_full, n_iters=cfg.tied_iters,
                    max_dur=cfg.max_dur,
                    var_floor_scale=cfg.var_floor_scale, mesh=mesh,
                    log=say)
            else:
                context_clustered.reestimate_clustered(
                    state.clustered, utts_full, n_iters=cfg.tied_iters,
                    max_dur=cfg.max_dur,
                    var_floor_scale=cfg.var_floor_scale, log=say)

    # ---- FALGN: forced alignment under the CLUSTERED model -----------
    # (the reference aligns with the re-estimated tied mmf, not the
    # monophone set: HSMMAlign -H $reclmmf, Training.pl:613)
    say("FALGN: Viterbi forced alignment (clustered model)")
    state.alignments = {}
    for ui, (frames, ctx_seq) in enumerate(corpus):
        try:
            _, ends, _ = context_clustered.align_with_clustered(
                state.clustered, frames, ctx_seq, cfg.max_dur)
        except ValueError as e:
            # drop unalignable utterances like the reference's screening
            # gates (data/Makefile.in:216-238, Training.pl:601-618)
            say(f"FALGN: dropping utt {ui}: {e}")
            continue
        state.alignments[ui] = ends

    # ---- MCDGV: context-dependent GV models ---------------------------
    if cfg.use_gv:
        say("MCDGV: GV models from per-utterance static variances")
        state.gv = make_gv(state, corpus, cfg, questions)

    # ---- MSPF: modulation-spectrum postfilter statistics --------------
    if cfg.use_mspf:
        say("MSPF: natural/generated modulation-spectrum statistics")
        state.mspf = make_mspf(state, corpus, cfg)

    say("recipe complete")
    return state


# ---------------------------------------------------------------------------
# MCDGV (Training.pl:620-685) — per-utterance GV observations
# ---------------------------------------------------------------------------


def _statics(frames: np.ndarray, st: hsmm.StreamDef, n_win: int):
    """Static block of one stream from cmp-layout frames (the window
    expansion is [static | delta | delta2], features/windows.py)."""
    width = (st.sl.stop - st.sl.start) // n_win
    return frames[:, st.sl.start:st.sl.start + width]


def _phone_ends(state: RecipeState, ui: int, n_states: int):
    ends = state.alignments.get(ui)
    return None if ends is None else ends[n_states - 1::n_states]


def make_gv(state: RecipeState, corpus, cfg: RecipeConfig,
            questions) -> gv_model.GVModel:
    """make_data_gv + MCDGV: per utterance, the per-dimension variance of
    each stream's statics over non-silence (and MSD-present) frames, one
    observation labeled by the utterance's first full-context label,
    clustered by the usual questions when cdgv (Training.pl:1402-1491)."""
    model = state.clustered
    obs = []
    for ui, (frames, ctx_seq) in enumerate(corpus):
        keep = np.ones(len(frames), bool)
        if cfg.nosilgv and cfg.silence_phones:
            pe = _phone_ends(state, ui, cfg.n_states)
            if pe is not None:
                keep = gv_model.silence_keep_mask(
                    [context_clustered.phone_of(c) for c in ctx_seq],
                    pe, cfg.silence_phones, len(frames))
        statics = {}
        keeps = {}
        for st in model.streams:
            statics[st.name] = _statics(frames, st, cfg.n_win)
            k = keep
            if st.msd:
                k = keep & (frames[:, st.msd_flag_col] != 0.0)
            keeps[st.name] = k
        ctx0 = ctx_seq[0] if cfg.cdgv else "gv"
        obs.append((ctx0, statics, keeps))
    stats = gv_model.gv_observations(obs)
    return gv_model.build_gv_model(
        stats, questions, mdl_factor=cfg.mdl_factor,
        min_occupancy=cfg.min_occupancy, context_dependent=cfg.cdgv)


# ---------------------------------------------------------------------------
# MSPF (Training.pl:687-724) — natural vs aligned-generation stats
# ---------------------------------------------------------------------------


def make_mspf(state: RecipeState, corpus, cfg: RecipeConfig):
    """Natural mgc statics vs parameters generated under the FORCED
    alignment (HMGenS -m with fal labels, Training.pl:713-721): the two
    modulation-spectrum statistics the postfilter maps between."""
    from hts_train_world_tpu.ops import postfilter as pf_mod
    model = state.clustered
    mgc_st = next(st for st in model.streams if st.name == "mgc")
    nat_trajs, gen_trajs = [], []
    for ui, (frames, ctx_seq) in enumerate(corpus):
        ends = state.alignments.get(ui)
        if ends is None:
            continue
        durs = np.diff(np.concatenate([[0], ends]))
        fp = pgen_mod.frame_params(model, ctx_seq, durs)
        statics = pgen_mod.mlpg_streams(fp, model.streams, cfg.n_win)
        nat_trajs.append(_statics(frames, mgc_st, cfg.n_win))
        gen_trajs.append(statics["mgc"])
    nat = pf_mod.mspf_stats(nat_trajs)
    gen = pf_mod.mspf_stats(gen_trajs)
    return nat, gen


# ---------------------------------------------------------------------------
# PGEN + WGEN (Training.pl:730-759) — label sequence -> waveform
# ---------------------------------------------------------------------------


def synthesize_utterance(state: RecipeState, label_seq: Sequence[str],
                         cfg: RecipeConfig, fs: int,
                         frame_period: float = 5.0, fft_size: int = 0,
                         rho: float = 0.0, durs=None):
    """Generate one utterance from the trained voice: durations (pgtype /
    rho) -> MLPG -> GV -> postfilter -> WORLD synthesis.  Returns
    (waveform, statics, vuv, durs)."""
    gcfg = pgen_mod.GenConfig(
        pgtype=cfg.pgtype, rho=rho, max_dur=cfg.max_dur, n_win=cfg.n_win,
        use_gv=cfg.use_gv and state.gv is not None,
        postfilter_mcp=cfg.postfilter_mcp, alpha=cfg.alpha)
    statics, vuv, durs = pgen_mod.generate_parameters(
        state.clustered, label_seq, gcfg, gv_model=state.gv, durs=durs,
        mspf=state.mspf if cfg.use_mspf else None,
        mspf_weight=cfg.mspf_weight)
    y = pgen_mod.generate_waveform(statics, vuv, fs, fft_size,
                                   frame_period)
    return y, statics, vuv, durs


def export(state: RecipeState, path: str, fs: int, frame_shift: int,
           cfg: RecipeConfig, alpha: float = 0.0) -> None:
    """CONVM: package the trained voice (+ GV models) as .htsvoice."""
    model = state.clustered
    static_dims = {st.name: (st.sl.stop - st.sl.start) // cfg.n_win
                   for st in model.streams}
    context_clustered.export_voice(
        model, path, fs, frame_shift, static_dims, gv_model=state.gv,
        alpha=alpha or cfg.alpha,
        gv_off_context=tuple(f"*-{p}+*" for p in cfg.silence_phones)
        if cfg.nosilgv else ())

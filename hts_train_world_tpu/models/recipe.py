"""HMM-voice training recipe — the TPU-native Training.pl.

One typed config with the reference's stage switches
(Config.pm.in:310-349) and training knobs (nIte, DAEM, UPMIX, SEMIT,
configure.ac:698-713), and one driver that runs the full HTS flow on
the MSD-HSMM stack:

  IN_RE   init_modelset (HInit/HRest bootstrap from label spans)
  ERST0   monophone embedded re-estimation — full Baum-Welch, plain or
          DAEM-annealed (Training.pl:417-446)
  CXCL/ERST2   full-context stats -> MDL tree clustering -> tied model
  FALGN   Viterbi forced alignment (HSMMAlign)
  SEMIT   semi-tied covariance transforms (Training.pl:1017-1035)
  UPMIX/ERST5  1->2 mixture split + embedded mixture EM
          (Training.pl:1076-1098)
  CONVM   .htsvoice export (models/voice.py)

Each stage is idempotent over an in-memory `RecipeState`; callers can
run stages selectively exactly like the reference's Config.pm switches.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from hts_train_world_tpu.models import context_clustered, hsmm
from hts_train_world_tpu.models import hsmm_variants as hv


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


@dataclasses.dataclass
class RecipeState:
    monophone: Optional[hsmm.ModelSet] = None
    clustered: Optional[context_clustered.ClusteredModel] = None
    mixture: Optional[hv.MixtureModelSet] = None
    semitied: Optional[hv.SemiTiedModelSet] = None
    alignments: Optional[Dict[int, np.ndarray]] = None
    log_history: List[str] = dataclasses.field(default_factory=list)


def train_voice(corpus, questions, cfg: RecipeConfig = RecipeConfig(),
                streams: Sequence[hsmm.StreamDef] | None = None,
                bootstrap_spans=None, log=print) -> RecipeState:
    """Run the full recipe.

    corpus: list of (frames (T, D), full_context_label_seq).
    questions: clustering questions (features/qconf or models/clustering
    format).  bootstrap_spans: optional {utt_index: phone end frames}
    for HInit-style supervised bootstrapping; uniform cuts otherwise.
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
                             max_dur=cfg.max_dur, log=say)
    else:
        mode = "baum_welch" if cfg.soft_counts else "viterbi"
        say(f"ERST0: embedded re-estimation ({mode})")
        hsmm.embedded_reestimate(ms, utts_mono, n_iters=cfg.n_iters,
                                 var_floor_scale=cfg.var_floor_scale,
                                 max_dur=cfg.max_dur, log=say, mode=mode)
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

    # ---- CXCL: full-context clustering ------------------------------
    say("CXCL: full-context statistics + MDL tree clustering")
    utts_full = [(f, seq) for f, seq in corpus]
    stream_stats, msd_stats, dur_stats = \
        context_clustered.collect_context_stats(ms, utts_full,
                                                cfg.max_dur)
    state.clustered = context_clustered.build_clustered_model(
        ms, stream_stats, msd_stats, dur_stats, questions,
        mdl_factor=cfg.mdl_factor, min_occupancy=cfg.min_occupancy)

    # ---- ERST2: embedded re-estimation of the tied model -------------
    if cfg.tied_iters > 0:
        say("ERST2: tied-model embedded re-estimation")
        context_clustered.reestimate_clustered(
            state.clustered, utts_full, n_iters=cfg.tied_iters,
            max_dur=cfg.max_dur, var_floor_scale=cfg.var_floor_scale,
            log=say)

    # ---- UNTIE -> CXCL2 -> ERST4 --------------------------------------
    if cfg.recluster:
        say("UNTIE/CXCL2: untied statistics from tied alignments "
            "+ second clustering round")
        ss2, ms2_, ds2 = context_clustered.collect_context_stats_tied(
            state.clustered, utts_full, cfg.max_dur)
        state.clustered = context_clustered.build_clustered_model(
            ms, ss2, ms2_, ds2, questions,
            mdl_factor=cfg.mdl_factor, min_occupancy=cfg.min_occupancy)
        if cfg.tied_iters > 0:
            say("ERST4: re-estimation of the reclustered model")
            context_clustered.reestimate_clustered(
                state.clustered, utts_full, n_iters=cfg.tied_iters,
                max_dur=cfg.max_dur, var_floor_scale=cfg.var_floor_scale,
                log=say)

    # ---- FALGN: forced alignment ------------------------------------
    say("FALGN: Viterbi forced alignment")
    state.alignments = {}
    for ui, (frames, _) in enumerate(corpus):
        try:
            _, ends = hsmm.align_utterance(ms, frames, mono_seqs[ui],
                                           cfg.max_dur)
        except ValueError as e:
            # drop unalignable utterances like the reference's screening
            # gates (data/Makefile.in:216-238, Training.pl:601-618)
            say(f"FALGN: dropping utt {ui}: {e}")
            continue
        state.alignments[ui] = ends
    say("recipe complete")
    return state

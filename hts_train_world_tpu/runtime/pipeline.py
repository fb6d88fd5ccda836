"""Corpus pipeline orchestrator — the Training.pl equivalent for the DNN
singing-synthesis path (SURVEY.md T3-T7, §3.4), restartable per stage.

Stages (each idempotent, tracked by the StageManifest):
  ANALYZE  raw audio -> f0/sp/ap -> lf0(2)/mgc(50)/bap(25)/vib(2)
           (data/Makefile.in `features` + Extract.py)
  COMPOSE  delta windows -> cmp (HTK) + ffo targets (`cmp`/`ffo` targets)
  STATS    ffo.var / stream vars / gv.var (`stats`; never ran under WORLD
           in the reference — gap closed)
  MKDAT    aligned labels + question config -> ffi inputs (makefeature.pl)
  TRDNN    frame-mode acoustic training w/ checkpoints (DNNTraining.py)
  PGEN     forward + MLPG generation (+ mcep postfilter) (gen_param)
  WGEN     WORLD synthesis -> wav (closing the reference's gen_wave gap:
           it never calls WORLD, Training.pl:2813-2947)
"""
from __future__ import annotations

import dataclasses
import glob
import os
import subprocess
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import cli as cli_mod
from hts_train_world_tpu import config as cfg
from hts_train_world_tpu import vocoder
from hts_train_world_tpu.features import compose, htk, labels as labels_mod
from hts_train_world_tpu.features import qconf as qconf_mod
from hts_train_world_tpu.features import vibrato
from hts_train_world_tpu.io import rawio, wavio
from hts_train_world_tpu.models import acoustic, dataio, training
from hts_train_world_tpu.ops import generation, postfilter
from hts_train_world_tpu.runtime.checkpoint import StageManifest

STAGES = ["ANALYZE", "COMPOSE", "STATS", "MKDAT", "TRDNN", "PGEN", "WGEN"]


@dataclasses.dataclass
class PipelineConfig:
    workdir: str
    fs: int = 48000
    frame_period: float = 5.0
    layout: compose.StreamLayout = dataclasses.field(
        default_factory=compose.StreamLayout)
    parity: bool = False                 # exact reference noise streams
    model: acoustic.ModelConfig = None   # filled at MKDAT (n_in known)
    train: training.TrainConfig = dataclasses.field(
        default_factory=training.TrainConfig)
    postfilter_mcp: float = 0.0          # 0 = off; reference default 1.4
    alpha: float = 0.0                   # 0 -> freqwarp_for_fs(fs)


class SingingPipeline:
    def __init__(self, pcfg: PipelineConfig):
        self.cfg = pcfg
        self.wd = os.path.abspath(pcfg.workdir)
        self.manifest = StageManifest(self.wd)
        self.fft_size = cfg.cheaptrick_fft_size(pcfg.fs)
        for d in ("lf0", "mgc", "bap", "vib", "cmp", "ffo", "ffi", "stats",
                  "model", "gen"):
            os.makedirs(os.path.join(self.wd, d), exist_ok=True)

    # -- corpus discovery --
    def utterances(self) -> List[str]:
        wavs = sorted(glob.glob(os.path.join(self.wd, "raw", "*.wav")))
        return [os.path.splitext(os.path.basename(w))[0] for w in wavs]

    def _p(self, sub: str, base: str, ext: str) -> str:
        return os.path.join(self.wd, sub, f"{base}.{ext}")

    # -- stages --
    def analyze(self) -> None:
        if self.manifest.done("ANALYZE"):
            return
        lay = self.cfg.layout
        bases = self.utterances()
        analyzed = {}
        if not self.cfg.parity and len(bases) > 1:
            # fast corpus path: length-bucketed batched analysis — one
            # XLA compile per bucket shape instead of one per file
            from hts_train_world_tpu.io import loader as nloader
            from hts_train_world_tpu.parallel import bucketing
            paths = [os.path.join(self.wd, "raw", f"{b}.wav")
                     for b in bases]
            sigs: list = [None] * len(bases)
            try:
                with nloader.CorpusLoader(paths, nloader.WAV) as dl:
                    for i, x, sr in dl:
                        assert x is not None, f"{bases[i]}: unreadable wav"
                        assert sr == self.cfg.fs, \
                            f"{bases[i]}: fs {sr} != {self.cfg.fs}"
                        sigs[i] = x
            except (OSError, subprocess.CalledProcessError):
                # no native toolchain (or a broken one — native.load
                # raises CalledProcessError when g++ exists but the
                # compile fails): fall back to the python wav reader
                for i, p in enumerate(paths):
                    x, fs = wavio.wavread(p)
                    assert fs == self.cfg.fs, \
                        f"{bases[i]}: fs {fs} != {self.cfg.fs}"
                    sigs[i] = x
            res = bucketing.bucketed_analyze(sigs, self.cfg.fs,
                                             self.cfg.frame_period)
            for base, (t, f0, sp, ap) in zip(bases, res):
                analyzed[base] = vocoder.WorldAnalysis(
                    temporal_positions=t, f0=f0, spectrogram=sp,
                    aperiodicity=ap, fs=self.cfg.fs,
                    fft_size=self.fft_size,
                    frame_period=self.cfg.frame_period)
        for base in bases:
            if base in analyzed:
                a = analyzed[base]
            else:
                x, fs = wavio.wavread(os.path.join(self.wd, "raw",
                                                   f"{base}.wav"))
                assert fs == self.cfg.fs, f"{base}: fs {fs} != {self.cfg.fs}"
                a = vocoder.analyze(jnp.asarray(x), fs,
                                    self.cfg.frame_period,
                                    parity=self.cfg.parity)
            lf0_1d, mgc, bap = cli_mod.encode_features(
                a.f0, a.spectrogram, a.aperiodicity, a.fs, a.fft_size,
                lay.mgc_dim, lay.bap_dim)
            mono = os.path.join(self.wd, "labels", "mono", f"{base}.lab")
            full = os.path.join(self.wd, "labels", "full", f"{base}.lab")
            if os.path.exists(full) and not os.path.exists(mono):
                labels_mod.make_mono_from_full(full, mono)
            if os.path.exists(full):
                labs = labels_mod.load_labels(mono, full)
            else:
                labs = []
            lf0_2d, vib = vibrato.extract(np.asarray(lf0_1d), labs,
                                          self.cfg.frame_period)
            rawio.write_f32(self._p("lf0", base, "lf0"), lf0_2d)
            rawio.write_f32(self._p("mgc", base, "mgc"), np.asarray(mgc))
            rawio.write_f32(self._p("bap", base, "bap"), np.asarray(bap))
            rawio.write_f32(self._p("vib", base, "vib"), vib)
        self.manifest.mark("ANALYZE", n=len(self.utterances()))

    def compose_stage(self) -> None:
        if self.manifest.done("COMPOSE"):
            return
        lay = self.cfg.layout
        shift = int(self.cfg.frame_period / 1000.0 * self.cfg.fs)
        for base in self.utterances():
            mgc = rawio.read_f32(self._p("mgc", base, "mgc"), lay.mgc_dim)
            lf0 = rawio.read_f32(self._p("lf0", base, "lf0"), lay.lf0_dim)
            bap = rawio.read_f32(self._p("bap", base, "bap"), lay.bap_dim)
            vib = rawio.read_f32(self._p("vib", base, "vib"), lay.vib_dim)
            cmp_ = compose.compose_cmp(mgc, lf0, bap, vib, lay)
            htk.write_htk(self._p("cmp", base, "cmp"), cmp_, self.cfg.fs,
                          shift)
            ffo = compose.compose_ffo(mgc, lf0, bap, vib, lay)
            rawio.write_f32(self._p("ffo", base, "ffo"), ffo)
        self.manifest.mark("COMPOSE")

    def stats(self) -> None:
        if self.manifest.done("STATS"):
            return
        lay = self.cfg.layout
        ffos = [rawio.read_f32(self._p("ffo", b, "ffo"), lay.ffo_dim)
                for b in self.utterances()]
        var = compose.ffo_variance(ffos)
        rawio.write_f32(os.path.join(self.wd, "stats", "ffo.var"), var)
        for name, v in compose.stream_variances(var, lay).items():
            rawio.write_f32(os.path.join(self.wd, "stats",
                                         f"{name}.var"), v)
        rawio.write_f32(os.path.join(self.wd, "stats", "gv.var"),
                        compose.gv_variance(ffos, lay))
        self.manifest.mark("STATS")

    def mkdat(self) -> None:
        if self.manifest.done("MKDAT"):
            return
        conf = open(os.path.join(self.wd, "qconf.conf")).read()
        feats = qconf_mod.parse_config(conf)
        shift_100ns = int(self.cfg.frame_period * 1e4)
        for base in self.utterances():
            lab = os.path.join(self.wd, "labels", "align", f"{base}.lab")
            if not os.path.exists(lab):
                lab = os.path.join(self.wd, "labels", "full", f"{base}.lab")
            labs = qconf_mod.parse_aligned_labels(open(lab).read(),
                                                  shift_100ns)
            ffi = qconf_mod.encode_labels(feats, labs)
            rawio.write_f32(self._p("ffi", base, "ffi"), ffi)
        self.manifest.mark("MKDAT", n_in=len(feats))

    def _pairs(self) -> List[dataio.UtterancePair]:
        lay = self.cfg.layout
        n_in = self._model_cfg().n_in
        return [dataio.load_pair(b, self._p("ffi", b, "ffi"),
                                 self._p("ffo", b, "ffo"), n_in,
                                 lay.ffo_dim) for b in self.utterances()]

    def _model_cfg(self) -> acoustic.ModelConfig:
        if self.cfg.model is not None:
            return self.cfg.model
        conf = open(os.path.join(self.wd, "qconf.conf")).read()
        n_in = len(qconf_mod.parse_config(conf))
        self.cfg.model = acoustic.ModelConfig(
            n_in=n_in, n_out=self.cfg.layout.ffo_dim)
        return self.cfg.model

    def train_dnn(self) -> None:
        if self.manifest.done("TRDNN"):
            return
        training.train(self._model_cfg(), self.cfg.train, self._pairs(),
                       os.path.join(self.wd, "model"))
        self.manifest.mark("TRDNN", steps=self.cfg.train.num_steps)

    def _restore_params(self):
        from hts_train_world_tpu.runtime.checkpoint import Checkpointer
        import jax
        mcfg = self._model_cfg()
        template = acoustic.init_params(jax.random.PRNGKey(0), mcfg)
        ckpt = Checkpointer(os.path.join(self.wd, "model"))
        opt = acoustic.make_optimizer(self.cfg.train.learning_rate)
        restored = ckpt.restore({"params": template,
                                 "opt_state": opt.init(template)})
        if restored is None:
            raise RuntimeError("no trained checkpoint")
        return restored["params"]

    def generate(self) -> None:
        if self.manifest.done("PGEN"):
            return
        lay = self.cfg.layout
        params = self._restore_params()
        mcfg = self._model_cfg()
        var = rawio.read_f32(os.path.join(self.wd, "stats", "ffo.var"))
        alpha = self.cfg.alpha or cfg.freqwarp_for_fs(self.cfg.fs)
        for base in self.utterances():
            ffi = rawio.read_f32(self._p("ffi", base, "ffi"), mcfg.n_in)
            ffo = training.forward_corpus(mcfg, params, ffi)
            g = generation.generate_parameters(
                jnp.asarray(ffo, jnp.float64),
                jnp.asarray(var, jnp.float64), lay)
            mgc = g.mgc
            if self.cfg.postfilter_mcp > 0:
                mgc = postfilter.mcep_postfilter(
                    mgc, alpha, self.cfg.postfilter_mcp, self.fft_size)
            rawio.write_f32(self._p("gen", base, "mgc"), np.asarray(mgc))
            rawio.write_f32(self._p("gen", base, "lf0"), np.asarray(g.lf0))
            rawio.write_f32(self._p("gen", base, "bap"), np.asarray(g.bap))
            rawio.write_f32(self._p("gen", base, "vuv"),
                            np.asarray(g.vuv, np.float32))
        self.manifest.mark("PGEN")

    def synthesize_stage(self) -> None:
        if self.manifest.done("WGEN"):
            return
        lay = self.cfg.layout
        for base in self.utterances():
            mgc = rawio.read_f32(self._p("gen", base, "mgc"),
                                 lay.mgc_dim).astype(np.float64)
            lf0 = rawio.read_f32(self._p("gen", base, "lf0"),
                                 lay.lf0_dim).astype(np.float64)
            bap = rawio.read_f32(self._p("gen", base, "bap"),
                                 lay.bap_dim).astype(np.float64)
            lf0_1 = np.where(lf0[:, 0] == generation.MAGIC, 0.0, lf0[:, 0])
            f0, sp, ap = cli_mod.decode_features(
                jnp.asarray(lf0_1), jnp.asarray(mgc), jnp.asarray(bap),
                self.cfg.fs, self.fft_size)
            y = vocoder.synthesize(f0, sp, ap, self.cfg.fs, self.fft_size,
                                   self.cfg.frame_period,
                                   parity=self.cfg.parity)
            wavio.wavwrite(np.asarray(y), self.cfg.fs,
                           self._p("gen", base, "wav"))
        self.manifest.mark("WGEN")

    def run(self, upto: Optional[str] = None) -> None:
        for stage, fn in zip(STAGES, (
                self.analyze, self.compose_stage, self.stats, self.mkdat,
                self.train_dnn, self.generate, self.synthesize_stage)):
            fn()
            if stage == upto:
                break

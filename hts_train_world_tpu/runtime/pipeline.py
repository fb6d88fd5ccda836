"""Corpus pipeline orchestrator — the Training.pl equivalent for the DNN
singing-synthesis path (SURVEY.md T3-T7, §3.4), restartable per stage.

Stages (each idempotent, tracked by the StageManifest):
  ANALYZE  raw audio -> f0/sp/ap -> lf0(2)/mgc(50)/bap(25)/vib(2)
           (data/Makefile.in `features` + Extract.py)
  COMPOSE  delta windows -> cmp (HTK) + ffo targets (`cmp`/`ffo` targets)
  STATS    ffo.var / stream vars / gv.var (`stats`; never ran under WORLD
           in the reference — gap closed)
  HALGN    HSMM recipe on the cmp corpus -> labels/align state-level +
           labels/fal phone-level alignments + the duration model for
           unseen-label synthesis (the HMM half of the DNN config:
           FALGN + convert_state2phone, Training.pl:601-618, 1604-1635)
  MKDAT    aligned labels + question config -> ffi inputs (makefeature.pl)
  TRDNN    frame-mode acoustic training w/ checkpoints (DNNTraining.py)
  TRJGV    trajectory fine-tuning with the GV term, warm-started from the
           frame checkpoint (Training.pl:930-940)
  MSPFD    modulation-spectrum postfilter statistics from aligned DNN
           generations (MSPF1 dnn branch, Training.pl:842-882)
  PGEN     forward + MLPG generation (+ mcep/MSPF postfilter) (gen_param)
  WGEN     WORLD synthesis -> wav (closing the reference's gen_wave gap:
           it never calls WORLD, Training.pl:2813-2947)

synthesize_unseen() is PGEND/WGEND (Training.pl:885-928): durations from
the HALGN duration model -> convert_dur2lab -> DNN -> MLPG -> WORLD.
"""
from __future__ import annotations

import dataclasses
import glob
import os
import pickle
import shutil
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

STAGES = ["ANALYZE", "COMPOSE", "STATS", "HALGN", "MKDAT", "TRDNN",
          "TRJGV", "MSPFD", "PGEN", "WGEN"]


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
    # HALGN (HSMM alignment + duration model)
    use_hmm_align: bool = False
    hmm: object = None                   # models/recipe.RecipeConfig
    # TRJGV
    trajectory_steps: int = 0            # extra trajectory-mode steps
    # MSPF postfilter ($useMSPF)
    use_mspf: bool = False
    mspf_weight: float = 1.0


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
            # bucketed_extract encodes lf0/mgc/bap ON DEVICE in the
            # batched program — one compile per bucket shape for the
            # whole corpus (a host-side per-utterance encode_features
            # loop recompiles per distinct length AND downloads full
            # spectrograms)
            res = bucketing.bucketed_extract(
                sigs, self.cfg.fs, self.cfg.frame_period,
                mgc_dim=lay.mgc_dim, bap_dim=lay.bap_dim)
            for base, enc in zip(bases, res):
                analyzed[base] = enc
        for base in bases:
            if base in analyzed:
                lf0_1d, mgc, bap = analyzed[base]
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

    # -- HALGN: HSMM alignment + duration model ------------------------
    def _read_cmp(self, base: str) -> np.ndarray:
        lay = self.cfg.layout
        mgc = rawio.read_f32(self._p("mgc", base, "mgc"), lay.mgc_dim)
        lf0 = rawio.read_f32(self._p("lf0", base, "lf0"), lay.lf0_dim)
        bap = rawio.read_f32(self._p("bap", base, "bap"), lay.bap_dim)
        vib = rawio.read_f32(self._p("vib", base, "vib"), lay.vib_dim)
        return compose.compose_cmp(mgc, lf0, bap, vib,
                                   lay).astype(np.float64)

    def _full_label(self, base: str):
        """(ctx_seq, phone end frames) from labels/full (100 ns times)."""
        path = os.path.join(self.wd, "labels", "full", f"{base}.lab")
        if not os.path.exists(path):
            return None, None
        shift_100ns = int(self.cfg.frame_period * 1e4)
        ctx, ends = [], []
        for ln in open(path).read().splitlines():
            parts = ln.split()
            if len(parts) >= 3:
                ctx.append(parts[2])
                ends.append(int(round(int(parts[1]) / shift_100ns)))
        return ctx, np.asarray(ends)

    def halgn(self) -> None:
        if self.manifest.done("HALGN"):
            return
        if not self.cfg.use_hmm_align:
            self.manifest.mark("HALGN", skipped=True)
            return
        from hts_train_world_tpu.models import clustering, hsmm
        from hts_train_world_tpu.models import recipe as recipe_mod
        lay = self.cfg.layout
        shift_100ns = int(self.cfg.frame_period * 1e4)
        qs = clustering.questions_from_config(qconf_mod.parse_config(
            open(os.path.join(self.wd, "qconf.conf")).read()))
        corpus, spans, bases = [], {}, []
        for base in self.utterances():
            ctx_seq, ends = self._full_label(base)
            if ctx_seq is None:
                continue
            frames = self._read_cmp(base)
            spans[len(corpus)] = np.minimum(ends, len(frames))
            corpus.append((frames, ctx_seq))
            bases.append(base)
        rcfg = self.cfg.hmm or recipe_mod.RecipeConfig(
            n_states=5, n_iters=2, tied_iters=1, recluster=False,
            use_gv=False, use_mspf=False)
        st = recipe_mod.train_voice(corpus, qs, rcfg,
                                    streams=hsmm.world_streams(lay),
                                    bootstrap_spans=spans,
                                    log=lambda m: None)
        os.makedirs(os.path.join(self.wd, "labels", "align"), exist_ok=True)
        os.makedirs(os.path.join(self.wd, "labels", "fal"), exist_ok=True)
        S = rcfg.n_states
        for i, base in enumerate(bases):
            ends = st.alignments.get(i)
            if ends is None:
                continue
            ctx_seq = corpus[i][1]
            with open(os.path.join(self.wd, "labels", "align",
                                   f"{base}.lab"), "w") as f:
                f.write(labels_mod.state_alignment_lines(
                    ctx_seq, ends, S, shift_100ns))
            with open(os.path.join(self.wd, "labels", "fal",
                                   f"{base}.lab"), "w") as f:
                f.write(labels_mod.phone_alignment_lines(
                    ctx_seq, ends, S, shift_100ns))
        with open(os.path.join(self.wd, "model", "hmm.pkl"), "wb") as f:
            pickle.dump({"clustered": st.clustered, "cfg": rcfg}, f)
        self.manifest.mark("HALGN", n=len(bases))

    def _load_hmm(self):
        with open(os.path.join(self.wd, "model", "hmm.pkl"), "rb") as f:
            return pickle.load(f)

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

    # -- TRJGV: trajectory fine-tuning with the GV term -----------------
    def _traj_meta(self):
        lay = self.cfg.layout
        feature_dims = (lay.mgc_dim, lay.lf0_dim, lay.bap_dim, lay.vib_dim)
        msd_flags = (0, 1, 0, 0)   # ffo carries one lf0 flag (compose.py)
        gv = rawio.read_f32(os.path.join(self.wd, "stats", "gv.var"))
        # gv.var covers [mgc | lf0 | bap] (data/Makefile.in:441-456);
        # vib gets unit variance
        gv_var = np.concatenate([gv, np.ones(lay.vib_dim)])
        return feature_dims, msd_flags, np.maximum(gv_var, 1e-8)

    def trjgv(self) -> None:
        if self.manifest.done("TRJGV"):
            return
        if self.cfg.trajectory_steps <= 0:
            self.manifest.mark("TRJGV", skipped=True)
            return
        # warm start: copy the frame-mode checkpoints (Training.pl:936-938)
        src = os.path.join(self.wd, "model")
        dst = os.path.join(self.wd, "model_trj")
        if not os.path.isdir(dst):
            shutil.copytree(src, dst, ignore=shutil.ignore_patterns(
                "hmm.pkl"))
        feature_dims, msd_flags, gv_var = self._traj_meta()
        tcfg = dataclasses.replace(
            self.cfg.train, trajectory=True,
            num_steps=self.cfg.train.num_steps + self.cfg.trajectory_steps,
            batch_size=1)
        training.train(self._model_cfg(), tcfg, self._pairs(), dst,
                       feature_dims=feature_dims, msd_flags=msd_flags,
                       gv_variances=gv_var)
        self.manifest.mark("TRJGV", steps=self.cfg.trajectory_steps)

    def _params_dir(self) -> str:
        trj = os.path.join(self.wd, "model_trj")
        return trj if os.path.isdir(trj) else os.path.join(self.wd,
                                                           "model")

    def _restore_params(self, ckpt_dir: Optional[str] = None):
        from hts_train_world_tpu.runtime.checkpoint import Checkpointer
        import jax
        mcfg = self._model_cfg()
        template = acoustic.init_params(jax.random.PRNGKey(0), mcfg)
        ckpt = Checkpointer(ckpt_dir or self._params_dir())
        opt = acoustic.make_optimizer(self.cfg.train.learning_rate)
        restored = ckpt.restore({"params": template,
                                 "opt_state": opt.init(template)})
        if restored is None:
            raise RuntimeError("no trained checkpoint")
        return restored["params"]

    # -- parameter generation ------------------------------------------
    def _gen_one(self, ffi, params, var, alpha, mspf):
        """forward -> MLPG -> postfilter for one utterance's inputs."""
        mcfg = self._model_cfg()
        ffo = training.forward_corpus(mcfg, params, ffi)
        g = generation.generate_parameters(
            jnp.asarray(ffo, jnp.float64), jnp.asarray(var, jnp.float64),
            self.cfg.layout)
        mgc = g.mgc
        if mspf is not None:
            nat, gen = mspf
            mgc = postfilter.apply_mspf(mgc, nat, gen,
                                        self.cfg.mspf_weight)
        elif self.cfg.postfilter_mcp > 0:
            mgc = postfilter.mcep_postfilter(
                mgc, alpha, self.cfg.postfilter_mcp, self.fft_size)
        return mgc, g

    def _load_mspf(self):
        path = os.path.join(self.wd, "stats", "mspf.npz")
        if not os.path.exists(path):
            return None
        z = np.load(path)
        return (postfilter.MspfStats(z["nat_mean"], z["nat_std"]),
                postfilter.MspfStats(z["gen_mean"], z["gen_std"]))

    def mspfd(self) -> None:
        """MSPF statistics for the DNN path (Training.pl:842-882): the
        natural mgc statics vs generations from the ALIGNED training
        inputs (the tdn scp is the aligned ffi set)."""
        if self.manifest.done("MSPFD"):
            return
        if not self.cfg.use_mspf:
            self.manifest.mark("MSPFD", skipped=True)
            return
        lay = self.cfg.layout
        params = self._restore_params()
        var = rawio.read_f32(os.path.join(self.wd, "stats", "ffo.var"))
        mcfg = self._model_cfg()
        nat_trajs, gen_trajs = [], []
        for base in self.utterances():
            ffi = rawio.read_f32(self._p("ffi", base, "ffi"), mcfg.n_in)
            _, g = self._gen_one(ffi, params, var,
                                 self.cfg.alpha
                                 or cfg.freqwarp_for_fs(self.cfg.fs),
                                 mspf=None)
            gen_trajs.append(np.asarray(g.mgc, np.float64))
            nat_trajs.append(rawio.read_f32(
                self._p("mgc", base, "mgc"),
                lay.mgc_dim).astype(np.float64))
        nat = postfilter.mspf_stats(nat_trajs)
        gen = postfilter.mspf_stats(gen_trajs)
        np.savez(os.path.join(self.wd, "stats", "mspf.npz"),
                 nat_mean=nat.mean, nat_std=nat.std,
                 gen_mean=gen.mean, gen_std=gen.std)
        self.manifest.mark("MSPFD")

    def generate(self) -> None:
        if self.manifest.done("PGEN"):
            return
        params = self._restore_params()
        mcfg = self._model_cfg()
        var = rawio.read_f32(os.path.join(self.wd, "stats", "ffo.var"))
        alpha = self.cfg.alpha or cfg.freqwarp_for_fs(self.cfg.fs)
        mspf = self._load_mspf() if self.cfg.use_mspf else None
        for base in self.utterances():
            ffi = rawio.read_f32(self._p("ffi", base, "ffi"), mcfg.n_in)
            mgc, g = self._gen_one(ffi, params, var, alpha, mspf)
            rawio.write_f32(self._p("gen", base, "mgc"), np.asarray(mgc))
            rawio.write_f32(self._p("gen", base, "lf0"), np.asarray(g.lf0))
            rawio.write_f32(self._p("gen", base, "bap"), np.asarray(g.bap))
            rawio.write_f32(self._p("gen", base, "vuv"),
                            np.asarray(g.vuv, np.float32))
        self.manifest.mark("PGEN")

    # -- PGEND/WGEND: unseen labels via the HSMM duration model ---------
    def synthesize_unseen(self, base: str, rho: float = 0.0) -> str:
        """Synthesize labels/full/<base>.lab with durations PREDICTED by
        the HALGN duration model (HMGenS -> convert_dur2lab ->
        DNNSynthesis -> gen_param -> gen_wave; Training.pl:885-928).
        Returns the wav path."""
        from hts_train_world_tpu.models import pgen as pgen_mod
        hmm = self._load_hmm()
        model, rcfg = hmm["clustered"], hmm["cfg"]
        ctx_seq, _ = self._full_label(base)
        if ctx_seq is None:
            raise FileNotFoundError(f"labels/full/{base}.lab")
        shift_100ns = int(self.cfg.frame_period * 1e4)
        durs = pgen_mod.state_durations(model, ctx_seq, rho)
        lab = labels_mod.durations_to_state_lines(
            ctx_seq, durs, rcfg.n_states, shift_100ns)
        with open(self._p("gen", base, "lab"), "w") as f:
            f.write(lab)
        feats = qconf_mod.parse_config(
            open(os.path.join(self.wd, "qconf.conf")).read())
        labs = qconf_mod.parse_aligned_labels(lab, shift_100ns)
        ffi = qconf_mod.encode_labels(feats, labs)
        params = self._restore_params()
        var = rawio.read_f32(os.path.join(self.wd, "stats", "ffo.var"))
        alpha = self.cfg.alpha or cfg.freqwarp_for_fs(self.cfg.fs)
        mspf = self._load_mspf() if self.cfg.use_mspf else None
        mgc, g = self._gen_one(np.asarray(ffi), params, var, alpha, mspf)
        lf0 = np.asarray(g.lf0)
        lf0_1 = np.where(lf0[:, 0] == generation.MAGIC, 0.0, lf0[:, 0])
        f0, sp, ap = cli_mod.decode_features(
            jnp.asarray(lf0_1), jnp.asarray(np.asarray(mgc, np.float64)),
            jnp.asarray(np.asarray(g.bap, np.float64)), self.cfg.fs,
            self.fft_size)
        y = vocoder.synthesize(f0, sp, ap, self.cfg.fs, self.fft_size,
                               self.cfg.frame_period,
                               parity=self.cfg.parity)
        out = self._p("gen", base, "wav")
        wavio.wavwrite(np.asarray(y), self.cfg.fs, out)
        return out

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
                self.analyze, self.compose_stage, self.stats, self.halgn,
                self.mkdat, self.train_dnn, self.trjgv, self.mspfd,
                self.generate, self.synthesize_stage)):
            fn()
            if stage == upto:
                break

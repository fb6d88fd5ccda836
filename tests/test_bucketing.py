"""Length-bucketed batched analysis (parallel/bucketing.py).

Gates:
- bucket planning is geometric/aligned and deterministic;
- a heterogeneous corpus needs one compile per bucket shape, not per file;
- trimmed results match exact-length analysis on interior frames (the
  zero tail only perturbs DIO's utterance-level statistics);
- the corpus pipeline ANALYZE stage produces the same feature shapes
  through the bucketed path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.parallel import batch as batch_mod
from hts_train_world_tpu.parallel import bucketing

FS = 16000


def _sig(n, f0=200.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    x = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * t)
            for h, a in enumerate([0.6, 0.25, 0.1]))
    return 0.7 * x + 0.005 * rng.standard_normal(n)


def test_bucket_plan_geometric():
    ls = [5000, 5100, 9000, 9001, 40000]
    plan = bucketing.plan_buckets(ls)
    assert sorted(sum(plan.values(), [])) == list(range(len(ls)))
    for blen, idxs in plan.items():
        assert blen % 2048 == 0
        for i in idxs:
            assert blen >= ls[i]
    # nearby lengths share a bucket; distant ones don't
    b = {i: bl for bl, idxs in plan.items() for i in idxs}
    assert b[0] == b[1]
    assert b[2] == b[3]
    assert b[0] != b[4]


def test_compile_count_sublinear():
    ls = [4000 + 137 * i for i in range(50)]
    n = bucketing.bucket_compile_count(ls)
    assert n < 12  # 50 distinct lengths -> ~a handful of shapes


def test_bucketed_matches_exact_interior():
    lengths = [13000, 16000, 16000, 21000]
    sigs = [_sig(n, 180.0 + 25 * i, seed=i) for i, n in enumerate(lengths)]
    res = bucketing.bucketed_analyze(sigs, FS, max_batch=2)
    assert len(res) == len(sigs)
    for i, (t, f0, sp, ap) in enumerate(res):
        T = cfg.samples_for_dio(FS, lengths[i], 5.0)
        assert f0.shape == (T,) and sp.shape[0] == T and ap.shape[0] == T
        # exact-length reference for this utterance
        te, fe, se, ae = (np.asarray(a)[0] for a in batch_mod.batch_analyze(
            jnp.asarray(sigs[i], jnp.float32)[None], FS, 5.0, 0.0))
        # interior frames (clear of the padded tail's contour edge)
        vr = int(0.5 + 1000.0 / 5.0 / cfg.K_FLOOR_F0) * 2 + 1
        lo, hi = vr, T - 2 * vr
        voiced = (fe[lo:hi] > 0) & (f0[lo:hi] > 0)
        assert voiced.mean() > 0.6
        df = np.abs(f0[lo:hi] - fe[lo:hi])[voiced] / fe[lo:hi][voiced]
        assert np.median(df) < 1e-4
        fl = np.float32(1e-20)  # f32 deep nulls underflow to 0
        dsp = np.abs(np.log(np.maximum(sp[lo:hi][voiced], fl))
                     - np.log(np.maximum(se[lo:hi][voiced], fl)))
        assert np.median(dsp) < 1e-2


def test_pipeline_analyze_bucketed(tmp_path):
    import os
    from scipy.io import wavfile
    from hts_train_world_tpu.runtime import pipeline as pl
    wd = tmp_path / "corpus"
    os.makedirs(wd / "raw")
    for i, n in enumerate([12000, 12000, 18000]):
        x = _sig(n, 200.0 + 10 * i, seed=10 + i)
        wavfile.write(str(wd / "raw" / f"utt{i}.wav"), FS,
                      np.round(x * 32767).astype(np.int16))
    p = pl.SingingPipeline(pl.PipelineConfig(workdir=str(wd), fs=FS))
    p.analyze()
    for i, n in enumerate([12000, 12000, 18000]):
        T = cfg.samples_for_dio(FS, n, 5.0)
        lay = p.cfg.layout
        mgc = np.fromfile(wd / "mgc" / f"utt{i}.mgc", np.float32)
        assert mgc.size == T * lay.mgc_dim

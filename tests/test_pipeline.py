"""End-to-end DNN singing pipeline on a tiny synthetic corpus:
analyze -> compose -> stats -> encode labels -> train -> generate ->
synthesize, with stage restartability."""
import os

import numpy as np
import pytest

from hts_train_world_tpu.features import compose
from hts_train_world_tpu.io import wavio
from hts_train_world_tpu.models import acoustic
from hts_train_world_tpu.models.training import TrainConfig
from hts_train_world_tpu.runtime import pipeline as pl

QCONF = """
C-Phone_a  {*-a+*}
C-Phone_i  {*-i+*}
C-Phone_sil {*-sil+*}
C-NoteIdx  {*/E:%d]*} MIN=0 MAX=23
Pos_C-Frame_in_Phone(Fw)  MIN=1 MAX=200
Pos_C-Frame_in_Phone(Bw)  MIN=1 MAX=200
"""


def _make_corpus(wd, fs=16000, n_utt=2):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(wd, "raw"), exist_ok=True)
    os.makedirs(os.path.join(wd, "labels", "full"), exist_ok=True)
    os.makedirs(os.path.join(wd, "labels", "mono"), exist_ok=True)
    for u in range(n_utt):
        dur = 0.6
        n = int(fs * dur)
        t = np.arange(n) / fs
        f0 = 200.0 + 20 * u
        x = (0.5 * np.sin(2 * np.pi * f0 * t)
             + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
             + 0.01 * rng.standard_normal(n))
        edge = n // 8
        x[:edge] *= 0
        x[-edge:] *= 0
        # noise floor keeps silent-region mgc[0] in a learnable range
        x += 0.003 * rng.standard_normal(n)
        wavio.wavwrite(0.8 * x / np.abs(x).max(), fs,
                       os.path.join(wd, "raw", f"utt{u}.wav"))
        # 3-phone label: sil a sil (times in 100 ns)
        d = int(dur * 1e7)
        e1, e2 = d // 8, d - d // 8
        lines = [f"0 {e1} x^x-sil+a=x/E:xx]",
                 f"{e1} {e2} x^sil-a+sil=x/E:{3 + u}]",
                 f"{e2} {d} x^a-sil+x=x/E:xx]"]
        with open(os.path.join(wd, "labels", "full", f"utt{u}.lab"),
                  "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(os.path.join(wd, "qconf.conf"), "w") as f:
        f.write(QCONF)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("corpus"))
    _make_corpus(wd)
    return wd


def test_full_pipeline(workdir):
    pcfg = pl.PipelineConfig(
        workdir=workdir, fs=16000,
        model=acoustic.ModelConfig(n_in=6, n_out=238, hidden=(64, 64),
                                   dtype="float32"),
        train=TrainConfig(num_steps=400, batch_size=128, log_interval=200,
                          save_interval=200, valid_fraction=0.0),
        postfilter_mcp=1.4)
    p = pl.SingingPipeline(pcfg)
    p.run()
    lay = pcfg.layout
    for u in range(2):
        from hts_train_world_tpu.io import rawio
        cmp_path = os.path.join(workdir, "cmp", f"utt{u}.cmp")
        data, period, kind = __import__(
            "hts_train_world_tpu.features.htk", fromlist=["read_htk"]
        ).read_htk(cmp_path)
        assert data.shape[1] == lay.cmp_dim == 237
        assert kind == 9
        ffo = rawio.read_f32(os.path.join(workdir, "ffo", f"utt{u}.ffo"),
                             lay.ffo_dim)
        assert np.isfinite(ffo).all()
        y, fs = wavio.wavread(os.path.join(workdir, "gen", f"utt{u}.wav"))
        assert len(y) > 1000 and np.isfinite(y).all()
        assert np.abs(y).max() > 1e-4  # actually produced audio
    # stage restartability: a second run is a no-op
    p2 = pl.SingingPipeline(pcfg)
    p2.run()
    assert p2.manifest.done("WGEN")

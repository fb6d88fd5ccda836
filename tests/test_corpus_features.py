"""BASELINE config 3: corpus-scale feature extraction parity — every
utterance's lf0/mgc/bap streams and their delta-window expansions must
match the reference binaries + window.pl byte-for-byte at float32.

(The reference's Extract.py vibrato stage cannot run here — it needs
statsmodels/progressbar which the image lacks — so the comparison covers
the WORLD analysis + coding + windowing chain, which is where all the
numerics live; the vib stream logic is gated separately in
test_features.py.)
"""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from hts_train_world_tpu import cli, vocoder
from hts_train_world_tpu.features import windows
from hts_train_world_tpu.io import rawio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = "/tmp/worldref/build"
SCRIPTS = "/root/reference/data/scripts"
WINDIR = "/root/reference/data/win"

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference unavailable")

N_UTT = 8
FS = 16000


def _corpus(tmpdir):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_golden
    make_golden.build_reference()
    from scipy.io import wavfile
    rng = np.random.default_rng(7)
    utts = []
    for u in range(N_UTT):
        dur = 0.5 + 0.15 * (u % 4)
        x = make_golden.synth_utterance(FS, dur, 100 + u)
        wav = os.path.join(tmpdir, f"u{u}.wav")
        wavfile.write(wav, FS, np.round(x * 32768.0).astype(np.int16))
        utts.append((wav, x))
    return utts


def test_corpus_feature_parity(tmp_path):
    utts = _corpus(str(tmp_path))
    winfiles = [os.path.join(WINDIR, f"mgc.win{i}") for i in (1, 2, 3)]
    for i, (wav, x) in enumerate(utts):
        lf0_p = str(tmp_path / f"u{i}.lf0")
        mgc_p = str(tmp_path / f"u{i}.mgc")
        bap_p = str(tmp_path / f"u{i}.bap")
        subprocess.run([f"{BUILD}/analysis", wav, lf0_p, mgc_p, bap_p,
                        "5", "1024", "50", "25"], check=True,
                       capture_output=True)
        a = vocoder.analyze(jnp.asarray(x), FS, 5.0)
        lf0, mgc, bap = cli.encode_features(a.f0, a.spectrogram,
                                            a.aperiodicity, FS, a.fft_size)
        np.testing.assert_allclose(np.asarray(lf0, np.float32),
                                   rawio.read_f32(lf0_p), atol=1e-6)
        ref_mgc = rawio.read_f32(mgc_p, 50)
        # float32 storage ties can flip the last ulp; gate at 1e-7 relative
        np.testing.assert_allclose(np.asarray(mgc, np.float32), ref_mgc,
                                   atol=1e-7, rtol=1e-6)
        ref_bap = rawio.read_f32(bap_p, 25)
        np.testing.assert_allclose(np.asarray(bap, np.float32), ref_bap,
                                   atol=2e-12)
        # delta-window expansion vs window.pl on the reference's own mgc
        out = subprocess.run(
            ["perl", os.path.join(SCRIPTS, "window.pl"), "50", mgc_p,
             *winfiles], capture_output=True, check=True)
        ref_win = np.frombuffer(out.stdout, "<f4").reshape(-1, 150)
        got_win = np.asarray(windows.expand(ref_mgc.astype(np.float64)),
                             dtype=np.float32)
        np.testing.assert_allclose(got_win, ref_win, rtol=1e-6, atol=1e-5)

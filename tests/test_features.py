"""Feature-pipeline parity vs. the reference Perl scripts (run directly)."""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from hts_train_world_tpu.features import compose, htk, msd, vibrato, windows
from hts_train_world_tpu.io import rawio

SCRIPTS = "/root/reference/data/scripts"
WINDIR = "/root/reference/data/win"

needs_ref = pytest.mark.skipif(not os.path.isdir(SCRIPTS),
                               reason="reference unavailable")


def _run_window_pl(data: np.ndarray, dim: int, winfiles):
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.f32")
        rawio.write_f32(inp, data)
        out = subprocess.run(
            ["perl", os.path.join(SCRIPTS, "window.pl"), str(dim), inp,
             *winfiles], capture_output=True, check=True)
        return np.frombuffer(out.stdout, "<f4").reshape(-1, 3 * dim)


@needs_ref
def test_window_expand_matches_window_pl():
    rng = np.random.default_rng(0)
    T, D = 40, 3
    x = rng.standard_normal((T, D)).astype(np.float32)
    # sprinkle MSD magic runs
    x[5:9, 1] = windows.MAGIC
    x[0, 2] = windows.MAGIC
    x[-1, 0] = windows.MAGIC
    ref = _run_window_pl(x, D, [os.path.join(WINDIR, f"mgc.win{i}")
                                for i in (1, 2, 3)])
    got = np.asarray(windows.expand(x.astype(np.float64)),
                     dtype=np.float32)
    # window.pl emits [w1 | w2 | w3] per frame in window order
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@needs_ref
def test_interpolate_matches_interpolate_pl():
    rng = np.random.default_rng(1)
    T = 60
    x = rng.standard_normal(T).astype(np.float32)
    x[:7] = msd.MAGIC
    x[20:30] = msd.MAGIC
    x[50:] = msd.MAGIC
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.f32")
        rawio.write_f32(inp, x)
        out = subprocess.run(
            ["perl", os.path.join(SCRIPTS, "interpolate.pl"), "1", inp],
            capture_output=True, check=True)
        ref = np.frombuffer(out.stdout, "<f4")
    got = msd.interpolate_gaps(x.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@needs_ref
def test_htk_header_matches_addhtkheader_pl():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((11, 7)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.f32")
        rawio.write_f32(inp, data)
        out = subprocess.run(
            ["perl", "/root/reference/data/scripts/addhtkheader.pl",
             "48000", "240", str(4 * 7), "9", inp],
            capture_output=True, check=True)
        mine = os.path.join(td, "mine.cmp")
        htk.write_htk(mine, data, 48000, 240)
        assert open(mine, "rb").read() == out.stdout


def test_compose_cmp_layout():
    T = 25
    rng = np.random.default_rng(3)
    mgc = rng.standard_normal((T, 50))
    lf0 = rng.standard_normal((T, 2))
    bap = rng.standard_normal((T, 25))
    vib = rng.standard_normal((T, 2))
    cmp_ = compose.compose_cmp(mgc, lf0, bap, vib)
    lay = compose.StreamLayout()
    assert cmp_.shape == (T, 237) == (T, lay.cmp_dim)
    sl = lay.cmp_slices()
    np.testing.assert_allclose(cmp_[:, sl["mgc"]][:, :50], mgc, rtol=1e-6)
    np.testing.assert_allclose(cmp_[:, sl["lf0"]][:, :2], lf0, rtol=1e-6)
    ffo = compose.compose_ffo(mgc, np.abs(lf0) + 4.0, bap, vib)
    assert ffo.shape == (T, 238)


def test_vibrato_basic():
    from hts_train_world_tpu.features.labels import LabelSegment
    fs_frames = 200
    t = np.arange(fs_frames) * 0.005
    f0 = 220.0 * (1 + 0.04 * np.sin(2 * np.pi * 5.0 * t))  # 5 Hz vibrato
    lf0 = np.log(f0).astype(np.float32)
    seg = LabelSegment(0.0, fs_frames * 5.0, "a", "x^x-a+x=x/E:A3]")
    lf0_2d, vib = vibrato.extract(lf0, [seg], 5.0)
    assert lf0_2d.shape == (fs_frames, 2)
    np.testing.assert_allclose(np.exp(lf0_2d[:, 0]), f0, rtol=1e-5)
    # vibrato depth ~ 220*0.04 = 8.8 Hz > 5 Hz threshold -> detected
    depth = np.exp(vib[50:150, 0])
    assert (depth > 5.0).mean() > 0.5
    # stored depth should be in the right ballpark
    assert 4.0 < np.median(depth[depth > 1.0]) < 16.0

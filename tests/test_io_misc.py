"""WORLD parameter files, band filters, corpus file lists."""
import os
import subprocess

import numpy as np
import pytest

from hts_train_world_tpu.features import filters
from hts_train_world_tpu.io import worldparam


def test_worldparam_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f0 = np.abs(rng.standard_normal(50)) * 100
    p = tmp_path / "a.f0"
    worldparam.write_f0(str(p), f0, 5.0)
    t, f0r, fp = worldparam.read_f0(str(p))
    np.testing.assert_array_equal(f0, f0r)
    assert fp == 5.0
    sp = np.abs(rng.standard_normal((50, 513))) + 1e-6
    worldparam.write_spectral_envelope(str(tmp_path / "a.sp"), sp, 5.0,
                                       1024, 16000)
    spr, fp2, fft, fs = worldparam.read_spectral_envelope(
        str(tmp_path / "a.sp"))
    np.testing.assert_array_equal(sp, spr)
    assert (fft, fs) == (1024, 16000)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference unavailable")
def test_band_filters_match_makefilter():
    for sr in (16000, 48000):
        for flag, idx in (("0", 0), ("1", 1)):
            out = subprocess.run(
                ["perl", "/root/reference/data/scripts/makefilter.pl",
                 str(sr), flag], capture_output=True, text=True, check=True)
            ref = np.array([float(v) for v in out.stdout.split()])
            got = filters.band_split_filters(sr)[idx]
            np.testing.assert_allclose(got, ref, atol=1e-8)


def test_band_filters_complementary():
    low, high = filters.band_split_filters(48000)
    # together the five kernels sum to (roughly) an impulse at the center
    total = low + high
    assert abs(total[15] - 0.999) < 0.2
    assert np.abs(np.delete(total, 15)).max() < 0.1

"""SPTK subset + postfilters + parameter generation."""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from hts_train_world_tpu.ops import generation, postfilter, sptk

MCEP_DRIVER = "/tmp/worldref/golden_mcep"


def _build_mcep_driver():
    if os.path.exists(MCEP_DRIVER):
        return True
    try:
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        import make_golden
        make_golden.build_reference()
        subprocess.run(
            ["g++", "-O2", "-I", "/tmp/worldref/test", "-I",
             "/tmp/worldref/src", "-o", MCEP_DRIVER,
             os.path.join(os.path.dirname(os.path.dirname(
                 os.path.abspath(__file__))), "tools", "golden_mcep.cpp"),
             "/tmp/worldref/build/objs/test/sptkfunctions.o",
             "/tmp/worldref/build/objs/test/theq.o", "-lm"], check=True)
        return True
    except Exception:
        return False


def test_mcep_matches_reference(tmp_path):
    if not _build_mcep_driver():
        pytest.skip("reference unavailable")
    rng = np.random.default_rng(0)
    T, fft, m, alpha, itr = 5, 512, 24, 0.42, 8
    from scipy.ndimage import uniform_filter1d
    logsp = uniform_filter1d(rng.standard_normal((T, fft // 2 + 1)), 40,
                             axis=1)
    inp = tmp_path / "in.f64"
    logsp.tofile(inp)
    out = tmp_path / "out.f64"
    subprocess.run([MCEP_DRIVER, str(inp), str(T), str(fft), str(m),
                    str(alpha), str(itr), str(out)], check=True,
                   capture_output=True)
    ref = np.fromfile(out).reshape(T, m + 1)
    got = np.asarray(sptk.mcep(jnp.asarray(2.0 * logsp), m, alpha, fft,
                               itr=itr))
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_mc2b_b2mc_roundtrip():
    rng = np.random.default_rng(1)
    mc = jnp.asarray(rng.standard_normal((7, 25)))
    b = sptk.mc2b(mc, 0.55)
    np.testing.assert_allclose(np.asarray(sptk.b2mc(b, 0.55)),
                               np.asarray(mc), atol=1e-12)


def test_mcep_postfilter_energy_preserved():
    rng = np.random.default_rng(2)
    from scipy.ndimage import uniform_filter1d
    mgc = np.zeros((4, 50))
    mgc[:, 0] = -2.0
    mgc[:, 1:] = uniform_filter1d(rng.standard_normal((4, 49)) * 0.3, 5,
                                  axis=1)
    out = postfilter.mcep_postfilter(jnp.asarray(mgc), 0.42, 1.4, 2048)
    # energy matching: r0 of the output ~ r0 of the input
    r_in = sptk.c2acr(sptk.freqt(jnp.asarray(mgc), 511, -0.42), 0,
                      2048)[..., 0]
    r_out = sptk.c2acr(sptk.freqt(out, 511, -0.42), 0, 2048)[..., 0]
    np.testing.assert_allclose(np.asarray(r_out), np.asarray(r_in),
                               rtol=0.02)
    # formants emphasised: higher-order coefficients scaled up
    assert np.abs(np.asarray(out)[:, 2:]).sum() > \
        np.abs(mgc[:, 2:]).sum() * 1.2


def test_mspf_roundtrip_identity():
    """With gen stats == nat stats the filter must be ~identity."""
    rng = np.random.default_rng(3)
    T, D = 100, 3
    traj = np.cumsum(rng.standard_normal((T, D)) * 0.1, axis=0)
    stats = postfilter.mspf_stats([traj])
    out = postfilter.apply_mspf(jnp.asarray(traj), stats, stats, 1.0)
    err = np.abs(np.asarray(out) - traj)
    assert err.max() < 0.05 * np.abs(traj).max() + 0.05


def test_generate_parameters_layout():
    rng = np.random.default_rng(4)
    from hts_train_world_tpu.features.compose import StreamLayout
    lay = StreamLayout()
    T = 40
    ffo = rng.standard_normal((T, lay.ffo_dim)) * 0.1
    flag_col = 3 * lay.mgc_dim
    ffo[:, flag_col] = 1.0
    ffo[:10, flag_col] = 0.0
    var = np.abs(rng.standard_normal(lay.ffo_dim)) + 0.5
    g = generation.generate_parameters(jnp.asarray(ffo), jnp.asarray(var),
                                       lay)
    assert g.mgc.shape == (T, 50)
    assert g.lf0.shape == (T, 2)
    assert bool(np.all(np.asarray(g.lf0)[:10] == generation.MAGIC))
    assert np.isfinite(np.asarray(g.mgc)).all()
    f0 = generation.lf0_to_f0(g.lf0, g.vuv)
    assert np.all(np.asarray(f0)[:10] == 0.0)

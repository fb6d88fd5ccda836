"""Device Harvest contour stack (ops/harvest_fix.py) vs the host
transcription oracle (ops/harvest.py), on randomized candidate fields and
through the batched analysis lane."""
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import harvest as hv
from hts_train_world_tpu.ops import harvest_fix as hf


def _random_candidates(seed, T=220, NC=21):
    """Sparse, section-structured candidate/score fields like the real
    refiner emits: voiced stretches with up to NC candidates near a base
    contour, plus dropouts and outliers."""
    rng = np.random.default_rng(seed)
    cands = np.zeros((T, NC))
    scores = np.zeros((T, NC))
    t0 = 0
    while t0 < T - 10:
        seg = int(rng.integers(5, 60))
        if rng.random() < 0.35:  # unvoiced gap
            t0 += seg
            continue
        base = rng.uniform(80, 700)
        for t in range(t0, min(T, t0 + seg)):
            k = int(rng.integers(1, NC + 1))
            vals = base * (1 + 0.01 * rng.standard_normal(k))
            if rng.random() < 0.1:
                vals[rng.integers(0, k)] *= rng.uniform(1.5, 3.0)
            cands[t, :k] = np.abs(vals)
            scores[t, :k] = rng.uniform(2.5, 60.0, k)
            drop = rng.random(NC) < 0.2
            cands[t, drop] = 0.0
            scores[t, drop] = 0.0
        t0 += seg + int(rng.integers(1, 12))
    return cands, scores


def test_remove_unreliable_matches_host():
    for seed in range(3):
        cands, scores = _random_candidates(seed)
        hc, hs = hv.remove_unreliable(cands.copy(), scores.copy())
        dc, ds = hf.remove_unreliable(jnp.asarray(cands),
                                      jnp.asarray(scores))
        np.testing.assert_allclose(np.asarray(dc), hc, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ds), hs, atol=1e-12)


def test_fix_contour_matches_host():
    for seed in range(6):
        cands, scores = _random_candidates(seed)
        host = hv.fix_contour(cands, scores)
        dev = hf.fix_contour(jnp.asarray(cands), jnp.asarray(scores),
                             hf.step3_section_cap(cands.shape[0]))
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-9,
                                   err_msg=f"seed {seed}")


def test_smooth_matches_host():
    for seed in range(3):
        cands, scores = _random_candidates(seed)
        s4 = hv.fix_contour(cands, scores)
        host = hv.smooth_contour(s4)
        dev = hf.smooth_contour(jnp.asarray(s4),
                                hf.smooth_section_cap(len(s4)))
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-9)


def test_detect_overlap_matches_host():
    rng = np.random.default_rng(7)
    n_ch, T = 152, 90
    raw = np.where(rng.random((n_ch, T)) < 0.55,
                   rng.uniform(60, 800, (n_ch, T)), 0.0)
    # inject long clean runs so real candidates exist
    raw[20:45, :] = 150.0 + np.arange(T) * 0.1
    raw[60:75, ::2] = 300.0
    max_c = int(n_ch / 10.0 + 0.5) * hv.OVERLAP_PARAMETER
    hc, hnc = hv.detect_official_candidates(raw, max_c)
    hov = hv.overlap_candidates(hc.copy(), hnc)
    nc_pad = min(int(n_ch / 10.0 + 0.5), (n_ch + 1) // 11) \
        * hv.OVERLAP_PARAMETER
    dc, dnc = hf.detect_candidates(jnp.asarray(raw), nc_pad)
    assert int(dnc) == hnc
    np.testing.assert_allclose(np.asarray(dc), hc[:, :nc_pad], atol=1e-12)
    dov = hf.overlap_candidates(dc, dnc)
    np.testing.assert_allclose(np.asarray(dov), hov[:, :nc_pad],
                               atol=1e-12)


def test_harvest_device_equals_host_end_to_end():
    fs, L = 16000, 9600
    t = np.arange(L) / fs
    f0c = 200 + 40 * np.sin(2 * np.pi * 3.0 * t)
    ph = np.cumsum(2 * np.pi * f0c / fs)
    rng = np.random.default_rng(1)
    x = (0.5 * np.sin(ph) + 0.2 * np.sin(2 * ph + 0.3)
         + 0.01 * rng.standard_normal(L))
    # an unvoiced stretch in the middle
    x[4000:5200] = 0.02 * rng.standard_normal(1200)
    xj = jnp.asarray(x, jnp.float64)
    _, fh = hv.harvest(xj, fs, contour="host")
    _, fd = hv.harvest(xj, fs, contour="device")
    np.testing.assert_allclose(np.asarray(fd), np.asarray(fh), atol=1e-8)


def test_batch_analyze_harvest_lane():
    from hts_train_world_tpu.parallel import batch as batch_mod
    fs, L, B = 16000, 9600, 3
    t = np.arange(L) / fs
    rng = np.random.default_rng(0)
    xs = []
    for i in range(B):
        f0c = (150 + 60 * i) * (1 + 0.03 * np.sin(2 * np.pi * 3.0 * t))
        ph = np.cumsum(2 * np.pi * f0c / fs)
        xs.append(0.5 * np.sin(ph) + 0.2 * np.sin(2 * ph)
                  + 0.01 * rng.standard_normal(L))
    xs = np.stack(xs).astype(np.float32)
    tt, f0, sp, ap = batch_mod.batch_analyze(jnp.asarray(xs), fs,
                                             algorithm="harvest")
    T = f0.shape[1]
    assert f0.shape == (B, T) and sp.shape[0] == B and ap.shape[0] == B
    assert np.isfinite(np.asarray(sp)).all()
    for i in range(B):
        _, ref = hv.harvest(jnp.asarray(xs[i]), fs)
        both = (np.asarray(f0[i]) > 0) & (np.asarray(ref) > 0)
        assert both.sum() >= 0.9 * (np.asarray(ref) > 0).sum()
        rel = np.abs(np.asarray(f0[i])[both] - np.asarray(ref)[both]) \
            / np.asarray(ref)[both]
        assert np.median(rel) < 1e-3


def test_batch_analyze_harvest_jit_composable():
    """Regression for BENCH_r04: harvest_f0_batch inside an enclosing
    jit must fall back to the worst-case candidate width (no host sync)
    and produce EXACTLY the eager two-stage result."""
    import jax
    from hts_train_world_tpu.parallel import batch as batch_mod
    fs, L, B = 16000, 8000, 2
    t = np.arange(L) / fs
    rng = np.random.default_rng(3)
    xs = np.stack([
        0.5 * np.sin(2 * np.pi * (160 + 25 * i) * t)
        + 0.01 * rng.standard_normal(L) for i in range(B)
    ]).astype(np.float32)

    _, f0_eager, _, _ = batch_mod.batch_analyze(jnp.asarray(xs), fs,
                                                algorithm="harvest")

    @jax.jit
    def run(x):
        return batch_mod.batch_analyze(x, fs, algorithm="harvest")[1]

    f0_jit = run(jnp.asarray(xs))
    # widths differ (bucketed vs worst-case) -> the slab refine's
    # frame-block matmul reduction order differs by an f32 ulp
    np.testing.assert_allclose(np.asarray(f0_jit), np.asarray(f0_eager),
                               rtol=1e-6)


def test_bucket_width_fallback_exact_bound():
    """_NC_BUCKETS overflow must fall back to the exact nc_pad bound,
    not silently cap at the largest bucket (ADVICE r4)."""
    plan = {"nc_pad": 7 * 30}
    assert hv._bucket_width(20, plan) == plan["nc_pad"]   # > max bucket
    assert hv._bucket_width(5, plan) == 7 * 6             # bucket 6
    assert hv._bucket_width(0, plan) == 7 * 1             # floor at 1

"""SPTK-excitation vocoder branch (ops/excitation.py) — gen_wave's
non-WORLD path (Training.pl:2873-2899).

Gates:
- EXCITE semantics: pulses spaced by the pitch period with sqrt(period)
  amplitude, Gaussian noise in unvoiced runs, phase reset at onsets;
- the mixed-excitation band split routes pulses low / noise high;
- the MGLSA OLA filter matches direct FFT convolution with the exact
  exp(mgc2sp) impulse response on a constant-filter segment;
- copy-synthesis through mcep -> excitation -> MGLSA preserves F0 and
  the spectral envelope of a synthetic vowel.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hts_train_world_tpu.features import filters
from hts_train_world_tpu.ops import excitation as ex

FS = 16000
SHIFT = 80


def test_lf0_to_pitch():
    lf0 = np.array([np.log(200.0), ex.MAGIC, np.log(100.0)])
    p = np.asarray(ex.lf0_to_pitch(lf0, FS))
    assert abs(p[0] - 80.0) < 1e-6 and p[1] == 0.0 and abs(p[2] - 160) < 1e-6


def test_excite_pulse_train():
    T = 50
    pitch = np.full(T, 100.0)
    e, voiced = ex.excite(pitch, SHIFT)
    e = np.asarray(e)
    assert voiced.all()
    pos = np.nonzero(e)[0]
    gaps = np.diff(pos)
    assert abs(np.median(gaps) - 100.0) <= 1.0
    assert np.allclose(e[pos], np.sqrt(100.0), atol=1e-3)


def test_excite_unvoiced_noise_and_onset_reset():
    T = 60
    pitch = np.concatenate([np.zeros(20), np.full(20, 120.0),
                            np.zeros(20)])
    e, voiced = ex.excite(pitch, SHIFT)
    e = np.asarray(e)
    v = np.asarray(voiced)
    # unvoiced run: zero-mean noise, unit-ish variance, dense support
    unv = e[~v]
    assert 0.5 < unv.std() < 2.0 and np.abs(unv).max() < 6.0
    # voiced run: sparse pulses spaced by the period, starting near onset
    pos = np.nonzero(np.where(v, e, 0.0))[0]
    assert len(pos) >= 10
    gaps = np.diff(pos)
    assert abs(np.median(gaps) - 120.0) <= 1.0
    onset = np.argmax(v)
    assert pos[0] - onset <= 125   # first pulse within ~one period


def test_mixed_excitation_band_split():
    """The low filter passes the pulse band and kills the top octave;
    the high filter does the reverse (makefilter.pl split at ~1-2 kHz
    for 16 kHz audio)."""
    rng = np.random.default_rng(2)
    low, high = filters.band_split_filters(FS)
    noise = rng.standard_normal(8000)

    def band_energy(sig, lo, hi):
        spec = np.abs(np.fft.rfft(np.asarray(sig))) ** 2
        f = np.fft.rfftfreq(len(sig), 1 / FS)
        return spec[(f >= lo) & (f < hi)].mean()

    ln = np.asarray(ex.fir(noise, low))
    hn = np.asarray(ex.fir(noise, high))
    assert band_energy(ln, 100, 800) > 10 * band_energy(ln, 6000, 8000)
    assert band_energy(hn, 6000, 8000) > 10 * band_energy(hn, 100, 800)
    # and the mixed signal carries pulses (periodicity) in the low band
    pitch = np.full(40, 100.0)
    mixed, _ = ex.mixed_excitation(pitch, SHIFT, low, high)
    lowpart = np.asarray(ex.fir(np.asarray(mixed), low))
    ac = np.correlate(lowpart, lowpart, "full")[len(lowpart) - 1:]
    assert ac[100] > 0.25 * ac[0]   # strong period-100 autocorrelation


def test_mglsa_matches_direct_convolution():
    """Constant mel-cepstrum -> the OLA filter equals one FFT filtering
    of the whole excitation with h = irfft(exp(mgc2sp))."""
    rng = np.random.default_rng(0)
    T, M, N = 24, 13, 512
    mgc1 = rng.standard_normal(M) * 0.1
    mgc1[0] = 0.5
    mgc = np.tile(mgc1, (T, 1))
    exc = rng.standard_normal((T - 1) * SHIFT)
    y = np.asarray(ex.mglsa_synthesis(exc, mgc, 0.42, SHIFT, N))
    from hts_train_world_tpu.ops import codec
    H = np.exp(np.asarray(codec.mgc2sp_real(jnp.asarray(mgc1[None]),
                                            0.42, N))[0])
    h = np.fft.irfft(H, N)            # zero-phase: negative time wraps
    hc = np.roll(h, N // 2)           # causal with N/2 delay
    ref = np.convolve(exc, hc, mode="full")[N // 2:N // 2 + len(exc)]
    # circular vs linear edge effects die off; compare the interior
    a, b = 2 * SHIFT, len(exc) - 2 * SHIFT
    num = np.abs(y[a:b] - ref[a:b]).mean()
    den = np.abs(ref[a:b]).mean()
    assert num / den < 0.05


def test_copy_synthesis_sptk_branch():
    """Vowel -> CheapTrick envelope -> mcep -> mixed excitation + MGLSA:
    the output tracks the source F0 and spectral envelope."""
    from hts_train_world_tpu import vocoder
    from hts_train_world_tpu.ops import sptk
    rng = np.random.default_rng(1)
    n = 12000
    t = np.arange(n) / FS
    f0 = 190.0
    x = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * t)
            for h, a in enumerate([0.5, 0.3, 0.15, 0.08, 0.04]))
    x = 0.6 * x + 0.003 * rng.standard_normal(n)
    a = vocoder.analyze(jnp.asarray(x), FS, 5.0, parity=False)
    M = 25
    mgc = sptk.mcep(jnp.log(jnp.maximum(a.spectrogram, 1e-12)) / 2.0,
                    M - 1, 0.42, a.fft_size)
    lf0 = np.where(np.asarray(a.f0) > 0, np.log(np.asarray(a.f0),
                                                where=np.asarray(a.f0) > 0),
                   ex.MAGIC)
    low, high = filters.band_split_filters(FS)
    y = np.asarray(ex.synthesize_sptk(lf0, np.asarray(mgc), FS, SHIFT,
                                      0.42, low, high,
                                      fft_size=a.fft_size))
    assert np.isfinite(y).all() and np.abs(y).max() > 1e-3
    # f0 preserved
    _, f0y = vocoder.estimate_f0(jnp.asarray(y, jnp.float64), FS, 5.0)
    f0y = np.asarray(f0y)
    voiced = f0y > 0
    assert voiced.mean() > 0.5
    assert abs(np.median(f0y[voiced]) - f0) / f0 < 0.03
    # envelope preserved where the source has energy (log-spectral
    # distance over the harmonic band)
    ay = vocoder.analyze(jnp.asarray(y, jnp.float64), FS, 5.0,
                         parity=False)
    Tm = min(ay.spectrogram.shape[0], a.spectrogram.shape[0]) - 10
    # compare inside the source's harmonic band (5 harmonics -> <1 kHz);
    # above it the source is noise floor while the pulse train keeps
    # exciting the envelope — not an envelope error
    band = slice(int(100 / FS * a.fft_size), int(950 / FS * a.fft_size))
    d = (np.log(np.asarray(ay.spectrogram)[10:Tm, band])
         - np.log(np.asarray(a.spectrogram)[10:Tm, band]))
    assert np.sqrt((d ** 2).mean()) < 2.0   # log-scale envelope match

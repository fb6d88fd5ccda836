"""Spectral postfilters — TPU-native equivalents of Training.pl's
postfiltering_mcp (Training.pl:2642-2687) and the modulation-spectrum
postfilter (postfiltering_mspf / msmp2seq / make_mspf,
Training.pl:2950-3038,3133-3221).

The mel-cepstral postfilter is energy-matched formant emphasis: scale
coefficients 2..M-1 by pf, then correct the 0th MLSA coefficient by
0.5*ln(r0/r0') where r0 is the zeroth autocorrelation via a
high-order dewarped cepstrum (co = 2047, Config.pm.in:188).

The modulation-spectrum postfilter maps each coefficient trajectory's
modulation log-spectrum toward natural statistics:
  ms' = ms + w * (((ms - mean_gen)/std_gen) * std_nat + mean_nat - ms)
then resynthesizes the trajectory from (ms', original phase) by
overlap-add.  Defaults mspfLength=25, mspfFFTLen=64 (Config.pm.in:222-223).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu.ops import sptk

CO = 2047          # cepstrum order for energy matching (Config.pm.in:188)
MSPF_LENGTH = 25
MSPF_FFTLEN = 64


def mcep_postfilter(mgc, alpha: float, pf: float = 1.4,
                    fft_size: int = 4096):
    """postfiltering_mcp (Training.pl:2642-2687). mgc: (T, M)."""
    M = mgc.shape[-1]
    weight = jnp.ones(M, mgc.dtype).at[2:].set(pf)
    weighted = mgc * weight
    r0 = sptk.c2acr(sptk.freqt(mgc, CO, -alpha), 0, fft_size)[..., 0]
    p_r0 = sptk.c2acr(sptk.freqt(weighted, CO, -alpha), 0, fft_size)[..., 0]
    b = sptk.mc2b(weighted, alpha)
    b0 = b[..., 0] + jnp.log(r0 / p_r0) / 2.0
    b = b.at[..., 0].set(b0)
    return sptk.b2mc(b, alpha)


# ---------------------------------------------------------------------------
# modulation-spectrum postfilter
# ---------------------------------------------------------------------------


def _frames(x, length: int, shift: int):
    """SPTK frame (centered): frame k = x[k*shift - (l-1)/2 ...] zero-padded.
    The pipeline zero-pads the sequence by `shift` first (WINDOW -l T
    -L T+shift, Training.pl:3071), giving one extra tail frame for exact
    Bartlett overlap-add coverage."""
    T = x.shape[0]
    n_frames = int(np.ceil((T + shift) / shift))
    half = (length - 1) // 2
    idx = (np.arange(n_frames)[:, None] * shift
           + np.arange(length)[None, :] - half)
    valid = (idx >= 0) & (idx < T)
    return jnp.where(jnp.asarray(valid),
                     jnp.take(x, jnp.clip(jnp.asarray(idx), 0, T - 1)), 0.0)


def _bartlett(n: int, dtype):
    i = np.arange(n)
    w = 1.0 - np.abs((i - (n - 1) / 2.0) / ((n - 1) / 2.0))
    return jnp.asarray(w, dtype)


def seq2msmp(traj):
    """Trajectory (T,) -> (log modulation magnitude, phase/pi) frames,
    each (n_frames, FFTLEN/2+1) (get_cmd_seq2ms/mp, Training.pl:3063-3096)."""
    shift = (MSPF_LENGTH - 1) // 2
    frames = _frames(traj, MSPF_LENGTH, shift) * _bartlett(MSPF_LENGTH,
                                                           traj.dtype)
    X = jnp.fft.rfft(frames, MSPF_FFTLEN, axis=-1)
    power = jnp.real(X) ** 2 + jnp.imag(X) ** 2
    ms = 0.5 * jnp.log(power + 1e-30)
    mp = jnp.arctan2(jnp.imag(X), jnp.real(X)) / jnp.pi
    return ms, mp


def msmp2seq(ms, mp, T: int):
    """(ms, phase) -> trajectory via overlap-add (msmp2seq,
    Training.pl:3003-3038)."""
    shift = (MSPF_LENGTH - 1) // 2
    X = jnp.exp(ms) * jnp.exp(1j * jnp.pi * mp)
    w = jnp.fft.irfft(X, MSPF_FFTLEN, axis=-1)
    n_frames = ms.shape[0]
    out_len = shift * (n_frames - 1) + MSPF_FFTLEN
    # OLA as one flat scatter-add (frame k lands at k*shift)
    idx = (np.arange(n_frames)[:, None] * shift
           + np.arange(MSPF_FFTLEN)[None, :]).reshape(-1)
    seq = jnp.zeros(out_len, w.real.dtype).at[jnp.asarray(idx)].add(
        w.reshape(-1))
    return seq[shift:T + shift]


@dataclasses.dataclass
class MspfStats:
    """Per-dimension modulation-spectrum mean/std, (D, FFTLEN/2+1)."""
    mean: np.ndarray
    std: np.ndarray


def mspf_stats(trajs) -> MspfStats:
    """make_mspf statistics over a corpus: trajs = list of (T, D)
    mean-subtracted parameter sequences.  All D dimensions are framed
    and transformed in one vmapped batch per utterance."""
    sums = None
    for t in trajs:
        tc = jnp.asarray(t) - jnp.mean(jnp.asarray(t), axis=0)
        ms, _ = jax.vmap(seq2msmp, in_axes=1)(tc)   # (D, F, half+1)
        # accumulate in float64: the one-pass E[x^2]-E[x]^2 form cancels
        # catastrophically in f32 at corpus scale
        ms = np.asarray(ms, np.float64)
        s1, s2 = ms.sum(1), (ms * ms).sum(1)
        n = ms.shape[1]
        if sums is None:
            sums = [s1, s2, n]
        else:
            sums[0] += s1
            sums[1] += s2
            sums[2] += n
    mean = sums[0] / sums[2]
    var = sums[1] / sums[2] - mean * mean
    return MspfStats(mean, np.sqrt(np.maximum(var, 0.0)))


def apply_mspf(traj, nat: MspfStats, gen: MspfStats, weight: float = 1.0):
    """postfiltering_mspf (Training.pl:2950-3000). traj: (T, D);
    every dimension converted in one vmapped batch."""
    traj = jnp.asarray(traj)
    T, D = traj.shape
    mean = jnp.mean(traj, axis=0)
    sub = traj - mean
    ms, mp = jax.vmap(seq2msmp, in_axes=1)(sub)     # (D, F, half+1)
    conv = ((ms - gen.mean[:, None]) / gen.std[:, None]) * nat.std[:, None] \
        + nat.mean[:, None]
    ms2 = ms + weight * (conv - ms)
    out = jax.vmap(msmp2seq, in_axes=(0, 0, None))(ms2, mp, T)  # (D, T)
    return out.T + mean


# ---------------------------------------------------------------------------
# LSP postfilter (postfiltering_lsp, Training.pl:2690-2752)
# ---------------------------------------------------------------------------


def lsp_sharpen(lsp, pf: float = 0.7):
    """The reference's per-frame LSP spacing sharpener
    (Training.pl:2723-2731): for interior indices 1 < i < m-1,

        d1 = pf*(w[i+1]-w[i]);  d2 = pf*(w[i]-w[i-1])
        w'[i] = w[i-1] + d2 + d2^2*((w[i+1]-w[i-1]) - (d1+d2))
                               / (d2^2 + d1^2)

    first and last LSPs pass through.  lsp: (..., m-1) frequencies
    (gain excluded).  Pure elementwise jnp, vmappable over frames."""
    lsp = jnp.asarray(lsp)
    prev = lsp[..., :-2]
    cur = lsp[..., 1:-1]
    nxt = lsp[..., 2:]
    d1 = pf * (nxt - cur)
    d2 = pf * (cur - prev)
    den = d2 * d2 + d1 * d1
    new = prev + d2 + d2 * d2 * ((nxt - prev) - (d1 + d2)) \
        / jnp.where(den == 0.0, 1.0, den)
    new = jnp.where(den == 0.0, cur, new)
    return jnp.concatenate([lsp[..., :1], new, lsp[..., -1:]], axis=-1)


def lsp_check(lsp, min_gap: float = 1e-3):
    """lspcheck -c -r equivalent: project each frame's LSPs onto the
    stable region — ascending in (0, pi) with a minimal gap.  A cumulative
    -max formulation (monotone envelope) instead of the C's pairwise
    swap loop."""
    lsp = jnp.asarray(lsp)
    m = lsp.shape[-1]
    lo = jnp.clip(lsp, min_gap, jnp.pi - min_gap)
    # enforce w[i] >= w[i-1] + min_gap via a running max of (w[i] - i*gap)
    shifted = lo - jnp.arange(1, m + 1) * min_gap
    env = jax.lax.associative_scan(jnp.maximum, shifted, axis=-1)
    out = env + jnp.arange(1, m + 1) * min_gap
    return jnp.clip(out, min_gap, jnp.pi - min_gap)


def lsp_to_lpc(lsp):
    """LSP frequencies (..., m) -> LPC coefficients a[1..m] (SPTK lsp2lpc
    equivalent).  Sorted LSPs alternate P/Q starting with P:
    P roots = lsp[0::2], Q roots = lsp[1::2];
      even m: A = ((1+z^-1) P~ + (1-z^-1) Q~) / 2
      odd  m: A = (P~ + (1-z^-2) Q~) / 2
    with X~ = prod (1 - 2 cos(w) z^-1 + z^-2) over that set's roots."""
    lsp = jnp.asarray(lsp)
    m = lsp.shape[-1]
    batch = lsp.shape[:-1]
    cos_w = jnp.cos(lsp)

    def poly_from(roots, deg_out: int):
        """prod over roots of (1 - 2c z^-1 + z^-2), coeffs padded to
        deg_out+1, built by a scan of in-place convolutions."""
        init = jnp.zeros(batch + (deg_out + 1,), lsp.dtype)
        init = init.at[..., 0].set(1.0)

        def body(c, coef):
            s1 = jnp.concatenate([jnp.zeros_like(c[..., :1]),
                                  c[..., :-1]], axis=-1)
            s2 = jnp.concatenate([jnp.zeros_like(c[..., :2]),
                                  c[..., :-2]], axis=-1)
            return c - 2.0 * coef[..., None] * s1 + s2, None

        out, _ = jax.lax.scan(body, init, jnp.moveaxis(roots, -1, 0))
        return out

    def times_1_plus(c, sign: float, lag: int):
        """c(z) * (1 + sign*z^-lag), same padded length."""
        shifted = jnp.concatenate(
            [jnp.zeros_like(c[..., :lag]), c[..., :-lag]], axis=-1)
        return c + sign * shifted

    if m % 2 == 0:
        P = poly_from(cos_w[..., 0::2], m + 1)
        Q = poly_from(cos_w[..., 1::2], m + 1)
        P = times_1_plus(P, +1.0, 1)
        Q = times_1_plus(Q, -1.0, 1)
    else:
        P = poly_from(cos_w[..., 0::2], m + 1)
        Q = poly_from(cos_w[..., 1::2], m + 1)
        Q = times_1_plus(Q, -1.0, 2)
    A = 0.5 * (P + Q)
    return A[..., 1:m + 1]


def lsp_spectrum_energy(gain, lsp, n_fft: int = 512):
    """0.5*ln sum |H|^2 of the all-pole filter exp(gain)/A(z) — the
    energy the reference's ene1/ene2 pipeline measures (SOPR -P |
    VSUM | SOPR -LN -m 0.5, Training.pl:2705-2706)."""
    a = lsp_to_lpc(lsp)
    A = jnp.concatenate([jnp.ones(a.shape[:-1] + (1,), a.dtype), a], -1)
    Af = jnp.fft.rfft(A, n_fft)
    mag2 = jnp.real(Af) ** 2 + jnp.imag(Af) ** 2
    h2 = jnp.exp(2.0 * gain)[..., None] / jnp.maximum(mag2, 1e-20)
    return 0.5 * jnp.log(jnp.sum(h2, axis=-1))


def lsp_postfilter(mgc_lsp, pf: float = 0.7, energy_match: bool = False):
    """postfiltering_lsp (Training.pl:2690-2752) on (T, m) frames of
    [gain, lsp_1..lsp_{m-1}].

    energy_match=False reproduces the reference LITERALLY: its gain
    'correction' divides ene2 by itself (Training.pl:2745 passes ene2 as
    both vopr operands; ene1 is written then deleted unused), so the
    gain passes through unchanged.  energy_match=True implements the
    evident intent: gain' = gain + (ene1 - ene2) with ene the all-pole
    log energy of the frame before/after sharpening."""
    mgc_lsp = jnp.asarray(mgc_lsp)
    gain = mgc_lsp[..., 0]
    lsp = mgc_lsp[..., 1:]
    plsp = lsp_check(lsp_sharpen(lsp, pf))
    if energy_match:
        e1 = lsp_spectrum_energy(gain, lsp_check(lsp))
        e2 = lsp_spectrum_energy(gain, plsp)
        gain = gain + (e1 - e2)
    return jnp.concatenate([gain[..., None], plsp], axis=-1)

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
    seq = jnp.zeros(out_len, w.real.dtype)
    for k in range(n_frames):  # static unroll; n_frames = ceil(T/shift)
        seq = seq.at[k * shift:k * shift + MSPF_FFTLEN].add(w[k])
    return seq[shift:T + shift]


@dataclasses.dataclass
class MspfStats:
    """Per-dimension modulation-spectrum mean/std, (D, FFTLEN/2+1)."""
    mean: np.ndarray
    std: np.ndarray


def mspf_stats(trajs) -> MspfStats:
    """make_mspf statistics over a corpus: trajs = list of (T, D)
    mean-subtracted parameter sequences."""
    D = trajs[0].shape[1]
    per_dim = [[] for _ in range(D)]
    for t in trajs:
        tc = jnp.asarray(t) - jnp.mean(jnp.asarray(t), axis=0)
        for d in range(D):
            ms, _ = seq2msmp(tc[:, d])
            per_dim[d].append(np.asarray(ms))
    mean = np.stack([np.concatenate(p).mean(0) for p in per_dim])
    std = np.stack([np.concatenate(p).std(0) for p in per_dim])
    return MspfStats(mean, std)


def apply_mspf(traj, nat: MspfStats, gen: MspfStats, weight: float = 1.0):
    """postfiltering_mspf (Training.pl:2950-3000). traj: (T, D)."""
    traj = jnp.asarray(traj)
    T, D = traj.shape
    mean = jnp.mean(traj, axis=0)
    sub = traj - mean
    outs = []
    for d in range(D):
        ms, mp = seq2msmp(sub[:, d])
        conv = ((ms - gen.mean[d]) / gen.std[d]) * nat.std[d] + nat.mean[d]
        ms2 = ms + weight * (conv - ms)
        outs.append(msmp2seq(ms2, mp, T))
    return jnp.stack(outs, axis=1) + mean

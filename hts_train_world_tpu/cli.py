"""CLI-compatible analysis / synth — the framework's equivalents of the
reference binaries (test/analysis.cpp, test/synth.cpp), including every
scaling quirk of the compressed (mgc/lf0/bap) path:

analysis (analysis.cpp:293-358):
  sp *= 1e4 (zeros -> 1e-4) -> CodeSpectralEnvelope -> mgc, mgc[0] += 12
  ap *= 1e4 -> CodeSpectralEnvelope -> bap, bap[0] -= 9.210340 (= -ln 1e4),
  tiny positive bap[0] snapped to 0.  (The reference also runs a per-frame
  SPTK mcep whose result is immediately overwritten, analysis.cpp:339-348 —
  dead compute, intentionally omitted.)
  f0 -> lf0 via log, 0 stays 0 (ToLF0, analysis.cpp:216-224).

synth (synth.cpp:171-256):
  lf0 -> f0 via exp; mgc[0] -= 12 -> DecodeSpectralEnvelope -> /1e4;
  bap[0] += 9.210340 -> SPTK mgc2sp(alpha=0.55, gamma=0) -> exp/1e4 for the
  FIRST `apl` spectral bins only (odd bap dims drop the last coefficient);
  remaining bins are 0 in practice (the reference leaves them uninitialized
  on a fresh heap, synth.cpp:239-245) and get clamped to 0.001 by
  GetSafeAperiodicity during synthesis.

Run: python -m hts_train_world_tpu.cli analysis in.wav out.lf0 out.mgc \
         out.bap [fp fftlen mgcdim bapdim]
     python -m hts_train_world_tpu.cli synth in.lf0 in.mgc in.bap out.wav \
         fp fftlen fs [mgcdim bapdim]
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu import vocoder
from hts_train_world_tpu.io import rawio, wavio
from hts_train_world_tpu.ops import codec

LN_1E4 = 9.210340  # the literal used by the CLIs (not full precision ln 1e4)
ALPHA = 0.55


def encode_features(f0, sp, ap, fs: int, fft_size: int, mgc_dim: int = 50,
                    bap_dim: int = 25):
    """analysis.cpp:293-358 compressed outputs -> (lf0, mgc, bap)."""
    sp4 = sp * 1e4
    sp4 = jnp.where(sp4 == 0.0, 1e-4, sp4)
    mgc = codec.code_spectral_envelope(sp4, fs, fft_size, mgc_dim)
    mgc = mgc.at[:, 0].add(12.0)
    ap4 = ap * 1e4
    bap = codec.code_spectral_envelope(ap4, fs, fft_size, bap_dim)
    bap0 = bap[:, 0] - LN_1E4
    bap0 = jnp.where((bap0 > 0.0) & (bap0 < 1e-4), 0.0, bap0)
    bap = bap.at[:, 0].set(bap0)
    lf0 = jnp.where(f0 != 0.0, jnp.log(jnp.where(f0 > 0, f0, 1.0)), 0.0)
    return lf0, mgc, bap


def decode_features(lf0, mgc, bap, fs: int, fft_size: int):
    """synth.cpp:171-256 -> (f0, spectrogram, aperiodicity)."""
    f0 = jnp.where(lf0 != 0.0, jnp.exp(lf0), 0.0)
    mgc = mgc.at[:, 0].add(-12.0)
    sp = codec.decode_spectral_envelope(mgc, fs, fft_size,
                                        mgc.shape[-1]) / 1e4
    apl = bap.shape[-1]
    if apl % 2 == 1:
        apl -= 1  # oddApl: order apl, all apl+1 coefficients still read
    bap = bap.at[:, 0].add(LN_1E4)
    xx = codec.mgc2sp_real(bap[:, :apl + 1], ALPHA, fft_size)
    ap = jnp.zeros((bap.shape[0], fft_size // 2 + 1), bap.dtype)
    ap = ap.at[:, :apl].set(jnp.exp(xx[:, :apl]) / 1e4)
    return f0, sp, ap


def analysis_main(argv):
    algorithm = "dio"
    if "--harvest" in argv:        # extension: Harvest F0 (harvest.cpp)
        argv = [a for a in argv if a != "--harvest"]
        algorithm = "harvest"
    wav, lf0_p, mgc_p, bap_p = argv[:4]
    fp = float(argv[4]) if len(argv) > 4 else 5.0
    fftlen = int(argv[5]) if len(argv) > 5 else 0
    mgc_dim = int(argv[6]) if len(argv) > 6 else 0
    bap_dim = int(argv[7]) if len(argv) > 7 else 24
    x, fs = wavio.wavread(wav)
    a = vocoder.analyze(jnp.asarray(x), fs, fp, fft_size=fftlen,
                        algorithm=algorithm)
    if mgc_dim:
        lf0, mgc, bap = encode_features(a.f0, a.spectrogram, a.aperiodicity,
                                        fs, a.fft_size, mgc_dim, bap_dim)
        rawio.write_f32(lf0_p, np.asarray(lf0))
        rawio.write_f32(mgc_p, np.asarray(mgc))
        rawio.write_f32(bap_p, np.asarray(bap))
    else:
        rawio.write_f32(lf0_p, np.asarray(a.f0))
        rawio.write_f32(mgc_p, np.asarray(a.spectrogram))
        rawio.write_f32(bap_p, np.asarray(a.aperiodicity))
    print(f"complete. frames={a.f0.shape[0]} fft={a.fft_size}")


def synth_main(argv):
    lf0_p, mgc_p, bap_p, wav_out, fp, fftlen, fs = argv[:7]
    fp, fftlen, fs = float(fp), int(fftlen), int(fs)
    mgc_dim = int(argv[7]) if len(argv) > 7 else 0
    bap_dim = int(argv[8]) if len(argv) > 8 else 24
    lf0 = rawio.read_f32(lf0_p).astype(np.float64)
    T = len(lf0)
    if mgc_dim:
        mgc = rawio.read_f32(mgc_p, mgc_dim).astype(np.float64)[:T]
        bap = rawio.read_f32(bap_p, bap_dim).astype(np.float64)[:T]
        f0, sp, ap = decode_features(jnp.asarray(lf0), jnp.asarray(mgc),
                                     jnp.asarray(bap), fs, fftlen)
    else:
        half = fftlen // 2 + 1
        f0 = jnp.asarray(lf0)
        sp = jnp.asarray(rawio.read_f32(mgc_p, half).astype(np.float64)[:T])
        ap = jnp.asarray(rawio.read_f32(bap_p, half).astype(np.float64)[:T])
    y = vocoder.synthesize(f0, sp, ap, fs, fftlen, fp)
    wavio.wavwrite(np.asarray(y), fs, wav_out)
    print(f"complete. samples={y.shape[0]}")


def main():
    argv = sys.argv[1:]
    # parity mode by default: the reference binaries compute in double and
    # store float32; without x64 the f32 fast path drifts visibly in the
    # log-spectral coefficients.  --f32 opts into the fast path (the one
    # bench.py measures on TPU).
    if "--f32" in argv:
        argv = [a for a in argv if a != "--f32"]
    else:
        import jax
        jax.config.update("jax_enable_x64", True)
    cmd = argv[0]
    if cmd == "analysis":
        analysis_main(argv[1:])
    elif cmd == "synth":
        synth_main(argv[1:])
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()

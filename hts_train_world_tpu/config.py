"""Typed configuration for the framework.

Replaces the reference's autoconf flag system (configure.ac) and the derived
value rules it substitutes into Makefile / data/Makefile / scripts/Config.pm:

- WORLD constants:    externs/WORLD_v2/src/world/constantnumbers.h:13-43
- CheapTrick FFT:     externs/WORLD_v2/src/cheaptrick.cpp:191-198
- D4C FFT sizes:      externs/WORLD_v2/src/d4c.cpp:262-263,344-346
- FFTLEN-from-fs:     configure.ac:540-554 (USEWORLD branch)
- FREQWARP table:     configure.ac:556-569
- stream dims:        configure.ac:575-585,671-678 + data/Makefile.in:97-100
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

# ---------------------------------------------------------------------------
# WORLD constants (constantnumbers.h)
# ---------------------------------------------------------------------------
K_PI = 3.1415926535897932384
K_MY_SAFE_GUARD_MINIMUM = 1e-12
K_EPS = 2.220446049250313e-16
K_FLOOR_F0 = 71.0
K_CEIL_F0 = 800.0
K_DEFAULT_F0 = 500.0
K_LOG2 = 0.69314718055994529
K_MAXIMUM_VALUE = 100000.0
K_FLOOR_F0_STONEMASK = 40.0
K_FREQUENCY_INTERVAL = 3000.0
K_UPPER_LIMIT = 15000.0
K_THRESHOLD = 0.85
K_FLOOR_F0_D4C = 47.0
# Codec mel scale (Stevens & Volkmann 1940)
K_M0 = 1127.01048
K_F0 = 700.0
K_FLOOR_FREQUENCY = 40.0
K_CEIL_FREQUENCY = 20000.0


def get_suitable_fft_size(sample: int) -> int:
    """2^(1+floor(log2(sample))) — common.cpp:51-54 (int-truncated log)."""
    return int(2 ** (int(math.log(sample) / K_LOG2) + 1))


def cheaptrick_fft_size(fs: int, f0_floor: float = K_FLOOR_F0) -> int:
    """cheaptrick.cpp:191-194."""
    return int(2 ** (1 + int(math.log(3.0 * fs / f0_floor + 1) / K_LOG2)))


def cheaptrick_f0_floor(fs: int, fft_size: int) -> float:
    """cheaptrick.cpp:196-198."""
    return 3.0 * fs / (fft_size - 3.0)


def d4c_love_train_fft_size(fs: int) -> int:
    """d4c.cpp:261-263 (lowest_f0 = 40)."""
    return int(2 ** (1 + int(math.log(3.0 * fs / 40.0 + 1) / K_LOG2)))


def d4c_fft_size(fs: int) -> int:
    """d4c.cpp:344-346."""
    return int(2 ** (1 + int(math.log(4.0 * fs / K_FLOOR_F0_D4C + 1) / K_LOG2)))


def number_of_aperiodicities(fs: int) -> int:
    """codec.cpp:212-215 / d4c.cpp:351-353."""
    return int(min(K_UPPER_LIMIT, fs / 2.0 - K_FREQUENCY_INTERVAL)
               / K_FREQUENCY_INTERVAL)


def fftlen_for_fs(fs: int) -> int:
    """configure.ac:540-551 (USEWORLD branch)."""
    if fs <= 25600:
        return 1024
    if fs <= 51200:
        return 2048
    if fs <= 102400:
        return 4096
    return 8192


_FREQWARP_TABLE = {8000: 0.31, 10000: 0.35, 12000: 0.37, 16000: 0.42,
                   20000: 0.44, 22050: 0.45, 32000: 0.50, 44100: 0.53,
                   48000: 0.55}


def freqwarp_for_fs(fs: int) -> float:
    """configure.ac:556-569."""
    return _FREQWARP_TABLE.get(fs, 0.0)


def samples_for_dio(fs: int, x_length: int, frame_period: float) -> int:
    """dio.cpp:638-640."""
    return int(1000.0 * x_length / fs / frame_period) + 1


@dataclasses.dataclass(frozen=True)
class AnalysisConfig:
    """WORLD analysis configuration (mirrors the analysis CLI defaults,
    test/analysis.cpp:93-203, and the data/Makefile feature target)."""
    fs: int = 48000
    frame_period: float = 5.0          # ms; Makefile: integer expr shift*1000/fs
    f0_floor: float = K_FLOOR_F0
    f0_ceil: float = K_CEIL_F0
    channels_in_octave: float = 2.0
    speed: int = 1
    allowed_range: float = 0.1
    q1: float = -0.15                  # analysis.cpp:152
    d4c_threshold: float = 0.0         # analysis.cpp:190
    fft_size: Optional[int] = None     # None -> cheaptrick_fft_size(fs)

    # feature-coding dims (configure.ac defaults for the WORLD path)
    mgc_order: int = 49                # MGCDIM = order+1 = 50
    bap_order: int = 24                # BAPDIM = order+1 = 25
    alpha: float = 0.55                # ALPHA in analysis/synth CLIs

    def resolved_fft_size(self) -> int:
        return self.fft_size if self.fft_size else cheaptrick_fft_size(
            self.fs, K_FLOOR_F0)

    @property
    def mgc_dim(self) -> int:
        return self.mgc_order + 1

    @property
    def bap_dim(self) -> int:
        return self.bap_order + 1

    def f0_length(self, x_length: int) -> int:
        return samples_for_dio(self.fs, x_length, self.frame_period)

    def y_length(self, f0_length: int) -> int:
        """synth.cpp:259."""
        return int((f0_length - 1) * self.frame_period / 1000.0 * self.fs) + 1


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """HTS CMP stream layout under the WORLD config.

    scripts/Config.pm.in:57-133 + configure.ac:575-585,671-678:
      mgc order 49 -> dim 50, lf0 dim 2 (ln f0, ln dF0), bap dim 25,
      vib dim 2 (ln depth, ln period); 3 delta windows each;
      cmp vector = 150 + 6 + 75 + 6 = 237 floats/frame.
    """
    mgc_dim: int = 50
    lf0_dim: int = 2
    bap_dim: int = 25
    vib_dim: int = 2
    n_win: int = 3

    @property
    def cmp_dim(self) -> int:
        return self.n_win * (self.mgc_dim + self.lf0_dim + self.bap_dim
                             + self.vib_dim)


def enable_x64() -> None:
    """Parity mode: the reference is double-precision throughout."""
    import jax
    jax.config.update("jax_enable_x64", True)

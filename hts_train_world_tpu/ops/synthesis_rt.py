"""Streaming (real-time) WORLD synthesizer — TPU-native equivalent of
externs/WORLD_v2/src/synthesisrealtime.cpp (SURVEY.md N10).

The reference keeps a ring buffer of parameter frames and emits
buffer_size samples per Synthesis2() call, handing off phase/F0 state
across chunks (synthesisrealtime.h:55-58).  This implementation meets the
same streaming contract with a chunked design:

- add_parameters(f0, sp, ap) enqueues frames (AddParameters);
- read(n) emits up to n finished samples, or an empty array while starved
  (the IsLocked analogue is `starved`);
- phase accumulation is carried exactly across chunks, and the pulse whose
  noise-segment length depends on the NEXT chunk is carried as a pending
  pulse, so the concatenated stream equals offline batch synthesis
  bit-for-bit given the same noise stream (gated in tests) — a stronger
  guarantee than the reference, whose RT path diverges from its batch path.

Per chunk one jitted kernel detects pulses and synthesizes their
responses (vmap over a bounded pulse axis); the overlap-add assembly and
emission watermark (latency = fft_size samples, the response's backward
reach) are tiny host-side state.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hts_train_world_tpu import config as cfg
from hts_train_world_tpu.ops import prims
from hts_train_world_tpu.ops.synthesis import _dc_remover


@partial(jax.jit, static_argnames=("fft_size", "frame_period", "fs",
                                   "chunk", "max_pulses", "T_total"))
def _chunk_pulses(f0_all, sp_all, ap_all, phase0, chunk_start,
                  pending_pidx, pending_shift, stream, stream_base,
                  fft_size: int, frame_period: float, fs: int, chunk: int,
                  max_pulses: int, T_total: int):
    """Detect pulses in samples [chunk_start, chunk_start+chunk), prepend
    the pending pulse, synthesize every pulse except the (new) last, and
    return (responses, pulse_indices, n_synth, new_pending, phase_out,
    stream_base_out)."""
    dtype = sp_all.dtype
    N = fft_size
    half = N // 2
    fp = frame_period / 1000.0
    T = T_total

    lowest_f0 = fs / N + 1.0
    cf0 = jnp.where(f0_all < lowest_f0, 0.0, f0_all)
    cvuv = jnp.where(cf0 == 0.0, 0.0, 1.0)
    t_frames = jax.lax.optimization_barrier(
        jnp.arange(T, dtype=dtype) * fp)  # same ulp discipline as batch
    time_axis = prims.exact_div(
        (chunk_start + jnp.arange(chunk)).astype(dtype), float(fs))
    if0 = prims.interp1(t_frames, cf0, time_axis, exact=True)
    ivuv_c = prims.interp1(t_frames, cvuv, time_axis, exact=True)
    ivuv_c = jnp.where(ivuv_c > 0.5, 1.0, 0.0)
    if0 = jnp.where(ivuv_c == 0.0, cfg.K_DEFAULT_F0, if0)

    def acc(c, d):
        c = c + d
        return c, c
    _, total_phase = jax.lax.scan(
        acc, phase0, prims.exact_div(2.0 * jnp.pi * if0, float(fs)),
        unroll=64)
    wrap = jnp.mod(total_phase, 2.0 * jnp.pi)
    wrap_prev = jnp.concatenate(
        [jnp.mod(phase0, 2.0 * jnp.pi)[None], wrap[:-1]])
    jump = jnp.abs(wrap - wrap_prev) > jnp.pi
    n_new = jnp.sum(jump)
    k = prims.compact_indices(jump, max_pulses - 1, chunk - 1)
    new_pidx = chunk_start + k - 1
    y1 = jnp.take(wrap_prev, k) - 2.0 * jnp.pi
    y2 = jnp.take(wrap, k)
    new_shift = (-y1 / (y2 - y1)) / fs

    has_pending = pending_pidx >= 0
    pidx = jnp.concatenate([pending_pidx[None], new_pidx])
    shifts = jnp.concatenate([pending_shift[None], new_shift])
    valid = jnp.concatenate([has_pending[None],
                             jnp.arange(max_pulses - 1) < n_new])
    # compact: drop a missing pending slot by shifting left
    order = jnp.argsort(~valid, stable=True)
    pidx = pidx[order]
    shifts = shifts[order]
    n_pulses = jnp.sum(valid)

    # synthesize all but the last (its noise size needs the next chunk)
    n_synth = jnp.maximum(n_pulses - 1, 0)
    pnext = jnp.roll(pidx, -1)
    noise_size = jnp.where(jnp.arange(max_pulses) < n_synth,
                           pnext - pidx, 0)
    noise_off = stream_base + jnp.cumsum(noise_size) - noise_size

    dc_rm = _dc_remover(N, dtype)
    kj = jnp.arange(N)

    def one_pulse(p_i, ns, off, shift_i):
        t_i = prims.exact_div(p_i.astype(dtype), float(fs))
        pos = prims.exact_div(t_i, fp)
        fl = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
        ce = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, T - 1)
        frac = pos - jnp.floor(pos)
        sp0 = jnp.abs(sp_all[fl])
        sp1 = jnp.abs(sp_all[ce])
        same = fl == ce
        sp_env = jnp.where(same, sp0, (1.0 - frac) * sp0 + frac * sp1)
        ap0 = jnp.clip(ap_all[fl], 0.001, 0.999999999999)
        ap1 = jnp.clip(ap_all[ce], 0.001, 0.999999999999)
        apr = jnp.where(same, ap0, (1.0 - frac) * ap0 + frac * ap1) ** 2
        # vuv at the pulse sample: recompute from frames (global, exact)
        vuv_i = prims.interp1(t_frames, cvuv, t_i[None], exact=True)[0]
        vuv_i = jnp.where(vuv_i > 0.5, 1.0, 0.0)
        unvoiced = (vuv_i <= 0.5) | (apr[0] > 0.999)

        log_p = jnp.log(sp_env * (1.0 - apr)
                        + cfg.K_MY_SAFE_GUARD_MINIMUM) / 2.0
        mp = prims.minimum_phase_spectrum(log_p, N)
        coef = 2.0 * jnp.pi * shift_i * fs / N
        re2 = jnp.cos(coef * jnp.arange(half + 1, dtype=dtype))
        im2 = jnp.sqrt(1.0 - re2 * re2)
        re, im = jnp.real(mp), jnp.imag(mp)
        per = prims.fftshift(jnp.fft.irfft(
            (re * re2 + im * im2) + 1j * (im * re2 - re * im2), N) * N)
        dc = jnp.sum(per[half:])
        per = jnp.where(kj < half, -dc * dc_rm, per - dc * dc_rm)
        per = jnp.where(unvoiced, 0.0, per)

        noise = jnp.where(kj < ns, jnp.take(stream, off + kj, mode="clip"),
                          0.0)
        avg = jnp.sum(noise) / jnp.maximum(ns, 1)
        noise = jnp.where(kj < ns, noise - avg, 0.0)
        nspec = jnp.fft.rfft(noise)
        tiny = prims.tiny_floor(dtype)
        log_a = jnp.where(vuv_i != 0.0,
                          jnp.log(jnp.maximum(sp_env * apr, tiny)) / 2.0,
                          jnp.log(jnp.maximum(sp_env, tiny)) / 2.0)
        mpa = prims.minimum_phase_spectrum(log_a, N)
        aper = prims.fftshift(jnp.fft.irfft(mpa * nspec, N) * N)
        return (per * jnp.sqrt(ns.astype(dtype)) + aper) / N

    responses = jax.vmap(one_pulse)(pidx, noise_size, noise_off, shifts)
    synth_mask = (jnp.arange(max_pulses) < n_synth) & (noise_size > 0)
    responses = jnp.where(synth_mask[:, None], responses, 0.0)

    last = jnp.clip(n_pulses - 1, 0, max_pulses - 1)
    new_pending = jnp.where(n_pulses > 0, pidx[last], -1)
    new_pending_shift = jnp.where(n_pulses > 0, shifts[last], 0.0)
    return (responses, pidx, n_synth, new_pending, new_pending_shift,
            total_phase[-1], stream_base + jnp.sum(noise_size))


class StreamingSynthesizer:
    """InitializeSynthesizer / AddParameters / Synthesis2 contract
    (synthesisrealtime.h:90-148) with exact batch equivalence."""

    def __init__(self, fs: int, frame_period: float = 5.0,
                 fft_size: int = 0, buffer_size: int = 1024,
                 noise_stream=None, dtype=jnp.float64):
        self.fs = fs
        self.frame_period = frame_period
        self.fft_size = fft_size or cfg.cheaptrick_fft_size(fs)
        self.buffer_size = buffer_size
        self.dtype = dtype
        self._noise = (jnp.zeros(1, dtype) if noise_stream is None
                       else jnp.asarray(noise_stream, dtype))
        self._reset_state()

    def _reset_state(self):
        self._f0 = np.zeros(0)
        self._sp = None
        self._ap = None
        self._phase = jnp.zeros((), self.dtype)
        self._pending = jnp.asarray(-1)
        self._pending_shift = jnp.zeros((), self.dtype)
        self._processed = 0   # samples with pulses detected
        self._emitted = 0
        self._acc = np.zeros(self.fft_size * 4)
        self._acc_base = 0    # global sample index of self._acc[0]
        self._stream_base = jnp.asarray(0)

    def add_parameters(self, f0, spectrogram, aperiodicity) -> None:
        f0 = np.atleast_1d(np.asarray(f0, np.float64))
        sp = np.atleast_2d(np.asarray(spectrogram))
        ap = np.atleast_2d(np.asarray(aperiodicity))
        self._f0 = np.concatenate([self._f0, f0])
        self._sp = sp if self._sp is None else np.vstack([self._sp, sp])
        self._ap = ap if self._ap is None else np.vstack([self._ap, ap])

    @property
    def starved(self) -> bool:
        fp_samples = self.frame_period / 1000.0 * self.fs
        covered = (len(self._f0) - 1) * fp_samples
        return covered < self._processed + self.buffer_size

    def _grow_acc(self, upto_global: int):
        need = upto_global - self._acc_base
        if need > len(self._acc):
            self._acc = np.concatenate(
                [self._acc, np.zeros(need - len(self._acc) + self.fft_size)])

    def read(self):
        """Process one chunk and return newly finished samples (possibly
        empty); None while starved."""
        if self.starved:
            return None
        chunk = self.buffer_size
        N = self.fft_size
        max_pulses = int(chunk * 1200.0 / self.fs) + 18
        T = len(self._f0)
        (resp, pidx, n_synth, pend, pend_shift, phase, sbase) = \
            _chunk_pulses(
                jnp.asarray(self._f0, self.dtype),
                jnp.asarray(self._sp, self.dtype),
                jnp.asarray(self._ap, self.dtype),
                self._phase, self._processed, self._pending,
                self._pending_shift, self._noise, self._stream_base,
                N, self.frame_period, self.fs, chunk, max_pulses, T)
        resp = np.asarray(resp)
        pidx = np.asarray(pidx)
        n_synth = int(n_synth)
        self._phase, self._pending, self._pending_shift = \
            phase, pend, pend_shift
        self._stream_base = sbase
        self._processed += chunk
        # host overlap-add
        for i in range(n_synth):
            start = pidx[i] - N // 2 + 1
            self._grow_acc(start + N)
            a = start - self._acc_base
            if a + N <= 0:
                continue
            lo = max(a, 0)
            self._acc[lo:a + N] += resp[i][lo - a:]
        # emission watermark: any future pulse writes at >= processed - N
        emit_upto = max(self._processed - N, 0)
        out = self._acc[self._emitted - self._acc_base:
                        emit_upto - self._acc_base].copy()
        # slide the buffer
        keep = self._acc[emit_upto - self._acc_base:]
        self._acc = np.concatenate([keep, np.zeros(self.fft_size)])
        self._acc_base = emit_upto
        self._emitted = emit_upto
        return out

    def refresh(self) -> None:
        """RefreshSynthesizer (synthesisrealtime.h:114)."""
        self._reset_state()

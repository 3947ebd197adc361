"""L3a — pitch shifters (pure JAX, real-valued, TPU-ready).

Three shifters mirroring the reference's API surface:

- :class:`PhaseVocoderPitchShift` — reference-exact rebuild of
  ``PhaseVocoderPitchShift`` (VocoderPitchShifter.py:50-306): STFT
  (normalized, center, constant pad) -> per-frame-independent stretch rule
  (including the reference's non-accumulating phase quirk, SURVEY.md
  §2.5-4) -> ISTFT (with the 1-frame irfft fallback) -> center pad/crop to
  ``(frames_out-1)*hop + n_fft`` -> linear resample to the input length.
  The reference's per-output-frame Python loop with ``.item()`` host syncs
  (VocoderPitchShifter.py:217-237) is replaced by vectorized gathers; an
  ``accumulate_phase=True`` flag switches to the librosa-correct running
  phase if desired.

- :class:`ResamplePitchShift` — ``ScriptablePitchShift``
  (1-PitchShifterWrapper.py:44-100): linear-resample speed change + center
  crop/pad; no phase preservation.

- :class:`TorchaudioPitchShift` — ``torchaudio.transforms.PitchShift``
  equivalent (used per band in PQMFPsWrapper.py:68-72): reflect-pad STFT,
  accumulating phase vocoder, ISTFT to ``round(T/rate)``, windowed-sinc
  resample back, right-crop/pad to T.

All DSP is real-valued matmul-DFT (the axon TPU backend has no complex or
FFT support) and every shape is static per (T, n_steps) configuration.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pqmf_tpu.ops import phase_vocoder as pv
from pqmf_tpu.ops import resample as rs
from pqmf_tpu.ops import stft as S

__all__ = [
    "PhaseVocoderPitchShift",
    "PitchShifter",
    "ResamplePitchShift",
    "TorchaudioPitchShift",
]


def _norm_bt(x):
    """Accept [T], [B,T] or [B,1,T] -> ([B,T], restore_mode).

    ``restore_mode`` records the original rank so :func:`_restore_bt` can
    hand back the same leading shape the caller passed (a [B,1,T] conv
    buffer comes back [B,1,T], not [B,T])."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x[None], "t"
    if x.ndim == 3 and x.shape[1] == 1:
        return x[:, 0], "b1t"
    if x.ndim != 2:
        raise ValueError("input must be [T], [B,T] or [B,1,T]")
    return x, "bt"


def _restore_bt(y, mode):
    """Undo :func:`_norm_bt`'s shape normalization."""
    if mode == "t":
        return y[0]
    if mode == "b1t":
        return y[:, None, :]
    return y


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "T",
                                   "frames_out", "accumulate"))
def _pvoc_shift_core(x, rate, n_fft, hop, win_length, T, frames_out,
                     accumulate=False):
    """The full jitted pvoc pitch-shift pipeline for one static geometry.

    x: [B, T_in >= n_fft] (already right-padded if needed).
    """
    window = S.hann_window(win_length, x.dtype)
    re, im = S.stft_ri(x, n_fft, hop, window, center=True, normalized=True,
                       pad_mode="constant")
    # reference magphase: sqrt(r^2 + i^2 + 1e-12) (VocoderPitchShifter.py:166)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    phase = jnp.arctan2(im, re)

    # f32-stepwise omega: bit-parity with the reference's construction at
    # the stretch's ±pi wrap boundaries (see phase_advance_reference)
    omega = pv.phase_advance_reference(re.shape[1], hop, n_fft, x.dtype)
    if accumulate:
        re_s, im_s = pv.stretch_accumulate(re, im, rate, omega, frames_out)
    else:
        mag_s, phi_s = pv.stretch_reference(mag, phase, rate, omega,
                                            frames_out)
        re_s = mag_s * jnp.cos(phi_s)
        im_s = mag_s * jnp.sin(phi_s)

    length_stretch = max(1, (frames_out - 1) * hop + n_fft)
    if frames_out == 1:
        # reference 1-frame fallback: direct irfft, crop to win_length
        # (VocoderTPitchShifter.py:127-138) — note it does NOT undo the
        # normalized-analysis scaling; reproduced as-is.
        Ci, Si = S.idft_basis(n_fft, x.dtype)
        hp = jax.lax.Precision.HIGHEST
        y = (jnp.einsum("bkf,kn->bfn", re_s, Ci, precision=hp)
             + jnp.einsum("bkf,kn->bfn", im_s, Si, precision=hp))[:, 0]
        y = y[..., :win_length]
    else:
        y = S.istft_ri(re_s, im_s, n_fft, hop, window, center=True,
                       normalized=True)
    # center pad / truncate to length_stretch (VocoderPitchShifter.py:287-297)
    L = y.shape[-1]
    if L < length_stretch:
        pad = length_stretch - L
        left = pad // 2
        y = jnp.pad(y, ((0, 0), (left, pad - left)))
    elif L > length_stretch:
        start = (L - length_stretch) // 2
        y = y[:, start:start + length_stretch]
    # linear resample back to the original length T
    return rs.interpolate_linear(y, T)


class PhaseVocoderPitchShift:
    """Reference-exact phase-vocoder pitch shifter.

    Call with ``x: [T] | [B,T] | [B,1,T]`` and integer ``n_steps``
    (semitones); returns the same leading shape with length preserved.
    """

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, accumulate_phase: bool = False):
        self.n_fft = int(n_fft)
        self.hop_length = int(hop_length)
        self.win_length = int(win_length)
        self.accumulate_phase = accumulate_phase

    def geometry(self, T: int, n_steps: int):
        """Static shape plan for (input length, shift): returns
        (T_padded, frames, frames_out, rate)."""
        Tp = max(T, self.n_fft)
        frames = S.frame_count(Tp, self.n_fft, self.hop_length)
        factor = 2.0 ** (float(int(n_steps)) / 12.0)
        rate = 1.0 / factor
        frames_out = max(1, int(math.floor(frames / rate)))
        return Tp, frames, frames_out, rate

    def __call__(self, x, n_steps: int):
        x, mode = _norm_bt(x)
        B, T = x.shape
        Tp, frames, frames_out, rate = self.geometry(T, n_steps)
        if Tp > T:
            x = jnp.pad(x, ((0, 0), (0, Tp - T)))
        y = _pvoc_shift_core(x, jnp.float32(rate), self.n_fft,
                             self.hop_length, self.win_length, T, frames_out,
                             accumulate=self.accumulate_phase)
        return _restore_bt(y, mode)

    forward = __call__


class ResamplePitchShift:
    """``ScriptablePitchShift`` equivalent: speed-change by linear
    interpolation to ``round(T/factor)`` then center crop/zero-pad back to
    T (1-PitchShifterWrapper.py:59-100)."""

    def __init__(self, n_steps: int):
        self.n_steps = int(n_steps)
        self.factor = float(2 ** (self.n_steps / 12.0))

    def __call__(self, x):
        x, mode = _norm_bt(x)
        B, T = x.shape
        new_len = max(1, int(round(float(T) / self.factor)))
        y = rs.interpolate_linear(x, new_len)
        cur = y.shape[-1]
        if cur > T:
            start = (cur - T) // 2
            y = y[:, start:start + T]
        elif cur < T:
            pad = T - cur
            left = pad // 2
            y = jnp.pad(y, ((0, 0), (left, pad - left)))
        return _restore_bt(y, mode)

    forward = __call__


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "T",
                                   "frames_out", "len_stretch", "orig_freq",
                                   "new_freq"))
def _ta_shift_core(x, rate, n_fft, hop, win_length, T, frames_out,
                   len_stretch, orig_freq, new_freq):
    window = S.hann_window(win_length, x.dtype)
    re, im = S.stft_ri(x, n_fft, hop, window, center=True, normalized=False,
                       pad_mode="reflect")
    omega = pv.phase_advance(re.shape[1], hop, n_fft, x.dtype)
    re_s, im_s = pv.stretch_accumulate(re, im, rate, omega, frames_out)
    y = S.istft_ri(re_s, im_s, n_fft, hop, window, center=True,
                   normalized=False, length=len_stretch)
    y = rs.sinc_resample(y, orig_freq, new_freq)
    # right crop / right zero-pad to T (torchaudio pitch_shift tail handling)
    cur = y.shape[-1]
    if cur >= T:
        return y[:, :T]
    return jnp.pad(y, ((0, 0), (0, T - cur)))


class TorchaudioPitchShift:
    """``torchaudio.transforms.PitchShift`` equivalent.

    rate = 2^(n_steps/bins_per_octave); phase-vocoder time stretch by
    ``rate`` (accumulating phase), ISTFT to ``round(T/rate)``, sinc
    resample ``int(sr/rate) -> sr`` (TRUNCATING, exactly torchaudio's
    rounding — ``round()`` measured 15-18 dB vs the independent torch
    oracle in tests/ta_oracle.py when the two differ), crop/pad to T.
    """

    def __init__(self, sample_rate: int, n_steps: int,
                 bins_per_octave: int = 12, n_fft: int = 512,
                 win_length: int | None = None, hop_length: int | None = None):
        self.sample_rate = int(sample_rate)
        self.n_steps = int(n_steps)
        self.bins_per_octave = int(bins_per_octave)
        self.n_fft = int(n_fft)
        self.win_length = int(win_length or n_fft)
        self.hop_length = int(hop_length or self.win_length // 4)
        # torchaudio: rate applied to the STFT timeline is 2^(-n/bins) —
        # stretch longer for upward shifts, then resample back shorter
        self.rate = 2.0 ** (-float(self.n_steps) / self.bins_per_octave)

    def geometry(self, T: int):
        frames = S.frame_count(T, self.n_fft, self.hop_length)
        frames_out = int(math.ceil(frames / self.rate))
        len_stretch = int(round(T / self.rate))
        # torchaudio's exact (truncating) rounding of the stretched sample
        # rate: `resample(stretch, int(sample_rate / rate), sample_rate)`.
        # round() here measured 15-18 dB vs the independent torch oracle
        # whenever the two roundings differ (tests/ta_oracle.py); int()
        # holds >90 dB
        orig = int(self.sample_rate / self.rate)
        return frames, frames_out, len_stretch, orig

    def __call__(self, x):
        x, mode = _norm_bt(x)
        B, T = x.shape
        frames, frames_out, len_stretch, orig = self.geometry(T)
        if self.n_steps == 0:
            return _restore_bt(x, mode)
        y = _ta_shift_core(x, jnp.float32(self.rate), self.n_fft,
                           self.hop_length, self.win_length, T, frames_out,
                           len_stretch, orig, self.sample_rate)
        return _restore_bt(y, mode)

    forward = __call__


class PitchShifter:
    """Fixed-shift adapter holding ``n_steps`` and delegating to a
    :class:`PhaseVocoderPitchShift` instance (reference ``PitchShifter``,
    1-PitchShifterWrapper.py:31-40; its defaults n_fft=4096, hop=128,
    win=1024 are always overridden by the pipeline's derived geometry,
    SURVEY.md §2.5-9)."""

    def __init__(self, n_steps: int, n_fft: int = 4096,
                 hop_length: int = 128, win_length: int = 1024):
        self.n_steps = int(n_steps)
        self.shifter = PhaseVocoderPitchShift(n_fft, hop_length, win_length)

    def __call__(self, x):
        return self.shifter(x, self.n_steps)

    forward = __call__

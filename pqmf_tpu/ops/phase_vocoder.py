"""Phase-vocoder time-stretch — fully vectorized over output frames.

Two stretch rules are provided:

- :func:`stretch_reference` reproduces the reference's
  ``PhaseVocoderPitchShift._phase_vocoder`` (VocoderPitchShifter.py:176-238)
  *exactly*, including its documented quirk (SURVEY.md §2.5-4): the output
  phase of frame j is rebuilt from the source frame's phase
  (``phi = phi0 + omega + a*princarg(phi1-phi0-omega)``), NOT accumulated
  across output frames. Because each output frame is independent, the
  reference's per-frame Python loop (+ ``.item()`` syncs) vectorizes into
  pure gathers — the TPU version is one fused XLA program.

- :func:`stretch_accumulate` implements the librosa/torchaudio running-
  phase rule (cumulative sum of wrapped per-frame advances), used by the
  torchaudio-equivalent pitch shifter.

Both are shape-static: ``frames_out`` is passed explicitly so per-band
pipelines can pad to a common maximum and mask.

Frame selection is a one-hot MATMUL, not a gather: ``jnp.take`` over the
minor axis with traced indices is the pattern this TPU executes ~100x too
slow (see the TA banded resample / interpolate_linear_dynamic); selecting
with an exact 0/1 matrix at HIGHEST precision is bit-identical (each
output row sums exactly one ``x*1.0`` against zeros) and MXU-shaped.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "principal_angle",
    "phase_advance",
    "phase_advance_reference",
    "stretch_reference",
    "stretch_accumulate",
]


def principal_angle(x: jax.Array) -> jax.Array:
    """Wrap angle to [-pi, pi] (reference: VocoderPitchShifter.py:39-47,
    via remainder — matching its edge behavior)."""
    two_pi = 2.0 * math.pi
    return jnp.remainder(x + math.pi, two_pi) - math.pi


def phase_advance(n_freq: int, hop_length: int, n_fft: int,
                  dtype=jnp.float32) -> jax.Array:
    """Expected per-hop phase advance per bin:
    ``omega_k = 2 pi k hop / n_fft`` (VocoderPitchShifter.py:197-198);
    equals torchaudio's ``linspace(0, pi*hop, n_freq)`` when
    ``n_freq = n_fft//2 + 1``. Computed in float64 then cast — use this
    for the torchaudio-rule paths (stretch_accumulate)."""
    k = np.arange(n_freq)
    return jnp.asarray(2.0 * np.pi * k * hop_length / n_fft, dtype)


def phase_advance_reference(n_freq: int, hop_length: int, n_fft: int,
                            dtype=jnp.float32) -> jax.Array:
    """Bit-exact transcription of the reference's omega construction
    (VocoderPitchShifter.py:197-198): float32 STEPWISE
    ``2.0*pi * k * hop / n_fft``, matching torch's scalar-op rounding at
    every step. This matters: the float64-then-cast values of
    :func:`phase_advance` differ by 1 ulp on ~1/3 of the bins, and the
    stretch's boundary-clamped frames (t1 == t0, reference
    VocoderPitchShifter.py:212) feed ``princarg(-omega)`` EXACTLY at the
    ±pi wrap for every other even bin — a 1-ulp omega difference there
    flips the wrap branch systematically, which measured 25-60 dB
    against the live pqmfpvoc.ts artifact for shifts whose stretch reads
    the clamped frame (+6/+7/+9); bit-exact omega restores >100 dB
    (tests/test_reference_artifact.py)."""
    k = np.arange(n_freq, dtype=np.float32)
    om = np.float32(2.0 * math.pi) * k * np.float32(hop_length)
    return jnp.asarray(om / np.float32(n_fft), dtype)


@partial(jax.jit, static_argnames=("frames_out",))
def stretch_reference(mag: jax.Array, phase: jax.Array, rate: jax.Array,
                      omega: jax.Array, frames_out: int):
    """Reference-rule stretch. mag/phase: [B, F, frames]; rate: scalar
    (traced ok); omega: [F]. Returns (mag_s, phase_s) with ``frames_out``
    frames.

    For j in [0, frames_out): t' = j*rate; t0 = floor(t'); t1 = min(t0+1,
    frames-1); a = t'-t0; mag_j = lerp; phase_j = phi0 + omega +
    a*princarg(phi1 - phi0 - omega).
    """
    B, F, frames = mag.shape
    t_prime = jnp.arange(frames_out, dtype=mag.dtype) * rate
    t0 = jnp.floor(t_prime).astype(jnp.int32)
    t0 = jnp.clip(t0, 0, frames - 1)
    t1 = jnp.minimum(t0 + 1, frames - 1)
    a = (t_prime - t0.astype(mag.dtype))[None, None, :]

    mag0, phi0 = _select_frames(mag, phase, t0)
    mag1, phi1 = _select_frames(mag, phase, t1)
    mag_s = (1.0 - a) * mag0 + a * mag1

    om = omega[None, :, None]
    dp = principal_angle(phi1 - phi0 - om)
    phase_s = phi0 + om + a * dp
    return mag_s, phase_s


# lowering crossover, measured on chip (tools/ab_pipeline_select.py
# --streams 16, verify ledger): at serving block shapes (frames ~5) the
# gathers are ~9% faster end-to-end across 16 streams — the r2->r3
# serving regression — while at whole-file shapes (frames in the
# hundreds) minor-dim gathers with traced indices are the documented
# ~100x-slow pattern and the one-hot matmul wins. Both forms are
# bit-identical (each output row is exactly one x*1.0 against exact
# zeros), so the frame-count switch is purely a lowering choice.
_TAKE_MAX_FRAMES = 32

# trace-time probe pin: "take"/"onehot" force one lowering regardless of
# the crossover. Set only by tools/ab_{stretch,pipeline}_select.py
# between fresh jits, for same-window A/Bs of the two lowerings.
_FORCE_SELECT = None


def _select_frames(p: jax.Array, q: jax.Array, idx: jax.Array):
    """(p, q)[..., idx] along the minor frames axis: a one-hot 0/1
    matmul at HIGHEST precision for large frame counts (gather-free,
    bit-exact), jnp.take below the measured crossover where the gathers
    lower faster (module comment at _TAKE_MAX_FRAMES). p, q: [B, F, T];
    idx: [O] int32 in range -> ([B, F, O], [B, F, O])."""
    T = p.shape[-1]
    mode = _FORCE_SELECT or (
        "take" if T <= _TAKE_MAX_FRAMES else "onehot")
    if mode == "take":
        return jnp.take(p, idx, axis=-1), jnp.take(q, idx, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], T), 1)
    sel = (cols == idx[:, None]).astype(p.dtype)  # [O, T]
    both = jnp.einsum("bft,ot->bfo", jnp.concatenate([p, q], axis=0), sel,
                      precision=jax.lax.Precision.HIGHEST)
    B = p.shape[0]
    return both[:B], both[B:]


@partial(jax.jit, static_argnames=("frames_out",))
def stretch_accumulate(re: jax.Array, im: jax.Array, rate: jax.Array,
                       omega: jax.Array, frames_out: int):
    """torchaudio-style ``phase_vocoder`` with running phase accumulation,
    real-valued throughout (the TPU backend has no complex dtypes):
    (re, im) [B, F, frames] -> (re_s, im_s) [B, F, frames_out].

    Mirrors torchaudio.functional.phase_vocoder: source positions
    ``t = j*rate``; spec is zero-padded by 2 frames on the right; the
    per-step wrapped phase increment is accumulated with a cumulative sum
    seeded by the phase of the first sampled frame.
    """
    B, F, frames = re.shape
    re_p = jnp.pad(re, ((0, 0), (0, 0), (0, 2)))
    im_p = jnp.pad(im, ((0, 0), (0, 0), (0, 2)))
    t = jnp.arange(frames_out, dtype=jnp.float32) * rate
    t0 = jnp.floor(t).astype(jnp.int32)
    alphas = (t - t0.astype(jnp.float32))[None, None, :]
    # clamp into the padded spec: a no-op for in-range stretches
    # (j*rate < frames by construction), and required when frames_out is
    # a shared padded maximum across bands whose excess frames are
    # masked downstream
    t0 = jnp.minimum(t0, frames)

    r0, i0 = _select_frames(re_p, im_p, t0)
    r1, i1 = _select_frames(re_p, im_p, t0 + 1)

    angle_0 = jnp.arctan2(i0, r0)
    angle_1 = jnp.arctan2(i1, r1)
    norm_0 = jnp.sqrt(r0 * r0 + i0 * i0)
    norm_1 = jnp.sqrt(r1 * r1 + i1 * i1)

    om = omega[None, :, None]
    phase = angle_1 - angle_0 - om
    phase = phase - 2.0 * math.pi * jnp.round(phase / (2.0 * math.pi))
    phase = phase + om

    phase_0 = angle_0[..., :1]
    incs = jnp.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(incs, axis=-1)

    mag = alphas * norm_1 + (1.0 - alphas) * norm_0
    return mag * jnp.cos(phase_acc), mag * jnp.sin(phase_acc)

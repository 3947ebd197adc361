"""Resampling ops (pure JAX, jit/vmap-safe).

Two resamplers exist in the reference stack:

1. Linear interpolation — ``F.interpolate(mode='linear',
   align_corners=False)``, used by the phase-vocoder shifter to map the
   stretched signal back to the input length
   (VocoderPitchShifter.py:299-302) and by ``ScriptablePitchShift``
   (1-PitchShifterWrapper.py:82). Reimplemented exactly (tested vs torch).

2. Windowed-sinc polyphase resampling — what
   ``torchaudio.functional.resample`` does inside
   ``torchaudio.transforms.PitchShift`` (PQMFPsWrapper.py:71).
   Reimplemented from the published algorithm (sinc kernel bank at the
   reduced rate ratio, Hann or Kaiser windowed); torchaudio itself is not
   available in this environment, so it is validated by DSP properties
   (tone frequency scaling, DC preservation, output length).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "interpolate_linear",
    "interpolate_linear_dynamic",
    "interpolate_linear_dynamic_gather",
    "interpolate_linear_dynamic_chunked",
    "sinc_resample_kernel",
    "sinc_resample",
    "banded_resample_plan",
]


@partial(jax.jit, static_argnames=("size",))
def interpolate_linear(x: jax.Array, size: int) -> jax.Array:
    """``F.interpolate(x, size, mode='linear', align_corners=False)``.

    x: [..., T] -> [..., size]. Source coordinate of output i is
    ``(i + 0.5) * T/size - 0.5`` clamped to [0, T-1].

    Lowering note: this static-shape form keeps the two minor-dim gathers
    (their indices are compile-time constants here). It serves the
    *standalone* shifters (CLI / offline whole-file use, where a one-hot
    [size, T] weight matrix would be O(T^2) memory); the fused on-chip
    pipelines use :func:`interpolate_linear_dynamic`'s gather-free
    one-hot matmul instead.
    """
    T = x.shape[-1]
    scale = T / size
    src = (jnp.arange(size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, T - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    a = (src - i0).astype(x.dtype)
    return x[..., i0] * (1 - a) + x[..., i1] * a


@partial(jax.jit, static_argnames=("size",))
def interpolate_linear_dynamic(x: jax.Array, src_len: jax.Array, size: int):
    """Like :func:`interpolate_linear`, but the *effective* source length is
    a traced scalar ``src_len <= x.shape[-1]`` (the valid prefix of a
    padded buffer). This is what lets the per-band pitch-shift pipeline —
    where each band stretches to a different length — run as ONE vmapped
    XLA program with static shapes.

    Gather-free: the lerp is one ``[B, T] @ [T, size]`` matmul against a
    two-nonzeros-per-column weight matrix built from iota==index
    compares — ~100x faster on TPU, where minor-dim gathers dominate
    everything else in the pipeline. Matches the gather formulation to
    the last bit except where the clamp makes i0 == i1 (the final output
    sample of some lengths): there the weights sum before the multiply
    (``((1-a)+a)*x`` vs ``x*(1-a)+x*a``), which can differ by one ulp.
    """
    T = x.shape[-1]
    slf = src_len.astype(jnp.float32)
    src = (jnp.arange(size, dtype=jnp.float32) + 0.5) * (slf / size) - 0.5
    src = jnp.clip(src, 0.0, jnp.maximum(slf - 1, 0))
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(src_len - 1, 0))
    i0 = jnp.clip(i0, 0, T - 1)
    i1 = jnp.clip(i1, 0, T - 1)
    a = (src - i0).astype(x.dtype)
    p = jax.lax.broadcasted_iota(jnp.int32, (size, T), 1)
    Wm = ((p == i0[:, None]).astype(x.dtype) * (1 - a)[:, None]
          + (p == i1[:, None]).astype(x.dtype) * a[:, None])
    return jnp.einsum("...p,jp->...j", x, Wm,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("size",))
def interpolate_linear_dynamic_gather(x: jax.Array, src_len: jax.Array,
                                      size: int):
    """Linear-memory form of :func:`interpolate_linear_dynamic`: two
    traced-index gathers instead of the O(T * size) one-hot matmul.

    The gather is the slow per-element pattern on this TPU, but it scales
    linearly — the right trade for OFFLINE whole-file inputs where the
    one-hot weight matrix would be gigabytes (same trade the TA pipeline
    makes with ``resample_kind="gather"``). Matches the one-hot form to
    float round-off (identical index/weight math; the one-hot's documented
    1-ulp clamp-case difference applies in reverse here).
    """
    T = x.shape[-1]
    slf = src_len.astype(jnp.float32)
    src = (jnp.arange(size, dtype=jnp.float32) + 0.5) * (slf / size) - 0.5
    src = jnp.clip(src, 0.0, jnp.maximum(slf - 1, 0))
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(src_len - 1, 0))
    i0 = jnp.clip(i0, 0, T - 1)
    i1 = jnp.clip(i1, 0, T - 1)
    a = (src - i0).astype(x.dtype)
    return (jnp.take(x, i0, axis=-1) * (1 - a)
            + jnp.take(x, i1, axis=-1) * a)


@partial(jax.jit, static_argnames=("size", "chunk"))
def interpolate_linear_dynamic_chunked(x: jax.Array, src_len: jax.Array,
                                       size: int, chunk: int = 2048):
    """Chunked one-hot form of :func:`interpolate_linear_dynamic` for
    WHOLE-FILE sizes: identical index/weight math, executed as a
    ``lax.scan`` of ``size/chunk`` small one-hot matmuls instead of one
    O(T * size) weight matrix (gigabytes at file scale) or two minor-dim
    gathers (the ~100x-slow pattern on this TPU — the r4 whole-file
    bench's only non-matmul stage).

    Each output chunk's source taps live in a contiguous span of at most
    ``ceil(chunk * T/size) + 3`` input samples (the lerp is monotonic, 2
    taps per output), so the scan body dynamic-slices that bounded span,
    builds a [chunk, span] two-nonzeros-per-row weight matrix from
    iota==index compares in LOCAL coordinates, and runs one
    ``[B, span] @ [span, chunk]`` dot. Weights match the one-hot form
    bit-for-bit (same a, same clamped i0/i1), so results agree to the
    matmul's float32 reduction-order round-off.
    """
    T = x.shape[-1]
    if size % chunk:
        raise ValueError(f"size {size} must be a multiple of chunk {chunk}")
    n_chunks = size // chunk
    # static span bound: src advances by scale = src_len/size <= T/size
    # per output sample, so a chunk's i1 range fits in chunk*T/size + 3.
    # The bound REQUIRES src_len <= T (the callers' contract: the stretch
    # length never exceeds its buffer); clamp so an out-of-contract
    # src_len degrades to resampling the whole buffer instead of silently
    # zeroing taps whose local indices would fall outside the span (the
    # sibling forms clamp per-tap indices and tolerate such inputs)
    src_len = jnp.minimum(src_len, T)
    span = min(T, -(-chunk * T // size) + 3)
    slf = src_len.astype(jnp.float32)
    scale = slf / size

    j_local = jnp.arange(chunk, dtype=jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (chunk, span), 1)

    def body(_, c):
        src = (c.astype(jnp.float32) * chunk + j_local + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, jnp.maximum(slf - 1, 0))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, jnp.maximum(src_len - 1, 0))
        i0 = jnp.clip(i0, 0, T - 1)
        i1 = jnp.clip(i1, 0, T - 1)
        a = (src - i0).astype(x.dtype)
        # base <= i0[0] <= every tap; clamped so base+span <= T. The
        # clamp only DECREASES base, and i1 - i0[0] <= chunk*scale + 1
        # <= span - 2, so local indices stay inside [0, span).
        base = jnp.minimum(i0[0], T - span)
        sl = jax.lax.dynamic_slice_in_dim(x, base, span, axis=-1)
        l0 = (i0 - base)[:, None]
        l1 = (i1 - base)[:, None]
        Wm = ((p == l0).astype(x.dtype) * (1 - a)[:, None]
              + (p == l1).astype(x.dtype) * a[:, None])
        y = jnp.einsum("...p,jp->...j", sl, Wm,
                       precision=jax.lax.Precision.HIGHEST)
        return None, y

    _, ys = jax.lax.scan(body, None,
                         jnp.arange(n_chunks, dtype=jnp.int32))
    # ys: [n_chunks, ..., chunk] -> [..., size]
    ys = jnp.moveaxis(ys, 0, -2)
    return ys.reshape(*x.shape[:-1], size)


def sinc_resample_kernel(orig_freq: int, new_freq: int,
                         lowpass_filter_width: int = 6,
                         rolloff: float = 0.99,
                         window: str = "hann",
                         beta: float | None = None,
                         dtype=np.float32):
    """Build the polyphase windowed-sinc kernel bank (host-side NumPy),
    following the torchaudio/resampy construction: one FIR per output
    phase at the reduced ratio ``new/orig``.

    Returns (kernels [new_freq, 1, K], width) where width is the one-sided
    support in input samples.
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_freq, new_freq = int(orig_freq) // g, int(new_freq) // g

    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx[None]
         ) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if window == "hann":
        win = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    elif window == "kaiser":
        if beta is None:
            beta = 14.769656459379492  # torchaudio's default
        win = np.i0(beta * np.sqrt(np.clip(
            1 - (t / lowpass_filter_width) ** 2, 0, 1))) / np.i0(beta)
    else:
        raise ValueError(f"unknown window {window}")

    scale = base_freq / orig_freq
    with np.errstate(invalid="ignore", divide="ignore"):
        kernels = np.where(t == 0, 1.0, np.sin(np.pi * t) / (np.pi * t))
    kernels = (kernels * win * scale).astype(dtype)
    return kernels[:, None, :], width, orig_freq, new_freq


def banded_resample_plan(orig_freq: int, new_freq: int, n_out: int,
                         lowpass_filter_width: int = 6,
                         rolloff: float = 0.99, window: str = "hann"):
    """Row-sparse (banded) form of :func:`sinc_resample` for a fixed output
    length (host-side NumPy, one-time per plan).

    Each output sample of the polyphase windowed-sinc resampler reads only
    the ~``2*width+1`` input taps under its sinc support, so the whole
    resample is ``z[j] = sum_k W[j, k] * y[start[j] + k]`` — a gather plus
    a tiny weighted sum that batches across sub-bands with *different*
    ratios in ONE fused program (each band pads its W rows / start indices
    to a common tap count). This is what lets the torchaudio-variant
    pitch-shift pipeline run as a single XLA dispatch instead of 16
    (reference per-band loop, PQMFPsWrapper.py:126-144).

    Returns ``(W [n_out, K_taps], start [n_out] int32, width)`` with
    ``start`` in *unpadded* input coordinates (may be negative down to
    ``-width``; callers left-pad the input by >= width and offset).
    Row ``j`` reproduces ``sinc_resample(y, orig, new)[..., j]`` exactly
    for any input length T with ``j < ceil(T * new/orig)`` (taps beyond T
    read zeros, matching the conv's zero padding); rows past the caller's
    valid output length should be zeroed by the caller.
    """
    if orig_freq == new_freq:
        # identity plan, mirroring torchaudio's equal-rate short-circuit
        # (and sinc_resample's): one unit tap per output row
        return (np.ones((n_out, 1), np.float32),
                np.arange(n_out, dtype=np.int32), 0)
    kernels, width, o, n = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff, window)
    kern = kernels[:, 0, :]  # [n, K], K = 2*width + o

    # per used phase: nonzero span (the sinc support; everything outside
    # is exactly zero because the cos^2 window vanishes at |t| = width)
    used = sorted({j % n for j in range(n_out)})
    spans = {}
    for p in used:
        nz = np.flatnonzero(kern[p] != 0.0)
        spans[p] = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 1)
    K_taps = max(hi - lo for lo, hi in spans.values())

    W = np.zeros((n_out, K_taps), kern.dtype)
    start = np.zeros((n_out,), np.int32)
    for j in range(n_out):
        s, p = divmod(j, n)
        lo, hi = spans[p]
        W[j, : hi - lo] = kern[p, lo:hi]
        start[j] = s * o - width + lo
    return W, start, width


@partial(jax.jit, static_argnames=("orig_freq", "new_freq",
                                   "lowpass_filter_width", "rolloff",
                                   "window"))
def sinc_resample(x: jax.Array, orig_freq: int, new_freq: int,
                  lowpass_filter_width: int = 6, rolloff: float = 0.99,
                  window: str = "hann") -> jax.Array:
    """Windowed-sinc polyphase resample, torchaudio-style.

    x: [B, T] -> [B, ceil(T * new/orig)].
    """
    if orig_freq == new_freq:
        # torchaudio short-circuits equal rates to identity BEFORE any
        # filtering (functional.resample); without this the 0.99-rolloff
        # lowpass would attenuate near-Nyquist content at ratio 1
        return x
    kernels, width, o, n = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff, window)
    B, T = x.shape
    target_len = int(math.ceil(new_freq * T / orig_freq))
    K = kernels.shape[-1]
    # im2col + ONE matmul instead of a conv with n_phases output channels:
    # after gcd reduction n_phases can reach the thousands (e.g. large
    # semitone shifts at prime sub-band rates), which blows up TPU conv
    # lowering (scoped-VMEM OOM); frames [B, S, K] @ [K, n] is tiny.
    xp = jnp.pad(x, ((0, 0), (width, width + o)))
    S = -(-T // o)  # conv steps: one per n output samples
    idx = (np.arange(S)[:, None] * o + np.arange(K)[None, :])
    frames = xp[:, idx]  # [B, S, K]
    y = jnp.einsum("bsk,pk->bsp", frames, jnp.asarray(kernels[:, 0, :]),
                   precision=jax.lax.Precision.HIGHEST)
    # output sample s*n + p comes from phase p at step s
    y = y.reshape(B, -1)
    return y[:, :target_len]

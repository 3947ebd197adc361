"""Analytic evidence for the windowed-sinc resampler (VERDICT r1 item 8).

torchaudio is not installable here, so ``ops.resample.sinc_resample`` —
the engine under the torchaudio-variant pitch shifter (reference
PQMFPsWrapper.py:71) — is validated against closed-form mathematics
instead of recorded outputs: band-limited multi-tones through every one
of the 16 default band ratios must reproduce the continuous-time signal
at the new rate (>60 dB interior SNR; any kernel-bank index or phase
slip collapses this to ~0 dB), plus DC preservation and Nyquist
rejection edge cases, and exact equality of the banded (fused-pipeline)
formulation against the reference implementation.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from pqmf_tpu.ops import resample as rs

SUB_SR = 2756  # round(44100/16), the default TA-variant sub-band rate


def _band_ratios():
    """(orig, new) for the chromatic default shifts 0..15
    (PQMFPsWrapper.py:57-72 geometry)."""
    out = []
    for s in range(16):
        rate = 2.0 ** (-s / 12.0)
        orig = int(round(SUB_SR / rate))
        if orig != SUB_SR:
            out.append((orig, SUB_SR))
    return out


def _multitone(freqs, amps, phases, sr, n):
    t = np.arange(n) / sr
    x = np.zeros(n, np.float64)
    for f, a, p in zip(freqs, amps, phases):
        x += a * np.sin(2 * np.pi * f * t + p)
    return x


@pytest.mark.parametrize("orig,new", _band_ratios())
def test_multitone_through_band_ratio(orig, new):
    """Tones in the lower passband come out at the exact closed-form
    positions: frequency scaling, interpolation phase, and output-index
    mapping all verified at once."""
    ny = min(orig, new) / 2
    freqs = (0.07 * ny, 0.19 * ny, 0.31 * ny)
    amps = (0.7, 0.25, 0.1)
    phases = (0.3, 1.1, 2.4)
    T = 4096
    x = _multitone(freqs, amps, phases, orig, T).astype(np.float32)
    y = np.asarray(rs.sinc_resample(jnp.asarray(x[None]), orig, new))[0]
    assert y.shape[-1] == int(math.ceil(T * new / orig))
    want = _multitone(freqs, amps, phases, new, y.shape[-1])
    lo, hi = 64, y.shape[-1] - 64  # exclude the kernel's edge transients
    err = y[lo:hi] - want[lo:hi]
    snr = 10 * np.log10((want[lo:hi] ** 2).sum() / (err ** 2).sum())
    assert snr > 60, f"{orig}->{new}: interior SNR {snr:.1f} dB"


def test_dc_preserved_across_ratios():
    for orig, new in [(2920, 2756), (6555, 2756), (1378, 2756),
                      (44100, 22050)]:
        x = jnp.full((1, 2048), 0.5, jnp.float32)
        y = np.asarray(rs.sinc_resample(x, orig, new))[0]
        inner = y[64:-64]
        np.testing.assert_allclose(inner, 0.5, rtol=0, atol=2e-3)


def test_nyquist_tone_rejected_on_downsample():
    """A tone above the output Nyquist must be attenuated by the lowpass
    (this is what makes it a resampler, not a decimator)."""
    orig, new = 5512, 2756
    T = 8192
    t = np.arange(T) / orig
    f = 0.45 * orig  # 0.9 of input Nyquist, far above output Nyquist
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(rs.sinc_resample(jnp.asarray(x[None]), orig, new))[0]
    in_rms = np.sqrt((x ** 2).mean())
    out_rms = np.sqrt((y[64:-64] ** 2).mean())
    assert out_rms < in_rms * 10 ** (-20 / 20), (
        f"aliased energy only {20*np.log10(out_rms/in_rms):.1f} dB down")


def test_identity_ratio_exact():
    """Equal rates are an exact identity — torchaudio.functional.resample
    short-circuits BEFORE any filtering, so even full-band content (which
    the 0.99-rolloff lowpass would attenuate) must pass through bit-exactly;
    the banded plan mirrors the same short-circuit with unit-tap rows."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1024)).astype(np.float32)  # full-band
    y = np.asarray(rs.sinc_resample(jnp.asarray(x), SUB_SR, SUB_SR))
    np.testing.assert_array_equal(y, x)

    W, start, width = rs.banded_resample_plan(SUB_SR, SUB_SR, 64)
    assert width == 0
    np.testing.assert_array_equal(W[:, 0], np.ones(64, np.float32))
    np.testing.assert_array_equal(start, np.arange(64, dtype=np.int32))


@pytest.mark.parametrize("orig,new", [(2920, 2756), (6555, 2756),
                                      (1378, 2756), (11024, 2756)])
def test_banded_plan_equals_reference_resampler(orig, new):
    """The banded (gather + weighted-sum) form used by the fused TA
    pipeline is numerically the SAME operator as sinc_resample."""
    rng = np.random.default_rng(1)
    T = 517  # deliberately not a multiple of anything
    x = rng.standard_normal((2, T)).astype(np.float32)
    ref = np.asarray(rs.sinc_resample(jnp.asarray(x), orig, new))
    n_out = ref.shape[-1]
    W, start, width = rs.banded_resample_plan(orig, new, n_out)
    pad_left = width
    need = int(start.max()) + W.shape[-1] + pad_left
    xp = np.pad(x, ((0, 0), (pad_left, max(0, need - (T + pad_left)))))
    idx = (start[:, None] + pad_left
           + np.arange(W.shape[-1])[None]).astype(np.int32)
    z = (xp[:, idx] * W[None]).sum(-1)
    np.testing.assert_allclose(z, ref, atol=1e-6)


def test_plan_rows_past_target_are_callers_problem():
    """banded_resample_plan rows are T-independent: the same plan serves
    any input length, matching sinc_resample for j < ceil(T*new/orig)."""
    orig, new = 3472, 2756
    W, start, width = rs.banded_resample_plan(orig, new, 256)
    for T in (100, 301):
        x = np.random.default_rng(2).standard_normal((1, T)).astype(
            np.float32)
        ref = np.asarray(rs.sinc_resample(jnp.asarray(x), orig, new))[0]
        valid = ref.shape[-1]
        pad_left = width
        need = int(start.max()) + W.shape[-1] + pad_left
        xp = np.pad(x, ((0, 0), (pad_left, max(0, need - (T + pad_left)))))
        idx = (start[:, None] + pad_left
               + np.arange(W.shape[-1])[None]).astype(np.int32)
        z = (xp[:, idx] * W[None]).sum(-1)[0]
        np.testing.assert_allclose(z[:min(256, valid)],
                                   ref[:min(256, valid)], atol=1e-6)

"""Independent-oracle parity for the torchaudio-variant chain (VERDICT r2
item 2): ``tests/ta_oracle.py`` re-derives torchaudio's phase_vocoder /
resample / pitch_shift in torch (torch's own complex FFT + conv1d kernels,
no JAX), and these tests pin the JAX implementations against it — unit by
unit and end-to-end through the fused wrapper.

This oracle has teeth: it caught a real transcription slip on first run
(``TorchaudioPitchShift`` used ``round(sr/rate)`` for the resample source
rate where torchaudio truncates with ``int()`` — 15-18 dB parity whenever
the two roundings differ, >90 dB once fixed) that the structural
self-oracle (``pitchshifter_loop``, same primitives) could never see.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pqmf_tpu.ops import phase_vocoder as pv
from pqmf_tpu.ops import resample as rs
from pqmf_tpu.ops import stft as S
from pqmf_tpu.shifters import TorchaudioPitchShift

from oracles import snr_db
from ta_oracle import torch_phase_vocoder, torch_pitch_shift, torch_resample

SUB_SR = round(44100 / 16)  # 2756: the reference's per-band rate


@pytest.mark.parametrize("orig,new", [
    (2756, 2920),    # n=+1 band rate pair (non-trivial gcd reduction: 4)
    (2919, 2756),    # the truncated (int()) n=+1 pair
    (2064, 2756),    # n=-5
    (11025, 8268),
    (44100, 22050),  # integer decimation
    (2756, 8268),    # integer upsample x3
    (5512, 2756),
])
def test_sinc_resample_matches_torchaudio_oracle(orig, new):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 700)) * 0.5).astype(np.float32)
    want = torch_resample(torch.from_numpy(x), orig, new).numpy()
    got = np.asarray(rs.sinc_resample(jnp.asarray(x), orig, new))
    assert got.shape == want.shape
    s = snr_db(want, got)
    assert s > 80, f"resample {orig}->{new}: {s:.1f} dB vs torch oracle"


@pytest.mark.parametrize("n_steps", [1, -3, 5, -7, 12])
def test_stretch_accumulate_matches_torchaudio_phase_vocoder(n_steps):
    """The running-phase stretch (real-valued RI form) == torchaudio's
    complex ``phase_vocoder`` on the same spectrogram."""
    rng = np.random.default_rng(2)
    F_, frames = 257, 9
    re = rng.standard_normal((2, F_, frames)).astype(np.float32)
    im = rng.standard_normal((2, F_, frames)).astype(np.float32)
    rate = 2.0 ** (-n_steps / 12.0)
    hop, n_fft = 128, 512
    frames_out = int(math.ceil(frames / rate))

    spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
    adv = torch.linspace(0, math.pi * hop, F_)[..., None]
    want = torch_phase_vocoder(spec, rate, adv)

    omega = pv.phase_advance(F_, hop, n_fft)
    re_s, im_s = pv.stretch_accumulate(jnp.asarray(re), jnp.asarray(im),
                                       jnp.float32(rate), omega, frames_out)
    got = np.asarray(re_s) + 1j * np.asarray(im_s)
    assert got.shape == tuple(want.shape)
    s = snr_db(want.numpy(), got)
    assert s > 60, f"n={n_steps}: stretch parity {s:.1f} dB"


@pytest.mark.parametrize("n_steps", [1, -3, 7, 12, -24, 5, -5, 2])
def test_pitchshift_matches_torchaudio_oracle_band_rate(n_steps):
    """End-to-end TorchaudioPitchShift at the reference's per-band sample
    rate (round(44100/16)=2756, PQMFPsWrapper.py:57) and band length
    (8192/16=512) vs the full independent torch chain."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 512)) * 0.3).astype(np.float32)
    want = torch_pitch_shift(torch.from_numpy(x), SUB_SR, n_steps).numpy()
    got = np.asarray(TorchaudioPitchShift(SUB_SR, n_steps)(x))
    s = snr_db(want, got)
    assert s > 60, f"n={n_steps}: end-to-end parity {s:.1f} dB"


def test_pitchshift_matches_oracle_other_geometry():
    """Off-default band count/length: 8 bands of an 8192 buffer (sub_sr
    5513, Tb 1024). (Bands shorter than n_fft//2=256 can't be compared:
    torch.stft's reflect pad itself rejects them — torchaudio would crash
    on such bands too.)"""
    sub_sr = round(44100 / 8)
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((1, 1024)) * 0.3).astype(np.float32)
    for n_steps in (3, -9):
        want = torch_pitch_shift(torch.from_numpy(x), sub_sr, n_steps).numpy()
        got = np.asarray(TorchaudioPitchShift(sub_sr, n_steps)(x))
        s = snr_db(want, got)
        assert s > 60, f"sr={sub_sr} n={n_steps}: parity {s:.1f} dB"


def test_fused_ta_wrapper_matches_full_torch_composition():
    """The fused one-dispatch ``pitchshifter`` vs a torch composition of
    the REFERENCE chain (PQMFPsWrapper.py:114-150): decompose (torch conv
    oracle) -> torchaudio pitch_shift per band (independent oracle) ->
    center crop / reflect pad -> reconstruct (torch conv oracle)."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA
    from test_pipelines import torch_cached_analysis, torch_cached_synthesis

    shifts = [0, -3, 5, 12, -7, 2, 1, -1, 4, -5, 3, -2, 6, -6, 7, -24]
    w = PQMFPitchShiftWrapperTA(100, 16, 8192, 44100,
                                shifts_in_semitones=shifts)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1, 1, 8192)) * 0.3).astype(np.float32)

    hk = np.asarray(w.pqmf.params["hk"])
    sub = torch_cached_analysis(x, hk)  # [1, 16, 512]
    target = sub.shape[-1]
    bands = []
    for i in range(16):
        band = torch.from_numpy(sub[:, i, :])
        if shifts[i] == 0:
            shifted = band.numpy()
        else:
            shifted = torch_pitch_shift(band, w.sub_band_sample_rate,
                                        shifts[i]).numpy()
        cur = shifted.shape[-1]
        if cur > target:  # center crop (PQMFPsWrapper.py:136-139)
            start = (cur - target) // 2
            shifted = shifted[..., start:start + target]
        elif cur < target:  # reflect pad (PQMFPsWrapper.py:142)
            pad = target - cur
            left = pad // 2
            shifted = np.pad(shifted, ((0, 0), (left, pad - left)),
                             mode="reflect")
        bands.append(shifted[:, None, :])
    want = torch_cached_synthesis(np.concatenate(bands, axis=1), hk)

    got = np.asarray(w.pitchshifter(x))
    assert got.shape == want.shape
    s = snr_db(want, got)
    assert s > 60, f"fused wrapper vs torch composition: {s:.1f} dB"

"""Independent torch oracle for the torchaudio-variant shifter chain
(VERDICT r2 item 2).

``TorchaudioPitchShift`` (pqmf_tpu/shifters.py) reimplements
``torchaudio.transforms.PitchShift`` — the per-band shifter of the
reference's torchaudio wrapper (PQMFPsWrapper.py:71). torchaudio itself is
not installable in this environment, but torch IS, so this module
re-derives torchaudio's published algorithm *in torch*, using torch's own
complex STFT/ISTFT/conv1d kernels — none of the JAX code path — as an
independent parity fixture. Transcription slips in the JAX sinc phase
indexing, stretch seeding or rate rounding flip these oracles while the
framework's structural self-oracle (the per-band loop built from the same
primitives) cannot see them.

Sources transcribed (torchaudio 2.x, torchaudio/functional/functional.py):
- ``phase_vocoder``           -> :func:`torch_phase_vocoder`
- ``resample`` (sinc_interp_hann) -> :func:`torch_resample`
  (via ``_get_sinc_resample_kernel`` / ``_apply_sinc_resample_kernel``)
- ``pitch_shift``             -> :func:`torch_pitch_shift`
"""

from __future__ import annotations

import math

import torch


def torch_sinc_resample_kernel(orig_freq: int, new_freq: int,
                               lowpass_filter_width: int = 6,
                               rolloff: float = 0.99):
    """torchaudio ``_get_sinc_resample_kernel`` (sinc_interp_hann window,
    float64 build, float32 result). Returns (kernel [new, 1, K], width)."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig_freq = int(orig_freq) // gcd
    new_freq = int(new_freq) // gcd

    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = torch.arange(-width, width + orig_freq,
                       dtype=torch.float64)[None, None] / orig_freq
    t = torch.arange(0, -new_freq, -1,
                     dtype=torch.float64)[:, None, None] / new_freq + idx
    t *= base_freq
    t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)

    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base_freq / orig_freq
    kernels = torch.where(t == 0,
                          torch.tensor(1.0, dtype=torch.float64),
                          t.sin() / t)
    kernels *= window * scale
    return kernels.to(torch.float32), width


def torch_resample(waveform: torch.Tensor, orig_freq: int, new_freq: int,
                   lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """torchaudio ``resample``: polyphase windowed-sinc via strided conv1d
    (``_apply_sinc_resample_kernel``). waveform [..., T]."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    kernel, width = torch_sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    o = int(orig_freq) // gcd
    n = int(new_freq) // gcd

    shape = waveform.size()
    length = shape[-1]
    x = waveform.reshape(-1, length)
    xp = torch.nn.functional.pad(x, (width, width + o))
    res = torch.nn.functional.conv1d(xp[:, None], kernel, stride=o)
    res = res.transpose(1, 2).reshape(x.size(0), -1)
    target_length = int(math.ceil(n * length / o))
    res = res[..., :target_length]
    return res.view(shape[:-1] + res.shape[-1:])


def torch_phase_vocoder(spec: torch.Tensor, rate: float,
                        phase_advance: torch.Tensor) -> torch.Tensor:
    """torchaudio ``phase_vocoder``: accumulating-phase time stretch.
    spec: complex [..., F, frames]; phase_advance: [F, 1]."""
    if rate == 1.0:
        return spec
    shape = spec.size()
    spec = spec.reshape([-1] + list(shape[-2:]))

    time_steps = torch.arange(0, spec.size(-1), rate, dtype=torch.float32)
    alphas = time_steps % 1.0
    phase_0 = spec[..., :1].angle()
    spec = torch.nn.functional.pad(spec, [0, 2])

    spec_0 = spec.index_select(-1, time_steps.long())
    spec_1 = spec.index_select(-1, (time_steps + 1).long())
    angle_0 = spec_0.angle()
    angle_1 = spec_1.angle()
    norm_0 = spec_0.abs()
    norm_1 = spec_1.abs()

    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2 * math.pi * torch.round(phase / (2 * math.pi))
    phase = phase + phase_advance
    phase = torch.cat([phase_0, phase[..., :-1]], dim=-1)
    phase_acc = torch.cumsum(phase, -1)

    mag = alphas * norm_1 + (1 - alphas) * norm_0
    out = torch.polar(mag, phase_acc)
    return out.reshape(shape[:-2] + out.shape[-2:])


def torch_pitch_shift(waveform: torch.Tensor, sample_rate: int,
                      n_steps: int, bins_per_octave: int = 12,
                      n_fft: int = 512, win_length: int | None = None,
                      hop_length: int | None = None) -> torch.Tensor:
    """torchaudio ``pitch_shift``: reflect-pad complex STFT -> phase
    vocoder stretch -> istft(length=round(T/rate)) -> sinc resample
    ``int(sr/rate) -> sr`` -> right crop / right zero-pad to T."""
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 4
    window = torch.hann_window(win_length)

    shape = waveform.size()
    waveform = waveform.reshape(-1, shape[-1])
    ori_len = shape[-1]
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)

    spec_f = torch.stft(waveform, n_fft=n_fft, hop_length=hop_length,
                        win_length=win_length, window=window, center=True,
                        pad_mode="reflect", return_complex=True)
    phase_advance = torch.linspace(
        0, math.pi * hop_length, spec_f.shape[-2])[..., None]
    spec_stretch = torch_phase_vocoder(spec_f, rate, phase_advance)
    len_stretch = int(round(ori_len / rate))
    waveform_stretch = torch.istft(
        spec_stretch, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, window=window, length=len_stretch)
    # NOTE the truncating int() — torchaudio's exact rounding
    waveform_shift = torch_resample(waveform_stretch,
                                    int(sample_rate / rate), sample_rate)

    shift_len = waveform_shift.size(-1)
    if shift_len > ori_len:
        waveform_shift = waveform_shift[..., :ori_len]
    else:
        waveform_shift = torch.nn.functional.pad(
            waveform_shift, [0, ori_len - shift_len])
    return waveform_shift.view(shape[:-1] + waveform_shift.shape[-1:])

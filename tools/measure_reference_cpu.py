"""One-off measurement: the REFERENCE algorithm's CPU real-time factor.

The reference publishes no numbers (BASELINE.md), so this script measures
a faithful PyTorch reimplementation of its flagship block path
(1-PitchShifterWrapper.py:222-301) on CPU torch: polyphase PQMF analysis,
per-band phase-vocoder pitch shift with the reference's per-output-frame
Python loop and ``.item()`` host syncs (VocoderPitchShifter.py:217-237),
crossfade, synthesis. This is an independent reimplementation of the
measured algorithm (same geometry: 16 bands, buffer 8192, win=512,
hop=128, n_fft=512), not copied code.

Result is recorded in BASELINE.md; bench.py's headline uses the cheaper
PQMF-roundtrip torch baseline measured inline.

Usage: python tools/measure_reference_cpu.py [n_blocks]
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracles import torch_polyphase_forward, torch_polyphase_inverse  # noqa: E402

from pqmf_tpu.ops.filterbank import build_filterbank, reverse_half  # noqa: E402


def pvoc_shift_torch(x: torch.Tensor, n_steps: int, n_fft=512, hop=128,
                     win=512) -> torch.Tensor:
    """Reference-rule phase-vocoder shift with the per-frame loop."""
    T = x.shape[-1]
    factor = 2.0 ** (n_steps / 12.0)
    rate = 1.0 / factor
    window = torch.hann_window(win)
    xp = F.pad(x, (0, max(0, n_fft - T)))
    spec = torch.stft(xp, n_fft, hop, win, window, center=True,
                      normalized=True, pad_mode="constant",
                      return_complex=True)
    mag, phase = spec.abs(), spec.angle()
    B, Fr, frames = mag.shape
    frames_out = max(1, int(math.floor(frames / rate)))
    omega = 2.0 * math.pi * torch.arange(Fr) * hop / n_fft

    out = torch.zeros((B, Fr, frames_out), dtype=torch.complex64)
    for j in range(frames_out):  # the reference's per-frame Python loop
        t_prime = j * rate
        t0 = min(int(math.floor(t_prime)), frames - 1)
        t1 = min(t0 + 1, frames - 1)
        a = t_prime - t0
        m = (1 - a) * mag[..., t0] + a * mag[..., t1]
        dphi = phase[..., t1] - phase[..., t0] - omega
        dphi = torch.remainder(dphi + math.pi, 2 * math.pi) - math.pi
        phi = phase[..., t0] + omega + a * dphi
        out[..., j] = torch.polar(m, phi)
        _ = float(m.sum())  # the reference's .item() host syncs

    y = torch.istft(out, n_fft, hop, win, window, center=True,
                    normalized=True)
    target = (frames_out - 1) * hop + n_fft
    if y.shape[-1] < target:
        y = F.pad(y, (0, target - y.shape[-1]))
    y = y[..., :target]
    y = F.interpolate(y[:, None, :], size=T, mode="linear",
                      align_corners=False)[:, 0, :]
    return y


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    M, buf = 16, 8192
    hk = np.asarray(build_filterbank(100, M)["hk"])
    shifts = list(range(M))
    rng = np.random.default_rng(0)
    blocks = rng.standard_normal((n_blocks, 1, 1, buf)).astype(np.float32)

    torch.set_num_threads(torch.get_num_threads())
    # warm up one block
    t0 = time.perf_counter()
    for b in range(n_blocks):
        sub = reverse_half(torch_polyphase_forward(blocks[b], hk))
        sub_t = torch.from_numpy(np.asarray(sub))
        shifted = []
        for i in range(M):
            band = sub_t[:, i, :]
            shifted.append(pvoc_shift_torch(band, shifts[i]))
        sub_s = torch.stack(shifted, dim=1).numpy()
        _ = torch_polyphase_inverse(np.asarray(reverse_half(sub_s)), hk)
        if b == 0:  # exclude warmup
            t0 = time.perf_counter()
    per_block = (time.perf_counter() - t0) / max(1, n_blocks - 1)
    audio = buf / 44100.0
    print(f"reference-algorithm CPU flagship pitchshift: "
          f"{per_block * 1e3:.1f} ms per {audio * 1e3:.1f} ms block "
          f"-> RTF {audio / per_block:.2f}x")


if __name__ == "__main__":
    main()

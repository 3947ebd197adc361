"""Torchaudio-variant per-band pitch-shift test main
(reference: PitchShifterTorchaudio/PQMFPsWrapper.py:154-197).

Builds the torchaudio-style wrapper (one accumulating phase-vocoder +
windowed-sinc-resample shifter per band at the sub-band sample rate
``round(sr / n_band)``), runs forward / inverse / pitchshifter on a
bundled wav padded to a buffer multiple, saves the shifted and
round-tripped audio, and prints shapes + RMS (the reference prints
shapes; RMS matches the block harness's metric).

Usage:
    python -m pqmf_tpu.cli.ps_torchaudio [input.wav]
        [--n_band 16] [--buffer 8192] [--shifts s0,s1,...] [--seed N]
        [--out_dir audio] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", nargs="?",
                   default="/root/reference/audio/flute.wav")
    p.add_argument("--attenuation", type=int, default=100)
    p.add_argument("--n_band", type=int, default=16)
    p.add_argument("--buffer", type=int, default=8192)
    p.add_argument("--sample_rate", type=int, default=None)
    p.add_argument("--shifts", type=str, default=None,
                   help="comma-separated semitones per band; default "
                        "random uniform(-48.53, 12.32) like the reference "
                        "(PQMFPsWrapper.py:157)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="audio")
    p.add_argument("--finetuned", action="store_true",
                   help="install the committed fine-tuned bank for this "
                        "(attenuation, n_band) — better decompose/"
                        "reconstruct quality than the Kaiser design")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA
    from pqmf_tpu.utils.audio import read_wav, rms, write_wav

    wav, sr = read_wav(args.input)
    if wav.shape[0] > 1:
        wav = wav.mean(axis=0, keepdims=True)
    wav = wav.astype(np.float32)
    if args.sample_rate:
        sr = args.sample_rate

    if args.shifts is not None:
        shifts = [float(s) for s in args.shifts.split(",")]
    else:
        rng = random.Random(args.seed)
        shifts = [rng.uniform(-48.53, 12.32) for _ in range(args.n_band)]
    print(f"shifts (semitones): {[round(s, 2) for s in shifts]}")

    pad = (-wav.shape[-1]) % args.buffer
    wav = np.pad(wav, ((0, 0), (0, pad)))
    print(f"loaded {args.input}: shape={wav.shape}, sr={sr}, pad={pad}")

    # max_buffer_size=None: this harness feeds the whole padded file in
    # one call, like the reference main (PQMFPsWrapper.py:177); the
    # declared limit applies to real-time host blocks
    w = PQMFPitchShiftWrapperTA(args.attenuation, args.n_band, args.buffer,
                                sr, shifts, max_buffer_size=None)
    if args.finetuned:
        from pqmf_tpu.cli._common import install_finetuned_bank

        print(f"installed fine-tuned bank "
              f"{install_finetuned_bank(w, args.attenuation, args.n_band)}")
    x = wav[None]
    sub = w.forward(x)
    recon = np.asarray(w.inverse(sub))
    shifted = np.asarray(w.pitchshifter(x))
    print(f"subbands: {sub.shape}, reconstructed: {recon.shape}, "
          f"pitchshifted: {shifted.shape}")

    os.makedirs(args.out_dir, exist_ok=True)
    write_wav(os.path.join(args.out_dir, "reconstruido.wav"), recon[0], sr)
    write_wav(os.path.join(args.out_dir, "ta_pitchshifted.wav"),
              shifted[0], sr)
    print("RMS orig:", rms(wav))
    print("RMS recon:", rms(recon))
    print("RMS shifted:", rms(shifted))


if __name__ == "__main__":
    main()

"""Block-streaming test harness (reference: 2-TestBlocks.py:20-166).

Simulates a real-time host: Hann-windowed overlapping blocks -> per-block
``pitchshift`` with carried crossfade state -> windowed overlap-add
normalized by the accumulated window energy, alongside a plain
forward/inverse reconstruction stream and a whole-file pass, with RMS
metrics printed at the end (the reference's only quantitative output).

Also fixes reference bug SURVEY.md §2.5-2: the whole-file pass calls the
method that actually exists, so ``nonblock_pitchshifter.wav`` is produced.

Usage:
    python -m pqmf_tpu.cli.blocks <input.wav> --block 4096 [--overlap N]
        [--out_prefix blocktest] [--out_dir DIR] [--n_band 16]
        [--buffer 8192] [--shifts s0,s1,...] [--seed N] [--stereo] [--cpu]

``--stereo`` keeps all channels, one serving stream per channel with
independent crossfade state (the reference mixes down / drops to the
first channel and its crossfade is single-stream only).
"""

from __future__ import annotations

import argparse
import math
import os
import random

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="input wav file")
    p.add_argument("--block", type=int, default=4096,
                   help="block size (the host's buffer)")
    p.add_argument("--overlap", type=int, default=None,
                   help="overlap samples between blocks (default block//2)")
    p.add_argument("--out_prefix", type=str, default="blocktest")
    p.add_argument("--out_dir", type=str, default="audio")
    p.add_argument("--attenuation", type=int, default=100)
    p.add_argument("--n_band", type=int, default=16)
    p.add_argument("--buffer", type=int, default=8192,
                   help="m_buffer_size the wrapper is built with")
    p.add_argument("--shifts", type=str, default=None,
                   help="comma-separated semitone shifts per band; default "
                        "random uniform(-24.75, 12.43) like the reference "
                        "export (1-PitchShifterWrapper.py:331)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--artifact", type=str, default=None,
                   help="load the wrapper from an exported artifact dir "
                        "(the reference's --ts flag, 2-TestBlocks.py:44) "
                        "instead of constructing one")
    p.add_argument("--scan", action="store_true",
                   help="run the whole stream as ONE jitted lax.scan "
                        "(blocking + OLA in-graph; no per-block host "
                        "round-trips)")
    p.add_argument("--finetuned", action="store_true",
                   help="install the committed fine-tuned bank for this "
                        "(attenuation, n_band) on the constructed wrapper "
                        "(ignored with --artifact: its weights already ride "
                        "in the manifest)")
    p.add_argument("--stereo", action="store_true",
                   help="keep all channels and run one serving stream per "
                        "channel (independent crossfade state each) instead "
                        "of the reference's mono mixdown")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")


    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.audio import read_wav, rms, write_wav

    wav, sr = read_wav(args.input)
    if wav.shape[0] > 1 and not args.stereo:
        wav = wav.mean(axis=0, keepdims=True)
    wav = wav.astype(np.float32)
    n_ch = wav.shape[0]

    overlap = args.overlap if args.overlap is not None else args.block // 2
    if overlap < 0 or overlap >= args.block:
        raise ValueError("overlap must be in [0, block-1]")
    hop = args.block - overlap

    wrapper = None
    if args.artifact is not None:
        from pqmf_tpu.export import load_artifact

        wrapper, manifest = load_artifact(args.artifact)
        wrapper.reset()
        shifts = list(wrapper.shifts)
        args.n_band = wrapper.n_band
        print(f"loaded artifact {args.artifact} "
              f"(kind={manifest['kind']}, n_band={wrapper.n_band})")
    elif args.shifts is not None:
        shifts = [float(s) for s in args.shifts.split(",")]
    else:
        rng = random.Random(args.seed)
        shifts = [rng.uniform(-24.75, 12.43) for _ in range(args.n_band)]
    print(f"shifts (semitones): {[round(s, 2) for s in shifts]}")

    L = wav.shape[-1]
    n_frames = 1 if L <= args.block else (
        int(math.ceil((L - args.block) / float(hop))) + 1)
    total_needed = (n_frames - 1) * hop + args.block
    pad = total_needed - L
    if pad > 0:
        wav = np.pad(wav, ((0, 0), (0, pad)))
    total_len = wav.shape[-1]
    print(f"loaded {args.input}: shape={wav.shape}, sr={sr}, pad={pad}, "
          f"blocks={n_frames}")

    if wrapper is None:
        wrapper = PQMFPitchShiftWrapper(args.attenuation, args.n_band,
                                        args.buffer, sr, shifts)
        if args.finetuned:
            from pqmf_tpu.cli._common import install_finetuned_bank

            print(f"installed fine-tuned bank "
                  f"{install_finetuned_bank(wrapper, args.attenuation, args.n_band)}")

    n = np.arange(args.block)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / args.block)).astype(
        np.float32)[None, :]

    out_accum = np.zeros((n_ch, total_len), np.float32)
    norm_accum = np.zeros_like(out_accum)
    recon_accum = np.zeros_like(out_accum)
    recon_norm = np.zeros_like(out_accum)

    from pqmf_tpu import native

    nat = native.get()  # C OLA accumulator; None -> NumPy path
    win_b = window[0].tobytes()

    def ola(acc, nrm, blk_np, i):
        if nat is not None:
            for c in range(acc.shape[0]):
                nat.ola_accumulate(acc[c], nrm[c],
                                   np.ascontiguousarray(
                                       blk_np[c]).tobytes(),
                                   win_b, i)
        else:
            acc[:, i:i + args.block] += blk_np * window
            nrm[:, i:i + args.block] += window * window

    if args.scan:
        from pqmf_tpu.pipelines import stream_ola

        import time as _time

        t0 = _time.perf_counter()
        pitch, recon = stream_ola(wrapper, wav, args.block, overlap)
        pitch_stream = np.asarray(pitch)[:, : total_len - pad]
        recon_stream = np.asarray(recon)[:, : total_len - pad]
        print(f"scan path: {_time.perf_counter() - t0:.2f} s "
              f"(compile + run, ONE dispatch)")
    else:
        # mono: the reference's single-stream stateful step; multichannel
        # (--stereo): one serving stream per channel, each with its own
        # crossfade state (the reference's crossfade is batch==1 only)
        state = (wrapper.init_state() if n_ch == 1
                 else wrapper.init_streams(n_ch))
        for frame_idx in range(n_frames):
            i = frame_idx * hop
            blk = wav[:, i:i + args.block] * window
            if n_ch == 1:
                state, out = wrapper.pitchshift_fn(state, blk)
            else:
                state, out = wrapper.pitchshift_streams(state, blk)
            ola(out_accum, norm_accum, np.asarray(out), i)
            rec = np.asarray(wrapper.forward_fn(blk[:, None, :]))
            ola(recon_accum, recon_norm, rec, i)

        eps = 1e-8
        pitch_stream = (out_accum / (norm_accum + eps))[:, : total_len - pad]
        recon_stream = (recon_accum / (recon_norm + eps))[:, : total_len - pad]

    # whole-file pass (reference bug §2.5-2 fixed: call the real method);
    # lift the real-time buffer limit for this offline comparison pass
    wrapper.reset()
    wrapper.max_buffer_size = None
    T_full = (wav.shape[-1] // args.n_band) * args.n_band
    # multichannel rides the batch axis ([C, 1, T]); like the reference
    # (batch==1 guard, 1-PitchShifterWrapper.py:262), batch > 1 skips the
    # crossfade — so unlike the mono path, the first band_overlap sub-band
    # samples are NOT faded in against the zero-initialized prev_tail
    full_in = wav[:, :T_full] if n_ch == 1 else wav[:, None, :T_full]
    full_out = np.asarray(
        wrapper.pitchshift(full_in))[:, : wav.shape[-1] - pad]

    # an out_prefix with a directory part (e.g. /tmp/blocktest) routes ALL
    # outputs there, including the prefix-less nonblock file
    if os.path.dirname(args.out_prefix):
        args.out_dir = os.path.dirname(args.out_prefix)
        args.out_prefix = os.path.basename(args.out_prefix)
    os.makedirs(args.out_dir, exist_ok=True)
    write_wav(os.path.join(args.out_dir,
                           f"{args.out_prefix}_pitchshifter.wav"),
              pitch_stream, sr)
    write_wav(os.path.join(args.out_dir,
                           f"{args.out_prefix}_recontructed.wav"),
              recon_stream, sr)
    write_wav(os.path.join(args.out_dir, "nonblock_pitchshifter.wav"),
              full_out, sr)
    print(f"saved stream + full outputs to {args.out_dir}/")

    orig = wav[:, : wav.shape[-1] - pad]
    print("RMS orig:", rms(orig))
    print("RMS stream_pitch:", rms(pitch_stream))
    print("RMS stream_recon:", rms(recon_stream))
    print("RMS full_pitch:", rms(full_out))


if __name__ == "__main__":
    main()

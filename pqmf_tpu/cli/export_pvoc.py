"""Export + test of the flagship pvoc pitch-shift wrapper
(reference: 1-PitchShifterWrapper.py:328-371).

Random per-band shifts uniform(-24.75, 12.43), artifact save + reload,
forward round-trip + pitchshift + decompose on flute.wav padded to a
buffer multiple; shapes printed.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", default="/root/reference/audio/flute.wav")
    p.add_argument("--out_dir", default="artifacts/pqmfpvoc")
    p.add_argument("--audio_dir", default="audio")
    p.add_argument("--attenuation", type=int, default=100)
    p.add_argument("--n_band", type=int, default=16)
    p.add_argument("--buffer", type=int, default=8192)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--save_audio", action="store_true",
                   help="also write the shifted audio (the reference left "
                        "this commented out, :369-371)")
    p.add_argument("--stablehlo", action="store_true",
                   help="embed a jax.export StableHLO of the pitchshift "
                        "step in the artifact")
    p.add_argument("--finetuned", action="store_true",
                   help="install the committed fine-tuned bank for this "
                        "(attenuation, n_band) before export — better "
                        "decompose/reconstruct quality than the Kaiser "
                        "design (parallel.training.load_pretrained_bank)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pqmf_tpu.export import load_artifact, save_artifact
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.audio import read_wav, write_wav

    rng = random.Random(args.seed)
    shifts = [rng.uniform(-24.75, 12.43) for _ in range(args.n_band)]
    print(f"using shifts (semitones): {[round(s, 2) for s in shifts]}")

    wrapper = PQMFPitchShiftWrapper(args.attenuation, args.n_band,
                                    args.buffer, 44100, shifts)
    if args.finetuned:
        from pqmf_tpu.cli._common import install_finetuned_bank

        bank = install_finetuned_bank(wrapper, args.attenuation, args.n_band)
        print(f"installed fine-tuned bank {bank} (weights ride in the "
              f"artifact)")
    save_artifact(wrapper, args.out_dir, with_stablehlo=args.stablehlo)
    print(f"artifact saved to {args.out_dir}")

    loaded, manifest = load_artifact(args.out_dir)
    print(f"reloaded: methods={loaded.get_methods()}")
    # offline whole-file smoke pass, like the reference main feeding the
    # whole padded flute.wav (1-PitchShifterWrapper.py:346-367); the
    # declared max_buffer_size applies to real-time host blocks
    loaded.max_buffer_size = None

    wav, sr = read_wav(args.input)
    if wav.shape[0] > 1:
        wav = wav[:1]
    pad = (args.buffer - wav.shape[-1] % args.buffer) % args.buffer
    if pad:
        wav = np.pad(wav, ((0, 0), (0, pad)))
    wav = wav.astype(np.float32)
    print(f"audio loaded: shape={wav.shape}, sr={sr}")

    reconstructed = loaded.forward(wav)
    shifted = loaded.pitchshift(wav)
    subbands = loaded.decompose(wav)
    print(f"subbands shape: {subbands.shape}")
    print(f"reconstructed shape: {reconstructed.shape}")
    print(f"pitchshift output shape: {shifted.shape}")

    if args.save_audio:
        os.makedirs(args.audio_dir, exist_ok=True)
        write_wav(os.path.join(args.audio_dir, "phasevocoder.wav"),
                  np.asarray(shifted), sr)
        print("shifted audio saved")


if __name__ == "__main__":
    main()

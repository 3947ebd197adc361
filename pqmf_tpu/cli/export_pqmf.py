"""Export + round-trip test of the plain PQMF wrapper
(reference: PQMFWrapper.py:96-135).

Builds PQMFWrapper(atten=100, n_band=16, buffer=8192), saves the artifact,
reloads it, runs forward/inverse/process on a bundled wav padded to a
buffer multiple, and writes ``reconstruido.wav``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", default="/root/reference/audio/"
                   "violin_bow_nonvib_f4_44100.wav")
    p.add_argument("--out_dir", default="artifacts/pqmf")
    p.add_argument("--audio_dir", default="audio")
    p.add_argument("--attenuation", type=int, default=100)
    p.add_argument("--n_band", type=int, default=16)
    p.add_argument("--buffer", type=int, default=8192)
    p.add_argument("--stablehlo", action="store_true",
                   help="also AOT-export the process method (jax.export)")
    p.add_argument("--finetuned", action="store_true",
                   help="install the committed fine-tuned bank for this "
                        "(attenuation, n_band) before export — beats the "
                        "Kaiser design's reconstruction on every bundled "
                        "fixture (see parallel.training.load_pretrained_bank)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pqmf_tpu.export import load_artifact, save_artifact
    from pqmf_tpu.pipelines import PQMFWrapper
    from pqmf_tpu.utils.audio import read_wav, write_wav

    print("exporting PQMFWrapper artifact...")
    wrapper = PQMFWrapper(args.attenuation, args.n_band,
                          m_buffer_size=args.buffer)
    if args.finetuned:
        from pqmf_tpu.cli._common import install_finetuned_bank

        bank = install_finetuned_bank(wrapper, args.attenuation, args.n_band)
        print(f"installed fine-tuned bank {bank} (weights ride in the "
              f"artifact)")
    save_artifact(wrapper, args.out_dir, with_stablehlo=args.stablehlo)
    print(f"artifact saved to {args.out_dir}")

    loaded, manifest = load_artifact(args.out_dir)
    print(f"reloaded: methods={loaded.get_methods()}")
    # offline whole-file pass (the reference main feeds the whole padded
    # wav through the wrapper too, PQMFWrapper.py:112-131); the declared
    # max_buffer_size applies to real-time host blocks
    loaded.max_buffer_size = None

    wav, sr = read_wav(args.input)
    if wav.shape[0] > 1:
        wav = wav[:1]
    buffer_size = loaded.m_buffer_size
    pad = (buffer_size - wav.shape[-1] % buffer_size) % buffer_size
    if pad:
        wav = np.pad(wav, ((0, 0), (0, pad)))
    print(f"audio loaded: shape={wav.shape}, sr={sr}")

    subbands = loaded.forward(wav.astype(np.float32))
    reconstructed = loaded.inverse(subbands)
    recon, sub = loaded.process(wav.astype(np.float32))
    print(f"subbands shape: {subbands.shape}")
    print(f"reconstructed shape: {reconstructed.shape}")
    print(f"process output shapes: {[t.shape for t in (recon, sub)]}")

    os.makedirs(args.audio_dir, exist_ok=True)
    out = np.asarray(reconstructed)[0]
    write_wav(os.path.join(args.audio_dir, "reconstruido.wav"), out, sr)
    print(f"reconstructed audio saved to "
          f"{os.path.join(args.audio_dir, 'reconstruido.wav')}")


if __name__ == "__main__":
    main()

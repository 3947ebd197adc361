"""Reproduce (or extend) the committed fine-tuned banks.

Runs the exact recipe behind every ``pqmf_tpu/data/hk*_finetuned.npz``
artifact (`parallel.training.finetune_filterbank`, cosine decay — see its
docstring for why the schedule matters), evaluates designed vs fine-tuned
SNR on all three bundled fixtures through the real streaming path (the
same measurement as ``tests/test_parallel.py::
test_pretrained_bank_beats_designed_on_every_fixture``), and writes the
npz artifact.

Usage:
    python tools/finetune_bank.py --n_band 64 [--steps 8000] [--lr 2e-5]
        [--batch 4] [--length 8192] [--out pqmf_tpu/data/hk64_atten100_finetuned.npz]
        [--cpu]

Runs on the real TPU chip by default (the 8000-step scan is ONE
dispatch); M=16 takes a couple of minutes there.

Committed-artifact recipes: M=8/16/32 use the defaults above; M=64's
2048-tap bank needs the longer interior window —
``--length 16384 --steps 12000 --batch 2`` (84.3/75.3/97.9 dB vs the
default recipe's 84.2/75.3/97.0).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = ("flute.wav", "violin_bow_nonvib_f4_44100.wav", "flutemulti.wav")
AUDIO_DIR = "/root/reference/audio"


def streaming_snr(params, attenuation, n_band, name):
    """Round-trip SNR (dB) on a bundled fixture — the shared measurement
    behind every committed-bank number."""
    from pqmf_tpu.parallel.training import streaming_roundtrip_snr

    return streaming_roundtrip_snr(params, attenuation, n_band,
                                   os.path.join(AUDIO_DIR, name))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_band", type=int, required=True)
    p.add_argument("--attenuation", type=float, default=100.0)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--length", type=int, default=8192)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--stopband_weight", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="npz path (default: pqmf_tpu/data/"
                        "hk{M}_atten{A}_finetuned.npz)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pqmf_tpu.parallel.training import finetune_filterbank

    print(f"designed bank (atten={args.attenuation:g}, M={args.n_band}):")
    for name in FIXTURES:
        print(f"  {name}: {streaming_snr(None, args.attenuation, args.n_band, name):.1f} dB")

    params, losses = finetune_filterbank(
        args.attenuation, args.n_band, steps=args.steps, batch=args.batch,
        length=args.length, lr=args.lr,
        stopband_weight=args.stopband_weight, seed=args.seed,
        lr_schedule="cosine")
    print(f"noise interior loss: {losses[0]:.3e} -> {losses[-1]:.3e} "
          f"({args.steps} steps, cosine lr peak {args.lr:g})")

    print("fine-tuned bank:")
    for name in FIXTURES:
        print(f"  {name}: {streaming_snr(params, args.attenuation, args.n_band, name):.1f} dB")

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pqmf_tpu", "data",
        f"hk{args.n_band}_atten{args.attenuation:g}_finetuned.npz")
    if not out.endswith(".npz"):
        out += ".npz"  # np.savez appends it anyway; print the real name
    np.savez_compressed(out, hk=np.asarray(params["hk"]),
                        h=np.asarray(params["h"]))
    print(f"saved {out}")


if __name__ == "__main__":
    main()

"""Fine-tune the PQMF bank past its Kaiser design — the framework's
"beat the reference" demo.

The reference's design chain (pqmf.py:98-112) minimizes amplitude
distortion over a one-parameter Kaiser family; treating the whole
modulated bank as learnable (all M x P taps) with the interior
reconstruction loss + stopband penalty (parallel.training.
make_finetune_loss) finds banks the Kaiser family can't express:

    designed (atten=100, 16 bands): 65.1 dB flute.wav round trip
    fine-tuned (cosine decay, 8000 steps — the committed recipe):
    104.9 dB steady-state (worst stopband: -107 dB -> ~-60 dB; the
    committed cosine runs ship as
    pqmf_tpu/data/hk{8,16,32,64}_atten100_finetuned.npz; SNRs per
    parallel.training.streaming_roundtrip_snr's round-4 steady-state
    definition)

Usage:
    python examples/finetune_demo.py --cpu --steps 100      # quick look
    python examples/finetune_demo.py --steps 8000 --lr 2e-5 \
        --lr_schedule cosine --batch 4 --length 8192  # committed recipe (TPU)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n_band", type=int, default=16)
    ap.add_argument("--atten", type=int, default=100)
    ap.add_argument("--lr", type=float, default=3e-6)
    ap.add_argument("--lr_schedule", choices=["constant", "cosine"],
                    default="constant",
                    help="cosine (lr as the peak, decayed to 0) breaks the "
                         "constant-lr plateau — every committed bank uses it")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=4096)
    ap.add_argument("--stopband_weight", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None,
                    help="save the fine-tuned bank as an .npz")
    ap.add_argument("--wav", default="/root/reference/audio/flute.wav")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pqmf_tpu.parallel.training import (finetune_filterbank,
                                            streaming_roundtrip_snr)

    M = args.n_band
    print(f"designed bank   : "
          f"{streaming_roundtrip_snr(None, args.atten, M, args.wav):6.2f} "
          f"dB round-trip SNR ({args.wav.rsplit('/', 1)[-1]})")

    print(f"fine-tuning {args.steps} steps "
          f"(Adam {args.lr} {args.lr_schedule}, "
          f"stopband weight {args.stopband_weight}) ...")
    params, losses = finetune_filterbank(
        args.atten, M, steps=args.steps, lr=args.lr,
        batch=args.batch, length=args.length,
        stopband_weight=args.stopband_weight,
        lr_schedule=args.lr_schedule)
    print(f"interior loss   : {losses[0]:.3e} -> {losses[-1]:.3e}")

    print(f"fine-tuned bank : "
          f"{streaming_roundtrip_snr(params, args.atten, M, args.wav):6.2f} "
          f"dB round-trip SNR")

    if args.out:
        np.savez_compressed(args.out, hk=np.asarray(params["hk"]),
                            h=np.asarray(params["h"]))
        print(f"saved -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

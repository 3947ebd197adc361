"""Per-kernel roofline table for the four Pallas kernels (VERDICT r1 #9).

Times each kernel with chained on-chip measurement (utils.profiling) at
the default config and prints bytes moved, MXU FLOPs, achieved GB/s and
GFLOP/s. Run twice in one window for A/B when comparing kernel changes —
the chip is co-tenanted (~3x swings between windows, see the verify
skill), so only same-window comparisons are meaningful.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/roofline.py [--seconds 60]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--atten", type=int, default=100)
    ap.add_argument("--n_band", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.kernels import polyphase as pk
    from pqmf_tpu.ops import filterbank as fb
    from pqmf_tpu.streaming import StreamingPQMF
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M = args.n_band
    SR = 44100
    T = int(args.seconds * SR) // M * M
    params = fb.build_filterbank(args.atten, M)
    sp = StreamingPQMF(args.atten, M)

    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32))
    x_sub = jnp.asarray(
        rng.standard_normal((1, M, T // M)).astype(np.float32))

    print(f"platform={jax.devices()[0].platform}  T={T} ({args.seconds}s "
          f"@44.1k)  M={M}  dispatch_floor={dispatch_floor_ms():.1f} ms")

    L = params["hk_poly"].shape[-1]
    Ka = sp.hkf.shape[-1]
    Ks = sp.hki.shape[-1]

    # every case carries a [1, 1, T] f32 buffer through the kernel (the
    # reshapes are free) so the chained fori_loop cannot dead-code it
    f32 = 4
    shape = (1, 1, T)
    cases = [
        ("polyphase_analysis (fused mask)",
         lambda v: pk.polyphase_analysis(
             v.reshape(shape), params["hk_poly"]).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (L * M)),
        ("polyphase_synthesis (fused)",
         lambda v: pk.polyphase_synthesis(
             v.reshape(1, M, T // M), params["hk_ipoly"]).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (L * M)),
        ("cached analysis (k=513 s=16)",
         lambda v: sp.forward(v.reshape(shape)).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (-(-Ka // M) * M)),
        ("cached synthesis (k=33 s=1)",
         lambda v: sp.inverse(v.reshape(1, M, T // M)).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (Ks * M)),
        ("full roundtrip (cached offline)",
         lambda v: sp.inverse(sp.forward(v.reshape(shape))).reshape(shape),
         4 * T * f32,
         2 * (T // M) * M * (-(-Ka // M) * M) + 2 * (T // M) * M * (Ks * M)),
        ("fused roundtrip (grouped pass-through)",
         lambda v: sp.roundtrip(v.reshape(shape)).reshape(shape),
         2 * T * f32,
         2 * (T // M) * M * (-(-Ka // M) * M) + 2 * (T // M) * M * (Ks * M)),
    ]

    print(f"{'kernel':34s} {'ms':>8s} {'GB/s':>8s} {'GFLOP/s':>9s} "
          f"{'ms/60s-audio':>12s}")
    for name, fn, nbytes, flops in cases:
        ms = chained_ms(fn, x_raw, n=args.chain)
        gbs = nbytes / (ms * 1e-3) / 1e9
        gfs = flops / (ms * 1e-3) / 1e9
        per60 = ms * (60.0 / args.seconds)
        print(f"{name:34s} {ms:8.3f} {gbs:8.1f} {gfs:9.1f} {per60:12.3f}")


if __name__ == "__main__":
    main()

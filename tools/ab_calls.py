"""Same-window A/B: fused roundtrip calls="single" (one pallas_call,
VMEM-ring intermediate) vs calls="two" (round-3 default), both precision
tiers, plus on-chip bit-identity. tools/mxu_floor3.py attributed the
two-call residual to the XLA glue copies (~0.07 ms), the mid's HBM round
trip, and the second kernel launch — all of which the single-call kernel
removes. Arms interleaved: every ratio within one co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_calls.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chain", type=int, default=400)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--tile", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp = {"highest": StreamingPQMF(100, M, use_pallas=True),
          "bf16x3": StreamingPQMF(100, M, use_pallas=True,
                                  precision="bf16x3")}

    Ka = sp["highest"].hkf.shape[-1]
    Ks = sp["highest"].hki.shape[-1]
    al, ar = centered_padding(Ka)
    pads = centered_padding(Ks)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32) * 0.1)
    xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))
    shape = xx.shape

    arms = []
    for prec in ("highest", "bf16x3"):
        w_a, w_s = sp[prec].hkf, sp[prec].hki
        for calls in ("two", "single"):
            def fn(v, *, prec=prec, calls=calls, w_a=w_a, w_s=w_s):
                out = cc.fused_roundtrip_conv(
                    v, w_a, w_s, M, pads, tile=args.tile,
                    mxu_precision=prec, calls=calls)
                flat = out.reshape(1, 1, -1)
                return jnp.pad(flat, ((0, 0), (0, 0),
                                      (0, shape[-1] - flat.shape[-1])))
            arms.append((f"{prec:7s} calls={calls:6s}", fn))

    # on-chip bit-identity first
    for prec in ("highest", "bf16x3"):
        a = np.asarray(arms[dict(highest=0, bf16x3=2)[prec]][1](xx))
        b = np.asarray(arms[dict(highest=0, bf16x3=2)[prec] + 1][1](xx))
        print(f"{prec}: max|two-single| = {np.abs(a - b).max():.3e}")

    print(f"platform={jax.devices()[0].platform}  T={T}  tile={args.tile}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  chain={args.chain}")
    results = {name: [] for name, _ in arms}
    for rep in range(args.reps):
        for name, fn in arms:
            ms = chained_ms(fn, xx, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:24s} {ms:8.3f} ms")
    print()
    for prec in ("highest", "bf16x3"):
        a = min(results[f"{prec:7s} calls=two   "])
        b = min(results[f"{prec:7s} calls=single"])
        print(f"{prec}: two {a:.3f} ms, single {b:.3f} ms, "
              f"two/single = {a / b:.3f}x")


if __name__ == "__main__":
    main()

"""Same-window A/B: fused-roundtrip intermediate layout mid="time" vs
the round-2 mid="cols", at both precision tiers, plus a tile-size sweep.

mid="time" stores the analysis tiles time-major ("wave") and feeds the
synthesis through the "time_cols" input path, deleting the analysis
store-transpose and the synthesis per-window VMEM transpose — the two
in-kernel VMEM transposes tools/mxu_floor.py implicated in the
~0.2 ms data-movement residual. Arms are interleaved so every ratio is
within one co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_mid.py
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
    ap.add_argument("--tiles", type=str, default="2048,4096,8192")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp = {"highest": StreamingPQMF(100, M, use_pallas=True),
          "bf16x3": StreamingPQMF(100, M, use_pallas=True,
                                  precision="bf16x3")}

    from pqmf_tpu.kernels import cached_conv as cc

    Ka, Ks = sp["highest"].hkf.shape[-1], sp["highest"].hki.shape[-1]
    al, ar = centered_padding(Ka)
    sl, sr_ = centered_padding(Ks)
    pads = (sl, sr_)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32) * 0.1)
    xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))
    shape = xx.shape

    tiles = [int(t) for t in args.tiles.split(",")]
    arms = []
    for prec in ("highest", "bf16x3"):
        w_a, w_s = sp[prec].hkf, sp[prec].hki
        for tile in tiles:
            for mid in ("cols", "time"):
                def fn(v, *, prec=prec, tile=tile, mid=mid,
                       w_a=w_a, w_s=w_s):
                    # calls="two" explicitly: the single-call default
                    # ignores `mid` entirely (VMEM-ring intermediate),
                    # which would make both arms the identical program
                    out = cc.fused_roundtrip_conv(
                        v, w_a, w_s, M, pads, tile=tile,
                        mxu_precision=prec, mid=mid, calls="two")
                    # [B, T_out, M] time-major -> wave is a free reshape
                    flat = out.reshape(1, 1, -1)
                    return jnp.pad(flat, ((0, 0), (0, 0),
                                          (0, shape[-1] - flat.shape[-1])))
                arms.append((f"{prec:7s} tile={tile:5d} mid={mid}", fn))

    print(f"platform={jax.devices()[0].platform}  T={T}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  chain={args.chain}")
    results = {name: [] for name, _ in arms}
    for rep in range(args.reps):
        for name, fn in arms:
            ms = chained_ms(fn, xx, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:34s} {ms:8.3f} ms")
    print()
    for prec in ("highest", "bf16x3"):
        for tile in tiles:
            a = min(results[f"{prec:7s} tile={tile:5d} mid=cols"])
            b = min(results[f"{prec:7s} tile={tile:5d} mid=time"])
            print(f"{prec} tile={tile}: cols {a:.3f} ms, time {b:.3f} ms, "
                  f"cols/time = {a / b:.3f}x")


if __name__ == "__main__":
    main()

"""Second-stage attribution of the fused-roundtrip residual: are the
SHIFTED-SLICE dot operands the gap?

tools/mxu_floor.py showed the real kernel sits 1.9x (HIGHEST) / 3.8x
(bf16x3) over a skeleton running the same dot sequence on a resident
block; the mid-layout and hoisted-split A/Bs (tools/ab_mid.py,
tools/ab_split.py) each bought ~1%. The remaining structural difference
is that the skeleton's L dots all consume THE SAME unshifted block,
while the real kernel's consume L overlapping sublane-shifted slices
``xw[l:l+Tt]`` (unaligned rows: Mosaic may materialize a shifted copy
per dot). This tool measures, in one window, a common conv-leg geometry
(L=5, S=Q=128, Tt=2048 — both roundtrip legs have exactly this shape):

- ``noshift``   x [nt, Tt, S] resident; dots on the whole block
  (= mxu_floor skeleton: the known floor).
- ``inshift``   x [nt, win, S] resident; dots on the L shifted slices
  (= the real kernel's operand pattern, minus the manual DMA window).
- ``outshift``  x [nt, win, S] resident; L dots on the WHOLE window
  (unshifted operands, 6% more rows), accumulating shifted slices of
  the f32 OUTPUTS — the candidate reformulation: if inshift is slow
  and outshift ~= noshift, moving the shift from the bf16 dot inputs
  to the f32 outputs is the fix.
- the real fused roundtrip as the anchor.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/mxu_floor2.py
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
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp_hi = StreamingPQMF(100, M, use_pallas=True)
    sp_x3 = StreamingPQMF(100, M, use_pallas=True, precision="bf16x3")

    L, S, Q = 5, 128, 128
    Tt = args.tile
    win = Tt + 128
    # both legs of the real roundtrip have L=5, S=Q=128; two legs' tiles
    nt = 2 * (-(-(T // 128) // Tt))

    def skeleton(variant, prec):
        def kern(x_ref, w_ref, o_ref):
            xw = x_ref[0]
            dn = (((1,), (0,)), ((), ()))
            hi = prec == "f32"
            if hi:
                ops = [(xw, w_ref[:])]
            else:
                xh, xl = cc._split_bf16(xw)
                wh, wl = cc._split_bf16(w_ref[:])
                ops = [(xh, wh), (xh, wl), (xl, wh)]
            acc = None
            for l in range(L):
                for a, w in ops:
                    wb = w[l * S:(l + 1) * S, :]
                    if variant == "inshift":
                        a = a[l:l + Tt, :]
                    y = jax.lax.dot_general(
                        a, wb, dn,
                        preferred_element_type=jnp.float32,
                        **({"precision": jax.lax.Precision.HIGHEST}
                           if hi else {}))
                    if variant == "outshift":
                        y = y[l:l + Tt, :]
                    acc = y if acc is None else acc + y
            o_ref[0] = acc

        rows = Tt if variant == "noshift" else win
        w = jnp.asarray(np.random.default_rng(1).standard_normal(
            (L * S, Q)).astype(np.float32) * 0.01)

        def fn(v):  # v: [nt, rows, S] -> [nt, Tt, Q]: chainable via pad
            out = pl.pallas_call(
                kern,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((1, rows, S), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L * S, Q), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, Tt, Q), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nt, Tt, Q), jnp.float32),
            )(v, w)
            return (jnp.pad(out, ((0, 0), (0, rows - Tt), (0, 0)))
                    if rows > Tt else out)

        return fn, jnp.asarray(np.random.default_rng(0).standard_normal(
            (nt, rows, S)).astype(np.float32) * 0.1)

    shape = (1, 1, T)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
    arms = [("real roundtrip HIGHEST",
             lambda v: sp_hi.roundtrip(v.reshape(shape)).reshape(shape), x),
            ("real roundtrip bf16x3",
             lambda v: sp_x3.roundtrip(v.reshape(shape)).reshape(shape), x)]
    for prec in ("f32", "bf16x3"):
        for variant in ("noshift", "inshift", "outshift"):
            fn, v = skeleton(variant, prec)
            arms.append((f"skeleton {variant:8s} {prec}", fn, v))

    print(f"platform={jax.devices()[0].platform}  T={T}  L={L} S={S} "
          f"Tt={Tt} nt={nt} (both legs)  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms")
    results = {name: [] for name, _, _ in arms}
    for rep in range(args.reps):
        for name, fn, v in arms:
            ms = chained_ms(fn, v, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:30s} {ms:8.3f} ms")
    print()
    for k, v in results.items():
        print(f"{k:32s} best {min(v):8.3f} ms")


if __name__ == "__main__":
    main()

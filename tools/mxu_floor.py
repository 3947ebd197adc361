"""Measured MXU floor for the fused-roundtrip residual (DESIGN.md).

DESIGN.md attributes the fused roundtrip's ~2x-of-pass-count-bound
residual to "per-tile window movement + partial MXU utilization" —
after round 3 measured that the halo rolls were NOT it (scheme="slice"
bought only ~5%). This tool separates the two remaining suspects by
measuring a SKELETON kernel: the exact same grid, tile shapes, dot
sequence ([Tt, S] @ [S, Q] accumulating, same L per tile, same
precision scheme) but with no halo window, no DMA pipeline, no layout
transposes — the input block is VMEM-resident via BlockSpec and every
dot reuses it. Whatever the skeleton costs is the achievable floor of
the DOT SEQUENCE itself on this chip; the real-kernel excess over the
skeleton is data movement.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/mxu_floor.py

Interpretation (A/B within this one window):
- skeleton ≈ pass-count bound  -> residual is data movement (DMA/halo)
- skeleton ≈ real kernel       -> residual is MXU utilization at these
  dot shapes; the data movement is already hidden.
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
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp_hi = StreamingPQMF(100, M, use_pallas=True)
    sp_x3 = StreamingPQMF(100, M, use_pallas=True, precision="bf16x3")
    G = 128 // M

    # reproduce the fused roundtrip's actual grouped geometry
    Ka, Ks = sp_hi.hkf.shape[-1], sp_hi.hki.shape[-1]
    al, ar = centered_padding(Ka)
    Tpad = T + al + ar
    T_ana = (Tpad - Ka) // M + 1
    w2a, Sa, _ = cc._ana_grouped_weights(sp_hi.hkf, M, G, False, jnp.float32)
    La = w2a.shape[1] // Sa
    Ua = -(-T_ana // G)
    sl, sr = centered_padding(Ks)
    sl += G * M  # mirrors StreamingPQMF.roundtrip's aligned left pad
    T_out = sl + T_ana + sr - Ks + 1
    w2s, Ss, _ = cc._syn_grouped_weights(sp_hi.hki, G, False, 0, jnp.float32)
    Ls = w2s.shape[1] // Ss
    Us = -(-T_out // G)

    Tt = args.tile
    Q = 128
    nt_a, nt_s = -(-Ua // Tt), -(-Us // Tt)

    def skeleton(L, S, nt, prec):
        """Same dot sequence as _grouped_slice_kernel, zero data movement
        beyond the BlockSpec-resident tile."""

        def kern(x_ref, w_ref, o_ref):
            xw = x_ref[0]
            dn = (((1,), (0,)), ((), ()))
            if prec == "bf16x3":
                xh, xl = cc._split_bf16(xw)
                wh, wl = cc._split_bf16(w_ref[:])
                acc = None
                for l in range(L):
                    whb = wh[l * S:(l + 1) * S, :]
                    wlb = wl[l * S:(l + 1) * S, :]
                    y = (jax.lax.dot_general(
                            xh, whb, dn, preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            xh, wlb, dn, preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            xl, whb, dn, preferred_element_type=jnp.float32))
                    acc = y if acc is None else acc + y
            else:
                acc = None
                for l in range(L):
                    y = jax.lax.dot_general(
                        xw, w_ref[l * S:(l + 1) * S, :], dn,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    acc = y if acc is None else acc + y
            o_ref[0] = acc

        w = jnp.asarray(np.random.default_rng(1).standard_normal(
            (L * S, Q)).astype(np.float32) * 0.01)

        def fn(v):  # v: [nt, Tt, S] -> same shape (Q == S): chainable
            return pl.pallas_call(
                kern,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((1, Tt, S), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L * S, Q), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, Tt, Q), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nt, Tt, Q), jnp.float32),
            )(v, w)

        return fn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32) * 0.1)
    xa = jnp.asarray(rng.standard_normal(
        (nt_a, Tt, Sa)).astype(np.float32) * 0.1)
    xs = jnp.asarray(rng.standard_normal(
        (nt_s, Tt, Ss)).astype(np.float32) * 0.1)

    shape = (1, 1, T)
    arms = [
        ("real fused roundtrip HIGHEST",
         lambda v: sp_hi.roundtrip(v.reshape(shape)).reshape(shape), x),
        ("real fused roundtrip bf16x3",
         lambda v: sp_x3.roundtrip(v.reshape(shape)).reshape(shape), x),
        ("skeleton analysis dots HIGHEST", skeleton(La, Sa, nt_a, "f32"), xa),
        ("skeleton synthesis dots HIGHEST", skeleton(Ls, Ss, nt_s, "f32"),
         xs),
        ("skeleton analysis dots bf16x3", skeleton(La, Sa, nt_a, "bf16x3"),
         xa),
        ("skeleton synthesis dots bf16x3", skeleton(Ls, Ss, nt_s, "bf16x3"),
         xs),
    ]

    flops_a = nt_a * La * Tt * Sa * Q * 2
    flops_s = nt_s * Ls * Tt * Ss * Q * 2
    print(f"platform={jax.devices()[0].platform}  T={T}  "
          f"ana: La={La} S={Sa} nt={nt_a}  syn: Ls={Ls} S={Ss} nt={nt_s}  "
          f"tile={Tt}  dispatch_floor={dispatch_floor_ms():.1f} ms")
    print(f"skeleton GFLOP: analysis {flops_a/1e9:.2f}  "
          f"synthesis {flops_s/1e9:.2f}  (roundtrip {(flops_a+flops_s)/1e9:.2f})")

    results = {name: [] for name, _, _ in arms}
    for rep in range(args.reps):  # interleaved arms: same-window ratios
        for name, fn, v in arms:
            ms = chained_ms(fn, v, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:34s} {ms:8.3f} ms")
    print()
    best = {k: min(v) for k, v in results.items()}
    for k, v in best.items():
        print(f"{k:36s} best {v:8.3f} ms")
    sk_hi = best["skeleton analysis dots HIGHEST"] + \
        best["skeleton synthesis dots HIGHEST"]
    sk_x3 = best["skeleton analysis dots bf16x3"] + \
        best["skeleton synthesis dots bf16x3"]
    print(f"\nHIGHEST: real {best['real fused roundtrip HIGHEST']:.3f} ms "
          f"vs skeleton-sum {sk_hi:.3f} ms "
          f"({best['real fused roundtrip HIGHEST']/sk_hi:.2f}x)")
    print(f"bf16x3:  real {best['real fused roundtrip bf16x3']:.3f} ms "
          f"vs skeleton-sum {sk_x3:.3f} ms "
          f"({best['real fused roundtrip bf16x3']/sk_x3:.2f}x)")


if __name__ == "__main__":
    main()

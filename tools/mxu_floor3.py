"""Final attribution of the fused-roundtrip residual: manual DMA
pipeline vs XLA glue copies.

tools/mxu_floor2.py pinned the residual as a PRECISION-INDEPENDENT
~0.20 ms constant (real - skeleton: 0.203 ms HIGHEST, 0.211 ms bf16x3,
same window) and cleared the shifted-slice operands (inshift ==
noshift). Precision-independent leaves exactly two structural suspects:

- ``manualdma``: the real kernel's input machinery — x in ANY memory
  space, grid (1, nt), manual double-buffered window DMA
  (cc._dma_window_tm, win = Tt + 128, dynamic row offsets) — with the
  SAME dot sequence as floor2's ``inshift`` (which uses BlockSpec's
  automatic pipeline). manualdma - inshift = the DMA pipeline's cost.
- ``glue``: the XLA ops between/around the two pallas_calls (input
  pad-and-reshape; mid trim + last-group zeroing + left pad; output
  trim + chain pad) on the real shapes, with the kernels replaced by
  nothing — pads/slices cannot fuse across a custom-call boundary, so
  each is a real copy pass.

Expected identity (same window): 2*manualdma + glue + launch overhead
~= real roundtrip - 2*inshift + 2*inshift = real.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/mxu_floor3.py
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

    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    G = 128 // M
    T = int(args.seconds * SR) // M * M
    sp_hi = StreamingPQMF(100, M, use_pallas=True)
    sp_x3 = StreamingPQMF(100, M, use_pallas=True, precision="bf16x3")

    L, S, Q = 5, 128, 128
    Tt = args.tile
    win = Tt + 128
    nt = 2 * (-(-(T // 128) // Tt))  # both legs' tiles

    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (L * S, Q)).astype(np.float32) * 0.01)

    # --- inshift skeleton (floor2's, for the same-window base) ---------
    def make_inshift(prec):
        def kern(x_ref, w_ref, o_ref):
            xw = x_ref[0]
            dn = (((1,), (0,)), ((), ()))
            if prec == "f32":
                ops = [(xw, w_ref[:])]
            else:
                xh, xl = cc._split_bf16(xw)
                wh, wl = cc._split_bf16(w_ref[:])
                ops = [(xh, wh), (xh, wl), (xl, wh)]
            acc = None
            for l in range(L):
                for a, wb in ops:
                    y = jax.lax.dot_general(
                        a[l:l + Tt, :], wb[l * S:(l + 1) * S, :], dn,
                        preferred_element_type=jnp.float32,
                        **({"precision": jax.lax.Precision.HIGHEST}
                           if prec == "f32" else {}))
                    acc = y if acc is None else acc + y
            o_ref[0] = acc

        def fn(v):  # v [nt, win, S]
            out = pl.pallas_call(
                kern,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((1, win, S), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L * S, Q), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, Tt, Q), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nt, Tt, Q), jnp.float32),
            )(v, w)
            return jnp.pad(out, ((0, 0), (0, win - Tt), (0, 0)))

        return fn, jnp.asarray(np.random.default_rng(0).standard_normal(
            (nt, win, S)).astype(np.float32) * 0.1)

    # --- manual-DMA variant: real kernel's input machinery -------------
    def make_manualdma(prec):
        def kern(x_hbm, w_ref, o_ref, xw2, sem2):
            b = pl.program_id(0)
            i = pl.program_id(1)
            slot = cc._dma_window_tm(x_hbm, b, i, Tt, xw2, sem2, nt)
            xw = xw2[slot]
            dn = (((1,), (0,)), ((), ()))
            if prec == "f32":
                ops = [(xw, w_ref[:])]
            else:
                xh, xl = cc._split_bf16(xw)
                wh, wl = cc._split_bf16(w_ref[:])
                ops = [(xh, wh), (xh, wl), (xl, wh)]
            acc = None
            for l in range(L):
                for a, wb in ops:
                    y = jax.lax.dot_general(
                        a[l:l + Tt, :], wb[l * S:(l + 1) * S, :], dn,
                        preferred_element_type=jnp.float32,
                        **({"precision": jax.lax.Precision.HIGHEST}
                           if prec == "f32" else {}))
                    acc = y if acc is None else acc + y
            o_ref[:] = acc[None]

        cols = (nt - 1) * Tt + win

        def fn(v):  # v [1, cols, S]
            out = pl.pallas_call(
                kern,
                grid=(1, nt),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((L * S, Q), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, Tt, Q), lambda b, i: (b, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, nt * Tt, Q),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, win, S), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(v, w)
            return jnp.pad(out, ((0, 0), (0, cols - nt * Tt), (0, 0)))

        return fn, jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, cols, S)).astype(np.float32) * 0.1)

    # --- glue-only: the XLA ops around/between the real kernels --------
    Ka, Ks = sp_hi.hkf.shape[-1], sp_hi.hki.shape[-1]
    al, ar = centered_padding(Ka)
    Tpad = T + al + ar
    T_ana = (Tpad - Ka) // M + 1
    Ua = -(-T_ana // G)
    sl, sr_ = centered_padding(Ks)
    pl_ = sl if sl % G == 0 else sl + (G - sl % G)
    nt_a = -(-Ua // Tt)
    win_rows = Tt + 128
    cols_a = (nt_a - 1) * Tt + win_rows
    need = cols_a * S
    T_out = pl_ + T_ana + sr_ - Ks + 1
    Us = -(-T_out // G)
    nt_s = -(-Us // Tt)
    cols_s = (nt_s - 1) * Tt + win_rows
    rem = T_ana - (Ua - 1) * G

    @jax.jit
    def glue(x3, mid, zout):
        # input side: pad raw signal to the analysis kernel's coverage
        # and reshape to [1, cols, S] (the reshape itself is free)
        xr = jnp.pad(x3[:, 0, :], ((0, 0), (0, need - Tpad)))
        a_in = xr.reshape(1, need // S, S)
        # mid side: trim the analysis tiles, zero the edge rows of the
        # last partial group, left-pad for the synthesis, zero-extend to
        # the synthesis kernel's coverage
        ga = mid[:, :Ua, :]
        ga = ga.at[:, Ua - 1, rem * M:].set(0.0)
        ga = jnp.pad(ga, ((0, 0), (pl_ // G, cols_s - Ua - pl_ // G),
                          (0, 0)))
        # output side: trim + free reshape + the chain-harness pad every
        # measured "real roundtrip" number also contains
        z = zout[:, :Us, :].reshape(1, Us * G, M)[:, :T_out, :]
        zf = z.reshape(1, 1, -1)
        zf = jnp.pad(zf, ((0, 0), (0, 0), (0, Tpad - zf.shape[-1])))
        # keep every consumer live so nothing is DCE'd; outputs feed the
        # next chain step through combine in profiling.chained_ms
        return zf + a_in.reshape(1, 1, -1)[:, :, :Tpad] * 1e-30 \
            + ga[:, :1, :1].reshape(1, 1, 1) * 1e-30

    rng = np.random.default_rng(0)
    shape = (1, 1, Tpad)
    x3 = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
    mid = jnp.asarray(rng.standard_normal(
        (1, nt_a * Tt, Q)).astype(np.float32) * 0.1)
    zout = jnp.asarray(rng.standard_normal(
        (1, nt_s * Tt, Q)).astype(np.float32) * 0.1)

    def glue_arm(v):
        return glue(v, mid, zout)

    xx = x3
    shape60 = (1, 1, T)
    xr60 = jnp.asarray(rng.standard_normal(
        shape60).astype(np.float32) * 0.1)
    arms = [
        ("real roundtrip HIGHEST",
         lambda v: sp_hi.roundtrip(v.reshape(shape60)).reshape(shape60),
         xr60),
        ("real roundtrip bf16x3",
         lambda v: sp_x3.roundtrip(v.reshape(shape60)).reshape(shape60),
         xr60),
        ("glue only", glue_arm, xx),
    ]
    for prec in ("f32", "bf16x3"):
        fn, v = make_inshift(prec)
        arms.append((f"inshift blockspec {prec}", fn, v))
        fn, v = make_manualdma(prec)
        arms.append((f"inshift manualdma {prec}", fn, v))

    print(f"platform={jax.devices()[0].platform}  T={T}  L={L} S={S} "
          f"Tt={Tt} nt={nt} (both legs)  glue shapes: need={need} "
          f"Ua={Ua} Us={Us}  dispatch_floor={dispatch_floor_ms():.1f} ms")
    results = {name: [] for name, _, _ in arms}
    for rep in range(args.reps):
        for name, fn, v in arms:
            ms = chained_ms(fn, v, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:28s} {ms:8.3f} ms")
    print()
    best = {k: min(v) for k, v in results.items()}
    for k, v in best.items():
        print(f"{k:30s} best {v:8.3f} ms")
    for prec, tag in (("f32", "HIGHEST"), ("bf16x3", "bf16x3")):
        dma = best[f"inshift manualdma {prec}"] - \
            best[f"inshift blockspec {prec}"]
        acct = best[f"inshift manualdma {prec}"] + best["glue only"]
        print(f"{tag}: dma-pipeline delta {dma:+.3f} ms; "
              f"manualdma+glue = {acct:.3f} vs real "
              f"{best['real roundtrip ' + tag]:.3f} ms")


if __name__ == "__main__":
    main()

"""Same-window A/B of the grouped-kernel schemes on the real chip
(VERDICT r2 item 7): per-tile lane rolls ("roll", the round-2 shipped
form) vs sublane row-sliced time-major windows ("slice", the round-3
attempt at the ~2x-of-bound residual). Interleaves the measurements so
the documented co-tenancy swings hit both arms equally.

    python tools/ab_schemes.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms

    print(f"platform: {jax.devices()[0].platform}")
    sp = StreamingPQMF(100, 16, use_pallas=True)
    M = 16
    rng = np.random.default_rng(0)
    n = 60 * 44100 // M * M
    x = jnp.asarray(rng.standard_normal((1, 1, n)).astype(np.float32))

    Ka = sp.hkf.shape[-1]
    al, ar = centered_padding(Ka)
    sl, sr = centered_padding(sp.hki.shape[-1])
    xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))

    def rt(prec, scheme):
        def f(v):
            # calls="two" pins BOTH arms to the two-call body: the
            # default calls="single" only exists for scheme="slice", so
            # leaving it would conflate scheme with call count
            out = cc.fused_roundtrip_conv(v, sp.hkf, sp.hki, M, (sl, sr),
                                          mxu_precision=prec, scheme=scheme,
                                          calls="two")
            return jnp.pad(
                jnp.swapaxes(out, 1, 2).reshape(1, 1, -1),
                ((0, 0), (0, 0), (0, xx.shape[-1] - out.shape[1] * M)))
        return f

    def ana(scheme):
        def f(v):
            y = cc.strided_analysis_conv(v, sp.hkf, M, scheme=scheme)
            return jnp.pad(y.reshape(1, 1, -1),
                           ((0, 0), (0, 0),
                            (0, xx.shape[-1] - y.shape[1] * y.shape[2])))
        return f

    def syn(scheme):
        s = jnp.asarray(rng.standard_normal(
            (1, 16, n // M + sp.hki.shape[-1] - 1)).astype(np.float32))

        def f(v):
            y = cc.dense_synthesis_conv(v, sp.hki, scheme=scheme)
            return jnp.pad(
                jnp.swapaxes(y, 1, 2),
                ((0, 0), (0, 0), (0, v.shape[-1] - y.shape[1])))
        return f, s

    # interleaved repeats: each line prints roll vs slice measured
    # back-to-back in the same window
    for name, prec in (("HIGHEST", "highest"), ("bf16x3", "bf16x3")):
        for rep in range(3):
            a = chained_ms(rt(prec, "roll"), xx, n=60, repeats=2)
            b = chained_ms(rt(prec, "slice"), xx, n=60, repeats=2)
            print(f"fused roundtrip {name} rep{rep}: "
                  f"roll {a:.3f} ms  slice {b:.3f} ms  "
                  f"ratio {a / b if b else float('nan'):.2f}x")

    for rep in range(2):
        a = chained_ms(ana("roll"), xx, n=60, repeats=2)
        b = chained_ms(ana("slice"), xx, n=60, repeats=2)
        print(f"analysis rep{rep}: roll {a:.3f} ms  slice {b:.3f} ms")
    f_roll, s_in = syn("roll")
    f_slice, _ = syn("slice")
    for rep in range(2):
        a = chained_ms(f_roll, s_in, n=60, repeats=2)
        b = chained_ms(f_slice, s_in, n=60, repeats=2)
        print(f"synthesis rep{rep}: roll {a:.3f} ms  slice {b:.3f} ms")


if __name__ == "__main__":
    main()

"""Same-window A/B of the slice kernel's bf16x3 operand split: whole
window once (hoisted) vs per-tap slice (round-3 original), on the fused
roundtrip. The mxu_floor skeleton splits its resident block once and
sits 3.8x under the real bf16x3 kernel; this measures whether the
redundant per-slice re-splitting (~4.7x the data at L=5) is that gap.

The switch is a trace-time module global (cached_conv._SPLIT_WINDOW_ONCE)
read while Pallas traces the kernel, so each arm wraps the UNJITTED
fused_roundtrip_conv in a fresh jax.jit with the global pinned at trace
time. Arms are interleaved: every ratio is within one co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_split.py
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp = StreamingPQMF(100, M, use_pallas=True, precision="bf16x3")
    w_a, w_s = sp.hkf, sp.hki

    Ka, Ks = w_a.shape[-1], w_s.shape[-1]
    al, ar = centered_padding(Ka)
    sl, sr_ = centered_padding(Ks)
    pads = (sl, sr_)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32) * 0.1)
    xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))
    shape = xx.shape

    raw = cc.fused_roundtrip_conv.__wrapped__

    def make_arm(once):
        cc._SPLIT_WINDOW_ONCE = once

        @jax.jit
        def fn(v):
            out = raw(v, w_a, w_s, M, pads, tile=2048,
                      interpret=False, mxu_precision="bf16x3",
                      scheme="slice", mid="time")
            flat = out.reshape(1, 1, -1)
            return jnp.pad(flat, ((0, 0), (0, 0),
                                  (0, shape[-1] - flat.shape[-1])))

        fn(xx).block_until_ready()  # trace NOW, while the global is set
        return fn

    arms = [("hoisted ", make_arm(True)), ("per-slice", make_arm(False))]
    cc._SPLIT_WINDOW_ONCE = True

    # bit-identity first: the split is elementwise, slicing commutes
    a = np.asarray(arms[0][1](xx))
    b = np.asarray(arms[1][1](xx))
    print(f"max|hoisted-perslice| = {np.abs(a - b).max():.3e}")

    print(f"platform={jax.devices()[0].platform}  T={T}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  chain={args.chain}")
    results = {name: [] for name, _ in arms}
    for rep in range(args.reps):
        for name, fn in arms:
            ms = chained_ms(fn, xx, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:10s} {ms:8.3f} ms")
    h, p = min(results["hoisted "]), min(results["per-slice"])
    print(f"\nbf16x3 roundtrip: hoisted {h:.3f} ms, per-slice {p:.3f} ms, "
          f"per-slice/hoisted = {p / h:.3f}x")


if __name__ == "__main__":
    main()

"""Same-window A/B of the single-call fused roundtrip WITH vs WITHOUT
the synthesis window-assembly copies (the ring->synw VPU moves, ~1.1 MB
per 2048-row tile). The residual over the mxu_floor skeleton is a
precision-independent ~0.2 ms long tail; this isolates the assembly
copies' share of it.

The switch is a trace-time module global (cached_conv._ASSEMBLE) read
while Pallas traces the kernel, so each arm wraps the UNJITTED
fused_roundtrip_conv in a fresh jax.jit with the global pinned at trace
time. The False arm's OUTPUT IS GARBAGE (the dots read an unassembled
window) — it exists purely to time the kernel minus the copies; a
single-row ring read keeps the analysis arm live against DCE. Arms are
interleaved: every ratio is within one co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_asm.py
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
    ap.add_argument("--precision", default="both",
                    choices=["highest", "bf16x3", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, SR = 16, 44100
    T = int(args.seconds * SR) // M * M
    sp = StreamingPQMF(100, M, use_pallas=True)
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

    def make_arm(assemble, prec):
        cc._ASSEMBLE = assemble

        @jax.jit
        def fn(v):
            out = raw(v, w_a, w_s, M, pads, tile=2048,
                      interpret=False, mxu_precision=prec,
                      scheme="slice", mid="time", calls="single")
            flat = out.reshape(1, 1, -1)
            return jnp.pad(flat, ((0, 0), (0, 0),
                                  (0, shape[-1] - flat.shape[-1])))

        fn(xx).block_until_ready()  # trace NOW, while the global is set
        cc._ASSEMBLE = True
        return fn

    tiers = (["highest", "bf16x3"] if args.precision == "both"
             else [args.precision])

    print(f"platform={jax.devices()[0].platform}  T={T}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  chain={args.chain}")
    for prec in tiers:
        arms = [("assemble", make_arm(True, prec)),
                ("skip-asm", make_arm(False, prec))]
        results = {name: [] for name, _ in arms}
        for rep in range(args.reps):
            for name, fn in arms:
                ms = chained_ms(fn, xx, n=args.chain, repeats=2)
                results[name].append(ms)
                print(f"  [{prec}] rep{rep} {name:9s} {ms:8.3f} ms")
        a, s = min(results["assemble"]), min(results["skip-asm"])
        print(f"{prec}: assemble {a:.3f} ms, skip {s:.3f} ms, "
              f"copies cost {a - s:+.3f} ms ({(a - s) / a * 100:.1f}% "
              f"of the kernel)\n")


if __name__ == "__main__":
    main()

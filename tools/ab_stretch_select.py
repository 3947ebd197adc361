"""Same-window A/B: phase-vocoder frame selection as one-hot MATMUL vs
the jnp.take gathers it replaced (ops/phase_vocoder._select_frames).

CLAUDE.md documents traced minor-dim gathers at ~100x on this TPU (the
TA banded resample measured it); this probe quantifies the delta for the
STRETCH selection specifically, at the fused-pipeline shapes (16 bands,
traced per-band rates, the 8192-block STFT geometry and a whole-file
geometry). The switch is the trace-time pin pv._FORCE_SELECT, read while
tracing; each arm wraps the UNJITTED stretch in a fresh jax.jit (the
public fns' jit caches would otherwise serve one arm's trace to both).
Arms are interleaved: every ratio is within one co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp \
        python tools/ab_stretch_select.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=400)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.ops import phase_vocoder as pv
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M, B, F = 16, 1, 257
    shifts = np.arange(M)
    rates_np = (1.0 / 2.0 ** (shifts / 12.0)).astype(np.float32)

    raw_acc = pv.stretch_accumulate.__wrapped__

    print(f"platform={jax.devices()[0].platform}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  "
          f"chain={args.chain}")

    # block geometry (frames ~5) and a whole-file-ish one (frames 147)
    for frames, label in ((5, "block-8192"), (147, "file-150k")):
        FO = int(np.ceil(frames / rates_np.min()))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (2, M, B, F, frames)).astype(np.float32))
        omega = pv.phase_advance(F, 128, 512)
        rates = jnp.asarray(rates_np)

        def make_arm(use_take):
            pv._FORCE_SELECT = "take" if use_take else "onehot"

            @jax.jit
            def fn(v):
                def one(r, i, rate):
                    return raw_acc(r, i, rate, omega, FO)
                re_s, im_s = jax.vmap(one)(v[0], v[1], rates)
                out = jnp.stack([re_s, im_s])[..., :frames]
                return out * (1.0 / (1.0 + jnp.abs(out).max()))

            fn(x).block_until_ready()  # trace NOW, global pinned
            pv._FORCE_SELECT = None
            return fn

        arms = [("onehot", make_arm(False)), ("take", make_arm(True))]
        results = {name: [] for name, _ in arms}
        for rep in range(args.reps):
            for name, fn in arms:
                ms = chained_ms(fn, x, n=args.chain, repeats=2)
                results[name].append(ms)
                print(f"  [{label}] rep{rep} {name:7s} {ms:8.4f} ms")
        o, t = min(results["onehot"]), min(results["take"])
        print(f"{label}: onehot {o:.4f} ms, take {t:.4f} ms, "
              f"take/onehot = {t / o:.2f}x\n")


if __name__ == "__main__":
    main()

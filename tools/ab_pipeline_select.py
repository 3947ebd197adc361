"""Same-window A/B: the FULL flagship pitchshift step with the stretch
frame-selection as one-hot matmul (current, shared pv._select_frames) vs
the jnp.take gathers the r3 review flagged (the pipelines' inline stretch
used takes until then; ops/phase_vocoder switched in an earlier pass).

The switch is the trace-time global pv._USE_TAKE; each arm wraps the
wrapper's unjitted ``pitchshift_fn`` in a fresh ``jax.jit`` while the
global is pinned, so both lowerings of the whole fused program (analysis
+ stretch + resample + crossfade + synthesis) are compared in ONE
co-tenancy window.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp \
        python tools/ab_pipeline_select.py
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
    ap.add_argument("--buffer", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.ops import phase_vocoder as pv
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    w = PQMFPitchShiftWrapper(100, 16, args.buffer)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal(
        (1, 1, args.buffer)).astype(np.float32))
    tail0 = w.init_state()["prev_tail"]

    print(f"platform={jax.devices()[0].platform}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  "
          f"chain={args.chain}  buffer={args.buffer}")

    def make_arm(use_take):
        pv._USE_TAKE = use_take

        @jax.jit
        def fn(v):
            # chain through the carried tail so consecutive iterations
            # depend on each other (no across-iteration overlap illusion)
            tail, y = w.pitchshift_fn({"prev_tail": tail0 + v[0, 0, :1]},
                                      v)
            return v + (y[:, None, :] * 1e-6
                        + tail["prev_tail"].sum() * 1e-9)

        fn(x).block_until_ready()  # trace NOW, global pinned
        pv._USE_TAKE = False
        return fn

    arms = [("onehot", make_arm(False)), ("take", make_arm(True))]
    results = {name: [] for name, _ in arms}
    for rep in range(args.reps):
        for name, fn in arms:
            ms = chained_ms(fn, x, n=args.chain, repeats=2)
            results[name].append(ms)
            print(f"  rep{rep} {name:7s} {ms:8.4f} ms")
    o, t = min(results["onehot"]), min(results["take"])
    print(f"flagship step: onehot {o:.4f} ms, take {t:.4f} ms, "
          f"take/onehot = {t / o:.2f}x")


if __name__ == "__main__":
    main()

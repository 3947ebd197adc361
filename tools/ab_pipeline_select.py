"""Same-window A/B: the FULL flagship pitchshift step with the stretch
frame-selection as one-hot matmul (current, shared pv._select_frames) vs
the jnp.take gathers the r3 review flagged (the pipelines' inline stretch
used takes until then; ops/phase_vocoder switched in an earlier pass).

The switch is the trace-time pin pv._FORCE_SELECT; each arm wraps the
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
    ap.add_argument("--streams", type=int, default=1,
                    help="1: single-stream pitchshift_fn; N>1: the "
                         "N-stream serving step (pitchshift_streams)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.ops import phase_vocoder as pv
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    w = PQMFPitchShiftWrapper(100, 16, args.buffer)
    rng = np.random.default_rng(0)

    print(f"platform={jax.devices()[0].platform}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  "
          f"chain={args.chain}  buffer={args.buffer}  "
          f"streams={args.streams}")

    if args.streams > 1:
        NS = args.streams
        x = jnp.asarray(0.1 * rng.standard_normal(
            (NS, args.buffer)).astype(np.float32))
        tails0 = w.init_streams(NS)["prev_tail"]

        def step(v):
            # chain through the carried tails so consecutive iterations
            # depend on each other (no across-iteration overlap illusion)
            st, y = w.pitchshift_streams(
                {"prev_tail": tails0 + v[:1, :1, None]}, v)
            return v + (y * 1e-6 + st["prev_tail"].sum() * 1e-9)
    else:
        x = jnp.asarray(0.1 * rng.standard_normal(
            (1, 1, args.buffer)).astype(np.float32))
        tail0 = w.init_state()["prev_tail"]

        def step(v):
            # chain through the carried tail so consecutive iterations
            # depend on each other (no across-iteration overlap illusion)
            tail, y = w.pitchshift_fn({"prev_tail": tail0 + v[0, 0, :1]},
                                      v)
            return v + (y[:, None, :] * 1e-6
                        + tail["prev_tail"].sum() * 1e-9)

    def measure(use_take):
        # pitchshift_fn calls the jit-decorated _fused_band_pitchshift,
        # whose trace cache is keyed on avals/static args, NOT on the
        # module global — and chained_ms re-jits its chain around `step`
        # at call time. Pin the global and clear ALL trace caches for
        # every single measurement, or one arm silently re-measures the
        # other's lowering (found in r3 review: the original tool's two
        # arms compared identical programs; ab_stretch_select dodges the
        # same trap via __wrapped__). Retrace cost per call is absorbed
        # by the persistent compilation cache.
        jax.clear_caches()
        pv._FORCE_SELECT = "take" if use_take else "onehot"
        try:
            return chained_ms(step, x, n=args.chain, repeats=2)
        finally:
            pv._FORCE_SELECT = None

    arms = [("onehot", False), ("take", True)]
    results = {name: [] for name, _ in arms}
    for rep in range(args.reps):
        for name, use_take in arms:
            ms = measure(use_take)
            results[name].append(ms)
            print(f"  rep{rep} {name:7s} {ms:8.4f} ms")
    o, t = np.nanmin(results["onehot"]), np.nanmin(results["take"])
    print(f"flagship step: onehot {o:.4f} ms, take {t:.4f} ms, "
          f"take/onehot = {t / o:.2f}x")


if __name__ == "__main__":
    main()

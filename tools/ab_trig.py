"""Same-window A/B: the flagship pitchshift step with its VPU
transcendentals live (atan2 over every input bin in _magphase, cos/sin
over every stretched bin in the recompose — the math the reference runs
at VocoderPitchShifter.py:159-174) vs STUBBED to same-shape cheap
elementwise ops (pipelines._TRIG = "stub").

The stub arm's time is a LOWER BOUND on the step with free trig, so

    win_bound = real_ms / stub_ms

bounds what ANY trig optimization (rotation-form recompose, a Pallas
magphase kernel, ...) could buy. DESIGN §5c blames trig for the x16
serving step running 1.45x above its conv-peak FLOP bound — this
measures that attribution instead of assuming it (VERDICT r4 item 3).

Both arms re-jit the full fused program with the global pinned and ALL
trace caches cleared per measurement (the jit cache is keyed on avals,
not module globals — the r3 ab_pipeline_select trap).

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_trig.py
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
    ap.add_argument("--streams", type=int, default=16,
                    help="1: single-stream pitchshift_fn; N>1: the "
                         "N-stream serving step (the regime DESIGN §5c "
                         "bounds)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu import pipelines
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
            tail, y = w.pitchshift_fn({"prev_tail": tail0 + v[0, 0, :1]},
                                      v)
            return v + (y[:, None, :] * 1e-6
                        + tail["prev_tail"].sum() * 1e-9)

    def measure(mode):
        jax.clear_caches()
        pipelines._TRIG = mode
        try:
            return chained_ms(step, x, n=args.chain, repeats=2)
        finally:
            pipelines._TRIG = "real"

    arms = ["real", "stub"]
    results = {name: [] for name in arms}
    for rep in range(args.reps):
        for name in arms:
            ms = measure(name)
            results[name].append(ms)
            print(f"  rep{rep} {name:5s} {ms:8.4f} ms")
    r, s = np.nanmin(results["real"]), np.nanmin(results["stub"])
    print(f"flagship step ({args.streams} streams): real {r:.4f} ms, "
          f"trig-stubbed {s:.4f} ms, real/stub = {r / s:.3f}x "
          f"-> trig residual <= {100 * (r - s) / r:.1f}% of the step")


if __name__ == "__main__":
    main()

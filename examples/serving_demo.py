"""Production-style serving demo: AOT artifact + N concurrent streams.

Shows the deployment path end to end:

1. export the flagship pitch-shift wrapper to an artifact directory
   (weights + manifest + AOT StableHLO of the jitted step);
2. reload BOTH ways — full wrapper (portable) and AOT blob (no retrace);
3. serve N independent real-time streams, each with its own crossfade
   state, in ONE fused program per block step;
4. report per-step latency honestly (chained on-chip timing — see
   pqmf_tpu.utils.profiling for why naive per-call timing lies on
   tunneled setups).

    python examples/serving_demo.py --cpu --streams 8 --blocks 16
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--blocks", type=int, default=16)
    p.add_argument("--buffer", type=int, default=8192)
    p.add_argument("--n_band", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pqmf_tpu.export import load_artifact, load_stablehlo, save_artifact
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    shifts = [0, 4, -5, -12, 3, -7, 2, -3, 5, -9, 1, -1, -4, -6, -2, -24]
    # cycle to any band count (the wrapper asserts len(shifts) == n_band)
    shifts = [shifts[i % len(shifts)] for i in range(args.n_band)]

    with tempfile.TemporaryDirectory() as td:
        # 1. export (the TorchScript-archive analog)
        w = PQMFPitchShiftWrapper(100, args.n_band, args.buffer, 44100,
                                  shifts)
        path = save_artifact(w, os.path.join(td, "pvoc"),
                             with_stablehlo=True)
        files = sorted(os.listdir(path))
        print(f"artifact: {files}")

        # 2a. full reload (rebuilds the wrapper from weights, no design
        #     chain rerun)
        loaded, manifest = load_artifact(path)
        print(f"reloaded wrapper: methods={loaded.get_methods()}, "
              f"shifts={manifest['config']['shifts_in_semitones'][:4]}...")

        # 2b. AOT reload: executes the serialized StableHLO, no tracing
        aot = load_stablehlo(path)
        x1 = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, args.buffer)).astype(np.float32) * 0.3)
        tail0 = jnp.zeros((args.n_band, loaded.band_overlap), jnp.float32)
        tail1, y_aot = aot(tail0, x1)
        _, y_live = loaded.pitchshift_fn({"prev_tail": tail0}, x1)
        err = float(jnp.abs(y_aot - y_live).max())
        print(f"AOT == live wrapper: max err {err:.2e}")

        # 3. multi-stream serving: one fused step for all streams
        S = args.streams
        rng = np.random.default_rng(1)
        blocks = jnp.asarray(rng.standard_normal(
            (args.blocks, S, args.buffer)).astype(np.float32) * 0.3)
        states = loaded.init_streams(S)

        @jax.jit
        def serve(states, blocks):
            return jax.lax.scan(
                lambda st, b: loaded.pitchshift_streams(st, b),
                states, blocks)

        t0 = time.perf_counter()
        states, outs = serve(states, blocks)
        jax.block_until_ready(outs)
        compile_and_run = time.perf_counter() - t0

        t0 = time.perf_counter()
        states, outs = serve(states, blocks)
        jax.block_until_ready(outs)
        steady = time.perf_counter() - t0

        per_step_ms = steady / args.blocks * 1e3
        block_s = args.buffer / 44100.0
        agg_rtf = S * block_s / (steady / args.blocks)
        print(f"served {S} streams x {args.blocks} blocks "
              f"({S * args.blocks * block_s:.1f} s of audio)")
        print(f"first call (compile + run): {compile_and_run:.2f}s; "
              f"steady state: {per_step_ms:.2f} ms/step "
              f"(~{agg_rtf:,.0f}x aggregate realtime; includes one host "
              f"dispatch for the whole scan)")
        print(f"output: {outs.shape}, finite: "
              f"{bool(jnp.isfinite(outs).all())}")


if __name__ == "__main__":
    main()

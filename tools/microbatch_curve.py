"""Small-buffer micro-batching curve (VERDICT r4 item 7).

The reference's deployment target is a PD-style realtime host at small
buffers (PQMFWrapper.py:34 declares m_buffer_size=512 by default:
11.6 ms of audio at 44.1 kHz). On this development setup the chip sits
behind a ~25-35 ms per-dispatch tunnel, so a 512-sample host can never
hit realtime one-block-at-a-time — the dispatch floor alone blows the
budget (bench.py's block_latency_ms rows record exactly that, honestly).

The achievable trade is K-block micro-batching: the host queues K
consecutive blocks and submits ONE dispatch that scans all K through the
stateful pitchshift (carried crossfade state, so audio is bit-identical
to K single calls). Cost: (K-1) blocks of added buffering latency.
Payoff: the dispatch floor amortizes 1/K per block. This tool measures
the curve — WALL time per dispatch (deliberately including the tunnel:
that is what a host sees), per-block wall vs the audio budget, and the
total added latency — and prints the smallest realtime K.

On production TPU serving (no tunnel; PCIe/ICI-attached host, dispatch
floor well under 1 ms) the same curve applies with a much smaller
constant: read the K=1 row's on-chip step cost from bench.py /
tools/roofline.py instead.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/microbatch_curve.py [--block 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--n_band", type=int, default=16)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--ks", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.profiling import dispatch_floor_ms

    SR = 44100
    budget_ms = args.block / SR * 1e3
    w = PQMFPitchShiftWrapper(100, args.n_band, args.block, SR)
    rng = np.random.default_rng(0)

    print(f"platform={jax.devices()[0].platform}  block={args.block} "
          f"({budget_ms:.2f} ms audio budget)  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms")
    print(f"{'K':>4s} {'wall ms/call':>13s} {'ms/block':>9s} "
          f"{'budget x':>9s} {'added latency ms':>17s}  realtime?")

    best_k = None
    for K in args.ks:
        blocks = jnp.asarray(0.1 * rng.standard_normal(
            (K, 1, 1, args.block)).astype(np.float32))
        state = w.init_state()

        @jax.jit
        def run(state, blocks):
            return jax.lax.scan(
                lambda s, b: w.pitchshift_fn(s, b), state, blocks)

        float(run(state, blocks)[1].sum())  # compile + sync
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(state, blocks)[1].sum())
            best = min(best, time.perf_counter() - t0)
        wall = best * 1e3
        per_block = wall / K
        ok = per_block <= budget_ms
        # host pipeline latency: buffer K blocks, then one dispatch
        latency = K * budget_ms + wall
        if ok and best_k is None:
            best_k = (K, latency)
        print(f"{K:4d} {wall:13.2f} {per_block:9.2f} "
              f"{per_block / budget_ms:9.2f} {latency:17.1f}  "
              f"{'YES' if ok else 'no'}")

    if best_k:
        print(f"smallest realtime K = {best_k[0]} "
              f"(end-to-end added latency ~{best_k[1]:.0f} ms); every "
              f"doubling beyond it halves the per-block dispatch share "
              f"and adds {budget_ms:.1f} ms x K of buffering")
    else:
        print("no K in range reached realtime this window (co-tenancy? "
              "re-run; the curve's SHAPE is still valid within-window)")


if __name__ == "__main__":
    main()

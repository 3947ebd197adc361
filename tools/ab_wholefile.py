"""Same-window A/B: the whole-file flagship pitchshift's stretch-back
resample lowering — "gather" (two minor-dim jnp.take's, the pre-r5
fallback; VocoderPitchShifter.py:299-302 is the op this implements at
file scale) vs "chunked" (lax.scan of bounded-span one-hot matmuls,
ops.resample.interpolate_linear_dynamic_chunked) — on the exact
geometry bench.py's wholefile_pitchshift row records (T = 16*81920,
~29.7 s of audio per call, Tb = 81920 per band).

The lowering is pinned per arm via PQMFPitchShiftWrapper
.resample_override; resample_kind is a STATIC argname of the inner
fused program, so each arm compiles its own entry — no trace-global
trap (the r3 ab_pipeline_select lesson does not apply).

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/ab_wholefile.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--T", type=int, default=16 * 81920)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    SR = 44100
    w = PQMFPitchShiftWrapper(100, 16, 8192, SR, max_buffer_size=None)
    x = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
        (1, 1, args.T)).astype(np.float32))
    state0 = w.init_state()

    print(f"platform={jax.devices()[0].platform}  "
          f"dispatch_floor={dispatch_floor_ms():.1f} ms  "
          f"T={args.T} ({args.T / SR:.1f}s audio/call)  chain={args.chain}")

    # parity first: both lowerings must produce the same audio
    outs = {}
    for kind in ("gather", "chunked"):
        w.resample_override = kind
        _, y = w.pitchshift_fn(state0, x)
        outs[kind] = np.asarray(y)
    w.resample_override = None
    from pqmf_tpu.utils.metrics import snr_db  # the ONE definition site
    snr = snr_db(outs["gather"], outs["chunked"])
    print(f"gather-vs-chunked whole-file parity: {snr:.1f} dB "
          f"(expect > 120: identical index/weight math)")

    def step_for(kind):
        def step(v):
            w.resample_override = kind
            try:
                _, y = w.pitchshift_fn(state0, v)
            finally:
                w.resample_override = None
            return y[:, None, :]
        return step

    results = {k: [] for k in ("gather", "chunked")}
    # ONE closure per arm, hoisted out of the rep loop: a fresh closure
    # per measurement would miss jit's trace cache and re-trace + rebuild
    # the n and 2n whole-file chain programs every rep (the same
    # fresh-closure-identity defect the r5 stream_ola fix removed)
    steps = {k: step_for(k) for k in results}
    for rep in range(args.reps):
        for kind in results:
            ms = chained_ms(steps[kind], x, n=args.chain, repeats=2)
            results[kind].append(ms)
            rtf = (args.T / SR) / (ms * 1e-3) if ms == ms else float("nan")
            print(f"  rep{rep} {kind:8s} {ms:9.3f} ms/call  ({rtf:,.0f}x RT)")
    g = np.nanmin(results["gather"])
    c = np.nanmin(results["chunked"])
    print(f"best-of: gather {g:.3f} ms, chunked {c:.3f} ms, "
          f"gather/chunked = {g / c:.3f}x "
          f"({'chunked wins' if c < g else 'gather wins'})")


if __name__ == "__main__":
    main()

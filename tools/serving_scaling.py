"""Per-chip serving capacity curve: aggregate throughput of the flagship
pitch-shift step vs concurrent stream count.

bench.py records two points (16 and 64 streams); this sweeps S in
{1, 4, 16, 64, 128, 256} with the SAME measurement (scanned
`pitchshift_streams` over 8192-sample blocks, n-vs-2n differencing, one
dispatch per chain) so a deployment can size one chip: the curve's
plateau is the chip's saturated aggregate rate, and the largest S whose
per-stream rate is still >= 1x realtime is the capacity at the default
8192-sample (185.8 ms) serving buffer. The reference's nearest analog
is one module instance per stream, sequentially (its crossfade buffers
are single-stream — 1-PitchShifterWrapper.py:170-180, batch>1 skips the
blend at :262).

All points in one invocation share a measurement window; like every
tool here, compare points WITHIN a run (the shared chip swings up to
~3x between windows).

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/serving_scaling.py
    python tools/serving_scaling.py --streams 1,4,16 --n_blocks 64 --cpu
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

SR = 44100
BLOCK = 8192


def measure(n_streams: int, n_blocks: int, precision: str):
    import jax
    import jax.numpy as jnp

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.profiling import chained_ms

    w = PQMFPitchShiftWrapper(100, 16, BLOCK, SR, precision=precision)
    states = w.init_streams(n_streams)
    rng = np.random.default_rng(0)
    # cap the input upload at ~128 MB for the doubled array (the chip is
    # behind a tunnel; a 256-stream x 128-block input would be 2 GB) —
    # shrink the scan length, not the batch, at high S
    max_blocks = max(16, (64 << 20) // (n_streams * BLOCK * 4))
    n_blocks = min(n_blocks, max_blocks)
    blocks = jnp.asarray(0.1 * rng.standard_normal(
        (n_blocks, n_streams, BLOCK)).astype(np.float32))
    blocks2 = jnp.concatenate([blocks, blocks])

    @jax.jit
    def run(states, blocks):
        return jax.lax.scan(
            lambda s, b: w.pitchshift_streams(s, b), states, blocks)

    import time
    def timed(b, n):
        # n-vs-2n differencing over the scan length, same as bench.py's
        # _scan_rtf: one dispatch per call, the doubled scan isolates
        # the per-step cost from the dispatch + readback overhead
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(states, b)[1].sum())
            best = min(best, time.perf_counter() - t0)
        return best / n

    float(run(states, blocks)[1].sum())   # warm both programs
    float(run(states, blocks2)[1].sum())
    t1 = timed(blocks, n_blocks)
    t2 = timed(blocks2, 2 * n_blocks)
    # per-step seconds with overhead differenced out:
    # T(n) = n*step + ovh; T(2n) = 2n*step + ovh  =>  step = 2*t2 - t1
    step_s = 2 * t2 - t1
    if step_s <= 0:
        step_s = float("nan")
    audio_s = BLOCK / SR
    per_stream_rtf = audio_s / step_s
    return step_s * 1e3, per_stream_rtf, n_streams * per_stream_rtf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=str, default="1,4,16,64,128,256")
    ap.add_argument("--n_blocks", type=int, default=128)
    ap.add_argument("--precision", type=str, default="highest")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"platform={jax.devices()[0].platform}  block={BLOCK}  "
          f"precision={args.precision}  n_blocks={args.n_blocks}")
    print(f"{'S':>4} {'ms/step':>9} {'per-stream RTF':>15} "
          f"{'aggregate RTF':>14} {'realtime?':>9}")
    for s in (int(v) for v in args.streams.split(",")):
        ms, rtf1, agg = measure(s, args.n_blocks, args.precision)
        print(f"{s:>4} {ms:>9.3f} {rtf1:>15,.0f} {agg:>14,.0f} "
              f"{'yes' if rtf1 >= 1 else 'NO':>9}")


if __name__ == "__main__":
    main()

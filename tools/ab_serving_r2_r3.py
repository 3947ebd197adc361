"""Same-window A/B: the 16-stream serving step, r2 code vs the current
tree (VERDICT r3 item 5 — explain the BENCH_r02 8,727x -> BENCH_r03
8,047x aggregate drift: co-tenancy or a real regression from the r3
serving-path refactors, e.g. the shared one-hot crossover).

Each arm runs in a SUBPROCESS against its own source tree (the r2 tree
comes from `git worktree add <dir> d973c27`), measuring the differenced
per-step milliseconds of the scanned 16-stream pitchshift (the exact
bench_streams program). Arms are interleaved A/B/A/B within one window —
the chip's ~3x co-tenancy swings cancel only within a window (verify
skill). Run:

    python tools/ab_serving_r2_r3.py [--pairs 3] [--base COMMIT]

It creates/reuses a worktree at /tmp/pqmf_<base>_tree. ``--base`` lets
the same interleaved harness bisect WHICH commit introduced a measured
step-time change (default: the round-2 marker).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

R2_COMMIT = "d973c27"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEASURE = r"""
import sys, time, json
sys.path.insert(0, sys.argv[1])
import numpy as np
import jax, jax.numpy as jnp
from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

n_streams, n_blocks = 16, 256
w = PQMFPitchShiftWrapper(100, 16, 8192, 44100)
blocks = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
    (n_blocks, n_streams, 8192)).astype(np.float32))
blocks2 = jnp.concatenate([blocks, blocks])
states = w.init_streams(n_streams)

@jax.jit
def run(states, blocks):
    return jax.lax.scan(lambda s, b: w.pitchshift_streams(s, b),
                        states, blocks)

float(run(states, blocks)[1].sum())    # compile + sync
float(run(states, blocks2)[1].sum())
best1 = best2 = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(run(states, blocks)[1].sum())
    best1 = min(best1, time.perf_counter() - t0)
    t0 = time.perf_counter(); float(run(states, blocks2)[1].sum())
    best2 = min(best2, time.perf_counter() - t0)
ms = (best2 - best1) / n_blocks * 1e3
print(json.dumps({"per_step_ms": ms, "valid": best2 > best1}))
"""


def run_arm(tree: str) -> dict:
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/root/.cache/jaxcomp")
    out = subprocess.run([sys.executable, "-c", MEASURE, tree],
                         capture_output=True, text=True, timeout=1800,
                         env=env)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--base", default=R2_COMMIT,
                    help="commit for the baseline arm (default: round-2)")
    args = ap.parse_args()

    # resolve to a short SHA for the worktree path: a --base like
    # "origin/main" contains a slash, and /tmp/pqmf_origin/... has no
    # existing parent so `git worktree add` would fail (advisor r4)
    base_sha = subprocess.run(
        ["git", "rev-parse", "--short", args.base], cwd=REPO, check=True,
        capture_output=True, text=True).stdout.strip()
    base_tree = f"/tmp/pqmf_{base_sha}_tree"
    if not os.path.exists(base_tree):
        subprocess.run(["git", "worktree", "add", "--detach", base_tree,
                        args.base], cwd=REPO, check=True)

    results = {"base": [], "now": []}
    for i in range(args.pairs):
        a = run_arm(base_tree)
        b = run_arm(REPO)
        results["base"].append(a)
        results["now"].append(b)
        va = a["per_step_ms"] if a["valid"] else float("nan")
        vb = b["per_step_ms"] if b["valid"] else float("nan")
        print(f"pair {i}: base {va:.4f} ms | now {vb:.4f} ms | "
              f"now/base {vb / va:.3f}x")
    best_r2 = min(r["per_step_ms"] for r in results["base"] if r["valid"])
    best_now = min(r["per_step_ms"] for r in results["now"] if r["valid"])
    print(f"best-of: base {best_r2:.4f} ms, now {best_now:.4f} ms, "
          f"now/base {best_now / best_r2:.3f}x "
          f"(16-stream aggregate RTF: base "
          f"{16 * (8192 / 44100) / (best_r2 / 1e3):.0f}x, now "
          f"{16 * (8192 / 44100) / (best_now / 1e3):.0f}x)")


if __name__ == "__main__":
    main()

"""Profiling / timing utilities (SURVEY.md §5: the reference's only
instrumentation is ad-hoc prints — here: jax.profiler traces + honest
on-chip timing helpers).

The axon development setup reaches the chip through a network tunnel with
a ~25 ms per-dispatch round trip, so naive per-call timing measures the
host link, not the kernel. :func:`chained_ms` times ``n`` back-to-back
applications inside one jitted ``lax.fori_loop`` and divides — the number
a pipelined production server would see.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "chained_ms", "dispatch_floor_ms"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dispatch_floor_ms(repeats: int = 10) -> float:
    """Per-dispatch host<->device round-trip latency (the floor every
    single-call measurement sits on)."""
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: v + 1.0)
    x = jnp.ones((8, 128))
    float(tiny(x).sum())
    t0 = time.perf_counter()
    for _ in range(repeats):
        float(tiny(x).sum())
    return (time.perf_counter() - t0) / repeats * 1e3


def chained_ms(fn, x, n: int = 50, repeats: int = 3) -> float:
    """Milliseconds per application of shape-preserving ``fn``.

    Times chains of ``n`` and ``2n`` applications (each ONE jitted
    ``fori_loop`` program) and differences them, so the per-dispatch
    tunnel latency and any constant program overhead cancel exactly —
    subtracting a separately measured dispatch floor proved fragile (a
    single tunnel stall during the floor measurement skews every row)."""
    def make(k):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)
        return run

    run_n, run_2n = make(n), make(2 * n)
    float(run_n(x).sum())  # compile + sync
    float(run_2n(x).sum())
    best_n = best_2n = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(x).sum())
        best_n = min(best_n, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_2n(x).sum())
        best_2n = min(best_2n, time.perf_counter() - t0)
    if best_2n <= best_n:
        # the 2n chain measured no slower than the n chain: the window was
        # too noisy (documented co-tenancy swings) for a valid difference.
        # Return NaN so an invalid measurement is VISIBLE in roofline/A-B
        # tables instead of reading as infinitely fast (advisor r2).
        return float("nan")
    return (best_2n - best_n) / n * 1e3

"""Smoke tests for the driver-facing measurement harnesses.

bench.py is the artifact the driver runs at round end on the real chip;
nothing else in the suite imports it, so a refactor in the library
surface it drives (wrapper ctors, plan tuples, roundtrip methods) can
silently break it and the round's BENCH record then shows an error
instead of numbers — the same rot class VERDICT r3 flagged for the
untested examples. Each measurement function is run here at toy sizes
on CPU: timings are meaningless, but the programs must build, run, and
return finite positive rates.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REPEATS = 1
    return mod


def _tiny_signal(bench, seconds=2.0):
    n = int(seconds * bench.SR) // bench.N_BAND * bench.N_BAND
    return bench._signal(n)


def test_bench_jax_roundtrip(bench):
    rtf, snr, _ = bench.bench_jax(_tiny_signal(bench), chain=3)
    assert np.isfinite(rtf) and rtf > 0
    assert snr > 40  # the design's own ripple floor, not arithmetic


def test_bench_jax_m4_row(bench):
    # the M=4 extras row (VERDICT r3 item 6) drives the relaxed kernel gate
    rtf, snr, _ = bench.bench_jax(_tiny_signal(bench), chain=3, n_band=4)
    assert np.isfinite(rtf) and rtf > 0
    assert snr > 30


def test_bench_torch_floor(bench):
    rtf = bench.bench_torch(_tiny_signal(bench, 0.5))
    assert np.isfinite(rtf) and rtf > 0


@pytest.mark.parametrize("fn,kwargs", [
    ("bench_pitchshift", {"n_blocks": 2}),
    ("bench_ta_pitchshift", {"n_blocks": 2}),
    ("bench_streams", {"n_streams": 2, "n_blocks": 2}),
    ("bench_wholefile_pitchshift", {"n_calls": 1, "T": 16 * 2048}),
    ("bench_stream_ola", {"T": 16 * 2048}),
])
def test_scan_benches_build_and_run(bench, fn, kwargs):
    corrected, raw, _window_ok = getattr(bench, fn)(**kwargs)
    # window_ok is timing-dependent — on CPU either outcome is fine; the
    # invariant is that both reported rates are finite and positive
    assert np.isfinite(corrected) and corrected > 0
    assert np.isfinite(raw) and raw > 0


def test_block_latency_shape(bench):
    out = bench.bench_block_latency(blocks=(512,), repeats=2)
    row = out["512"]
    assert set(row) >= {"wall_ms", "best_ms", "budget_ms", "realtime"}
    assert row["best_ms"] > 0

"""Runtime shape guards (reference raises ValueError/RuntimeError on bad
shapes: PQMFWrapper.py:65,79; 1-PitchShifterWrapper.py:205,219) and the
profiling utilities."""

import numpy as np
import pytest

from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, PQMFWrapper


def test_wrapper_rejects_bad_shapes():
    w = PQMFWrapper(70, 8, m_buffer_size=256)
    with pytest.raises(ValueError):
        w.forward(np.zeros((2, 3, 256), np.float32))  # not mono
    with pytest.raises(ValueError):
        w.inverse(np.zeros((1, 4, 32), np.float32))  # wrong band count


def test_pitchshift_wrapper_rejects_bad_shapes():
    w = PQMFPitchShiftWrapper(70, 8, 256)
    with pytest.raises(ValueError):
        w.decompose(np.zeros((1, 2, 256), np.float32))
    with pytest.raises(AssertionError):
        PQMFPitchShiftWrapper(70, 8, 256, shifts_in_semitones=[1, 2, 3])


def test_pqmf_rejects_indivisible_length():
    from pqmf_tpu import PQMF

    pq = PQMF(70, 8)
    with pytest.raises(ValueError):
        pq.forward(np.zeros((1, 1, 100), np.float32))  # 100 % 8 != 0


def test_profiling_helpers():
    import jax.numpy as jnp

    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    floor = dispatch_floor_ms(repeats=3)
    assert floor >= 0.0
    ms = chained_ms(lambda v: v * 1.0001, jnp.ones((8, 128)), n=10,
                    repeats=1)
    assert ms >= 0.0


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from pqmf_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        float(jnp.ones((8, 8)).sum())
    import os

    found = any(files for _, _, files in os.walk(tmp_path))
    assert found

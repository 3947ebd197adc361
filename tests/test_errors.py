"""Runtime shape guards (reference raises ValueError/RuntimeError on bad
shapes: PQMFWrapper.py:65,79; 1-PitchShifterWrapper.py:205,219) and the
profiling utilities."""

import jax.numpy as jnp
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
    with pytest.raises(ValueError, match="shifts"):
        PQMFPitchShiftWrapper(70, 8, 256, shifts_in_semitones=[1, 2, 3])


def test_pqmf_rejects_indivisible_length():
    from pqmf_tpu import PQMF

    pq = PQMF(70, 8)
    with pytest.raises(ValueError):
        pq.forward(np.zeros((1, 1, 100), np.float32))  # 100 % 8 != 0


def test_profiling_helpers():
    import math

    import jax.numpy as jnp

    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    floor = dispatch_floor_ms(repeats=3)
    assert floor >= 0.0
    ms = chained_ms(lambda v: v * 1.0001, jnp.ones((8, 128)), n=10,
                    repeats=1)
    # NaN marks an invalid (too-noisy) window — visible, not "0 ms"
    assert math.isnan(ms) or ms >= 0.0


def test_max_buffer_size_is_enforced():
    """The declared host-buffer limit is real (VERDICT r2 weak-5): block
    longer than max_buffer_size -> ValueError in all three wrappers;
    max_buffer_size=None opts into offline whole-file processing."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    big = np.zeros((1, 1, 32768), np.float32)
    w = PQMFWrapper(70, 8, m_buffer_size=256)
    with pytest.raises(ValueError, match="max_buffer_size"):
        w.forward(big)
    with pytest.raises(ValueError, match="max_buffer_size"):
        w.inverse(np.zeros((1, 8, 32768 // 8), np.float32))

    wf = PQMFPitchShiftWrapper(70, 8, 256)
    with pytest.raises(ValueError, match="max_buffer_size"):
        wf.pitchshift_fn(wf.init_state(), big)
    with pytest.raises(ValueError, match="max_buffer_size"):
        wf.forward_fn(big)
    with pytest.raises(ValueError, match="max_buffer_size"):
        wf.inverse(np.zeros((1, 8, 32768 // 8), np.float32))

    wt = PQMFPitchShiftWrapperTA(70, 8, 256)
    with pytest.raises(ValueError, match="max_buffer_size"):
        wt.pitchshifter(big)

    # explicit opt-out restores whole-file use
    w_open = PQMFWrapper(70, 8, m_buffer_size=256, max_buffer_size=None)
    assert np.asarray(w_open.forward(big)).shape == (1, 8, 32768 // 8)


def test_streaming_odd_block_rejected():
    """An odd sub-band block length silently corrupts every later block
    (reverse_half's block-local sign parity — module docstring); the
    block methods must reject it loudly instead. Even blocks and the
    n_band=1 passthrough (no odd bands, parity-free) stay accepted."""
    from pqmf_tpu.streaming import StreamingPQMF

    sp = StreamingPQMF(70, 16)
    st = sp.init_state()
    with pytest.raises(ValueError, match="sign parity"):
        sp.forward_block(st, np.zeros((1, 1, 3 * 16), np.float32))
    with pytest.raises(ValueError, match="multiple of n_band"):
        sp.forward_block(st, np.zeros((1, 1, 100), np.float32))
    with pytest.raises(ValueError, match="sign parity"):
        sp.inverse_block(st, np.zeros((1, 16, 7), np.float32))
    sp.forward_block(st, np.zeros((1, 1, 32 * 16), np.float32))  # fine

    sp1 = StreamingPQMF(70, 1)
    sp1.forward_block(sp1.init_state(),
                      np.zeros((1, 1, 37), np.float32))  # parity-free


def test_set_weights_warns_when_mesh_degrades_to_lax():
    """Restoring a bank whose halos fail the Pallas gate while a (data,
    band) mesh is configured must warn like __init__ does for the same
    end state — not silently fall back to unsharded lax convs."""
    import jax

    from pqmf_tpu.ops.filterbank import params_from_hk
    from pqmf_tpu.parallel.sharding import make_mesh
    from pqmf_tpu.streaming import StreamingPQMF, kernels_from_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    sp = StreamingPQMF(100, 16, use_pallas=True, mesh=make_mesh(8, 16))
    assert sp.use_pallas
    # a 4096-tap bank: analysis halo 256 > the 128-lane tile -> unsupported
    big = params_from_hk(np.zeros((16, 4096), np.float32))
    with pytest.warns(UserWarning, match="unsharded"):
        sp.set_weights(big, *kernels_from_params(big))
    assert not sp.use_pallas


def test_nominal_buffer_larger_than_limit_rejected_at_construction():
    """m_buffer_size > max_buffer_size would produce a wrapper that
    rejects its own declared block size on every call — caught at
    construction with a clear error in all three wrappers."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    for ctor in (lambda: PQMFWrapper(70, 8, m_buffer_size=32768),
                 lambda: PQMFPitchShiftWrapper(70, 8, 32768),
                 lambda: PQMFPitchShiftWrapperTA(70, 8, 16384)):
        with pytest.raises(ValueError, match="exceeds max_buffer_size"):
            ctor()
    # max_buffer_size=None imposes no cap
    PQMFWrapper(70, 8, m_buffer_size=32768, max_buffer_size=None)


def test_unknown_kernel_scheme_rejected():
    """A typo'd scheme must not silently fall back to the roll kernel —
    it would invalidate every A/B comparison built on the flag."""
    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.streaming import StreamingPQMF

    sp = StreamingPQMF(70, 8)
    x = np.zeros((1, 1, 1024), np.float32)
    with pytest.raises(ValueError, match="unknown scheme"):
        cc.strided_analysis_conv(jnp.asarray(x), sp.hkf, 8,
                                 scheme="sliced", interpret=True)


def test_length_must_divide_into_bands():
    """T % n_band != 0 -> ValueError at the wrapper boundary (previously
    only the offline PQMF module checked)."""
    w = PQMFWrapper(70, 8, m_buffer_size=256)
    with pytest.raises(ValueError, match="multiple of n_band"):
        w.forward(np.zeros((1, 1, 100), np.float32))
    wf = PQMFPitchShiftWrapper(70, 8, 256)
    with pytest.raises(ValueError, match="multiple of n_band"):
        wf.decompose(np.zeros((1, 1, 100), np.float32))


def test_finetune_rejects_empty_interior():
    """length <= 2*trim would make the interior loss slice empty and train
    on NaNs (advisor r2) -> clear ValueError instead."""
    import jax.numpy as jnp

    from pqmf_tpu.ops import filterbank as fb
    from pqmf_tpu.parallel.training import (finetune_filterbank,
                                            make_finetune_loss)

    with pytest.raises(ValueError, match="interior"):
        finetune_filterbank(100, 16, steps=1, batch=1, length=1024)

    params = fb.build_filterbank(70, 8)
    n_taps = np.asarray(params["hk"]).shape[-1]
    loss = make_finetune_loss(8, n_taps)
    with pytest.raises(ValueError, match="2\\*trim"):
        loss(jnp.asarray(params["hk"]),
             jnp.zeros((1, 1, 2 * n_taps), jnp.float32))


def test_ta_single_band_is_passthrough_plus_shift():
    """n_band=1: the filterbank is an identity passthrough (reference
    pqmf.py:250-251), so the fused pitchshifter must NOT run the 1-band
    conv (advisor r2) — with shift 0 it is the identity."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    w = PQMFPitchShiftWrapperTA(70, 1, 512, shifts_in_semitones=[0])
    x = np.random.default_rng(0).standard_normal(
        (1, 1, 512)).astype(np.float32)
    y = np.asarray(w.pitchshifter(x))
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from pqmf_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        float(jnp.ones((8, 8)).sum())
    import os

    found = any(files for _, _, files in os.walk(tmp_path))
    assert found


def test_crossfade_rejects_blocks_shorter_than_overlap():
    """A block whose sub-band length can't cover the crossfade overlap
    used to skip the blend silently (stale tail, audible seams); it must
    fail loudly instead (r3 review finding). 1024 samples into the
    default 8192-geometry wrapper gives Tb=64 < overlap 128."""
    import numpy as np
    import pytest

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(100, 16, 8192)
    x = np.zeros((1, 1, 1024), np.float32)
    with pytest.raises(ValueError, match="crossfade overlap"):
        w.pitchshift_fn(w.init_state(), x)
    # the same length through a wrapper PLANNED for it is fine
    w2 = PQMFPitchShiftWrapper(100, 16, 1024)
    state, y = w2.pitchshift_fn(w2.init_state(), x)
    assert np.asarray(y).shape == (1, 1024)


def test_resample_override_unavailable_raises_clearly():
    """resample_override pins a lowering "regardless of the crossover
    logic", so a pin the geometry cannot honor must raise a clear
    ValueError at dispatch instead of crashing inside the trace
    (r5 review: 'chunked' with no pow-2 divisor hit a ZeroDivisionError,
    'dense' with no built constant hit np.asarray(None))."""
    import pytest

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(70, 4, 512, shifts_in_semitones=[1, -1, 2, -2])
    Tb = 512
    _, _, A = w._plan(Tb)

    w.resample_override = "bogus"
    with pytest.raises(ValueError, match="unknown resample_override"):
        w._resample_kind(Tb, A, 1)
    # Tb=512: largest pow-2 divisor 512 >= 128, so force the failure
    # with an odd whole-file length (divisor 1)
    w.resample_override = "chunked"
    with pytest.raises(ValueError, match="no\\s+power-of-two divisor"):
        w._resample_kind(81921, None, 1)
    w.resample_override = "dense"
    with pytest.raises(ValueError, match="no\\s+dense constant"):
        w._resample_kind(81921, None, 1)
    # 'onehot' at a whole-file geometry would trace an O(Tb * stretch)
    # multi-GB weight matrix per band — the byte guard must fire first
    w.resample_override = "onehot"
    with pytest.raises(ValueError, match="per-band weight"):
        w._resample_kind(81920, None, 1, total=3 * 81920)
    # a satisfiable pin still routes (with or without the total hint)
    assert w._resample_kind(Tb, A, 16) == "onehot"
    assert w._resample_kind(Tb, A, 16, total=4 * Tb) == "onehot"
    w.resample_override = None


def test_flagship_export_rejects_dense_override():
    """export_stablehlo on the flagship must refuse the dense resample
    lowering (r5 review): the export is B=1, where the auto crossover
    never picks dense, but resample_override='dense' would bake the
    prefolded multi-MB constant into the StableHLO blob — the same
    fail-loudly contract the TA branch already enforces."""
    import pytest

    from pqmf_tpu.export import export_stablehlo
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(70, 4, 512, shifts_in_semitones=[1, -1, 2, -2])
    w.resample_override = "dense"
    with pytest.raises(ValueError, match="dense"):
        export_stablehlo(w, 512)
    w.resample_override = None
    assert len(export_stablehlo(w, 512)) > 0

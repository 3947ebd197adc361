"""utils.metrics — the single source for the two round-trip SNR
definitions (whole-signal vs steady-state; VERDICT r4 weak #2)."""

import numpy as np
import pytest

from pqmf_tpu.utils.metrics import aligned_roundtrip_snr_db, snr_db


def test_snr_db_matches_direct_formula():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal(1000)
    got = ref + 0.01 * rng.standard_normal(1000)
    want = 10 * np.log10((ref ** 2).sum() / ((ref - got) ** 2).sum())
    assert abs(snr_db(ref, got) - want) < 1e-12


def test_snr_db_exact_equality_is_inf():
    x = np.arange(16.0)
    assert snr_db(x, x.copy()) == float("inf")


def test_aligned_whole_signal_definition():
    """delay alignment: y shifted by d against x, zero trim."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(500)
    d = 37
    y = np.concatenate([np.zeros(d), x]) + 0.001 * rng.standard_normal(537)
    got = aligned_roundtrip_snr_db(x, y, d)
    # the helper's convention (bench.py's original): a d-sample delay
    # also drops the last d input samples the output never covers
    want = snr_db(x[: 500 - d], y[d:500])
    assert abs(got - want) < 1e-12


def test_steady_state_trims_edges_after_alignment():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1000)
    y = np.concatenate([np.zeros(10), x])
    # corrupt only the edges: steady-state must be immune, whole must not
    y[10:30] += 1.0
    y[-20:] += 1.0
    whole = aligned_roundtrip_snr_db(x, y, 10)
    steady = aligned_roundtrip_snr_db(x, y, 10, edge_trim=32)
    assert steady == float("inf")
    assert whole < 30


def test_edge_trim_too_large_raises():
    with pytest.raises(ValueError, match="edge_trim"):
        aligned_roundtrip_snr_db(np.zeros(64), np.zeros(64), 0,
                                 edge_trim=32)


def test_training_snr_routes_through_metrics():
    """streaming_roundtrip_snr == the metrics helper applied to the same
    roundtrip (pin: the fine-tuned-bank numbers use THE steady-state
    definition, not a private copy of the math)."""
    import jax.numpy as jnp

    from pqmf_tpu.parallel.training import streaming_roundtrip_snr
    from pqmf_tpu.streaming import StreamingPQMF
    from pqmf_tpu.utils.audio import read_wav

    wav_path = "/root/reference/audio/flute.wav"
    got = streaming_roundtrip_snr(None, 100, 16, wav_path)

    x, _ = read_wav(wav_path)
    x = x[:1, : (x.shape[-1] // 16) * 16].astype(np.float32)
    sp = StreamingPQMF(100, 16)
    y = np.asarray(sp.roundtrip(jnp.asarray(x)[None]))
    want = aligned_roundtrip_snr_db(x[0], y[0, 0], sp.centered_delay,
                                    edge_trim=int(sp.params["hk"].shape[-1]))
    assert abs(got - want) < 1e-9


def test_length_mismatch_raises():
    """Round-trip paths are length-preserving; a shorter/longer output
    means the path dropped or grew samples — the metric must surface
    that, not truncate to the overlap and report a plausible SNR
    (r5 review: the inline code this replaced crashed on broadcast)."""
    with pytest.raises(ValueError, match="length mismatch"):
        aligned_roundtrip_snr_db(np.zeros(64), np.zeros(63), 0)

"""Export/artifact tests — the TorchScript-serialization analog
(reference PQMFWrapper.py:102-108, 1-PitchShifterWrapper.py:337-343)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pqmf_tpu.export import load_artifact, load_stablehlo, save_artifact
from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, PQMFWrapper

from oracles import SHIFTS16 as SHIFTS


def test_pqmf_wrapper_artifact_roundtrip(tmp_path):
    w = PQMFWrapper(100, 16, 8192)
    path = save_artifact(w, str(tmp_path / "pqmf"))
    loaded, manifest = load_artifact(path)

    assert manifest["kind"] == "PQMFWrapper"
    assert manifest["methods"] == ["forward", "inverse", "process"]
    assert manifest["attribute_values"]["m_buffer_size"] == 8192

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(w.forward(x)),
                                  np.asarray(loaded.forward(x)))


def test_old_artifact_without_buffer_limit_still_loads(tmp_path):
    """Pre-round-3 artifacts carry no max_buffer_size key: they declared
    no limit, so load_artifact must restore them with None — NOT the
    class default, which is smaller than this m_buffer_size and would
    make the previously working artifact raise at construction."""
    w = PQMFWrapper(100, 16, 32768, max_buffer_size=None)
    path = save_artifact(w, str(tmp_path / "old"))
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    del manifest["config"]["max_buffer_size"]  # simulate the old format
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    loaded, _ = load_artifact(path)
    assert loaded.max_buffer_size is None
    x = np.zeros((1, 32768), np.float32)
    assert np.asarray(loaded.forward(x)).shape == (1, 16, 2048)


def test_pvoc_artifact_roundtrip_with_state(tmp_path):
    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    y1 = w.pitchshift(x)  # advances internal crossfade state

    path = save_artifact(w, str(tmp_path / "pvoc"))
    loaded, manifest = load_artifact(path)

    assert manifest["config"]["shifts_in_semitones"] == SHIFTS
    assert manifest["state_spec"] == {"prev_tail": [16, 128]}
    # resumed state: next block matches exactly
    x2 = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    np.testing.assert_allclose(np.asarray(w.pitchshift(x2)),
                               np.asarray(loaded.pitchshift(x2)), atol=1e-6)


def test_artifact_weights_identical(tmp_path):
    """Loading must NOT re-run the design chain differently: weights are
    bit-identical."""
    w = PQMFPitchShiftWrapper(100, 8, 4096, 44100, [0] * 8)
    path = save_artifact(w, str(tmp_path / "a"))
    loaded, _ = load_artifact(path)
    np.testing.assert_array_equal(np.asarray(w.pqmf.params["hk"]),
                                  np.asarray(loaded.pqmf.params["hk"]))
    np.testing.assert_array_equal(np.asarray(w.pqmf.hkf),
                                  np.asarray(loaded.pqmf.hkf))


def test_stablehlo_export_roundtrip(tmp_path):
    """The AOT artifact is first-class: export -> deserialize -> outputs
    equal the live wrapper to 1e-6 (state tail bit-exact is expected too,
    it's the same program)."""
    w = PQMFPitchShiftWrapper(100, 8, 1024, 44100, [0, -12, -24, 0, -12,
                                                    -24, 0, -12])
    path = save_artifact(w, str(tmp_path / "hlo"), with_stablehlo=True)
    manifest = json.load(open(os.path.join(path, "manifest.json")))
    assert manifest["stablehlo"] == {"pitchshift": {"length": 1024}}
    fn = load_stablehlo(path)
    assert fn is not None
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1024)).astype(np.float32) * 0.3
    tail0 = jnp.zeros((8, w.band_overlap), jnp.float32)
    tail1, y = fn(tail0, jnp.asarray(x))
    state, y_ref = w.pitchshift_fn({"prev_tail": tail0}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tail1),
                               np.asarray(state["prev_tail"]), atol=1e-6)
    # a second block through the AOT program (carried tail) still matches
    x2 = rng.standard_normal((1, 1024)).astype(np.float32) * 0.3
    _, y2 = fn(tail1, jnp.asarray(x2))
    _, y2_ref = w.pitchshift_fn(state, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref),
                               atol=1e-6)


def test_stablehlo_failure_is_loud_and_writes_nothing(tmp_path):
    """A failing AOT export raises (no silent manifest downgrade) and,
    because the export runs before any file write, leaves no partially
    written artifact behind."""
    import pqmf_tpu.export as ex

    w = PQMFWrapper(100, 8, 1024)
    orig = ex.export_stablehlo
    ex.export_stablehlo = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("boom"))
    try:
        with pytest.raises(RuntimeError, match="StableHLO export"):
            save_artifact(w, str(tmp_path / "bad"), with_stablehlo=True)
    finally:
        ex.export_stablehlo = orig
    assert not os.path.exists(str(tmp_path / "bad"))


@pytest.mark.slow  # serializes + reloads every wrapper kind (~55 s)
def test_stablehlo_all_wrapper_kinds_roundtrip(tmp_path):
    """Every wrapper kind ships an AOT method (the TorchScript-archive
    analog): process (plain), pitchshifter (TA), pitchshift (flagship,
    covered above) — each reload equals the live wrapper."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 1, 1024)).astype(np.float32) * 0.3

    w = PQMFWrapper(100, 8, 1024)
    path = save_artifact(w, str(tmp_path / "pq"), with_stablehlo=True)
    fn = load_stablehlo(path)
    rec, sub = fn(jnp.asarray(x))
    rec_ref, sub_ref = w.pqmf.inverse(w.pqmf.forward(jnp.asarray(x))), \
        w.pqmf.forward(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(sub_ref),
                               atol=1e-6)

    wt = PQMFPitchShiftWrapperTA(100, 8, 1024, 44100,
                                 [0, -3, 5, 12, -7, 2, 1, -1])
    path2 = save_artifact(wt, str(tmp_path / "ta"), with_stablehlo=True)
    fn2 = load_stablehlo(path2)
    y = fn2(jnp.asarray(x))
    y_ref = wt.pitchshifter(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_output_changing_config_round_trips(tmp_path):
    """phase_rule and precision survive the artifact round trip (a wrapper
    exported with the accumulate rule must NOT reload with the reference
    rule and different audio)."""
    shifts = [0, -5, 7, -12, 3, 2, -3, 1]
    w_acc = PQMFPitchShiftWrapper(100, 8, 2048, 44100, shifts,
                                  phase_rule="accumulate")
    path = save_artifact(w_acc, str(tmp_path / "acc"))
    loaded, manifest = load_artifact(path)
    assert manifest["config"]["phase_rule"] == "accumulate"
    assert manifest["config"]["precision"] == "highest"
    assert loaded.phase_rule == "accumulate"
    assert loaded.pqmf.precision == "highest"

    x = np.random.default_rng(3).standard_normal(
        (1, 2048)).astype(np.float32) * 0.3
    _, y_acc = w_acc.pitchshift_fn(w_acc.init_state(), jnp.asarray(x))
    _, y_loaded = loaded.pitchshift_fn(loaded.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_loaded), np.asarray(y_acc),
                               atol=1e-6)
    # and the two phase rules genuinely produce different audio, so the
    # round-trip assertion above is not vacuous
    w_ref = PQMFPitchShiftWrapper(100, 8, 2048, 44100, shifts)
    _, y_ref = w_ref.pitchshift_fn(w_ref.init_state(), jnp.asarray(x))
    assert np.abs(np.asarray(y_ref) - np.asarray(y_acc)).max() > 1e-3


def test_max_buffer_size_survives_artifact_roundtrip(tmp_path):
    """The enforced host-buffer limit is behavior-changing config: a
    wrapper exported with max_buffer_size=None (offline use) must not
    reload with the default limit and start rejecting whole files —
    attribute_values silently drops None, so it must ride in config."""
    w = PQMFWrapper(100, 8, 1024, max_buffer_size=None)
    loaded, manifest = load_artifact(save_artifact(w, str(tmp_path / "a")))
    assert manifest["config"]["max_buffer_size"] is None
    assert loaded.max_buffer_size is None
    x = np.zeros((1, 1, 65536), np.float32)
    loaded.process(x)  # 65536 > the 16384 default: must NOT raise

    # an explicit custom limit round-trips too
    w2 = PQMFWrapper(100, 8, 1024, max_buffer_size=4096)
    loaded2, _ = load_artifact(save_artifact(w2, str(tmp_path / "b")))
    assert loaded2.max_buffer_size == 4096
    with pytest.raises(ValueError, match="max_buffer_size=4096"):
        loaded2.process(np.zeros((1, 1, 8192), np.float32))

    # old artifacts without the key declared no limit: restore None, not
    # the class default (which would reject whole files the artifact
    # used to process — and refuse to load at all when its
    # m_buffer_size exceeds the default; see
    # test_old_artifact_without_buffer_limit_still_loads)
    path = save_artifact(PQMFWrapper(100, 8, 1024), str(tmp_path / "c"))
    mpath = os.path.join(path, "manifest.json")
    manifest = json.load(open(mpath))
    del manifest["config"]["max_buffer_size"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    loaded3, _ = load_artifact(path)
    assert loaded3.max_buffer_size is None


def test_unknown_config_key_warns(tmp_path):
    w = PQMFWrapper(100, 8, 1024)
    path = save_artifact(w, str(tmp_path / "warn"))
    mpath = os.path.join(path, "manifest.json")
    manifest = json.load(open(mpath))
    manifest["config"]["frobnicate"] = 3
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.warns(UserWarning, match="frobnicate"):
        load_artifact(path)


def test_ta_wrapper_artifact_roundtrip(tmp_path):
    import numpy as np

    from pqmf_tpu.export import load_artifact, save_artifact
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    w = PQMFPitchShiftWrapperTA(70, 8, 512, 44100, list(range(8)))
    path = str(tmp_path / "ta")
    save_artifact(w, path)
    w2, manifest = load_artifact(path)
    assert manifest["kind"] == "PQMFPitchShiftWrapperTA"
    assert w2.shifts == w.shifts
    x = np.random.default_rng(0).standard_normal((1, 1, 8 * 64)).astype(
        np.float32)
    a = np.asarray(w.forward(x))
    b = np.asarray(w2.forward(x))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_reexport_without_stablehlo_removes_stale_blob(tmp_path):
    """Re-exporting into the same directory WITHOUT with_stablehlo must
    not leave the previous export's .jaxexport loadable: the stale
    program has the old wrapper's weights/config (review finding: it
    reloaded with a 0.063 output divergence and no error)."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    d = str(tmp_path / "art")
    w1 = PQMFPitchShiftWrapper(70, 8, 1024, 44100, [0, 2, 4, 5, 7, 9, 11, 12])
    save_artifact(w1, d, with_stablehlo=True)
    assert load_stablehlo(d) is not None

    w2 = PQMFPitchShiftWrapper(70, 8, 1024, 44100, [0] * 8)
    save_artifact(w2, d)  # no stablehlo this time
    assert load_stablehlo(d) is None
    assert not [f for f in os.listdir(d) if f.endswith(".jaxexport")]

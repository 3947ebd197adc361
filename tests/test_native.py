"""Native data-layer extension: build + equivalence vs the NumPy paths."""

import numpy as np
import pytest

from pqmf_tpu import native

nat = native.get()
pytestmark = pytest.mark.skipif(nat is None,
                                reason="no C compiler available")


def test_pcm16_roundtrip_matches_numpy():
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1.2, 1.2, 10000)).astype(np.float32)
    got = np.frombuffer(nat.f32_to_pcm16(x.tobytes()), dtype="<i2")
    ref = (np.clip(x, -1.0, 1.0) * 32767.0).round().astype("<i2")
    # lrintf vs numpy round can differ by 1 LSB at exact .5 boundaries
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    back = np.frombuffer(nat.pcm16_to_f32(got.tobytes()), dtype=np.float32)
    ref_back = got.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(back, ref_back)


def test_pcm24_decode_matches_numpy():
    rng = np.random.default_rng(1)
    vals = rng.integers(-(1 << 23), 1 << 23, 5000, dtype=np.int32)
    raw = bytearray()
    for v in vals:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    got = np.frombuffer(nat.pcm24_to_f32(bytes(raw)), dtype=np.float32)
    ref = vals.astype(np.float32) / float(1 << 23)
    np.testing.assert_allclose(got, ref, atol=0)


def test_ola_accumulate_matches_numpy():
    rng = np.random.default_rng(2)
    out = np.zeros(1000, np.float32)
    norm = np.zeros(1000, np.float32)
    out_ref = out.copy()
    norm_ref = norm.copy()
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(256) / 256)).astype(
        np.float32)
    for off in (0, 128, 256, 900, -32):  # incl. clipped edges
        blk = rng.standard_normal(256).astype(np.float32)
        nat.ola_accumulate(out, norm, blk.tobytes(), win.tobytes(), off)
        lo, hi = max(off, 0), min(off + 256, 1000)
        sl = slice(lo - off, hi - off)
        out_ref[lo:hi] += blk[sl] * win[sl]
        norm_ref[lo:hi] += win[sl] ** 2
    np.testing.assert_allclose(out, out_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(norm, norm_ref, rtol=1e-6, atol=1e-6)


def test_wav_io_uses_native(tmp_path):
    from pqmf_tpu.utils.audio import read_wav, write_wav

    rng = np.random.default_rng(3)
    x = (0.5 * rng.standard_normal((2, 4096))).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(str(p), x, 44100)
    y, sr = read_wav(str(p))
    assert sr == 44100 and y.shape == x.shape
    assert np.abs(y - np.clip(x, -1, 1)).max() < 2.0 / 32768.0

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


def _write_extensible_wav(path, payload, n_ch, sr, bits, sub_format,
                          block_align, byte_rate):
    """Minimal WAVE_FORMAT_EXTENSIBLE writer for the reader tests."""
    import struct

    guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    # wValidBitsPerSample, dwChannelMask, SubFormat GUID (code + tail)
    ext = (struct.pack("<HI", bits, 0) + struct.pack("<H", sub_format)
           + guid_tail)
    fmt = struct.pack("<HHIIHH", 0xFFFE, n_ch, sr, byte_rate, block_align,
                      bits) + struct.pack("<H", len(ext)) + ext
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks)


def test_extensible_wav_pcm32_not_decoded_as_float(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE must dispatch on the SubFormat GUID:
    extensible PCM32 decodes as integers, extensible FLOAT as IEEE."""
    from pqmf_tpu.utils.audio import read_wav

    rng = np.random.default_rng(4)
    x = np.clip(0.3 * rng.standard_normal(1024), -0.99, 0.99)

    pcm = np.round(x.astype(np.float64) * 2147483648.0).astype("<i4")
    p = tmp_path / "pcm32ext.wav"
    _write_extensible_wav(str(p), pcm.tobytes(), 1, 44100, 32,
                          sub_format=1, block_align=4, byte_rate=44100 * 4)
    y, sr = read_wav(str(p))
    assert sr == 44100
    np.testing.assert_allclose(
        y[0], pcm.astype(np.float64) / 2147483648.0, atol=1e-7)
    x = x.astype(np.float32)

    q = tmp_path / "floatext.wav"
    _write_extensible_wav(str(q), x.astype("<f4").tobytes(), 1, 48000, 32,
                          sub_format=3, block_align=4, byte_rate=48000 * 4)
    z, sr2 = read_wav(str(q))
    assert sr2 == 48000
    np.testing.assert_array_equal(z[0], x)

"""Parity against the reference's EXECUTABLE artifact.

Every other parity test in this suite compares against torch oracles
re-derived from the reference's source. These tests compare against the
single ground truth the reference ships: the exported TorchScript module
``PitchShifterPvoc/torchscript/pqmfpvoc.ts`` (loaded live via
``torch.jit.load``, reference 2-TestBlocks.py:74) and the committed
output wavs.

Round-4 findings these tests pin (both found BY this comparison):

1. The artifact's analysis conv pad is ``(256, 256)`` — the reference
   calls ``cc.get_padding(K)`` without the stride (pqmf.py:320), so the
   pad is computed as if stride were 1. The stride-aware ``(248, 249)``
   split modeled in rounds 1-3 was an 8-sample analysis-grid shift
   (~2 dB vs the artifact). Fixed in ``streaming.centered_padding``.
2. The reference's omega vector is computed float32-STEPWISE
   (VocoderPitchShifter.py:198); f64-then-cast omega differs by 1 ulp on
   ~1/3 bins, and the stretch's clamped boundary frames evaluate
   ``princarg(-omega)`` exactly at the ±pi wrap — those ulps flipped
   branches systematically (25-60 dB for shifts +6/+7/+9). Fixed in
   ``ops.phase_vocoder.phase_advance_reference``.

Committed-wav reproducibility (reference 2-TestBlocks.py:145-163):

- ``blocktest_recontructed.wav`` IS reproducible from the artifact
  (block=4096, overlap=2048, flute.wav, zeroed prev_tail): a rerun of
  the harness math through ``m.forward`` matches it at 51.4 dB, lag 0
  (not bit-exact — produced under a different torch build).
- ``blocktest_pitchshifter.wav`` has the SAME parameters (rerun RMS
  matches within 0.07%, magnitude spectrogram ~15 dB) but the waveform
  is NOT reproduced even by the reference binary itself in this torch
  build: the phase-vocoder's wrap decisions amplify FFT-implementation
  float differences. PARITY.md's earlier "unreproducible (unseeded
  RNG)" explanation was wrong — the shifts ARE serialized in the
  artifact (``m.shifts``); the irreproducibility is FFT-environment
  sensitivity of the pvoc phase path.
- ``nonblock_pitchshifter.wav`` cannot come from a fresh harness run at
  all (2-TestBlocks.py:137 calls the non-existent ``.pitchshifter`` —
  quirk SURVEY §2.5-2); its length equals the INPUT length (300321),
  consistent with an older harness that trimmed a working full-file
  call. A direct ``m.pitchshift(full)`` today returns 300336 samples.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

ARTIFACT = "/root/reference/PitchShifterPvoc/torchscript/pqmfpvoc.ts"
REF_AUDIO = "/root/reference/PitchShifterPvoc/audio"
FLUTE = "/root/reference/audio/flute.wav"


def _load_artifact():
    m = torch.jit.load(ARTIFACT)
    m.eval()
    return m


try:
    _ARTIFACT_OK = os.path.exists(ARTIFACT) and _load_artifact() is not None
except Exception:  # torch build can't deserialize the archive
    _ARTIFACT_OK = False

pytestmark = pytest.mark.skipif(
    not _ARTIFACT_OK, reason="reference pqmfpvoc.ts not loadable here")


# the scripted module print()s debug lines from _stft/_istft (reference
# quirk SURVEY §2.5-6) at the C level; silence fd 1 around calls
class _Quiet:
    def __enter__(self):
        self._null = os.open(os.devnull, os.O_WRONLY)
        self._saved = os.dup(1)
        os.dup2(self._null, 1)
        return self

    def __exit__(self, *exc):
        os.dup2(self._saved, 1)
        os.close(self._saved)
        os.close(self._null)
        return False


def _call(m, name, *args):
    with torch.no_grad(), _Quiet():
        return getattr(m, name)(*args).numpy()


def snr_db(ref, got):
    ref = np.asarray(ref, np.float64).squeeze()
    got = np.asarray(got, np.float64).squeeze()
    err = ref - got
    return 10 * np.log10(max((ref ** 2).sum(), 1e-300)
                         / max((err ** 2).sum(), 1e-300))


@pytest.fixture(scope="module")
def artifact():
    return _load_artifact()


@pytest.fixture(scope="module")
def flute():
    from pqmf_tpu.utils.audio import read_wav

    x, sr = read_wav(FLUTE)
    assert sr == 44100
    return np.asarray(x[:1], np.float32)


@pytest.fixture(scope="module")
def wrapper(artifact):
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    return PQMFPitchShiftWrapper(100, 16, 8192, 44100,
                                 list(artifact.shifts))


# ---------------------------------------------------------------------------
# baked geometry / weights
# ---------------------------------------------------------------------------


def test_artifact_conv_pads_are_stride_unaware(artifact):
    """The ground truth for centered_padding(): the export bakes the
    pads cc.get_padding computed WITHOUT the stride argument."""
    from pqmf_tpu.streaming import centered_padding

    assert tuple(artifact.pqmf.forward_conv._pad) == (256, 256)
    assert tuple(artifact.pqmf.inverse_conv._pad) == (16, 16)
    assert centered_padding(513) == (256, 256)
    assert centered_padding(33) == (16, 16)


def test_designed_bank_matches_artifact(artifact, wrapper):
    """Our filter design reproduces the artifact's baked bank: hk
    (pow-2-padded, 16x512) and both conv weights."""
    hk_ref = artifact.pqmf.hk.numpy()
    hkf_ref = artifact.pqmf.forward_conv.weight.detach().numpy()
    hki_ref = artifact.pqmf.inverse_conv.weight.detach().numpy()

    sp = wrapper.pqmf
    np.testing.assert_allclose(np.asarray(sp.params["hk"]), hk_ref,
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sp.hkf), hkf_ref,
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sp.hki), hki_ref,
                               rtol=0, atol=2e-6)


def test_crossfade_buffers_match_artifact(artifact, wrapper):
    """prev_tail geometry and the (swapped-name) hann fade split
    (1-PitchShifterWrapper.py:172-180)."""
    assert tuple(artifact.prev_tail.shape) == (16, 128)
    np.testing.assert_allclose(np.asarray(wrapper._fade_out),
                               artifact.fade_out.numpy()[0], atol=5e-7)
    np.testing.assert_allclose(np.asarray(wrapper._fade_in),
                               artifact.fade_in.numpy()[0], atol=5e-7)


def test_artifact_roundtrip_group_delay_is_16(artifact):
    """The artifact's forward (decompose+inverse) delays an impulse by
    exactly 16 samples — the value centered_delay must report."""
    from pqmf_tpu.streaming import StreamingPQMF

    x = torch.zeros(1, 8192)
    x[0, 3000] = 1.0
    y = _call(artifact, "forward", x)
    assert int(np.argmax(np.abs(y[0]))) == 3016
    assert StreamingPQMF(100, 16).centered_delay == 16


# ---------------------------------------------------------------------------
# stage + end-to-end numerical parity vs the live module
# ---------------------------------------------------------------------------


def test_decompose_matches_artifact(artifact, wrapper, flute):
    blk = flute[:, 20000:28192]
    ref = _call(artifact, "decompose", torch.from_numpy(blk))
    ours = np.asarray(wrapper.decompose(jnp.asarray(blk)))
    assert snr_db(ref, ours) > 110


def test_inverse_matches_artifact(artifact, wrapper, flute):
    blk = flute[:, 20000:28192]
    sub = _call(artifact, "decompose", torch.from_numpy(blk))
    ref = _call(artifact, "inverse", torch.from_numpy(sub))
    ours = np.asarray(wrapper.pqmf.inverse(jnp.asarray(sub)))
    assert snr_db(ref, ours) > 110


def test_forward_matches_artifact(artifact, wrapper, flute):
    blk = flute[:, 20000:28192]
    ref = _call(artifact, "forward", torch.from_numpy(blk))
    ours = np.asarray(wrapper.forward(jnp.asarray(blk)))
    assert snr_db(ref, ours) > 110


def test_pitchshift_two_blocks_stateful(artifact, wrapper, flute):
    """The flagship method, stateful across consecutive blocks, with the
    artifact's own baked random shifts (including the extreme -21/+9
    semitone cases whose stretch reads the clamped boundary frame)."""
    blk1 = flute[:, 20000:28192]
    blk2 = flute[:, 28192:36384]
    artifact.prev_tail.zero_()
    ref1 = _call(artifact, "pitchshift", torch.from_numpy(blk1))
    ref2 = _call(artifact, "pitchshift", torch.from_numpy(blk2))

    state = wrapper.init_state()
    state, ours1 = wrapper.pitchshift_fn(state, jnp.asarray(blk1))
    state, ours2 = wrapper.pitchshift_fn(state, jnp.asarray(blk2))
    s1 = snr_db(ref1, np.asarray(ours1))
    s2 = snr_db(ref2, np.asarray(ours2))
    assert s1 > 90, f"block 1 parity {s1:.1f} dB"
    assert s2 > 90, f"block 2 parity {s2:.1f} dB"


# ---------------------------------------------------------------------------
# committed wavs (reference 2-TestBlocks.py harness outputs)
# ---------------------------------------------------------------------------

_N_BLOCKS = 26        # prefix of the 146-block full run (exact prefix:
_BLOCK, _OV = 4096, 2048   # each OLA output sample only depends on
                           # earlier blocks)


def _harness_prefix(process, flute):
    """First _N_BLOCKS steps of the reference harness OLA
    (2-TestBlocks.py:83-127): hann window in, hann window out,
    normalize by the accumulated squared window."""
    hop = _BLOCK - _OV
    total = (_N_BLOCKS - 1) * hop + _BLOCK
    wav = flute[0, :total]
    window = np.hanning(_BLOCK + 1)[:_BLOCK].astype(np.float32)
    # torch.hann_window(N) == hanning(N+1)[:N]
    out = np.zeros(total, np.float64)
    norm = np.zeros(total, np.float64)
    for f in range(_N_BLOCKS):
        i = f * hop
        blk = (wav[i:i + _BLOCK] * window).astype(np.float32)
        o = process(blk[None, :])
        out[i:i + _BLOCK] += o.squeeze() * window
        norm[i:i + _BLOCK] += window * window
    # interior region where every contributing block has been processed
    valid = slice(_BLOCK, (_N_BLOCKS - 2) * hop)
    return (out / (norm + 1e-8))[valid].astype(np.float32), valid


def test_committed_recon_wav_reproducible_from_artifact(artifact, flute):
    """blocktest_recontructed.wav rerun through the live artifact:
    reproducible (full-file rerun measures 51.4 dB at lag 0)."""
    from pqmf_tpu.utils.audio import read_wav

    ref, _ = read_wav(os.path.join(REF_AUDIO, "blocktest_recontructed.wav"))
    got, valid = _harness_prefix(
        lambda b: _call(artifact, "forward", torch.from_numpy(b)), flute)
    assert snr_db(ref[0][valid], got) > 45


def test_committed_recon_wav_matches_our_wrapper(wrapper, flute):
    """And OUR forward, dropped into the same harness math, matches the
    committed reference wav equally well — drop-in replacement."""
    from pqmf_tpu.utils.audio import read_wav

    ref, _ = read_wav(os.path.join(REF_AUDIO, "blocktest_recontructed.wav"))

    def process(b):
        return np.asarray(wrapper.forward(jnp.asarray(b)))

    got, valid = _harness_prefix(process, flute)
    assert snr_db(ref[0][valid], got) > 45


def test_committed_pitchshifter_wav_parameters_confirmed(artifact, flute):
    """blocktest_pitchshifter.wav: same parameters (RMS within 1%,
    magnitude spectrogram correlates), but the committed WAVEFORM is not
    reproduced even by the reference binary itself in this torch build —
    the pvoc wrap decisions are FFT-implementation-sensitive (full-file
    rerun: RMS delta 0.07%, magspec 15.3 dB, waveform < 0 dB). This test
    pins the positive part and documents the negative."""
    from pqmf_tpu.utils.audio import read_wav

    ref, _ = read_wav(os.path.join(REF_AUDIO, "blocktest_pitchshifter.wav"))
    artifact.prev_tail.zero_()
    got, valid = _harness_prefix(
        lambda b: _call(artifact, "pitchshift", torch.from_numpy(b)), flute)
    r = ref[0][valid]
    rms_ref = float(np.sqrt((r.astype(np.float64) ** 2).mean()))
    rms_got = float(np.sqrt((got.astype(np.float64) ** 2).mean()))
    assert abs(rms_ref - rms_got) / rms_ref < 0.05

    # phase-insensitive spectral comparison on the shared prefix
    nfft = 2048
    n = (len(r) // nfft) * nfft
    A = np.abs(np.fft.rfft(r[:n].reshape(-1, nfft), axis=-1))
    B = np.abs(np.fft.rfft(got[:n].reshape(-1, nfft), axis=-1))
    mag_snr = 10 * np.log10((A ** 2).sum() / ((A - B) ** 2).sum())
    assert mag_snr > 8, f"magspec {mag_snr:.1f} dB"


def test_nonblock_wav_is_legacy_output(artifact, flute):
    """nonblock_pitchshifter.wav's length equals the INPUT length, which
    today's harness cannot produce (quirk §2.5-2: the call it would come
    from always raises); a direct full-file pitchshift returns the
    subband-grid length instead. Documents the provenance finding."""
    from pqmf_tpu.utils.audio import read_wav

    nb, _ = read_wav(os.path.join(REF_AUDIO, "nonblock_pitchshifter.wav"))
    T = flute.shape[-1]
    assert nb.shape[-1] == T == 300321
    # the artifact's own full-file output length: ceil over the 16-band
    # grid of the (256,256)-padded strided conv
    frames = (T + 512 - 513) // 16 + 1
    assert frames * 16 == 300336

"""L2 streaming tests: block-wise == offline-causal, the property the
reference gets from cached_conv (pqmf.py:306-354)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pqmf_tpu.streaming import (
    StreamingPQMF,
    centered_padding,
    conv_state_init,
    offline_conv,
    scan_blocks,
    streaming_conv,
)

from oracles import best_aligned_snr, snr_db


def test_centered_padding_matches_reference_geometry():
    # The reference builds both cached convs with cc.get_padding(K) and
    # never passes the stride (pqmf.py:316-333), so the strided analysis
    # conv is padded as if stride were 1: the exported pqmfpvoc.ts
    # artifact bakes forward_conv._pad == (256, 256) and
    # inverse_conv._pad == (16, 16) (verified live in
    # test_reference_artifact.py).
    assert centered_padding(513) == (256, 256)
    assert centered_padding(33) == (16, 16)


@pytest.mark.parametrize("kernel,stride", [(513, 16), (33, 1), (7, 2)])
def test_streaming_conv_equals_causal_offline(kernel, stride):
    rng = np.random.default_rng(0)
    Cin, Cout = 3, 5
    T = 64 * stride
    x = rng.standard_normal((2, Cin, 4 * T)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin, kernel)).astype(np.float32) * 0.1

    want = np.asarray(offline_conv(jnp.asarray(x), jnp.asarray(w),
                                   stride=stride, causal=True))

    state = conv_state_init(2, Cin, kernel, stride)
    outs = []
    for i in range(4):
        state, y = streaming_conv(state, jnp.asarray(x[..., i * T:(i + 1) * T]),
                                  jnp.asarray(w), stride=stride)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_streaming_conv_any_block_partition():
    rng = np.random.default_rng(1)
    kernel, stride = 33, 1
    x = rng.standard_normal((1, 4, 1024)).astype(np.float32)
    w = rng.standard_normal((4, 4, kernel)).astype(np.float32) * 0.2
    want = np.asarray(offline_conv(jnp.asarray(x), jnp.asarray(w),
                                   stride=1, causal=True))
    # uneven partition
    cuts = [0, 100, 101, 357, 800, 1024]
    state = conv_state_init(1, 4, kernel, stride)
    outs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        state, y = streaming_conv(state, jnp.asarray(x[..., a:b]),
                                  jnp.asarray(w), stride=1)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, -1), want,
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def spq():
    return StreamingPQMF(100, 16)


def test_streaming_roundtrip_equals_causal_offline(spq):
    rng = np.random.default_rng(2)
    T = 8192 * 2
    x = rng.standard_normal((1, 1, T)).astype(np.float32) * 0.3

    bands_ref = spq.forward_causal(x)
    y_ref = np.asarray(spq.inverse_causal(bands_ref))

    state = spq.init_state(batch=1)
    blocks = []
    B = 2048
    for i in range(T // B):
        state, y = spq.process_block(state, x[..., i * B:(i + 1) * B])
        blocks.append(np.asarray(y))
    got = np.concatenate(blocks, -1)
    assert got.shape == y_ref.shape
    np.testing.assert_allclose(got, y_ref, rtol=1e-4, atol=1e-5)


def test_streaming_roundtrip_reconstructs_signal(spq):
    """End-to-end quality: streamed round-trip is the input delayed by
    ``latency_samples`` (+ the offline path's own group delay)."""
    rng = np.random.default_rng(3)
    T = 8192 * 3
    x = rng.standard_normal(T).astype(np.float32) * 0.3

    state = spq.init_state(batch=1)
    out = []
    B = 4096
    for i in range(T // B):
        state, y = spq.process_block(state, x[None, None, i * B:(i + 1) * B])
        out.append(np.asarray(y)[0, 0])
    y = np.concatenate(out)

    s, lag = best_aligned_snr(x, y, max_lag=1024)
    assert s > 25, f"streamed roundtrip SNR {s} dB at lag {lag}"
    # interior quality
    if lag >= 0:
        a, b = x[lag:], y[: len(x) - lag]
    else:
        a, b = x[: len(x) + lag], y[-lag:]
    cut = 2048
    assert snr_db(a[cut:-cut], b[cut:-cut]) > 55


def test_offline_centered_roundtrip_snr(spq):
    """The exported-artifact mode (centered, non-cached)."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.3
    y = np.asarray(spq.inverse(spq.forward(x)))
    assert y.shape == x.shape
    s, lag = best_aligned_snr(x.ravel(), y.ravel(), max_lag=64)
    assert s > 25, f"centered roundtrip SNR {s} dB at lag {lag}"


def test_scan_blocks_matches_python_loop(spq):
    rng = np.random.default_rng(5)
    n_blocks, B = 6, 2048
    x = rng.standard_normal((n_blocks, 1, 1, B)).astype(np.float32)

    state = spq.init_state(batch=1)
    _, ys = scan_blocks(lambda s, b: spq.process_block(s, b), state,
                        jnp.asarray(x))
    ys = np.asarray(ys)  # [n_blocks, 1, 1, B]

    state = spq.init_state(batch=1)
    for i in range(n_blocks):
        state, y = spq.process_block(state, jnp.asarray(x[i]))
        np.testing.assert_allclose(np.asarray(y), ys[i], rtol=1e-5, atol=1e-6)


def test_latency_metadata(spq):
    # causal analysis left pad 497 vs centered 256 -> 241 extra; causal
    # synthesis 32 vs 16 -> 16 band steps = 256 samples; the centered
    # round-trip's own group delay is 16 (the reference artifact's
    # measured impulse delay); streamed total = 241 + 256 + 16 = 513
    # (unchanged from the causal path's physical delay).
    assert spq.stream_vs_centered_delay == 241 + 16 * 16
    assert spq.centered_delay == 16
    assert spq.latency_samples == 513


def test_latency_matches_measurement(spq):
    """The advertised latency must actually align the streamed round-trip."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(8192 * 2).astype(np.float32) * 0.3
    state = spq.init_state(1)
    out = []
    for i in range(4):
        state, y = spq.process_block(state, x[None, None, i * 4096:(i + 1) * 4096])
        out.append(np.asarray(y)[0, 0])
    y = np.concatenate(out)
    d = spq.latency_samples
    a, b = x[: len(x) - d], y[d:]
    cut = 2048
    assert snr_db(a[cut:-cut], b[cut:-cut]) > 55


def test_streaming_equals_causal_for_random_partitions():
    """Property: any random block partition whose per-block SUB-BAND
    length is even reproduces the causal offline output (the cached_conv
    guarantee, pqmf.py:306-354).

    The even-length constraint is inherent to the design (ours AND the
    reference's): ``reverse_half`` negates alternating output samples with
    block-local indexing, so an odd-length block flips the parity of every
    later block relative to the offline mask. Real-time hosts use
    fixed power-of-two buffers, where this never triggers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import jax.numpy as jnp

    from pqmf_tpu.streaming import StreamingPQMF

    sp = StreamingPQMF(80, 8)
    rng = np.random.default_rng(21)
    T = 8 * 96
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32))
    want = np.asarray(sp.forward_causal(x))

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=6),
                    min_size=1, max_size=8))
    def run(chunks):
        # scale chunks (in units of 2*M: per-block sub-band length stays
        # even, see docstring) to cover T exactly
        M = 8
        sizes = [c * 2 * M for c in chunks]
        total = sum(sizes)
        if total > T:
            return
        sizes.append(T - total)
        sizes = [s for s in sizes if s > 0]
        state = sp.init_state()
        outs = []
        off = 0
        for s in sizes:
            state, y = sp.forward_block(state, x[..., off:off + s])
            outs.append(np.asarray(y))
            off += s
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    run()


def test_stereo_streaming_matches_offline():
    """n_channels=2: stereo flutemulti.wav streams block-wise equal to the
    causal offline output, each channel independently correct (exceeds
    the reference's mono-only CachedPQMF, pqmf.py:292-305)."""
    from pqmf_tpu.utils.audio import read_wav

    x, sr = read_wav("/root/reference/audio/flutemulti.wav")
    assert x.shape[0] == 2
    T = 4 * 4096
    x = x[:, 44100: 44100 + T][None]  # [1, 2, T]

    sp = StreamingPQMF(100, 16, n_channels=2)
    want_bands = np.asarray(sp.forward_causal(x))  # [1, 2*16, T/16]
    want = np.asarray(sp.inverse_causal(want_bands))  # [1, 2, T]

    state = sp.init_state()
    outs = []
    for off in range(0, T, 4096):
        state, bands = sp.forward_block(state, x[..., off:off + 4096])
        state, y = sp.inverse_block(state, bands)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    # channels are independent: mono pass over channel 0 equals its row
    mono = StreamingPQMF(100, 16)
    want_mono = np.asarray(mono.forward_causal(x[:, :1]))
    np.testing.assert_allclose(want_bands[:, :16], want_mono,
                               atol=1e-6, rtol=1e-6)

    # the round trip itself reconstructs (delay-compensated; streamed
    # output lags by sp.latency_samples)

    snr, lag = best_aligned_snr(x[0, 0], got[0, 0],
                                max_lag=sp.latency_samples + 64)
    assert snr > 45, (snr, lag)


def test_channel_count_mismatch_raises():
    sp = StreamingPQMF(100, 8, n_channels=2)
    with pytest.raises(ValueError):
        sp.forward(np.zeros((1, 3, 512), np.float32))
    with pytest.raises(ValueError):
        sp.inverse(np.zeros((1, 8, 32), np.float32))  # needs 2*8 rows

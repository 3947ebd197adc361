"""L3b pipeline tests: the fused per-band pitch-shift program vs a torch
oracle composing the reference's op chain (CachedPQMF centered convs +
per-band pvoc + crossfade), plus protocol/registry checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pqmf_tpu.pipelines import (
    PQMFPitchShiftWrapper,
    PQMFPitchShiftWrapperTA,
    PQMFWrapper,
    derive_stft_geometry,
)

from oracles import snr_db
from test_shifters import torch_pvoc_pitchshift

# stable shift set (avoids the +12/+7 wrap-chaotic parity cases analyzed in
# test_shifters; the pipeline itself handles any shifts)
from oracles import SHIFTS16 as SHIFTS


def torch_cached_analysis(x, hk):
    """CachedPQMF.forward oracle (pqmf.py:339-343): centered strided conv
    + reverse_half. The pad is ``(K//2, K//2)`` — the reference calls
    ``cc.get_padding(K)`` WITHOUT the stride (pqmf.py:320), so the pad
    is computed as if stride were 1; verified bit-exact against the
    exported artifact's baked ``forward_conv._pad == (256, 256)`` in
    test_reference_artifact.py."""
    hkf = torch.from_numpy(np.array(hk, np.float32))
    if hkf.shape[-1] % 2 == 0:
        hkf = F.pad(hkf, (0, 1))
    hkf = hkf.unsqueeze(1)  # [M, 1, K]
    M, _, K = hkf.shape
    xt = F.pad(torch.from_numpy(np.array(x, np.float32)),
               (K // 2, K // 2))
    y = F.conv1d(xt, hkf, stride=M)
    mask = torch.ones_like(y)
    mask[..., 1::2, ::2] = -1
    return (y * mask).numpy()


def torch_cached_synthesis(x, hk):
    """CachedPQMF.inverse oracle (pqmf.py:345-354)."""
    hkt = torch.from_numpy(np.array(hk, np.float32))
    M = hkt.shape[0]
    hki = hkt.flip(-1).reshape(M, -1, M).permute(2, 0, 1)  # m c t
    if hki.shape[-1] % 2 == 0:
        hki = F.pad(hki, (0, 1))
    K = hki.shape[-1]
    total = K - 1
    xt = torch.from_numpy(np.array(x, np.float32))
    mask = torch.ones_like(xt)
    mask[..., 1::2, ::2] = -1
    xt = xt * mask
    xt = F.pad(xt, (total // 2, total - total // 2))
    y = F.conv1d(xt, hki) * M
    y = y.flip(1)
    y = y.permute(0, 2, 1)
    y = y.reshape(y.shape[0], y.shape[1], -1, M).permute(0, 2, 1, 3)
    return y.reshape(y.shape[0], y.shape[1], -1).numpy()


def torch_flagship_pitchshift(x, hk, shifts, m_buffer_size, prev_tail,
                              canonical_zero_phase=False,
                              phase_rule="reference"):
    """Full reference pitchshift oracle (1-PitchShifterWrapper.py:222-301)
    composed from the documented op chain. Returns (y, new_tail).
    phase_rule="accumulate" swaps in the wrapper's opt-in running-phase
    rule (otherwise the identical chain)."""
    n_band = hk.shape[0]
    win, hop, n_fft, L = derive_stft_geometry(m_buffer_size, n_band)
    sub = torch_cached_analysis(x, hk)  # [B, M, Tb]
    B, M, Tb = sub.shape
    fade = torch.hann_window(2 * L).numpy()
    fade_out, fade_in = fade[:L], fade[L:]
    new_tail = prev_tail.copy()
    bands = []
    for i in range(M):
        shifted = torch_pvoc_pitchshift(
            sub[:, i, :], int(round(float(shifts[i]))), n_fft, hop, win,
            canonical_zero_phase=canonical_zero_phase,
            phase_rule=phase_rule)  # [B, Tb]
        if L > 0 and B == 1 and shifted.shape[-1] >= L:
            suffix = shifted[0, -L:].copy()
            blended = prev_tail[i] * fade_out + shifted[0, :L] * fade_in
            shifted = shifted.copy()
            shifted[0, :L] = blended
            new_tail[i] = suffix
        bands.append(shifted[:, None, :])
    cat = np.concatenate(bands, axis=1)
    y = torch_cached_synthesis(cat, hk)
    return y[:, 0, :], new_tail


@pytest.fixture(scope="module")
def wrapper():
    return PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)


def test_derived_geometry_matches_reference_defaults():
    # BASELINE.md: buffer 8192, M=16 -> win 512, hop 128, n_fft 512, ovl 128
    assert derive_stft_geometry(8192, 16) == (512, 128, 512, 128)
    assert derive_stft_geometry(512, 16) == (32, 8, 32, 8)


def test_registry_protocol(wrapper):
    assert wrapper.get_methods() == ["forward", "pitchshift"]
    attrs = wrapper.attribute_dict()
    assert attrs["m_buffer_size"] == 8192
    assert attrs["max_buffer_size"] == 16384
    assert attrs["pitchshift_in_ch"] == 1


def test_forward_roundtrip(wrapper):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    y = np.asarray(wrapper.forward(x))
    assert y.shape == (1, 8192)
    hk = np.asarray(wrapper.pqmf.params["hk"])
    want = torch_cached_synthesis(
        torch_cached_analysis(x[None], hk), hk)[:, 0, :]
    assert snr_db(want, y) > 90


def test_fused_pitchshift_matches_reference_chain(wrapper):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    hk = np.asarray(wrapper.pqmf.params["hk"])
    prev = np.zeros((16, wrapper.band_overlap), np.float32)

    state = wrapper.init_state()
    state, got = wrapper.pitchshift_fn(state, x)
    want, want_tail = torch_flagship_pitchshift(x[None], hk, SHIFTS, 8192,
                                                prev)
    got = np.asarray(got)
    assert got.shape == want.shape
    s = snr_db(want, got)
    assert s > 90, f"fused pitchshift parity SNR {s} dB"
    s_tail = snr_db(want_tail, np.asarray(state["prev_tail"]))
    assert s_tail > 90, f"tail state parity SNR {s_tail} dB"


def test_fused_pitchshift_crossfade_across_blocks(wrapper):
    """Second block must blend against the first block's stored tail."""
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    x2 = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    hk = np.asarray(wrapper.pqmf.params["hk"])

    state = wrapper.init_state()
    state, y1 = wrapper.pitchshift_fn(state, x1)
    state, y2 = wrapper.pitchshift_fn(state, x2)

    prev = np.zeros((16, wrapper.band_overlap), np.float32)
    w1, tail1 = torch_flagship_pitchshift(x1[None], hk, SHIFTS, 8192, prev)
    w2, tail2 = torch_flagship_pitchshift(x2[None], hk, SHIFTS, 8192, tail1)
    assert snr_db(w2, np.asarray(y2)) > 90


def test_pitchshift_variable_block_size(wrapper):
    """Blocks shorter than m_buffer_size (the block harness feeds 4096-
    sample windows into the 8192-built wrapper) must re-plan frame counts
    per call length and still match the reference chain."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3

    # strict parity needs wrap-stable shifts: for n in {0, -12, -24} the
    # interpolation weight a is always 0, so the chaotic dp term vanishes.
    # (At Tb=256 the right-zero-padded band STFTs are full of near-zero
    # bins with numerically arbitrary atan2 phases; fractional-a shifts
    # amplify those unstably in ANY float implementation, the reference
    # included.)
    stable = [0, -12, -24, 0, -12, -24, 0, -12,
              -24, 0, -12, -24, 0, -12, -24, 0]
    w2 = PQMFPitchShiftWrapper(100, 16, 8192, 44100, stable)
    hk = np.asarray(w2.pqmf.params["hk"])
    prev = np.zeros((16, w2.band_overlap), np.float32)
    state = w2.init_state()
    state, got = w2.pitchshift_fn(state, x)
    assert np.asarray(got).shape == (1, 4096)
    # the oracle derives STFT geometry from the construction buffer (8192)
    # but processes the actual 4096 block, exactly like the reference
    want, _ = torch_flagship_pitchshift(x[None], hk, stable, 8192, prev)
    assert snr_db(want, np.asarray(got)) > 85

    # mixed (fractional-a) shifts on a short block. The raw-oracle gap
    # here is NOT fp chaos: it is torch's FFT emitting signed zeros for
    # the exactly-zero pad-to-n_fft frames, whose atan2 phases form an
    # arbitrary {0, pi} twiddle pattern that the reference's
    # phi0 + a*princarg(...) rule mixes into real neighboring bins.
    # Strict parity is asserted against the oracle with those phases
    # canonicalized to our convention (0); the raw-oracle comparison then
    # bounds the size of the convention difference itself.
    state = wrapper.init_state()
    state, got = wrapper.pitchshift_fn(state, x)
    hk = np.asarray(wrapper.pqmf.params["hk"])
    prev = np.zeros((16, wrapper.band_overlap), np.float32)
    want_canon, _ = torch_flagship_pitchshift(x[None], hk, SHIFTS, 8192,
                                              prev,
                                              canonical_zero_phase=True)
    ours = snr_db(want_canon, np.asarray(got))
    assert ours > 90, f"canonical-oracle parity only {ours:.1f} dB"
    want_raw, _ = torch_flagship_pitchshift(x[None], hk, SHIFTS, 8192, prev)
    raw = snr_db(want_raw, np.asarray(got))
    assert raw > 30, (
        f"zero-frame phase-convention divergence grew: {raw:.1f} dB")


def test_pitchshift_batch_gt1_skips_crossfade(wrapper):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 1, 8192)).astype(np.float32) * 0.3
    state = wrapper.init_state()
    state2, y = wrapper.pitchshift_fn(state, x)
    assert np.asarray(y).shape == (3, 8192)
    # state untouched for batch > 1 (reference guard :262)
    np.testing.assert_array_equal(np.asarray(state2["prev_tail"]),
                                  np.asarray(state["prev_tail"]))


def test_stateful_facade_matches_pure_api():
    w1 = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)
    w2 = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)
    rng = np.random.default_rng(4)
    xs = [rng.standard_normal((1, 8192)).astype(np.float32) for _ in range(2)]
    state = w1.init_state()
    for x in xs:
        state, y_pure = w1.pitchshift_fn(state, x)
        y_facade = w2.pitchshift(x)
        np.testing.assert_allclose(np.asarray(y_pure), np.asarray(y_facade),
                                   atol=1e-6)


def test_pqmf_wrapper_process_order():
    """process returns (reconstructed, subbands) — the reference's actual
    behavior (PQMFWrapper.py:92), not its docstring."""
    w = PQMFWrapper(100, 16, 8192)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    recon, sub = w.process(x)
    assert recon.shape == (1, 1, 8192)
    assert sub.shape == (1, 16, 512)
    assert w.get_methods() == ["forward", "inverse", "process"]


def test_pqmf_wrapper_input_validation():
    w = PQMFWrapper(100, 16, 512)
    with pytest.raises(ValueError):
        w.forward(np.zeros((1, 2, 512), np.float32))
    with pytest.raises(ValueError):
        w.inverse(np.zeros((1, 8, 32), np.float32))


def test_ta_wrapper_identity_shifts_reconstruct():
    """All-zero shifts: TA pitchshifter reduces to a round-trip."""
    w = PQMFPitchShiftWrapperTA(100, 8, 1024, 44100, [0] * 8)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 1024)).astype(np.float32) * 0.3
    y = np.asarray(w.pitchshifter(x))
    want = np.asarray(w.inverse(w.forward(x)))
    np.testing.assert_allclose(y, want, atol=1e-5)
    assert w.sub_band_sample_rate == round(44100 / 8)


def test_ta_wrapper_runs_with_chromatic_default():
    w = PQMFPitchShiftWrapperTA(100, 4, 2048, 44100)
    assert w.shifts == [0, 1, 2, 3]
    x = np.random.default_rng(7).standard_normal((1, 2048)).astype(np.float32)
    y = np.asarray(w.pitchshifter(x))
    assert y.shape == (1, 1, 2048)
    assert np.isfinite(y).all()


@pytest.mark.parametrize("n_band,buf,shifts", [
    (16, 8192, None),  # the reference export config, chromatic defaults
    (8, 2048, [0, -3, 5, 12, -7, 2, 1, -1]),
    (16, 8192, [3.2, -48.5, 12.3, 0, 7, -24, 1, 2,
                3, 4, 5, 6, -6, -12, 9, -30]),  # PQMFPsWrapper.py:157 range
    # high band count: Tb=256 per band. Moderate cyclic shifts, NOT the
    # chromatic default: range(64) semitones means rates up to 2^(63/12)
    # ~ 38x, where the 689 Hz per-band resample plans degenerate (a
    # 26681x689 dense sinc fold at compile time) — a config torchaudio
    # itself would never be used with.
    (64, 16384, [0.0, -3.0, 5.0, 12.0] * 16),
])
def test_ta_fused_matches_per_band_loop(n_band, buf, shifts):
    """The fused one-dispatch TA pipeline equals the literal per-band loop
    (the reference's structure, PQMFPsWrapper.py:126-144) to >90 dB."""
    w = PQMFPitchShiftWrapperTA(100, n_band, buf,
                                shifts_in_semitones=shifts,
                                max_buffer_size=None)
    x = np.random.default_rng(11).standard_normal(
        (2, 1, buf)).astype(np.float32) * 0.3
    y_loop = np.asarray(w.pitchshifter_loop(x))
    y_fused = np.asarray(w.pitchshifter(x))
    err = ((y_fused - y_loop) ** 2).sum()
    snr = 10 * np.log10(max((y_loop ** 2).sum(), 1e-30) / max(err, 1e-30))
    assert snr > 90, f"fused-vs-loop parity only {snr:.1f} dB"


@pytest.mark.slow  # whole-file TA compile ~80 s; full lane only
def test_ta_fused_whole_file_uses_linear_memory_path():
    """Whole-file inputs (the reference main's use, PQMFPsWrapper.py:177)
    exceed the one-hot resample's O(Tb^2) memory; pitchshifter must route
    them through the gather form and still match the per-band loop."""
    w = PQMFPitchShiftWrapperTA(100, 16, 8192,
                                shifts_in_semitones=[0, -3, 5, 12, -7, 2,
                                                     1, -1, 4, -5, 3, -2,
                                                     6, -6, 7, -24],
                                max_buffer_size=None)  # offline whole-file
    T = 16 * (w._ONEHOT_MAX_TB + 512)  # just past the one-hot limit
    x = np.random.default_rng(17).standard_normal(
        (1, 1, T)).astype(np.float32) * 0.3
    y_fused = np.asarray(w.pitchshifter(x))
    y_loop = np.asarray(w.pitchshifter_loop(x))
    err = ((y_fused - y_loop) ** 2).sum()
    snr = 10 * np.log10(max((y_loop ** 2).sum(), 1e-30) / max(err, 1e-30))
    assert snr > 90, f"whole-file fused-vs-loop parity only {snr:.1f} dB"


def test_multi_stream_states_match_independent_streams():
    """pitchshift_streams == running each stream separately with its own
    crossfade state (the reference can't do this at all: batch>1 disables
    its crossfade, 1-PitchShifterWrapper.py:262)."""
    import jax.numpy as jnp

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(70, 4, m_buffer_size=256)
    rng = np.random.default_rng(7)
    S, T = 3, 256
    xs1 = jnp.asarray(rng.standard_normal((S, T)).astype(np.float32) * 0.1)
    xs2 = jnp.asarray(rng.standard_normal((S, T)).astype(np.float32) * 0.1)

    st = w.init_streams(S)
    st, y1 = w.pitchshift_streams(st, xs1)
    st, y2 = w.pitchshift_streams(st, xs2)

    for s in range(S):
        ind = w.init_state()
        ind, z1 = w.pitchshift_fn(ind, xs1[s][None, None, :])
        ind, z2 = w.pitchshift_fn(ind, xs2[s][None, None, :])
        np.testing.assert_allclose(np.asarray(y1[s]), np.asarray(z1[0]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y2[s]), np.asarray(z2[0]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st["prev_tail"][s]), np.asarray(ind["prev_tail"]),
            atol=1e-5, rtol=1e-5)


def test_phase_rule_accumulate_oracle_parity():
    """phase_rule='accumulate' (running-phase fix of reference quirk
    SURVEY §2.5-4) is pinned against an independent torch re-derivation
    of the same rule at the flagship geometry — two carried-state blocks
    of real audio, full shift range incl. the clamped-boundary cases
    (VERDICT r3 weak-2: this replaces the old differs-and-finite smoke).
    Also keeps the old smoke property: the two rules genuinely differ."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.utils.audio import read_wav

    x, _ = read_wav("/root/reference/audio/flute.wav")
    blk1 = np.asarray(x[None, :1, 20000:28192], np.float32)
    blk2 = np.asarray(x[None, :1, 28192:36384], np.float32)
    hk = None

    acc = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS,
                                phase_rule="accumulate")
    hk = np.asarray(acc.pqmf.params["hk"])
    state = acc.init_state()
    state, y1 = acc.pitchshift_fn(state, jnp.asarray(blk1[0]))
    state, y2 = acc.pitchshift_fn(state, jnp.asarray(blk2[0]))

    tail = np.zeros((16, 128), np.float32)
    o1, tail = torch_flagship_pitchshift(blk1, hk, SHIFTS, 8192, tail,
                                         phase_rule="accumulate")
    o2, tail = torch_flagship_pitchshift(blk2, hk, SHIFTS, 8192, tail,
                                         phase_rule="accumulate")
    s1 = snr_db(o1, np.asarray(y1))
    s2 = snr_db(o2, np.asarray(y2))
    assert s1 > 80, f"accumulate-rule block-1 parity {s1:.1f} dB"
    assert s2 > 80, f"accumulate-rule block-2 parity {s2:.1f} dB"

    ref = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)
    _, y_ref = ref.pitchshift_fn(ref.init_state(), jnp.asarray(blk1[0]))
    assert np.abs(np.asarray(y_ref) - np.asarray(y1)).max() > 1e-4


@pytest.mark.parametrize("n_band,buffer", [(8, 4096), (32, 8192), (64, 8192)])
def test_flagship_other_band_counts_oracle_parity(n_band, buffer):
    """Oracle parity OFF the default config (VERDICT r2 item 4): the full
    fused step at (8, 4096), (32, 8192) and (64, 8192) vs the torch
    reference chain,
    pinning ``derive_stft_geometry`` and the per-band masks away from the
    (16, 8192) default. Wrap-stable shifts ({0, -12, -24}: integer rates,
    so the interpolation weight a is identically 0 and the chaotic dp term
    of near-zero STFT bins vanishes — see test_pitchshift_variable_block_size
    for the analysis) make strict >85 dB parity meaningful."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    rng = np.random.default_rng(11)
    stable = [(0, -12, -24)[i % 3] for i in range(n_band)]
    w = PQMFPitchShiftWrapper(100, n_band, buffer,
                              shifts_in_semitones=stable)
    hk = np.asarray(w.pqmf.params["hk"])
    x = rng.standard_normal((1, 1, buffer)).astype(np.float32) * 0.3

    state = w.init_state()
    state, got = w.pitchshift_fn(state, x)
    assert np.asarray(got).shape == (1, buffer)

    prev = np.zeros((n_band, w.band_overlap), np.float32)
    want, want_tail = torch_flagship_pitchshift(x, hk, stable, buffer, prev)
    s = snr_db(want, np.asarray(got))
    assert s > 85, f"M={n_band} buffer={buffer}: oracle parity {s:.1f} dB"
    # tails of strongly-compressed bands are all-but-zero (the -24 shift
    # packs content into the first half): SNR is meaningless on float
    # dust, so accept either dB parity or absolute agreement
    tail_err = float(np.abs(want_tail - np.asarray(state["prev_tail"])).max())
    s_tail = snr_db(want_tail, np.asarray(state["prev_tail"]))
    assert s_tail > 85 or tail_err < 1e-6, (
        f"M={n_band}: tail parity {s_tail:.1f} dB, max err {tail_err:.2e}")


def test_stream_ola_matches_host_loop():
    """stream_ola (one jitted scan) == the CLI harness's host loop."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, stream_ola
    from pqmf_tpu.ops import stft as S

    rng = np.random.default_rng(13)
    block, n_band, buffer = 512, 4, 512
    T = 2000
    x = rng.standard_normal((1, T)).astype(np.float32) * 0.1
    w = PQMFPitchShiftWrapper(70, n_band, buffer,
                              shifts_in_semitones=[2, -2, 5, -5])

    pitch, recon = stream_ola(w, x, block)
    assert pitch.shape == (1, T) and recon.shape == (1, T)

    # host-loop reference (the CLI's exact math)
    hop = block - block // 2
    n_frames = -(-(T - block) // hop) + 1
    total = (n_frames - 1) * hop + block
    xp = np.pad(x, ((0, 0), (0, total - T)))
    win = np.asarray(S.hann_window(block))
    out_acc = np.zeros((1, total), np.float32)
    rec_acc = np.zeros_like(out_acc)
    norm = np.zeros_like(out_acc)
    state = w.init_state()
    for f in range(n_frames):
        i = f * hop
        blk = xp[:, i:i + block] * win
        state, out = w.pitchshift_fn(state, blk)
        out_acc[:, i:i + block] += np.asarray(out) * win
        rec_acc[:, i:i + block] += np.asarray(w.forward_fn(blk)) * win
        norm[:, i:i + block] += win * win
    pitch_ref = (out_acc / (norm + 1e-8))[:, :T]
    recon_ref = (rec_acc / (norm + 1e-8))[:, :T]

    np.testing.assert_allclose(np.asarray(pitch), pitch_ref,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), recon_ref,
                               atol=1e-5, rtol=1e-4)


def test_stream_ola_program_is_cached_no_retrace():
    """stream_ola must be ONE compiled program reused across calls
    (VERDICT r4 weak #1: the eager version re-traced every call because
    the step closure was new each time, so the 'one dispatch' claim was
    false and the bench measured the tunnel). Pins: one cached program
    per geometry, exactly one jit trace total across repeat calls, and a
    set_weights invalidates the cache instead of serving stale audio."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, stream_ola
    from pqmf_tpu.streaming import kernels_from_params

    rng = np.random.default_rng(5)
    w = PQMFPitchShiftWrapper(70, 4, 512,
                              shifts_in_semitones=[1, -1, 3, -3])
    x = rng.standard_normal((1, 2000)).astype(np.float32) * 0.1

    p1, r1 = stream_ola(w, x, 512)
    fns = w._stream_ola_fns
    assert len(fns) == 1
    (run,) = fns.values()
    assert run._cache_size() == 1
    p2, r2 = stream_ola(w, x, 512)
    assert len(fns) == 1 and run._cache_size() == 1  # no retrace
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    # a different geometry gets its own program, not a retrace of run
    stream_ola(w, x, 512, overlap=128)
    assert len(fns) == 2 and run._cache_size() == 1

    # weight swap: cached programs bake weights at trace time, so the
    # key must change (weights_version) and the audio must follow the
    # new bank
    pq = w.pqmf
    scaled = {k: np.asarray(v) * (0.5 if k == "hk" else 1.0)
              for k, v in pq.params.items()}
    import pqmf_tpu.ops.filterbank as fb

    params = fb.params_from_hk(scaled["hk"], h=scaled["h"])
    pq.set_weights(params, *kernels_from_params(params))
    p3, _ = stream_ola(w, x, 512)
    # new program under the new weights_version; the two programs traced
    # under the OLD version are evicted (stale versions can never be hit
    # again), so repeated set_weights does not accumulate dead programs
    assert len(fns) == 1
    assert all(k[4] != 0 for k in fns)
    assert not np.allclose(np.asarray(p3), np.asarray(p1))


def test_stream_ola_cache_keys_on_resample_override():
    """The pinned resample lowering is a trace-time decision baked into
    the compiled program, and the knob exists FOR timing A/Bs — a stale
    program under a changed override would silently time the wrong
    lowering (r5 review). Pins: changing the override compiles a new
    program; audio is unchanged (the knob's 'moves time, never audio'
    contract)."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, stream_ola

    rng = np.random.default_rng(9)
    w = PQMFPitchShiftWrapper(70, 4, 512,
                              shifts_in_semitones=[1, -1, 3, -3])
    x = rng.standard_normal((1, 1500)).astype(np.float32) * 0.1

    p1, r1 = stream_ola(w, x, 512)
    assert len(w._stream_ola_fns) == 1
    w.resample_override = "gather"
    try:
        p2, r2 = stream_ola(w, x, 512)
    finally:
        w.resample_override = None
    assert len(w._stream_ola_fns) == 2
    assert {k[-1] for k in w._stream_ola_fns} == {None, "gather"}
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))


def test_stream_ola_cache_does_not_pin_the_wrapper():
    """The compiled-program cache lives ON the wrapper (the program
    closures reference the wrapper, so any module-global cache — even a
    WeakKeyDictionary, whose values would reach the key through the step
    closure — pins every wrapper plus its ~MB-scale compiled programs
    for process lifetime). Pins: a dropped wrapper is ordinary
    collectable garbage after using stream_ola."""
    import gc
    import weakref

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, stream_ola

    rng = np.random.default_rng(6)
    w = PQMFPitchShiftWrapper(70, 4, 256, shifts_in_semitones=[1, -1, 2, -2])
    x = rng.standard_normal((1, 1000)).astype(np.float32) * 0.1
    stream_ola(w, x, 256)
    assert len(w._stream_ola_fns) == 1
    ref = weakref.ref(w)
    del w
    gc.collect()
    assert ref() is None


def test_long_stream_state_stays_bounded():
    """Soak: hundreds of blocks through the stateful pitchshift keep the
    crossfade state and output finite and bounded (no accumulation blowup
    in the carried tails)."""
    import jax
    import jax.numpy as jnp

    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(70, 4, 256, shifts_in_semitones=[1, -1, 2, -2])
    rng = np.random.default_rng(17)
    blocks = jnp.asarray(
        rng.standard_normal((300, 1, 1, 256)).astype(np.float32) * 0.5)

    @jax.jit
    def run(state, blocks):
        return jax.lax.scan(lambda s, b: w.pitchshift_fn(s, b), state, blocks)

    state, ys = run(w.init_state(), blocks)
    ys = np.asarray(ys)
    tail = np.asarray(state["prev_tail"])
    assert np.isfinite(ys).all() and np.isfinite(tail).all()
    assert np.abs(ys).max() < 10.0 and np.abs(tail).max() < 10.0
    # late blocks keep processing signal (no silent state collapse)
    assert np.sqrt((ys[-50:] ** 2).mean()) > 1e-4


def test_fast_serving_precision_mode():
    """precision='default' (bf16 MXU passes on TPU; plain f32 on CPU) is
    an opt-in quality/throughput tradeoff: output stays close to the
    HIGHEST-precision result and the state machinery is unaffected."""
    w_hi = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS)
    w_lo = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS,
                                 precision="default")
    x = np.random.default_rng(21).standard_normal(
        (1, 8192)).astype(np.float32) * 0.3
    _, y_hi = w_hi.pitchshift_fn(w_hi.init_state(), x)
    st, y_lo = w_lo.pitchshift_fn(w_lo.init_state(), x)
    assert np.isfinite(np.asarray(y_lo)).all()
    s = snr_db(np.asarray(y_hi), np.asarray(y_lo))
    assert s > 35, f"fast-mode quality {s:.1f} dB vs HIGHEST"
    # streams work in fast mode too
    sts = w_lo.init_streams(4)
    xs = np.random.default_rng(22).standard_normal(
        (4, 8192)).astype(np.float32) * 0.3
    sts, ys = w_lo.pitchshift_streams(sts, xs)
    assert np.asarray(ys).shape == (4, 8192)


@pytest.mark.slow  # rebuilds + recompiles the fused TA step twice
def test_ta_fused_path_respects_set_weights():
    """The fused pitchshifter takes the filterbank weights as traced jit
    ARGUMENTS; a pqmf.set_weights() (artifact restore / fine-tune) must
    change its output just like it changes the per-band loop oracle's
    (review finding: the weights were baked in as closure constants and
    the fused path returned bit-identical stale output)."""
    w = PQMFPitchShiftWrapperTA(70, 8, 1024, 44100, [0, 2, 4, 5, 7, 9, 11, 12])
    x = jnp.asarray(
        0.3 * np.random.default_rng(21).standard_normal(
            (1, 1, 1024)).astype(np.float32))
    y1 = np.asarray(w.pitchshifter(x))

    pq = w.pqmf
    pq.set_weights(pq.params, 2.0 * np.asarray(pq.hkf), np.asarray(pq.hki))
    y2 = np.asarray(w.pitchshifter(x))
    assert np.abs(y2 - y1).max() > 1e-3  # the new weights took effect
    # and the fused path still matches the live per-band loop oracle
    want = np.asarray(w.pitchshifter_loop(x))
    assert snr_db(want, y2) > 80


def test_flagship_fused_path_respects_set_weights():
    """Flagship mirror of the TA regression: pitchshift_fn must see a
    pqmf.set_weights() bank (its weights already ride as traced args
    through StreamingPQMF's jitted conv helpers — pin that property)."""
    w = PQMFPitchShiftWrapper(70, 8, 1024, 44100, [0, 2, 4, 5, 7, 9, 11, 12])
    x = jnp.asarray(
        0.3 * np.random.default_rng(22).standard_normal(
            (1, 1, 1024)).astype(np.float32))
    s0 = w.init_state()
    _, y1 = w.pitchshift_fn(s0, x)
    pq = w.pqmf
    pq.set_weights(pq.params, 2.0 * np.asarray(pq.hkf), np.asarray(pq.hki))
    _, y2 = w.pitchshift_fn(s0, x)
    assert np.abs(np.asarray(y2) - np.asarray(y1)).max() > 1e-3


def test_flagship_pipeline_composes_with_pretrained_bank():
    """The committed fine-tuned bank installs on the flagship pipeline's
    filterbank and the fused pitchshift step runs finite with a changed
    (non-stale) output — quality extension and serving path compose."""
    from pqmf_tpu.parallel.training import load_pretrained_bank
    from pqmf_tpu.streaming import kernels_from_params

    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100)
    x = jnp.asarray(
        0.2 * np.random.default_rng(23).standard_normal(
            (1, 1, 8192)).astype(np.float32))
    s0 = w.init_state()
    _, y0 = w.pitchshift_fn(s0, x)
    params = load_pretrained_bank()
    w.pqmf.set_weights(params, *kernels_from_params(params))
    _, y1 = w.pitchshift_fn(s0, x)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    assert np.isfinite(y1).all()
    assert np.abs(y1 - y0).max() > 1e-4


def test_stream_ola_stereo_matches_per_channel_mono():
    """stream_ola with [C, T] input == running each channel through its
    own mono stream_ola (per-channel crossfade state via serving
    streams); the reference drops to one channel here."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, stream_ola

    rng = np.random.default_rng(23)
    block, n_band, buffer = 512, 4, 512
    T = 1800
    x = rng.standard_normal((2, T)).astype(np.float32) * 0.1
    w = PQMFPitchShiftWrapper(70, n_band, buffer,
                              shifts_in_semitones=[2, -2, 5, -5])

    pitch, recon = stream_ola(w, x, block)
    assert pitch.shape == (2, T) and recon.shape == (2, T)
    for c in range(2):
        pc, rc = stream_ola(w, x[c:c + 1], block)
        np.testing.assert_allclose(np.asarray(pitch[c]), np.asarray(pc[0]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(recon[c]), np.asarray(rc[0]),
                                   atol=1e-5, rtol=1e-5)


def test_flagship_whole_file_uses_linear_memory_path():
    """Whole-file offline inputs (Tb past _ONEHOT_MAX_TB) must route the
    stretch resample through the linear-memory gather form — the one-hot
    weight matrix is O(Tb * stretch_len) and reaches gigabytes on real
    files (r3: a 442k-sample stereo file took the box to swap) — and the
    two forms must agree."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100,
                              shifts_in_semitones=[0, -3, 5, 12, -7, 2,
                                                   1, -1, 4, -5, 3, -2,
                                                   6, -6, 7, -24],
                              max_buffer_size=None)
    T = 16 * (w._ONEHOT_MAX_TB + 256)  # just past the one-hot limit
    # pin that this input really selects the gather form (pitchshift_fn's
    # `kind = "onehot" if Tb <= self._ONEHOT_MAX_TB else "gather"`),
    # whatever the threshold's current value
    assert T // w.n_band > w._ONEHOT_MAX_TB
    x = np.random.default_rng(29).standard_normal(
        (1, 1, T)).astype(np.float32) * 0.3
    state, y_gather = w.pitchshift_fn(w.init_state(), x)
    assert np.asarray(y_gather).shape == (1, T)
    # force the one-hot form at the same length for equality
    w2 = PQMFPitchShiftWrapper(100, 16, 8192, 44100,
                               shifts_in_semitones=w.shifts,
                               max_buffer_size=None)
    w2._ONEHOT_MAX_TB = 10 ** 9
    _, y_onehot = w2.pitchshift_fn(w2.init_state(), x)
    a, b = np.asarray(y_onehot), np.asarray(y_gather)
    err = ((a - b) ** 2).sum()
    snr = 10 * np.log10(max((a ** 2).sum(), 1e-30) / max(err, 1e-30))
    assert snr > 90, f"gather-vs-onehot stretch resample parity {snr:.1f} dB"


def test_frame_select_lowerings_bit_identical_across_crossover():
    """pv._select_frames picks its lowering by static frame count
    (take at serving block shapes, one-hot matmul in the whole-file
    regime — the r4 serving-regression fix). The two forms must be
    BIT-identical on both sides of the crossover, or the crossover
    would change results, not just lowering."""
    from pqmf_tpu.ops import phase_vocoder as pv

    rng = np.random.default_rng(7)
    for T in (5, pv._TAKE_MAX_FRAMES, pv._TAKE_MAX_FRAMES + 1, 147):
        p = jnp.asarray(rng.standard_normal((3, 17, T)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((3, 17, T)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, T, size=2 * T + 3),
                          dtype=jnp.int32)
        outs = {}
        for mode in ("take", "onehot"):
            pv._FORCE_SELECT = mode
            try:
                outs[mode] = [np.asarray(o)
                              for o in pv._select_frames(p, q, idx)]
            finally:
                pv._FORCE_SELECT = None
        # auto must equal both (they are mutually bit-identical)
        auto = [np.asarray(o) for o in pv._select_frames(p, q, idx)]
        for a, b, c in zip(outs["take"], outs["onehot"], auto):
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, c)


def test_ta_dense_resample_matches_onehot_and_plan():
    """resample_kind='dense' (r4: the banded plan prefolded into one
    constant matmul per band) must match the in-graph one-hot form to
    float32 round-off, and the plan's A must BE the fold of (W, start)."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    w = PQMFPitchShiftWrapperTA(100, 8, 2048, 44100,
                                [0, -3, 5, 12, -7, 2, 1, -1])
    Tb = 2048 // 8
    plan = w._ta_plan(Tb)
    A = plan[9]
    # dense is batch-gated (the constant read amortizes across streams):
    # off at B=1, on from _DENSE_MIN_B streams up
    assert A is not None
    assert w._resample_kind(Tb, plan, 1) == "onehot"
    assert w._resample_kind(Tb, plan, w._DENSE_MIN_B) == "dense"
    # structural check: A[m, start[m, j] + k, j] == W[m, j, k], zero
    # elsewhere (within a column the K tap rows are distinct)
    W, starts = plan[4], plan[5]
    M, _, Kt = W.shape
    ref = np.zeros_like(A)
    j = np.arange(Tb)
    for m in range(M):
        for k in range(Kt):
            ref[m, starts[m] + k, j] = W[m, :, k]
    np.testing.assert_array_equal(A, ref)

    x = np.random.default_rng(11).standard_normal(
        (2, 1, 2048)).astype(np.float32) * 0.3
    y_dense = np.asarray(w._pitchshifter_jit(
        jnp.asarray(x), w.pqmf.hkf, w.pqmf.hki,
        *plan[:4], jnp.asarray(A), plan[5],
        FO_max=plan[6], pad_left=plan[7], Lbuf=plan[8],
        resample_kind="dense"))
    y_onehot = np.asarray(w.pitchshifter(x))  # B=2 -> the one-hot form
    err = ((y_dense - y_onehot) ** 2).sum()
    snr = 10 * np.log10(max((y_onehot ** 2).sum(), 1e-30)
                        / max(err, 1e-30))
    assert snr > 120, f"dense-vs-onehot resample parity {snr:.1f} dB"


def test_ta_wrapper_routes_dense_at_batch_and_caches_device_constant():
    """An eager wrapper-level pitchshifter call at B >= _DENSE_MIN_B must
    take the dense lowering THROUGH the wrapper (including the per-Tb
    device copy of the prefolded constant — advisor r4: without the
    cache every eager batched call re-uploads ~52 MB through the
    tunnel), produce audio matching the one-hot form to float32
    round-off, and reuse the same committed device array on the next
    call."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapperTA

    w = PQMFPitchShiftWrapperTA(100, 8, 2048, 44100,
                                [0, -3, 5, 12, -7, 2, 1, -1])
    Tb = 2048 // 8
    rng = np.random.default_rng(11)
    x2 = rng.standard_normal((2, 1, 2048)).astype(np.float32) * 0.3
    x4 = np.concatenate([x2, x2], 0)  # B=4 == _DENSE_MIN_B -> dense

    assert w.pitchshifter(x2) is not None  # B=2 -> one-hot
    assert Tb not in w._dense_dev
    y4 = np.asarray(w.pitchshifter(x4))
    dev = w._dense_dev.get(Tb)
    assert dev is not None  # the wrapper populated the device cache
    # identical streams through one batched call must be bit-identical
    np.testing.assert_array_equal(y4[:2], y4[2:])
    # the SAME batch through the one-hot lowering (instance gate pushed
    # above B — comparing across different B would also pick up XLA's
    # batch-dependent reduction tiling, not just the lowering)
    w._DENSE_MIN_B = 99
    y4_onehot = np.asarray(w.pitchshifter(x4))
    w._DENSE_MIN_B = type(w)._DENSE_MIN_B
    err = ((y4 - y4_onehot) ** 2).sum()
    snr = 10 * np.log10(max((y4_onehot ** 2).sum(), 1e-30)
                        / max(err, 1e-30))
    assert snr > 120, f"wrapper dense-vs-onehot parity {snr:.1f} dB"
    w.pitchshifter(x4)
    assert w._dense_dev.get(Tb) is dev  # second call reuses, not re-puts


def test_flagship_dense_interp_matches_onehot():
    """The flagship's prefolded stretch-back lerp (resample_kind='dense',
    batch-gated serving form) must match the in-graph one-hot lerp to
    float32 round-off, and the batch gate must route B=1 away from it."""
    from pqmf_tpu.pipelines import (PQMFPitchShiftWrapper,
                                    _fused_band_pitchshift)

    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100)
    Tb = 512
    fo, FO_max, A = w._plan(Tb)
    assert A is not None
    assert w._resample_kind(Tb, A, 1) == "onehot"
    assert w._resample_kind(Tb, A, w._DENSE_MIN_B) == "dense"

    x = np.random.default_rng(17).standard_normal(
        (1, 1, 8192)).astype(np.float32) * 0.3
    sub = w.decompose(x)
    outs = {}
    for kind in ("dense", "onehot"):
        sh, _ = _fused_band_pitchshift(
            sub, w._rates, fo, w.init_state()["prev_tail"],
            w._fade_out, w._fade_in, w.n_fft, w.hop, w.win, Tb, FO_max,
            crossfade=True, phase_rule=w.phase_rule, precision=w.precision,
            resample_kind=kind,
            interp_A=jnp.asarray(A) if kind == "dense" else None)
        outs[kind] = np.asarray(w.inverse(sh))
    err = ((outs["dense"] - outs["onehot"]) ** 2).sum()
    snr = 10 * np.log10(max((outs["onehot"] ** 2).sum(), 1e-30)
                        / max(err, 1e-30))
    assert snr > 120, f"flagship dense-vs-onehot lerp parity {snr:.1f} dB"


def test_wholefile_routes_to_chunked_and_matches_gather():
    """Past the one-hot memory crossover the flagship's stretch resample
    now lowers to the chunked scan-of-matmuls form (r5: the gather was
    the whole-file path's only non-matmul stage — the documented
    ~100x-slow minor-dim pattern on the TPU). The audio must be
    identical to the gather lowering up to float32 round-off, and the
    resample_override knob must pin either form."""
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper, _resample_chunk

    w = PQMFPitchShiftWrapper(100, 4, 2048, 44100, max_buffer_size=None,
                              shifts_in_semitones=[0, 2, -3, 7])
    Tb = 4096  # past _ONEHOT_MAX_TB=2048, pow-2 so a chunk divisor exists
    assert _resample_chunk(Tb) == 2048
    fo, FO_max, A = w._plan(Tb)
    assert w._resample_kind(Tb, A, 1) == "chunked"
    # no usable divisor -> gather fallback stays reachable
    assert w._resample_kind(2049 * 2, None, 1) == "gather"

    x = jnp.asarray(0.2 * np.random.default_rng(23).standard_normal(
        (1, 1, 4 * Tb)).astype(np.float32))
    outs = {}
    for kind in ("chunked", "gather"):
        w.resample_override = kind
        _, y = w.pitchshift_fn(w.init_state(), x)
        outs[kind] = np.asarray(y)
    w.resample_override = None
    _, y_def = w.pitchshift_fn(w.init_state(), x)
    np.testing.assert_array_equal(np.asarray(y_def), outs["chunked"])
    np.testing.assert_allclose(outs["chunked"], outs["gather"],
                               atol=1e-5, rtol=1e-5)


def test_dense_device_cache_is_trace_safe():
    """The per-Tb device copies of the prefolded dense constants (advisor
    r4: eager batched steps must not re-upload ~52-56 MB per call) must
    stay concrete even when the FIRST dense-path call happens inside an
    outer trace: a bare device_put there returns a DynamicJaxprTracer,
    and caching it raises UnexpectedTracerError on the next call (the
    exact failure tools/ab_trig.py hit when chaining pitchshift_streams
    under a fori_loop with a cold cache)."""
    from pqmf_tpu.pipelines import (PQMFPitchShiftWrapper,
                                    PQMFPitchShiftWrapperTA)

    rng = np.random.default_rng(3)

    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100)
    B = w._DENSE_MIN_B
    x = jnp.asarray(rng.standard_normal((B, 8192)).astype(np.float32) * 0.1)
    states0 = w.init_streams(B)

    @jax.jit
    def traced_step(x):
        # cold cache: _dense_device runs for the first time under trace
        _, y = w.pitchshift_streams(states0, x)
        return y

    y_traced = np.asarray(traced_step(x))
    assert not isinstance(w._dense_dev[512], jax.core.Tracer)
    # the eager call after it must reuse the cache without blowing up
    _, y_eager = w.pitchshift_streams(states0, x)
    np.testing.assert_allclose(np.asarray(y_eager), y_traced,
                               atol=1e-5, rtol=1e-5)

    wta = PQMFPitchShiftWrapperTA(100, 16, 8192, use_pallas=False)
    xta = jnp.asarray(
        rng.standard_normal((wta._DENSE_MIN_B, 1, 8192)).astype(np.float32)
        * 0.1)

    @jax.jit
    def traced_ta(x):
        return wta.pitchshifter(x)

    y_ta = np.asarray(traced_ta(xta))
    assert not isinstance(wta._dense_dev[512], jax.core.Tracer)
    np.testing.assert_allclose(np.asarray(wta.pitchshifter(xta)), y_ta,
                               atol=1e-5, rtol=1e-5)

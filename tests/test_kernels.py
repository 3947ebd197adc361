"""Pallas kernel equality vs the lax polyphase path (SURVEY.md §4
"real-vs-interpret TPU kernel tests" — on CPU these run the Mosaic
interpreter; on TPU the native kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pqmf_tpu import PQMF
from pqmf_tpu.kernels import polyphase_analysis, polyphase_synthesis
from pqmf_tpu.ops import filterbank as fb


@pytest.mark.parametrize("n_band", [2, 4, 8, 16, 32, 64])
@pytest.mark.parametrize("t_sub", [128, 1000, 37])
def test_analysis_matches_lax(n_band, t_sub):
    p = fb.build_filterbank(100, n_band)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, 1, n_band * t_sub)).astype(np.float32))
    ref = fb.reverse_half(fb.polyphase_forward(x, p["hk_poly"]))
    got = polyphase_analysis(x, p["hk_poly"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n_band", [2, 4, 8, 16, 32, 64])
@pytest.mark.parametrize("t_sub", [128, 1000, 37])
def test_synthesis_matches_lax(n_band, t_sub):
    p = fb.build_filterbank(100, n_band)
    rng = np.random.default_rng(1)
    s = jnp.asarray(
        rng.standard_normal((2, n_band, t_sub)).astype(np.float32))
    ref = fb.polyphase_inverse(fb.reverse_half(s), p["hk_ipoly"])
    got = polyphase_synthesis(s, p["hk_ipoly"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pqmf_pallas_flag_roundtrip():
    """PQMF(use_pallas=True) matches the lax PQMF end-to-end."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 16 * 512)).astype(np.float32)
    ref = PQMF(100, 16, use_pallas=False)
    pal = PQMF(100, 16, use_pallas=True)
    sub_ref, sub_pal = ref.forward(x), pal.forward(x)
    np.testing.assert_allclose(np.asarray(sub_pal), np.asarray(sub_ref),
                               atol=2e-5, rtol=1e-4)
    y_ref, y_pal = ref.inverse(sub_ref), pal.inverse(sub_ref)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_supports_gate():
    """The native-kernel gate after the round-4 relaxation: every
    power-of-two band count <= 64 rides the time-grouped path (incl. the
    reference's M=2/M=4 configs); non-128-divisor counts still need the
    ungrouped path's M % 8; oversized halos always fall back."""
    from pqmf_tpu.kernels.polyphase import supports

    for m in (2, 4, 8, 16, 32, 64):
        assert supports(m)
    assert supports(24)          # ungrouped path: 24 % 8 == 0
    assert not supports(12)      # neither path: 128 % 12, 12 % 8
    assert not supports(8, halos=(200,))  # halo past one lane tile


def test_small_band_count_pallas_roundtrip():
    """n_band=4 (the BASELINE M=4 95-tap prototype) through the native
    kernels in auto mode — previously gated off to lax (VERDICT r3
    missing-2)."""
    from pqmf_tpu.kernels.polyphase import supports

    assert supports(4)  # the auto gate admits M=4 (pallas_available()
    # is False on the CPU test backend, so force the kernels on —
    # interpret mode — like the other kernel tests)
    pq = PQMF(100, 4, use_pallas=True)
    assert pq.use_pallas
    x = np.random.default_rng(3).standard_normal((1, 1, 4 * 256)).astype(
        np.float32)
    ref = PQMF(100, 4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(pq.forward(x)),
                               np.asarray(ref.forward(x)),
                               atol=2e-5, rtol=1e-4)
    y = pq.inverse(pq.forward(x))
    assert y.shape == (1, 1, 4 * 256)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(ref.inverse(ref.forward(x))),
                               atol=2e-5, rtol=1e-4)


def test_streaming_pqmf_pallas_matches_lax_all_modes():
    """StreamingPQMF(use_pallas=True) == lax path for offline, causal and
    block-streaming modes (kernels run interpreted on CPU)."""
    import jax.numpy as jnp

    from pqmf_tpu.streaming import StreamingPQMF

    rng = np.random.default_rng(4)
    M, T = 16, 16 * 256
    x = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32))

    ref = StreamingPQMF(100, M, use_pallas=False)
    pal = StreamingPQMF(100, M, use_pallas=True)

    for fn in ("forward", "inverse", "forward_causal", "inverse_causal"):
        arg = x if "forward" in fn else getattr(ref, "forward")(x)
        a = np.asarray(getattr(ref, fn)(arg))
        b = np.asarray(getattr(pal, fn)(arg))
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4,
                                   err_msg=fn)

    # block streaming: 4 blocks, carried state, then a round trip
    sr_, sp_ = ref.init_state(), pal.init_state()
    for blk in jnp.split(x, 4, axis=-1):
        sr_, yr = ref.process_block(sr_, blk)
        sp_, yp = pal.process_block(sp_, blk)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yr),
                                   atol=2e-5, rtol=1e-4)
    for k in sr_:
        np.testing.assert_allclose(np.asarray(sp_[k]), np.asarray(sr_[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_ungrouped_fallback_m128_matches_lax():
    """n_band=128 has no time-grouping (G=1): the ungrouped im2col kernels
    must still match the lax path (they are the fallback the grouped
    scheme rests on)."""
    p = fb.build_filterbank(100, 128)
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.standard_normal((1, 1, 128 * 200)).astype(np.float32))
    ref = fb.reverse_half(fb.polyphase_forward(x, p["hk_poly"]))
    got = polyphase_analysis(x, p["hk_poly"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    s = jnp.asarray(rng.standard_normal((1, 128, 200)).astype(np.float32))
    ref2 = fb.polyphase_inverse(fb.reverse_half(s), p["hk_ipoly"])
    got2 = polyphase_synthesis(s, p["hk_ipoly"])
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=1e-4, rtol=1e-4)


# slow-lane split (measured, not guessed): these tests are COMPILE-bound
# — every (n_band, precision, pads) combination builds fresh Mosaic
# programs — and the non-default band counts are the bulk of the suite's
# wall time. The default serving config (M=16) plus the small-M corners
# adjacent to it stay in the fast lane; the full matrix runs in the full
# lane (-m "").
@pytest.mark.parametrize("n_band", [
    pytest.param(2, marks=pytest.mark.slow), 4, 8, 16,
    pytest.param(32, marks=pytest.mark.slow),
    pytest.param(64, marks=pytest.mark.slow)])
def test_fused_roundtrip_matches_composition(n_band):
    """The grouped pass-through round trip (kernels.cached_conv.
    fused_roundtrip_conv — no re-interleave transposes, reverse_half
    masks cancelled) equals inverse(forward(x)): bit-exact on the
    cached path (group-aligned pads), <=5e-6 on the polyphase path
    (the drop-one-step alignment splits the tap accumulation across a
    different matmul row group). Covers T/M % G != 0 (partial last
    group masking) and batch/channel folding."""
    from pqmf_tpu.streaming import StreamingPQMF

    rng = np.random.default_rng(11)
    G = 128 // n_band
    pq = PQMF(70, n_band, n_channels=2, use_pallas=True)
    sp = StreamingPQMF(70, n_band, n_channels=2, use_pallas=True)
    for T in (256 * n_band, (128 * G + 3) * n_band):
        x = rng.standard_normal((2, 2, T)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(pq.roundtrip(x)),
            np.asarray(pq.inverse(pq.forward(x))), atol=5e-6, rtol=0)
        np.testing.assert_array_equal(
            np.asarray(sp.roundtrip(x)),
            np.asarray(sp.inverse(sp.forward(x))))


@pytest.mark.parametrize("n_band", [
    pytest.param(2, marks=pytest.mark.slow),
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow), 16,
    pytest.param(32, marks=pytest.mark.slow),
    pytest.param(64, marks=pytest.mark.slow)])
def test_single_call_roundtrip_matches_two_call(n_band):
    """calls="single" (one pallas_call, VMEM-ring intermediate) is
    bit-identical to calls="two": same dot operands in the same order;
    the mid trim/zero/pad glue is replaced by in-kernel masks. Covers
    partial last groups, multi-tile rings (tile=256 forces nt>1 so the
    ring wraps), and batch/channel folding."""
    from pqmf_tpu.kernels.cached_conv import fused_roundtrip_conv
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding

    rng = np.random.default_rng(21)
    G = 128 // n_band
    sp = StreamingPQMF(70, n_band, use_pallas=True)
    Ka, Ks = sp.hkf.shape[-1], sp.hki.shape[-1]
    al, ar = centered_padding(Ka)
    sl, sr = centered_padding(Ks)
    # pad variants cover the kernel's window-alignment cases: the
    # production-like aligned left pad (base > 0), no left pad
    # (pl_g == 0), and an 8-row-aligned left pad (base == 0)
    pad_list = [(-(-sl // G) * G, sr), (0, sl + sr), (8 * G, sr)]
    for T in (256 * n_band, (128 * G + 3) * n_band):
        x = rng.standard_normal((2, 1, T)).astype(np.float32)
        xx = jnp.pad(jnp.asarray(x), ((0, 0), (0, 0), (al, ar)))
        for pads in pad_list:
            for prec in ("highest", "bf16x3"):
                two = fused_roundtrip_conv(xx, sp.hkf, sp.hki, n_band,
                                           pads, tile=256,
                                           mxu_precision=prec, calls="two")
                one = fused_roundtrip_conv(xx, sp.hkf, sp.hki, n_band,
                                           pads, tile=256,
                                           mxu_precision=prec,
                                           calls="single")
                np.testing.assert_array_equal(np.asarray(one),
                                              np.asarray(two))


def test_single_call_roundtrip_tail_tiles_past_analysis():
    """Synthesis tiles past the analysis range (nt_s >= nt_a + 3, via a
    huge synthesis right pad at tile=128) must see zero mid rows, not a
    VMEM ring slot. Regression: the left-halo copy used to read
    ring[(j-1) % 3] for every j >= 1 with no j <= nt_a guard, so tile
    j = nt_a + 3 re-read tile 0's STALE slot (and j = nt_a + 1, + 2 read
    never-written VMEM, zeros only by accident in interpret mode)."""
    from pqmf_tpu.kernels.cached_conv import fused_roundtrip_conv
    from pqmf_tpu.streaming import StreamingPQMF, centered_padding

    rng = np.random.default_rng(33)
    n_band = 16
    G = 128 // n_band
    sp = StreamingPQMF(70, n_band, use_pallas=True)
    Ka = sp.hkf.shape[-1]
    al, ar = centered_padding(Ka)
    x = rng.standard_normal((1, 1, 256 * n_band)).astype(np.float32)
    xx = jnp.pad(jnp.asarray(x), ((0, 0), (0, 0), (al, ar)))
    pads = (G, 4096)  # pl_g == 1; nt_a = 1 but nt_s >= 4 at tile=128
    kw = dict(tile=128, mxu_precision="highest")
    two = fused_roundtrip_conv(xx, sp.hkf, sp.hki, n_band, pads,
                               calls="two", **kw)
    one = fused_roundtrip_conv(xx, sp.hkf, sp.hki, n_band, pads,
                               calls="single", **kw)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


@pytest.mark.slow  # ~50 s of fresh Mosaic compiles; full lane only
def test_single_call_roundtrip_pad_geometry_fuzz():
    """Property: calls="single" == calls="two" bit-exactly for RANDOM
    (left, right) synthesis pads — the single-call kernel re-derives the
    two-call path's mid trim/zero/left-pad glue as in-kernel index math,
    and every pad regime (pl_g 0..128, tail tiles past the analysis
    range, partial last groups) must agree. This is the generalization
    of the tail-tile regression above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pqmf_tpu.kernels.cached_conv import fused_roundtrip_conv

    M, G, Ka, Ks = 16, 8, 65, 33
    rng = np.random.default_rng(7)
    w_ana = jnp.asarray(rng.standard_normal((M, 1, Ka)).astype(np.float32))
    w_syn = jnp.asarray(
        rng.standard_normal((M, M, Ks)).astype(np.float32) * 0.1)
    x = jnp.asarray(
        rng.standard_normal((1, 1, 128 * M + Ka - 1)).astype(np.float32))

    @settings(max_examples=10, deadline=None)
    @given(pl_g=st.integers(min_value=0, max_value=128),
           pr=st.integers(min_value=0, max_value=1500))
    def run(pl_g, pr):
        pads = (pl_g * G, pr)
        two = fused_roundtrip_conv(x, w_ana, w_syn, M, pads, tile=128,
                                   calls="two")
        one = fused_roundtrip_conv(x, w_ana, w_syn, M, pads, tile=128,
                                   calls="single")
        np.testing.assert_array_equal(np.asarray(one), np.asarray(two))

    run()


def test_roundtrip_falls_back_off_pallas_and_on_mesh():
    """Configurations outside the fused path still answer through the
    composition (lax path; band-sharded mesh)."""
    from pqmf_tpu.streaming import StreamingPQMF

    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 1, 4096)).astype(np.float32)
    pq = PQMF(70, 16, use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(pq.roundtrip(x)),
        np.asarray(pq.inverse(pq.forward(x))))
    import jax
    if len(jax.devices()) >= 8:
        from pqmf_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8, n_band=16)
        sp = StreamingPQMF(70, 16, use_pallas=True, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(sp.roundtrip(x)),
            np.asarray(sp.inverse(sp.forward(x))), atol=1e-6, rtol=0)


def test_mxu_precision_tiers():
    """The kernels' precision tiers: 'bf16x3' (split-operand 3-pass
    scheme — exercised for real in interpret mode) stays within ~1e-5
    peak-relative of 'highest' on every kernel entry point; unknown tier
    names fail loudly."""
    from pqmf_tpu.streaming import StreamingPQMF

    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 1, 16 * 512)).astype(np.float32)

    hi = StreamingPQMF(100, 16, use_pallas=True)
    x3 = StreamingPQMF(100, 16, use_pallas=True, precision="bf16x3")
    ref = np.asarray(hi.roundtrip(x))
    got = np.asarray(x3.roundtrip(x))
    assert np.abs(got - ref).max() <= 5e-5 * np.abs(ref).max()

    a_ref = np.asarray(hi.forward(x))
    a_got = np.asarray(x3.forward(x))
    assert np.abs(a_got - a_ref).max() <= 5e-5 * np.abs(a_ref).max()
    s_ref = np.asarray(hi.inverse(a_ref))
    s_got = np.asarray(x3.inverse(a_ref))
    assert np.abs(s_got - s_ref).max() <= 5e-5 * np.abs(s_ref).max()

    # offline PQMF plumbs the same knob through the polyphase adapters
    p_hi = PQMF(100, 16, use_pallas=True)
    p_x3 = PQMF(100, 16, use_pallas=True, precision="bf16x3")
    r_ref = np.asarray(p_hi.roundtrip(x))
    r_got = np.asarray(p_x3.roundtrip(x))
    assert np.abs(r_got - r_ref).max() <= 5e-5 * np.abs(r_ref).max()

    with pytest.raises(KeyError):
        StreamingPQMF(100, 16, use_pallas=True,
                      precision="bogus").roundtrip(x)

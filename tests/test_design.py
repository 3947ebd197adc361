"""L0 design-chain parity tests vs SciPy (reference: pqmf.py:66-112).

BASELINE.md requires bit-comparable (float-tolerance) filter coefficients:
M=4 -> 95 taps, M=8 -> 189, M=16 -> 377, M=32 -> 753 at atten=100.
"""

import numpy as np
import pytest

from pqmf_tpu import design

scipy_signal = pytest.importorskip("scipy.signal")
scipy_optimize = pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("atten", [80, 100, 120])
@pytest.mark.parametrize("wc", [0.05, 0.107, 0.3, 1.0])
def test_kaiserord_matches_scipy(atten, wc):
    ours = design.kaiserord(atten, wc / np.pi)
    theirs = scipy_signal.kaiserord(atten, wc / np.pi)
    assert ours[0] == theirs[0]
    assert ours[1] == pytest.approx(theirs[1], rel=1e-14)


@pytest.mark.parametrize("atten", [80, 100, 120])
@pytest.mark.parametrize("wc", [0.05, 0.107, 0.3])
def test_kaiser_filter_matches_scipy_firwin(atten, wc):
    N_, beta = scipy_signal.kaiserord(atten, wc / np.pi)
    N_ = 2 * (N_ // 2) + 1
    theirs = scipy_signal.firwin(
        N_, wc, window=("kaiser", beta), scale=False, fs=2 * np.pi
    )
    ours = design.kaiser_filter(wc, atten)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def scipy_design_loss(w, atten, M):
    """The reference objective run on scipy primitives (pqmf.py:88-95) —
    one copy shared by both design-parity tests."""
    N_, beta = scipy_signal.kaiserord(atten, float(np.ravel(w)[0]) / np.pi)
    N_ = 2 * (N_ // 2) + 1
    h = scipy_signal.firwin(
        N_, float(np.ravel(w)[0]), window=("kaiser", beta),
        scale=False, fs=2 * np.pi,
    )
    g = np.convolve(h, h[::-1], "full")
    g = abs(g[g.shape[-1] // 2 :: 2 * M][1:])
    return np.max(g)


@pytest.mark.parametrize("M", [4, 8, 16])
def test_nelder_mead_matches_scipy_fmin(M):
    atten = 100

    wc_scipy = scipy_optimize.fmin(
        lambda w: scipy_design_loss(w, atten, M), 1.0 / M, disp=0)[0]
    wc_ours = design.nelder_mead(
        lambda w: design.loss_wc(w, atten, M), 1.0 / M
    )[0]
    assert wc_ours == pytest.approx(wc_scipy, rel=1e-8, abs=1e-10)


@pytest.mark.parametrize(
    "M,expected_taps", [(4, 95), (8, 189), (16, 377), (32, 753)]
)
def test_prototype_lengths_match_baseline(M, expected_taps):
    h = design.get_prototype(100, M)
    assert h.shape[-1] == expected_taps


def test_prototype_matches_reference_design_chain():
    """End-to-end: our prototype == the reference design chain run on SciPy."""
    M, atten = 16, 100

    wc = scipy_optimize.fmin(
        lambda w: scipy_design_loss(w, atten, M), 1.0 / M, disp=0)[0]
    N_, beta = scipy_signal.kaiserord(atten, wc / np.pi)
    N_ = 2 * (N_ // 2) + 1
    h_ref = scipy_signal.firwin(
        N_, wc, window=("kaiser", beta), scale=False, fs=2 * np.pi
    )

    h_ours = design.get_prototype(atten, M)
    assert h_ours.shape == h_ref.shape
    np.testing.assert_allclose(h_ours, h_ref, rtol=1e-7, atol=1e-10)


def test_loss_wc_positive_and_small_at_optimum():
    M = 16
    h = design.get_prototype(100, M)
    # optimized ripple should be tiny (near-PR filterbank)
    wc = design.nelder_mead(lambda w: design.loss_wc(w, 100, M), 1.0 / M)[0]
    assert design.loss_wc(wc, 100, M) < 1e-3
    assert np.isfinite(h).all()

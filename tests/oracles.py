"""Torch-based test oracles reproducing the reference's documented tensor
semantics (pqmf.py:115-199, VocoderPitchShifter.py). These exist only so the
JAX implementation can be checked numerically against the exact PyTorch op
geometry the reference uses; they are test fixtures, not framework code.
"""

import numpy as np
import torch
import torch.nn.functional as F



# canonical 16-band shift set shared by the pipeline, export, and golden
# tests (the committed goldens were generated with it — keep in sync)
SHIFTS16 = [0, 4, -5, -12, 3, -7, 2, -3, 5, -9, 1, -1, -4, -6, -2, -24]

def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, dtype=np.float32, copy=True))


def torch_polyphase_forward(x: np.ndarray, hk: np.ndarray) -> np.ndarray:
    """Oracle for the polyphase analysis conv (pqmf.py:115-130 semantics)."""
    xt = _t(x)
    hkt = _t(hk)
    M = hkt.shape[0]
    B, C, T = xt.shape
    # b c (t m) -> b (c m) t
    xp = xt.reshape(B, C, T // M, M).permute(0, 1, 3, 2).reshape(B, C * M, T // M)
    # c (t m) -> c m t
    w = hkt.reshape(M, -1, M).permute(0, 2, 1)
    y = F.conv1d(xp, w, padding=w.shape[-1] // 2)[..., :-1]
    return y.numpy()


def torch_polyphase_inverse(x: np.ndarray, hk: np.ndarray) -> np.ndarray:
    """Oracle for the polyphase synthesis conv (pqmf.py:133-157 semantics)."""
    xt = _t(x)
    hkt = _t(hk)
    M = hkt.shape[0]
    hkf = hkt.flip(-1)
    # c (t m) -> m c t
    w = hkf.reshape(M, -1, M).permute(2, 0, 1)
    pad = w.shape[-1] // 2 + 1
    y = F.conv1d(xt, w, padding=pad)[..., :-1] * M
    y = y.flip(1)
    B, Mb, Tp = y.shape
    # b (c m) t -> b c (t m)
    y = y.permute(0, 2, 1).reshape(B, 1, Tp * M)
    y = y[..., 2 * w.shape[1] :]
    return y.numpy()


def torch_classic_forward(x: np.ndarray, hk: np.ndarray) -> np.ndarray:
    """Oracle for the classic strided analysis conv (pqmf.py:160-177)."""
    xt = _t(x)
    hkt = _t(hk)
    y = F.conv1d(
        xt, hkt.unsqueeze(1), stride=hkt.shape[0], padding=hkt.shape[-1] // 2
    )[..., :-1]
    return y.numpy()


def torch_classic_inverse(x: np.ndarray, hk: np.ndarray) -> np.ndarray:
    """Oracle for the zero-stuffed synthesis conv (pqmf.py:180-199)."""
    xt = _t(x)
    hkt = _t(hk).flip(-1)
    M = hkt.shape[0]
    y = torch.zeros(*xt.shape[:2], M * xt.shape[-1])
    y[..., ::M] = xt * M
    y = F.conv1d(y, hkt.unsqueeze(0), padding=hkt.shape[-1] // 2)[..., 1:]
    return y.numpy()


def reverse_half_np(x: np.ndarray) -> np.ndarray:
    mask = np.ones_like(x)
    mask[..., 1::2, ::2] = -1
    return x * mask


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `ref` in dB.

    Complex inputs compare BOTH components (stacked re/im): a plain
    float64 cast would silently discard the imaginary part and a
    spectrum-parity test would then only check real parts.
    """
    ref, test = np.asarray(ref), np.asarray(test)
    if np.iscomplexobj(ref) or np.iscomplexobj(test):
        ref = np.stack([np.real(ref), np.imag(ref)])
        test = np.stack([np.real(test), np.imag(test)])
    ref = np.asarray(ref, np.float64).ravel()
    test = np.asarray(test, np.float64).ravel()
    n = min(len(ref), len(test))
    ref, test = ref[:n], test[:n]
    err = ref - test
    denom = np.sum(err**2)
    if denom == 0:
        return np.inf
    return float(10 * np.log10(np.sum(ref**2) / denom))


def best_aligned_snr(ref: np.ndarray, test: np.ndarray, max_lag: int = 64):
    """Max SNR over integer alignments in [-max_lag, max_lag]; returns
    (snr_db, lag). Needed because streaming/cached paths introduce a
    constant group delay."""
    best = (-np.inf, 0)
    ref = np.asarray(ref, np.float64).ravel()
    test = np.asarray(test, np.float64).ravel()
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            s = snr_db(ref[lag:], test[: len(ref) - lag])
        else:
            s = snr_db(ref[: len(ref) + lag], test[-lag:])
        if s > best[0]:
            best = (s, lag)
    return best

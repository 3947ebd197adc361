"""Fused Pallas kernels for the CachedPQMF conv geometry.

The streaming layer's convolutions (reference pqmf.py:316-333 via
cached_conv) are, at the default config: analysis 1->M channels,
kernel 513, stride M=16; synthesis M->M, kernel 33, stride 1. Both are
the same strided-dense-matmul shape as the polyphase kernels
(kernels/polyphase.py):

- analysis: ``y[c, t] = sum_k W[c, k] x_pad[t*M + k]`` — a [M, K'] x
  [K', Tt] matmul over M-strided windows of the raw signal, where
  ``K' = ceil(K/M)*M`` (kernel zero-padded right) and the conv's left
  padding is absorbed into the raw-signal pad (it need not be
  M-aligned). The alias sign mask (reverse_half) is fused on the output.
- synthesis: ``y[c, t] = sum_{m,l} Wm[c, m, l] x_pad[m, t + l]`` — the
  polyphase-synthesis frame build with the sign mask fused on the INPUT,
  the ``*M`` gain and band flip folded into the weights, and the output
  written band-major (the phase interleave happens in the streaming
  layer's reshape, which is free on the time-major result here: we emit
  [B, T, M] like the polyphase kernel).

Padding mode is the caller's: these kernels compute VALID convolutions
of pre-padded inputs, so offline (centered), causal, and streaming
(state-concatenated) modes all route through the same two kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqmf_tpu.kernels.polyphase import (
    _build_frames,
    _should_interpret,
    _sign_mask,
    supports,
)

__all__ = ["strided_analysis_conv", "dense_synthesis_conv"]

_FRAMES_VMEM_BYTES = 4 << 20


def _tile(tile, L, M, T_out):
    cap = max(128, _FRAMES_VMEM_BYTES // (L * M * 4))
    Tt = int(min(tile, cap, max(128, 1 << (T_out - 1).bit_length())))
    return Tt, -(-T_out // Tt)


def _ana_kernel(x_hbm, w_ref, out_ref, xw, frames, sem, *, M, Mout, L, Tt,
                mask_parity):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * Tt, xw.shape[-1])], xw, sem)
    copy.start()
    copy.wait()
    _build_frames(xw[:], frames, M, L, Tt)
    y = jax.lax.dot_general(
        w_ref[:], frames[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if mask_parity is not None:
        y = y * _sign_mask(Mout, Tt, mask_parity, y.dtype)
    out_ref[:] = y[None]


@functools.partial(jax.jit,
                   static_argnames=("M", "tile", "interpret", "fuse_mask"))
def strided_analysis_conv(x, w, M, tile=1024, interpret=None,
                          fuse_mask=True):
    """Valid stride-M conv of a pre-padded mono signal + optional fused
    reverse_half on the output.

    x: [B, 1, Tpad]; w: [Mb, 1, K] with Mb the output bands. Mb == M
    offline; under a band-sharded mesh each device passes its even-sized
    row shard of the bank (even so the fused sign mask's local band parity
    equals the global one). Returns [B, Mb, T_out] with
    ``T_out = (Tpad - K) // M + 1`` — equal to
    ``reverse_half(conv1d(x, w_full, stride=M, padding=0))[:, :Mb]``.
    """
    B, _, Tpad = x.shape
    Mb, _, K = w.shape
    assert supports(M)
    if fuse_mask and Mb % 2:
        raise ValueError("band shards must be even-sized (sign-mask parity)")
    T_out = (Tpad - K) // M + 1
    L = -(-K // M)  # kernel taps in M-sized rows
    Tt, nt = _tile(tile, L, M, T_out)
    win = Tt + -(-L // 128) * 128
    if L > 128:
        raise ValueError(
            f"halo L={L} wider than one lane tile; gate with supports()")
    Mb_pad = -(-Mb // 8) * 8  # sublane-aligned output rows

    # raw -> phase-rows reshape needs ((nt-1)*Tt + win) * M samples
    need = ((nt - 1) * Tt + win) * M
    xr = x[:, 0, :]
    if need > Tpad:
        xr = jnp.pad(xr, ((0, 0), (0, need - Tpad)))
    xr = xr[:, :need].reshape(B, need // M, M)
    xp = jnp.swapaxes(xr, 1, 2)  # [B, M, rows]

    w2 = jnp.pad(w[:, 0, :], ((0, Mb_pad - Mb), (0, L * M - K)))

    out = pl.pallas_call(
        functools.partial(_ana_kernel, M=M, Mout=Mb_pad, L=L, Tt=Tt,
                          mask_parity=0 if fuse_mask else None),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((Mb_pad, L * M), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mb_pad, Tt), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mb_pad, nt * Tt), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, win), x.dtype),
            pltpu.VMEM((L * M, Tt), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_should_interpret(interpret),
    )(xp, w2)
    return out[:, :Mb, :T_out]


def _syn_kernel(x_hbm, v_ref, out_ref, xw, frames, sem, *, M, Mout, L, Tt,
                in_mask_parity):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * Tt, xw.shape[-1])], xw, sem)
    copy.start()
    copy.wait()
    xv = xw[:]
    if in_mask_parity is not None:
        # reverse_half signs depend on each SOURCE sample's position, so
        # one mask multiply on the DMA window replaces a per-tap mask on
        # all L im2col slices (the per-tap version made this kernel 2.7x
        # slower than the analysis one in device traces)
        xv = xv * _sign_mask(M, xv.shape[-1], in_mask_parity, xv.dtype)
    _build_frames(xv, frames, M, L, Tt)
    y = jax.lax.dot_general(
        frames[:], v_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Tt, Mout]
    out_ref[:] = y[None]


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "fuse_mask",
                                    "x_offset"))
def dense_synthesis_conv(x, w, tile=1024, interpret=None, fuse_mask=True,
                         x_offset=0):
    """Valid stride-1 M->M conv of pre-padded sub-bands with the streaming
    synthesis post-amble fused: optional reverse_half on the input
    (``x_offset`` = index of x[..., 0] in the ORIGINAL unpadded signal,
    for the mask's time parity), ``*M`` gain, band flip, and time-major
    output so the phase interleave is a free reshape.

    x: [B, Mb, Tpad]; w: [M, Mb, K] with M the output phases (= full band
    count; also the reference's ``*M`` gain) and Mb the bands contracted
    here. Mb == M offline; under a band-sharded mesh each device passes
    its even-sized band shard of x and of the bank's band axis, and psums
    the partial outputs. Returns [B, T_out, M] with
    ``T_out = Tpad - K + 1`` — ``out.reshape(B, 1, T_out*M)`` equals
    ``interleave(flip(conv1d(reverse_half(x), w_full) * M))`` when
    Mb == M.
    """
    B, Mb, Tpad = x.shape
    M, Mw, K = w.shape
    assert supports(M)
    if Mw != Mb:
        raise ValueError(f"band dims disagree: x has {Mb}, bank has {Mw}")
    if fuse_mask and Mb % 2:
        raise ValueError("band shards must be even-sized (sign-mask parity)")
    T_out = Tpad - K + 1
    L = K
    if L > 128:
        raise ValueError(
            f"halo L={L} wider than one lane tile; gate with supports()")
    Mb_pad = -(-Mb // 8) * 8  # sublane-aligned frame row groups
    Tt, nt = _tile(tile, L, Mb_pad, T_out)
    win = Tt + -(-L // 128) * 128

    need = (nt - 1) * Tt + win
    x = jnp.pad(x, ((0, 0), (0, Mb_pad - Mb), (0, max(0, need - Tpad))))

    v2 = M * jnp.flip(w, axis=0)  # phase flip + full-M gain into weights
    v2 = jnp.transpose(v2, (0, 2, 1))  # [M, L, Mb]
    if Mb_pad > Mb:
        v2 = jnp.pad(v2, ((0, 0), (0, 0), (0, Mb_pad - Mb)))
    v2 = v2.reshape(M, L * Mb_pad)
    # v2[c, l*Mb + m] = M * w[M-1-c, m, l]; frames[l*Mb+m, t] = x[m, t+l]

    out = pl.pallas_call(
        functools.partial(
            _syn_kernel, M=Mb_pad, Mout=M, L=L, Tt=Tt,
            in_mask_parity=(x_offset % 2) if fuse_mask else None),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((M, L * Mb_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tt, M), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt * Tt, M), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Mb_pad, win), x.dtype),
            pltpu.VMEM((L * Mb_pad, Tt), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_should_interpret(interpret),
    )(x, v2)
    return out[:, :T_out, :]

"""Fused Pallas conv kernels — the compute core of the whole framework.

The streaming layer's convolutions (reference pqmf.py:316-333 via
cached_conv) are, at the default config: analysis 1->M channels,
kernel 513, stride M=16; synthesis M->M, kernel 33, stride 1. The
offline polyphase ops (kernels/polyphase.py) flatten to the same two
shapes, so everything routes through here.

**Time-grouped scheme** (the default whenever 128 % M == 0): an M=16
conv uses only 16 of the MXU's 128 rows. Grouping G = 128/M consecutive
outputs per matmul row-block fixes that — the conv becomes a stride-128
conv whose output channels are (time-group r, channel c) pairs:

- analysis: ``y[c, G*u + r] = sum_k W[c, k] x_pad[u*128 + r*M + k]`` —
  rows q = r*Mb + c of an extended weight matrix (taps shifted by r*M),
  windows of the raw signal de-interleaved to 128 rows (a free reshape).
- synthesis: input rows become (time-phase j, band m) pairs (one XLA
  transpose, fused into the producer in the full pipelines), output rows
  (time-group r, phase c); the band flip, ``*M`` gain, and reverse_half
  input sign pattern all fold into the extended weight matrix (the sign
  of source sample tau depends only on (m, tau mod 2) = (row, tap)
  parity when G is even — a pure weight scaling).

Each grid step double-buffers the haloed input window (DMA for tile i+1
overlaps tile i's compute) and accumulates ~5 dots of
``[128, 128] @ [128, Tt]`` instead of materializing an im2col scratch
(at 128 rows the accumulating form wins; at 16 rows it lost 3.4x, hence
the ungrouped fallback below keeps the frames scratch). Measured on the
60 s roundtrip: 1.68 ms (round 1) -> 0.81 ms.

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
    _dma_window,
    _should_interpret,
    _sign_mask,
    supports,
)

__all__ = ["strided_analysis_conv", "dense_synthesis_conv"]

_FRAMES_VMEM_BYTES = 4 << 20


def _tile(tile, L, M, T_out):
    cap = max(128, _FRAMES_VMEM_BYTES // (L * M * 4) // 128 * 128)
    Tt = int(min(tile, cap, max(128, 1 << (T_out - 1).bit_length())))
    return Tt, -(-T_out // Tt)


# ---------------------------------------------------------------------------
# time-grouped core: every conv here becomes a stride-128 conv whose output
# channels are (time-group r, original channel c) pairs — full MXU rows
# instead of M=16, and G outputs per matmul column. Measured 1.7x over the
# ungrouped im2col kernels in a same-window A/B (60 s analysis).
# ---------------------------------------------------------------------------


def _grouped_acc_kernel(x_hbm, w_ref, out_ref, xw2, sem2, *, S, L, Tt, nt):
    """acc over L row-blocks: y += W[:, l*S:(l+1)*S] @ xw[:, l:l+Tt].

    With only ~5 blocks of 128 rows each, accumulating dots beat the
    explicit im2col frames scratch (which was the right call at 16 rows x
    33 blocks); the rolled slice is the only way Mosaic accepts a
    lane-offset view.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
    xw = xw2[slot]
    W = xw.shape[-1]
    acc = None
    for l in range(L):
        sl = pltpu.roll(xw, W - l, axis=1)[:, :Tt] if l else xw[:, :Tt]
        y = jax.lax.dot_general(
            w_ref[:, l * S:(l + 1) * S], sl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = y if acc is None else acc + y
    out_ref[:] = acc[None]


def _grouped_matmul_conv(xr, w2, S, U, tile, interpret):
    """Generic grouped conv: output[u] = w2 @ xr-window(u*S, L*S).

    xr: [B, Traw] pre-padded; w2: [Q, L*S] with Q % 8 == 0; returns
    [B, Q, U].
    """
    B, Traw = xr.shape
    Q, LS = w2.shape
    L = LS // S
    Tt = int(min(tile, max(128, 1 << (U - 1).bit_length())))
    nt = -(-U // Tt)
    win = Tt + -(-L // 128) * 128
    need = ((nt - 1) * Tt + win) * S
    if need > Traw:
        xr = jnp.pad(xr, ((0, 0), (0, need - Traw)))
    xp = jnp.swapaxes(xr[:, :need].reshape(B, need // S, S), 1, 2)

    out = pl.pallas_call(
        functools.partial(_grouped_acc_kernel, S=S, L=L, Tt=Tt, nt=nt),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((Q, LS), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, Tt), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, nt * Tt), xr.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, S, win), xr.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_should_interpret(interpret),
    )(xp, w2)
    return out[:, :, :U]


def _ana_kernel(x_hbm, w_ref, out_ref, xw2, frames, sem2, *, M, Mout, L, Tt,
                nt, mask_parity):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
    _build_frames(xw2[slot], frames, M, L, Tt)
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
def strided_analysis_conv(x, w, M, tile=2048, interpret=None,
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

    G = 128 // M if 128 % M == 0 else 1
    if G >= 2 and (G * Mb) % 8 == 0:
        # time-grouped path: stride G*M = 128, output channels (r, c)
        S = G * M
        U = -(-T_out // G)
        K_ext = K + (G - 1) * M
        L = -(-K_ext // S)
        base = jnp.pad(w[:, 0, :], ((0, 0), (0, L * S - K)))
        # row group r shifts the taps by r*M (no wraparound: K_ext <= L*S)
        rows = jnp.stack([jnp.roll(base, r * M, axis=1) for r in range(G)])
        if fuse_mask:
            # reverse_half on the OUTPUT: -1 where band c odd and t even;
            # parity(t) = parity(r) since t = G*u + r with G even
            c = jnp.arange(Mb)
            r = jnp.arange(G)
            sign = jnp.where((c[None, :] % 2 == 1) & (r[:, None] % 2 == 0),
                             -1.0, 1.0).astype(x.dtype)
            rows = rows * sign[:, :, None]
        w2 = rows.reshape(G * Mb, L * S)
        out = _grouped_matmul_conv(x[:, 0, :], w2, S, U, tile, interpret)
        y = out.reshape(B, G, Mb, U)
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(B, Mb, U * G)
        return y[:, :, :T_out]

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
        functools.partial(_ana_kernel, M=M, Mout=Mb_pad, L=L, Tt=Tt, nt=nt,
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
            pltpu.VMEM((2, M, win), x.dtype),
            pltpu.VMEM((L * M, Tt), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_should_interpret(interpret),
    )(xp, w2)
    return out[:, :Mb, :T_out]


def _syn_kernel(x_hbm, v_ref, out_ref, xw2, frames, sem2, *, M, Mout, L, Tt,
                nt, in_mask_parity):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
    xv = xw2[slot]
    if in_mask_parity is not None:
        # reverse_half signs depend on each SOURCE sample's position, so
        # one mask multiply on the DMA window replaces a per-tap mask on
        # all L im2col slices (the per-tap version made this kernel 2.7x
        # slower than the analysis one in device traces)
        xv = xv * _sign_mask(M, xv.shape[-1], in_mask_parity, xv.dtype)
    _build_frames(xv, frames, M, L, Tt)
    # weights-major dot -> [Mout, Tt] (the [Tt, Mout] transposed-LHS form
    # measured 2x slower; the interleave transpose moved outside)
    y = jax.lax.dot_general(
        v_ref[:], frames[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Mout, Tt]
    out_ref[:] = y[None]


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "fuse_mask",
                                    "x_offset"))
def dense_synthesis_conv(x, w, tile=2048, interpret=None, fuse_mask=True,
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

    G = 128 // M if 128 % M == 0 else 1
    if G >= 2 and (G * Mb) % 8 == 0 and (G * M) % 8 == 0:
        # time-grouped path: input rows (j, m) = sub-band m at time-phase
        # j, output channels (r, c) = phase c at time-phase r
        S = G * Mb
        U = -(-T_out // G)
        L8 = -(-(K + G - 1) // G)
        w_eff = M * jnp.flip(w, axis=0)  # phase flip + full-M gain
        wt = jnp.pad(w_eff, ((0, 0), (0, 0), (0, L8 * G - K)))
        # stack[r, c, m, tap'] = w_eff[c, m, tap' - r] (tap' = G*l8 + j)
        stack = jnp.stack([jnp.roll(wt, r, axis=-1) for r in range(G)])
        if fuse_mask:
            # reverse_half on the INPUT source sample tau = G*(u+l8) + j:
            # parity(tau + x_offset) = parity(tap' + x_offset) for even G
            m = jnp.arange(Mb)
            tap = jnp.arange(L8 * G)
            sign = jnp.where(
                (m[:, None] % 2 == 1) & ((tap[None, :] + x_offset) % 2 == 0),
                -1.0, 1.0).astype(x.dtype)
            stack = stack * sign[None, None, :, :]
        # V[(r, c), (l8, j, m)] = stack[r, c, m, l8*G + j]
        v2 = stack.reshape(G, M, Mb, L8, G)
        v2 = jnp.transpose(v2, (0, 1, 3, 4, 2)).reshape(G * M, L8 * S)
        # xr raw stream: window u must cover xG[:, u : u + L8] where
        # xG[(j*Mb + m), v] = x[m, G*v + j] — i.e. x transposed to
        # time-phase-major and flattened time-major
        V = -(-max(Tpad, (U - 1 + L8) * G) // G)
        xs = jnp.pad(x, ((0, 0), (0, 0), (0, V * G - Tpad)))
        xG = jnp.transpose(xs.reshape(B, Mb, V, G), (0, 2, 3, 1))
        xr = xG.reshape(B, V * G * Mb)  # row-major (v, j, m): stride S per v
        out = _grouped_matmul_conv(xr, v2, S, U, tile, interpret)
        z = out.reshape(B, G, M, U)
        z = jnp.transpose(z, (0, 3, 1, 2)).reshape(B, U * G, M)
        return z[:, :T_out, :]  # [B, T_out, M]

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
            _syn_kernel, M=Mb_pad, Mout=M, L=L, Tt=Tt, nt=nt,
            in_mask_parity=(x_offset % 2) if fuse_mask else None),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((M, L * Mb_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, Tt), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, nt * Tt), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Mb_pad, win), x.dtype),
            pltpu.VMEM((L * Mb_pad, Tt), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_should_interpret(interpret),
    )(x, v2)
    return jnp.swapaxes(out[:, :, :T_out], 1, 2)  # [B, T_out, M]

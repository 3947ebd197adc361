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

__all__ = ["strided_analysis_conv", "dense_synthesis_conv",
           "fused_roundtrip_conv", "fused_roundtrip_supported"]

_FRAMES_VMEM_BYTES = 4 << 20

# trace-time switch for the slice kernel's bf16x3 operand split (whole
# window once vs per-tap slice); flipped only by tools/ab_split.py between
# fresh jax.jit closures — production callers always see the default
_SPLIT_WINDOW_ONCE = True

# trace-time probe switch: False skips the single-call kernel's synthesis
# window-assembly copies (output becomes garbage; timing isolates the
# assembly cost). Flipped only by tools/ab_asm.py between fresh jits.
_ASSEMBLE = True

# MXU pass count for the in-kernel dots (measured on the 60 s fused
# roundtrip: dots ~45 us/pass + ~0.21 ms pass-independent window/roll
# overhead):
# - "highest": full f32 contract — the parity default everywhere
#   (0.48 ms roundtrip);
# - "bf16x3": split-operand 3-pass scheme hi@hi + hi@lo + lo@hi with f32
#   accumulate (Mosaic lowers only DEFAULT/HIGHEST contract precision,
#   so X3 is built from single-pass dots by hand) — error ~2^-16 relative,
#   two orders below the filter design's own ripple floor (~0.35 ms);
# - "default": one bf16 pass — the fast-serving tier, matches the
#   pipelines' precision="default" DFT matmuls (~0.26 ms, ~49 dB).
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _split_bf16(a):
    """hi + lo bf16 decomposition of an f32 array (lo catches the next 8
    mantissa bits)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prec_dot(w, f, prec):
    """[Q, K] @ [K, T] -> [Q, T] f32 at the named precision tier."""
    dn = (((1,), (0,)), ((), ()))
    if prec in ("bf16x3", "high"):
        wh, wl = _split_bf16(w)
        fh, fl = _split_bf16(f)

        def d(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.float32)

        return d(wh, fh) + d(wh, fl) + d(wl, fh)
    return jax.lax.dot_general(w, f, dn,
                               preferred_element_type=jnp.float32,
                               precision=_PRECISIONS[prec])


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


def _dma_window_tm(x_hbm, b, i, Tt, xw2, sem2, nt):
    """Double-buffered fetch of a time-major window: x_hbm [B, cols, S],
    scratch slots [win, S] (the kernel transposes in VMEM). Dynamic
    offsets live on the second-to-last dim, so the 128-lane alignment
    rule is satisfied by the full minor dim."""
    win = xw2.shape[1]
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, win), :], xw2.at[0], sem2.at[0]).start()

    @pl.when(i + 1 < nt)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds((i + 1) * Tt, win), :], xw2.at[nxt],
            sem2.at[nxt]).start()

    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * Tt, win), :], xw2.at[slot],
        sem2.at[slot]).wait()
    return slot


def _grouped_acc_kernel(x_hbm, w_ref, out_ref, xw2, sem2, *, S, L, Tt, nt,
                        prec, tm, wave):
    """acc over L row-blocks: y += W[:, l*S:(l+1)*S] @ xw[:, l:l+Tt].

    With only ~5 blocks of 128 rows each, accumulating dots beat the
    explicit im2col frames scratch (which was the right call at 16 rows x
    33 blocks); the rolled slice is the only way Mosaic accepts a
    lane-offset view.

    ``tm``: the HBM input is time-major [cols, S]; the window transposes
    to [S, win] in VMEM — replacing a whole-signal XLA transpose pass
    with a per-tile VPU transpose. ``wave``: the output tile is stored
    transposed [Tt, Q]; since output row q = r*M + c and column u map to
    flat sample u*S + q, the [U, Q] result IS the interleaved waveform
    (another XLA pass gone).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    if tm:
        slot = _dma_window_tm(x_hbm, b, i, Tt, xw2, sem2, nt)
        xw = jnp.swapaxes(xw2[slot], 0, 1)
    else:
        slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
        xw = xw2[slot]
    W = xw.shape[-1]
    dn = (((1,), (0,)), ((), ()))
    if prec in ("bf16x3", "high"):
        # roll in f32 (Mosaic's rotate is 32-bit only), split each rolled
        # slice to (hi, lo) bf16; 3 single-pass dots per row block
        wh, wl = _split_bf16(w_ref[:])
        acc = None
        for l in range(L):
            sl = pltpu.roll(xw, W - l, axis=1)[:, :Tt] if l else xw[:, :Tt]
            sh, so = _split_bf16(sl)
            whb = wh[:, l * S:(l + 1) * S]
            wlb = wl[:, l * S:(l + 1) * S]
            y = (jax.lax.dot_general(whb, sh, dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(whb, so, dn,
                                       preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(wlb, sh, dn,
                                       preferred_element_type=jnp.float32))
            acc = y if acc is None else acc + y
    else:
        acc = None
        for l in range(L):
            sl = pltpu.roll(xw, W - l, axis=1)[:, :Tt] if l else xw[:, :Tt]
            y = jax.lax.dot_general(
                w_ref[:, l * S:(l + 1) * S], sl,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=_PRECISIONS[prec],
            )
            acc = y if acc is None else acc + y
    out_ref[:] = (jnp.swapaxes(acc, 0, 1) if wave else acc)[None]


def _slice_dots(xw, wt, L, S, Tt, prec, off=0):
    """The slice scheme's dot sequence: ``acc[Tt, Q] = sum_l
    xw[off+l : off+l+Tt, :] @ wt[l*S:(l+1)*S, :]`` at the named
    precision tier. Sublane-shifted operands are free on this chip
    (tools/mxu_floor2.py); for bf16x3 the operand split is hoisted to
    one whole-window pass (same-window wash vs per-slice, but strictly
    less VPU work — tools/ab_split.py)."""
    dn = (((1,), (0,)), ((), ()))
    if prec in ("bf16x3", "high"):
        wh, wl = _split_bf16(wt)
        if _SPLIT_WINDOW_ONCE:
            xwh, xwl = _split_bf16(xw)
        acc = None
        for l in range(L):
            if _SPLIT_WINDOW_ONCE:
                ah = xwh[off + l:off + l + Tt, :]
                al = xwl[off + l:off + l + Tt, :]
            else:
                ah, al = _split_bf16(xw[off + l:off + l + Tt, :])
            whb = wh[l * S:(l + 1) * S, :]
            wlb = wl[l * S:(l + 1) * S, :]
            y = (jax.lax.dot_general(ah, whb, dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(ah, wlb, dn,
                                       preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(al, whb, dn,
                                       preferred_element_type=jnp.float32))
            acc = y if acc is None else acc + y
        return acc
    acc = None
    for l in range(L):
        y = jax.lax.dot_general(
            xw[off + l:off + l + Tt, :], wt[l * S:(l + 1) * S, :],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[prec],
        )
        acc = y if acc is None else acc + y
    return acc


def _grouped_slice_kernel(x_hbm, wt_ref, out_ref, xw2, sem2, *, S, L, Tt,
                          nt, prec, tm, wave):
    """Row-sliced variant of :func:`_grouped_acc_kernel` (the round-3
    roofline attempt): keep the window TIME-major [win, S] and accumulate
    ``acc[Tt, Q] += xw[l:l+Tt, :] @ Wt[l]`` — the l-offsets are whole
    128-sample time units, i.e. SUBLANE offsets of the time-major window,
    so the per-l lane rotations (pltpu.roll) of the lane-major form
    disappear entirely. The dot runs transposed ([Tt, S] @ [S, Q]); with
    Q = 128 output lanes the store is full-width (the historical 2x
    penalty applied to 16-lane stores). "wave" output needs no final
    transpose (acc IS time-major); "rows" transposes once per tile.
    wt_ref: [L*S, Q] = per-block transposed weights."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    if tm:
        slot = _dma_window_tm(x_hbm, b, i, Tt, xw2, sem2, nt)
        xw = xw2[slot]  # [win, S] time-major already
    else:
        slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
        xw = jnp.swapaxes(xw2[slot], 0, 1)  # one transpose, zero rolls
    acc = _slice_dots(xw, wt_ref[:], L, S, Tt, prec)
    out_ref[:] = (acc if wave else jnp.swapaxes(acc, 0, 1))[None]


def _grouped_matmul_conv(x, w2, S, U, tile, interpret, layout="flat",
                         mxu_precision="highest", out_layout="rows",
                         scheme="roll"):
    """Generic grouped conv: output[u] = w2 @ x-window(u*S, L*S).

    layout "flat": x [B, Traw] pre-padded row-major (col, s) — one XLA
    transpose builds the [B, S, cols] kernel input. layout "time": same
    x, but the (col, s) -> (s, col) transpose happens per-window INSIDE
    the kernel (a free reshape feeds [B, cols, S]); measured cheaper than
    the whole-signal XLA pass. layout "cols": x [B, S, V] already
    column-major (the grouped layout itself — e.g. the output of another
    grouped conv); columns are zero-extended to the window coverage.
    layout "time_cols": x [B, V, S] — the same grouped signal but
    TIME-major (a "wave"-layout producer feeds it directly); rows are
    zero-extended, the DMA window is [win, S] as-is and the slice
    kernel needs no per-window VMEM transpose.
    w2: [Q, L*S] with Q % 8 == 0.

    out_layout "rows": returns [B, Q, U]. out_layout "wave": the kernel
    stores each tile transposed and this returns [B, U, Q] — for the
    synthesis weights' (r, c) row order, ``reshape(B, U*Q)`` is the
    interleaved waveform with no XLA transpose pass.
    """
    if scheme not in ("roll", "slice"):
        # a typo'd scheme silently benchmarking the roll kernel would make
        # every A/B built on this flag meaningless
        raise ValueError(f"unknown scheme {scheme!r}: expected 'roll' or "
                         f"'slice'")
    Q, LS = w2.shape
    L = LS // S
    Tt = int(min(tile, max(128, 1 << (U - 1).bit_length())))
    nt = -(-U // Tt)
    win = Tt + -(-L // 128) * 128
    cols = (nt - 1) * Tt + win
    tm = layout in ("time", "time_cols")
    if layout == "cols":
        B, _, V = x.shape
        xp = (jnp.pad(x, ((0, 0), (0, 0), (0, cols - V)))
              if cols > V else x[:, :, :cols])
    elif layout == "time_cols":
        B, V, _ = x.shape
        xp = (jnp.pad(x, ((0, 0), (0, cols - V), (0, 0)))
              if cols > V else x[:, :cols, :])
    else:
        B, Traw = x.shape
        need = cols * S
        xr = jnp.pad(x, ((0, 0), (0, need - Traw))) if need > Traw else x
        xp = xr[:, :need].reshape(B, need // S, S)  # free
        if not tm:
            xp = jnp.swapaxes(xp, 1, 2)

    wave = out_layout == "wave"
    if wave:
        out_spec = pl.BlockSpec((1, Tt, Q), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, nt * Tt, Q), xp.dtype)
    else:
        out_spec = pl.BlockSpec((1, Q, Tt), lambda b, i: (b, 0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Q, nt * Tt), xp.dtype)
    if scheme == "slice":
        kern = functools.partial(_grouped_slice_kernel, S=S, L=L, Tt=Tt,
                                 nt=nt, prec=mxu_precision, tm=tm,
                                 wave=wave)
        # per-block transposed weights [L*S, Q]
        w_in = jnp.transpose(w2.reshape(Q, L, S), (1, 2, 0)).reshape(LS, Q)
        w_spec = pl.BlockSpec((LS, Q), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_grouped_acc_kernel, S=S, L=L, Tt=Tt,
                                 nt=nt, prec=mxu_precision, tm=tm,
                                 wave=wave)
        w_in = w2
        w_spec = pl.BlockSpec((Q, LS), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            w_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, win, S) if tm else (2, S, win), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the in-kernel window transpose ("time") / tile-store transpose
        # ("wave") temporaries push the Mosaic stack past the default
        # 16 MB scoped-vmem limit at tile=2048; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(interpret),
    )(xp, w_in)
    return out[:, :U, :] if wave else out[:, :, :U]


def _ana_kernel(x_hbm, w_ref, out_ref, xw2, frames, sem2, *, M, Mout, L, Tt,
                nt, mask_parity, prec):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt)
    _build_frames(xw2[slot], frames, M, L, Tt)
    y = _prec_dot(w_ref[:], frames[:], prec)
    if mask_parity is not None:
        y = y * _sign_mask(Mout, Tt, mask_parity, y.dtype)
    out_ref[:] = y[None]


def _ana_grouped_weights(w, M, G, fuse_mask, dtype):
    """Extended analysis weight matrix for the time-grouped scheme:
    rows q = r*Mb + c with group r's taps shifted by r*M; the fused
    reverse_half output mask folds in as a row sign. Returns (w2, S, L)."""
    Mb, _, K = w.shape
    S = G * M
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
                         -1.0, 1.0).astype(dtype)
        rows = rows * sign[:, :, None]
    return rows.reshape(G * Mb, L * S), S, L


@functools.partial(jax.jit,
                   static_argnames=("M", "tile", "interpret", "fuse_mask",
                                    "out_layout", "mxu_precision",
                                    "scheme"))
def strided_analysis_conv(x, w, M, tile=2048, interpret=None,
                          fuse_mask=True, out_layout="bands",
                          mxu_precision="highest", scheme="roll"):
    """Valid stride-M conv of a pre-padded mono signal + optional fused
    reverse_half on the output.

    x: [B, 1, Tpad]; w: [Mb, 1, K] with Mb the output bands. Mb == M
    offline; under a band-sharded mesh each device passes its even-sized
    row shard of the bank (even so the fused sign mask's local band parity
    equals the global one). Returns [B, Mb, T_out] with
    ``T_out = (Tpad - K) // M + 1`` — equal to
    ``reverse_half(conv1d(x, w_full, stride=M, padding=0))[:, :Mb]``.

    ``out_layout="grouped"`` (time-grouped path only) returns the raw
    grouped output [B, G*Mb, U] instead — rows (r, c) = band c at
    sub-band time G*u + r — skipping the band re-interleave transpose;
    columns past T_out in the last group carry edge-conv values the
    caller must mask (see fused_roundtrip_conv).
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
        w2, S, _ = _ana_grouped_weights(w, M, G, fuse_mask, x.dtype)
        U = -(-T_out // G)
        out = _grouped_matmul_conv(x[:, 0, :], w2, S, U, tile, interpret,
                                   layout="time",
                                   mxu_precision=mxu_precision,
                                   scheme=scheme)
        if out_layout == "grouped":
            return out
        y = out.reshape(B, G, Mb, U)
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(B, Mb, U * G)
        return y[:, :, :T_out]
    if out_layout == "grouped":
        raise ValueError("grouped layout needs the time-grouped path "
                         f"(128 % M == 0, (128//M)*Mb % 8 == 0; M={M})")

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
                          mask_parity=0 if fuse_mask else None,
                          prec=mxu_precision),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
                nt, in_mask_parity, prec):
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
    y = _prec_dot(v_ref[:], frames[:], prec)
    out_ref[:] = y[None]


def _syn_grouped_weights(w, G, fuse_mask, x_offset, dtype):
    """Extended synthesis weight matrix for the time-grouped scheme:
    output rows (r, c) = phase c at time-phase r, contraction over
    (l8, j, m) = sub-band m at source time-phase j in column block l8;
    the band flip, full-M gain, and (optionally) the reverse_half INPUT
    sign pattern fold in. Returns (v2, S, L8)."""
    M, Mb, K = w.shape
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
            -1.0, 1.0).astype(dtype)
        stack = stack * sign[None, None, :, :]
    # V[(r, c), (l8, j, m)] = stack[r, c, m, l8*G + j]
    v2 = stack.reshape(G, M, Mb, L8, G)
    v2 = jnp.transpose(v2, (0, 1, 3, 4, 2)).reshape(G * M, L8 * G * Mb)
    return v2, G * Mb, L8


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "fuse_mask",
                                    "x_offset", "mxu_precision", "scheme"))
def dense_synthesis_conv(x, w, tile=2048, interpret=None, fuse_mask=True,
                         x_offset=0, mxu_precision="highest",
                         scheme="roll"):
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
        v2, S, L8 = _syn_grouped_weights(w, G, fuse_mask, x_offset, x.dtype)
        U = -(-T_out // G)
        # window u must cover xp[:, u : u + L8] where
        # xp[(j*Mb + m), v] = x[m, G*v + j] — ONE transpose builds it
        # (the earlier two-step xG form measured 0.48 vs 0.38 ms on the
        # 60 s signal; the permute composition was not being fused)
        V = -(-max(Tpad, (U - 1 + L8) * G) // G)
        xs = jnp.pad(x, ((0, 0), (0, 0), (0, V * G - Tpad)))
        xp = jnp.transpose(xs.reshape(B, Mb, V, G), (0, 3, 1, 2))
        xp = xp.reshape(B, S, V)
        out = _grouped_matmul_conv(xp, v2, S, U, tile, interpret,
                                   layout="cols",
                                   mxu_precision=mxu_precision,
                                   out_layout="wave", scheme=scheme)
        # wave rows (u, (r, c)) ARE time-major samples: free reshape
        return out.reshape(B, U * G, M)[:, :T_out, :]  # [B, T_out, M]

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
            in_mask_parity=(x_offset % 2) if fuse_mask else None,
            prec=mxu_precision),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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


def _fused_rt_kernel(x_hbm, wa_ref, ws_ref, out_ref, xw2, ring, synw, sem2,
                     *, La, Ls, Tt, nt_a, nt_s, prec, pl_g, base,
                     Ua_last, remM):
    """Whole round trip in ONE pallas_call (tools/mxu_floor3.py found
    the two-call residual = XLA glue copies + the mid's HBM round trip
    + a second kernel launch, all precision-independent).

    Grid step (b, i): analysis tile i -> a 3-slot VMEM ring; synthesis
    tile j = i-1 assembles its halo window from ring slots j-1, j, j+1
    (the one computed THIS step) — the sub-band intermediate never
    touches HBM, and the composed path's mid trim / last-group zeroing
    / left pad become in-kernel masks and index shifts. ``base`` aligns
    the window's big middle copy to the f32 sublane tile
    ((base + pl_g) % 8 == 0); the dots read logical row r at physical
    row base + r (sublane-shifted reads are free, tools/mxu_floor2.py).
    Tile lifetime: tile t is last read by synthesis window t+1 at step
    t+2; its slot is rewritten at step t+3."""
    S = 128
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i < nt_a)
    def _():
        slot = _dma_window_tm(x_hbm, b, i, Tt, xw2, sem2, nt_a)
        acc = _slice_dots(xw2[slot], wa_ref[:], La, S, Tt, prec)
        # the composed path trims the analysis output at Ua rows and
        # zeros the partial last group's columns; same, in-register
        ri = jax.lax.broadcasted_iota(jnp.int32, (Tt, S), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (Tt, S), 1)
        bad = (ri >= Ua_last) | ((ri == Ua_last - 1) & (ci >= remM))
        acc = jnp.where((i == nt_a - 1) & bad, 0.0, acc)
        ring[jax.lax.rem(i, 3)] = acc

    @pl.when((i >= 1) & (i <= nt_s))
    def _():
        j = i - 1
        # assemble the synthesis window: logical rows [0, Tt+128) =
        # left-padded mid rows [j*Tt, j*Tt + Tt + 128), i.e. mid rows
        # shifted by -pl_g, with out-of-range rows zero
        if pl_g and _ASSEMBLE:
            # tile j-1 exists only for 1 <= j <= nt_a (tile nt_a-1's
            # rows past Ua_last were zero-masked at write time); past
            # that the ring slot was never written — must be zeros
            @pl.when((j >= 1) & (j <= nt_a))
            def _():
                synw[base:base + pl_g] = \
                    ring[jax.lax.rem(j - 1, 3)][Tt - pl_g:]

            @pl.when((j == 0) | (j > nt_a))
            def _():
                synw[base:base + pl_g] = jnp.zeros((pl_g, S), synw.dtype)

        if _ASSEMBLE:
            @pl.when(j < nt_a)
            def _():
                synw[base + pl_g:base + pl_g + Tt] = \
                    ring[jax.lax.rem(j, 3)][:]

            @pl.when(j >= nt_a)
            def _():
                synw[base + pl_g:base + pl_g + Tt] = \
                    jnp.zeros((Tt, S), synw.dtype)

        if not _ASSEMBLE:
            # keep the ring live (one row) so the analysis arm can't be
            # dead-code-eliminated out of the probe's False arm
            synw[base:base + 1] = ring[jax.lax.rem(j, 3)][:1]

        tail = 128 - pl_g
        if tail and _ASSEMBLE:
            @pl.when(j + 1 < nt_a)
            def _():
                synw[base + pl_g + Tt:] = \
                    ring[jax.lax.rem(j + 1, 3)][0:tail]

            @pl.when(j + 1 >= nt_a)
            def _():
                synw[base + pl_g + Tt:] = jnp.zeros((tail, S), synw.dtype)

        acc = _slice_dots(synw[:], ws_ref[:], Ls, S, Tt, prec, off=base)
        out_ref[:] = acc[None]


def _fused_roundtrip_single(x, w_ana, w_syn, M, syn_pad, tile, interpret,
                            prec):
    """Driver for :func:`_fused_rt_kernel` — same contract as the
    two-call body of :func:`fused_roundtrip_conv` (slice scheme),
    bit-identical to it (same dot operands in the same order)."""
    B, _, Tpad = x.shape
    Ka = w_ana.shape[-1]
    Ks = w_syn.shape[-1]
    G = 128 // M
    pl_, pr_ = syn_pad
    T_ana = (Tpad - Ka) // M + 1
    Ua = -(-T_ana // G)
    T_out = pl_ + T_ana + pr_ - Ks + 1
    Us = -(-T_out // G)
    S = 128
    w2a, Sa, La = _ana_grouped_weights(w_ana, M, G, False, x.dtype)
    v2, Ss, Ls = _syn_grouped_weights(w_syn, G, False, 0, x.dtype)
    Qa, Qs = w2a.shape[0], v2.shape[0]
    wa = jnp.transpose(w2a.reshape(Qa, La, Sa),
                       (1, 2, 0)).reshape(La * Sa, Qa)
    ws = jnp.transpose(v2.reshape(Qs, Ls, Ss),
                       (1, 2, 0)).reshape(Ls * Ss, Qs)
    Tt = int(min(tile, max(128, 1 << (max(Ua, Us) - 1).bit_length())))
    nt_a, nt_s = -(-Ua // Tt), -(-Us // Tt)
    win = Tt + 128
    cols = (nt_a - 1) * Tt + win
    need = cols * S
    xr = x[:, 0, :]
    xr = (jnp.pad(xr, ((0, 0), (0, need - Tpad))) if need > Tpad
          else xr[:, :need])
    xp = xr.reshape(B, cols, S)
    pl_g = pl_ // G
    base = (8 - pl_g % 8) % 8
    rem = T_ana - (Ua - 1) * G
    Ua_last = Ua - (nt_a - 1) * Tt
    remM = rem * M if rem < G else S
    out = pl.pallas_call(
        functools.partial(_fused_rt_kernel, La=La, Ls=Ls, Tt=Tt,
                          nt_a=nt_a, nt_s=nt_s, prec=prec, pl_g=pl_g,
                          base=base, Ua_last=Ua_last, remM=remM),
        grid=(B, max(nt_a, nt_s + 1)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((La * Sa, Qa), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls * Ss, Qs), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tt, Qs),
                               lambda b, i: (b, jnp.maximum(i - 1, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt_s * Tt, Qs), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win, S), x.dtype),
            pltpu.VMEM((3, Tt, S), x.dtype),
            pltpu.VMEM((base + win, S), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(interpret),
    )(xp, wa, ws)
    z = out[:, :Us, :]
    return z.reshape(B, Us * G, M)[:, :T_out, :]


def fused_roundtrip_supported(M: int, syn_pad_left: int) -> bool:
    """The grouped pass-through round trip needs the time-grouped scheme
    on both convs and a group-aligned synthesis left pad."""
    if 128 % M or not supports(M):
        return False
    G = 128 // M
    return G >= 2 and (G * M) % 8 == 0 and syn_pad_left % G == 0


@functools.partial(jax.jit,
                   static_argnames=("M", "syn_pad", "tile", "interpret",
                                    "mxu_precision", "scheme", "mid",
                                    "calls"))
def fused_roundtrip_conv(x, w_ana, w_syn, M, syn_pad, tile=2048,
                         interpret=None, mxu_precision="highest",
                         scheme="slice", mid="time", calls="single"):
    """Analysis -> synthesis round trip with the sub-bands kept in the
    time-grouped layout in between.

    The grouped analysis output — rows (r, c) = band c at sub-band time
    G*u + r — is EXACTLY the layout the grouped synthesis kernel consumes
    (rows (j, m)), so the band re-interleave transpose after analysis and
    the time-phase interleave transpose before synthesis (0.48 ms alone
    on a 60 s signal — more than either kernel) both vanish; and since
    ``reverse_half`` is applied twice in a round trip (after analysis,
    before synthesis; reference pqmf.py:257, 283) and is its own inverse,
    neither kernel applies the sign mask.

    x: [B, 1, Tpad] pre-padded for the analysis conv (stride M, kernel
    w_ana [M, 1, Ka]); w_syn: [M, M, Ks]; syn_pad = (left, right) zero
    padding of the sub-band signal before the stride-1 synthesis conv,
    with left % (128//M) == 0 (see fused_roundtrip_supported).
    Returns [B, T_syn_out, M] time-major, equal to

        dense_synthesis_conv(pad(strided_analysis_conv(x, w_ana, M),
                                 syn_pad), w_syn)

    with both fuse_masks on (the masks cancel elementwise before the
    weights touch the data) — bit-exact with scheme="roll" (and on CPU
    interpret always); the default scheme="slice" computes transposed
    MXU dots that round differently at the f32 epsilon level (~2e-7)
    on the chip, ~5% faster (same-window A/B, tools/ab_schemes.py).

    ``mid`` selects the layout of the sub-band intermediate between the
    two kernels: "time" (default) stores the analysis tiles TIME-major
    ("wave" [B, Ua, Q]) and feeds the synthesis through the "time_cols"
    input path — the analysis store-transpose and the synthesis
    per-window VMEM transpose both vanish (the dot operands are
    identical, so each scheme's output is bit-identical to mid="cols",
    the round-2 layout kept for A/B: tools/ab_mid.py).

    ``calls="single"`` (the default; slice scheme only, else the
    two-call body runs) fuses the whole round trip into ONE pallas_call
    (:func:`_fused_rt_kernel`): the sub-band intermediate lives in a
    VMEM ring instead of HBM and the XLA glue between the kernels (mid
    trim/zero/left-pad copy passes) becomes in-kernel index math — same
    dot operands in the same order, so the output is bit-identical to
    ``calls="two"`` (asserted on chip and in tests). Measured 1.02-1.03x
    over two calls, same window, both tiers (tools/ab_calls.py) — the
    mid's HBM round trip was largely hidden by the DMA pipeline, so the
    win is the glue pass + launch, not bandwidth.
    """
    B, _, Tpad = x.shape
    Mb, _, Ka = w_ana.shape
    Ks = w_syn.shape[-1]
    if Mb != M or w_syn.shape[0] != M or w_syn.shape[1] != M:
        raise ValueError("fused round trip is full-bank only (Mb == M)")
    G = 128 // M if 128 % M == 0 else 1
    pl_, pr_ = syn_pad
    if not (G >= 2 and (G * M) % 8 == 0 and pl_ % G == 0):
        raise ValueError(
            f"unsupported fused-roundtrip geometry (M={M}, left pad {pl_});"
            " gate with fused_roundtrip_supported()")
    T_ana = (Tpad - Ka) // M + 1

    if mid not in ("time", "cols"):
        raise ValueError(f"unknown mid {mid!r}: expected 'time' or 'cols'")
    if calls not in ("single", "two"):
        raise ValueError(f"unknown calls {calls!r}: expected 'single' or "
                         f"'two'")
    if calls == "single" and scheme == "slice" and 0 <= pl_ // G <= 128:
        return _fused_roundtrip_single(x, w_ana, w_syn, M, syn_pad, tile,
                                       interpret, mxu_precision)
    tm_mid = mid == "time"
    w2a, Sa, _ = _ana_grouped_weights(w_ana, M, G, False, x.dtype)
    Ua = -(-T_ana // G)
    ga = _grouped_matmul_conv(x[:, 0, :], w2a, Sa, Ua, tile, interpret,
                              layout="time",
                              out_layout="wave" if tm_mid else "rows",
                              mxu_precision=mxu_precision, scheme=scheme)

    # the last group's rows past T_ana hold edge-conv values (the
    # analysis window still overlaps real samples there); the composed
    # path trims them and re-pads with true zeros — zero them here
    rem = T_ana - (Ua - 1) * G
    if rem < G:
        ga = (ga.at[:, Ua - 1, rem * M:].set(0.0) if tm_mid
              else ga.at[:, rem * M:, Ua - 1].set(0.0))

    v2, Ss, _ = _syn_grouped_weights(w_syn, G, False, 0, x.dtype)
    ga = jnp.pad(ga, ((0, 0), (pl_ // G, 0), (0, 0)) if tm_mid
                 else ((0, 0), (0, 0), (pl_ // G, 0)))
    T_out = pl_ + T_ana + pr_ - Ks + 1
    Us = -(-T_out // G)
    z = _grouped_matmul_conv(ga, v2, Ss, Us, tile, interpret,
                             layout="time_cols" if tm_mid else "cols",
                             mxu_precision=mxu_precision, out_layout="wave",
                             scheme=scheme)
    # wave rows (u, (r, c)) ARE time-major samples: free reshape
    return z.reshape(B, Us * G, M)[:, :T_out, :]

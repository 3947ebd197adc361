"""Fused Pallas polyphase analysis/synthesis (public ops + shared helpers).

The reference's hot path is two conv1ds (pqmf.py:129, 152) surrounded by
rearranges, a sign mask, a band flip, a gain, and a delay trim. The
polyphase conv is exactly a strided dense matmul on the raw signal:
``y[:, t] = W2 @ x_raw[(t - L/2)*M : (t - L/2)*M + L*M]`` (window stride
M, length L*M), since ``(t+l)*M + m = t*M + (l*M + m)`` — which is the
same shape as the CachedPQMF conv geometry, so both public ops here are
thin adapters over the generic time-grouped Mosaic kernels in
``kernels/cached_conv.py`` (see that module's docstring for the kernel
scheme): the bank flattens to raw conv weights, the reference's centered
pads/trims become explicit input padding, and the alias-cancellation
sign mask, band flip, ``*M`` gain and ``2M`` delay trim are all folded
into the weight matrix / index math. HBM traffic per direction = one
read of the input + one write of the output (plus one transpose pass
for the group re-interleave, which XLA fuses into neighboring ops in
the full pipelines).

Numerics match ``pqmf_tpu.ops.filterbank.polyphase_forward/inverse``
(lax path) to float32 round-off; tests assert equality in interpret mode
on CPU and natively on TPU.

Constraint: n_band must be a multiple of 8 (f32 sublane) for the aligned
scratch stores; callers fall back to the lax path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["polyphase_analysis", "polyphase_synthesis",
           "polyphase_roundtrip", "roundtrip_supported",
           "pallas_available", "supports"]

DEFAULT_TILE = 2048


def pallas_available() -> bool:
    """True when the default JAX backend can run these kernels natively."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def supports(n_band: int, halos=()) -> bool:
    """Shape constraints for the native kernels.

    A band count runs natively when EITHER path's alignment holds:

    - time-grouped path (the default): ``128 % M == 0`` with
      ``G = 128/M >= 2`` and ``G*M % 8 == 0`` — the grouped conv's
      output rows are (time-group, band) pairs, so only the PRODUCT
      must be sublane-aligned. This admits every power-of-two
      ``M <= 64`` incl. the reference's small M=2/M=4 configs
      (pqmf.py:220-224; BASELINE.md's M=4 95-tap prototype) — round 4
      relaxed the old blanket ``n_band % 8`` gate, which was an
      ungrouped-path constraint applied to everything.
    - ungrouped im2col fallback: ``n_band % 8 == 0`` (the frames
      scratch stores one M-row group per tap, each must be
      sublane-aligned).

    Additionally every halo ``L`` (taps per phase: P/M for the polyphase
    kernels, ceil(K/M) / K for the cached analysis/synthesis convs) must
    fit in one lane tile (<= 128); longer prototypes fall back to lax.

    Auto-dispatch callers pass their geometry's halos so unsupported
    shapes degrade to ``lax.conv`` instead of failing inside the kernel.
    """
    G = 128 // n_band if n_band > 0 and 128 % n_band == 0 else 1
    grouped_ok = G >= 2 and (G * n_band) % 8 == 0
    if n_band % 8 and not grouped_ok:
        return False
    return all(int(h) <= 128 for h in halos)


def check_band_mesh(mesh, n_band: int):
    """Validate a (data, band) mesh for the band-partitioned kernels: the
    band axis must divide ``n_band`` into even shards (the fused
    reverse_half sign mask needs local band parity == global). Returns the
    mesh (or None) so callers can store the validated value."""
    if mesh is None:
        return None
    if len(mesh.axis_names) != 2:
        raise ValueError(
            f"expected a 2-axis (data, band) mesh, got {mesh.axis_names}")
    band = mesh.shape[mesh.axis_names[1]]
    if n_band % band or (n_band // band) % 2:
        raise ValueError(
            f"band axis size {band} must divide n_band={n_band} "
            f"into even shards for the Pallas kernels")
    return mesh


def _should_interpret(interpret):
    if interpret is None:
        return not pallas_available()
    return bool(interpret)


def _sign_mask(M, Tt, parity, dtype):
    """reverse_half mask for a [M, Tt] tile: -1 where band odd and
    (t + parity) even. Built from iota (traced — pallas_call rejects
    captured constants). Static pattern because Tt is even."""
    band = jax.lax.broadcasted_iota(jnp.int32, (M, Tt), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (M, Tt), 1)
    neg = (band % 2 == 1) & ((t + int(parity) % 2) % 2 == 0)
    return jnp.where(neg, -1.0, 1.0).astype(dtype)


def _build_frames(xw, frames_ref, M, L, Tt):
    """frames_ref[l*M + m, t] = xw[m, t + l]."""
    W = xw.shape[-1]
    for l in range(L):
        # left-roll by l == right-roll by W - l (pltpu.roll wants shift >= 0)
        sl = pltpu.roll(xw, W - l, axis=1)[:, :Tt] if l else xw[:, :Tt]
        frames_ref[l * M:(l + 1) * M, :] = sl


def _dma_window(x_hbm, b, i, Tt, xw2, sem2, nt):
    """Double-buffered HBM->VMEM fetch of the tile-i haloed window.

    Grid steps run sequentially on TPU, so starting tile i+1's copy into
    the other slot before computing tile i overlaps the DMA with the
    frame build + matmul (measured ~17% on the 60 s analysis). Returns
    the slot index holding tile i's data.
    """
    win = xw2.shape[-1]
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(0, win)], xw2.at[0], sem2.at[0]).start()

    @pl.when(i + 1 < nt)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds((i + 1) * Tt, win)], xw2.at[nxt],
            sem2.at[nxt]).start()

    pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * Tt, win)], xw2.at[slot],
        sem2.at[slot]).wait()
    return slot


# ---------------------------------------------------------------------------
# public ops: thin adapters over the generic conv kernels
# ---------------------------------------------------------------------------
#
# The polyphase conv is the same strided-dense-matmul as the cached-conv
# geometry (see module docstring identity), so both directions route
# through kernels/cached_conv.py's generic (time-grouped) kernels with
# the polyphase bank flattened to raw conv weights and the reference's
# centered pads/trims expressed as explicit input padding.


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "fuse_mask",
                                    "mxu_precision"))
def polyphase_analysis(x, hk_poly, tile=DEFAULT_TILE, interpret=None,
                       fuse_mask=True, mxu_precision="highest"):
    """Fused polyphase analysis + reverse_half.

    x: [B, 1, T] (T divisible by M); hk_poly: [Mb, M, L] where M is the
    phase count (= full band count) and Mb the output bands computed here.
    Mb == M offline; under a band-sharded mesh each device passes its
    even-sized row shard of the bank (Mb must be even so the local band
    parity of the fused sign mask equals the global one).
    Returns [B, Mb, T/M] — equal to
    ``reverse_half(polyphase_forward(x, hk_poly))[:, :Mb]`` (the lax
    path's conv pad L//2 + [..., :-1] trim become the input padding here).
    """
    from pqmf_tpu.kernels import cached_conv as cc

    B, _, T = x.shape
    Mb, M, L = hk_poly.shape
    # W2[c, l*M + m] = hk_poly[c, m, l]; window start (t - L//2)*M
    w2 = jnp.transpose(hk_poly, (0, 2, 1)).reshape(Mb, 1, L * M)
    xq = jnp.pad(x, ((0, 0), (0, 0),
                     ((L // 2) * M, (L - L // 2 - 1) * M)))
    return cc.strided_analysis_conv(xq, w2, M, tile=tile,
                                    interpret=interpret,
                                    fuse_mask=fuse_mask,
                                    mxu_precision=mxu_precision)


@functools.partial(jax.jit, static_argnames=("tile", "interpret",
                                              "mxu_precision"))
def polyphase_synthesis(x, hk_ipoly, tile=DEFAULT_TILE, interpret=None,
                        mxu_precision="highest"):
    """Fused reverse_half + polyphase synthesis.

    x: [B, Mb, T'] sub-bands; hk_ipoly: [M, Mb, L] with M the phase count
    (= full band count; also the reference's ``*M`` gain) and Mb the bands
    contracted here. Mb == M offline; under a band-sharded mesh each
    device passes its even-sized band shard of x and of the bank's band
    axis, and psums the partial outputs.
    Returns [B, 1, M*T'] — equal to
    ``polyphase_inverse(reverse_half(x), hk_ipoly)`` when Mb == M (its
    pad L//2+1, [..., :-1] trim, and 2-row delay trim collapse to an
    input pad of L//2-1 left).
    """
    from pqmf_tpu.kernels import cached_conv as cc

    B, Mb, Tp = x.shape
    M, Mw, L = hk_ipoly.shape
    off = L // 2 - 1
    xq = jnp.pad(x, ((0, 0), (0, 0), (off, L - 1 - off)))
    out = cc.dense_synthesis_conv(xq, hk_ipoly, tile=tile,
                                  interpret=interpret,
                                  x_offset=-off,
                                  mxu_precision=mxu_precision)  # [B, Tp, M]
    return out.reshape(B, 1, Tp * M)


def roundtrip_supported(n_band: int, syn_taps: int) -> bool:
    """Whether the grouped pass-through round trip applies (see
    cached_conv.fused_roundtrip_supported); ``syn_taps`` is the synthesis
    bank's taps-per-phase (hk_ipoly.shape[-1])."""
    from pqmf_tpu.kernels import cached_conv as cc

    return cc.fused_roundtrip_supported(n_band, syn_taps // 2)


@functools.partial(jax.jit, static_argnames=("tile", "interpret",
                                              "mxu_precision"))
def polyphase_roundtrip(x, hk_poly, hk_ipoly, tile=DEFAULT_TILE,
                        interpret=None, mxu_precision="highest"):
    """Analysis -> synthesis round trip fused at the grouped-layout level
    (cached_conv.fused_roundtrip_conv): the sub-bands never leave the
    kernels' (time-phase, band) layout, and the two reverse_half masks
    cancel. Equal to
    ``polyphase_synthesis(polyphase_analysis(x, hk_poly), hk_ipoly)`` up
    to float32 accumulation-split round-off (~1e-6: the one-step
    alignment shift below lands each output in a different matmul row
    group, which partitions the synthesis tap sum differently).

    x: [B, 1, T] (T divisible by M); returns [B, 1, T].
    """
    from pqmf_tpu.kernels import cached_conv as cc

    B, _, T = x.shape
    Mb, M, L = hk_poly.shape
    w2 = jnp.transpose(hk_poly, (0, 2, 1)).reshape(Mb, 1, L * M)
    xq = jnp.pad(x, ((0, 0), (0, 0),
                     ((L // 2) * M, (L - L // 2 - 1) * M)))
    Ls = hk_ipoly.shape[-1]
    # the composed synthesis pads (Ls//2 - 1, Ls//2); pad one more on
    # each side here — group-aligned on the left — which shifts every
    # output window one step later and yields one extra trailing step, so
    # drop the first output step: out_fused[t'+1] covers exactly
    # out_composed[t']'s window
    out = cc.fused_roundtrip_conv(xq, w2, hk_ipoly, M,
                                  (Ls // 2, Ls - Ls // 2), tile=tile,
                                  interpret=interpret,
                                  mxu_precision=mxu_precision)
    return out[:, 1:, :].reshape(B, 1, T)

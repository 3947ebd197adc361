"""Fused Pallas polyphase analysis/synthesis kernels.

The reference's hot path is two conv1ds (pqmf.py:129, 152) surrounded by
rearranges, a sign mask, a band flip, a gain, and a delay trim. Here each
direction is ONE Mosaic kernel:

- **analysis**: per time-tile, DMA a haloed window of the phase-major
  input from HBM, build the im2col frame matrix in a VMEM scratch
  (``pltpu.roll`` + aligned stores — Mosaic cannot concat lane-offset
  slices), run a single ``[M, M*L] @ [M*L, Tt]`` MXU matmul, and apply
  the alias-cancellation sign mask (``reverse_half``, pqmf.py:13-22) on
  the way out.
- **synthesis**: the sign mask is folded into the frame build, the band
  flip + ``*M`` gain + ``2M``-sample delay trim are folded into the
  weight matrix/index math, and the output tile is written time-major so
  the final phase re-interleave is a free reshape.

The polyphase conv is exactly a strided dense matmul on the raw signal:
``y[:, t] = W2 @ x_raw[(t - L/2)*M : (t - L/2)*M + L*M]`` (window stride
M, length L*M), since ``(t+l)*M + m = t*M + (l*M + m)``. HBM traffic per
direction = one read of the phase-major input + one write of the output.

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

__all__ = ["polyphase_analysis", "polyphase_synthesis", "pallas_available",
           "supports"]

DEFAULT_TILE = 1024
# frames scratch [L*M, Tt] must fit comfortably in VMEM alongside the
# pipeline's in/out blocks; 4 MB keeps tile=2048 for the default L*M=512.
_FRAMES_VMEM_BYTES = 4 << 20


def pallas_available() -> bool:
    """True when the default JAX backend can run these kernels natively."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def supports(n_band: int, halos=()) -> bool:
    """Shape constraints for the native kernels.

    - ``n_band % 8 == 0``: the im2col scratch stores are sublane-aligned
      per phase row group (f32 sublane = 8).
    - every halo ``L`` (taps per phase: P/M for the polyphase kernels,
      ceil(K/M) / K for the cached analysis/synthesis convs) must fit in
      one lane tile (<= 128); longer prototypes fall back to the lax path.

    Auto-dispatch callers pass their geometry's halos so unsupported
    shapes degrade to ``lax.conv`` instead of failing inside the kernel.
    """
    if n_band % 8:
        return False
    return all(int(h) <= 128 for h in halos)


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


def _build_frames(xw, frames_ref, M, L, Tt, mask_fn=None):
    """frames_ref[l*M + m, t] = xw[m, t + l] (optionally * mask_l)."""
    W = xw.shape[-1]
    for l in range(L):
        # left-roll by l == right-roll by W - l (pltpu.roll wants shift >= 0)
        sl = pltpu.roll(xw, W - l, axis=1)[:, :Tt] if l else xw[:, :Tt]
        if mask_fn is not None:
            sl = sl * mask_fn(l)
        frames_ref[l * M:(l + 1) * M, :] = sl


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------


def _analysis_kernel(x_hbm, w_ref, out_ref, xw, frames, sem, *, M, Mout, L,
                     Tt):
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
    )  # [Mout, Tt]
    out_ref[:] = (y * _sign_mask(Mout, Tt, 0, y.dtype))[None]


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "fuse_mask"))
def polyphase_analysis(x, hk_poly, tile=DEFAULT_TILE, interpret=None,
                       fuse_mask=True):
    """Fused polyphase analysis + reverse_half.

    x: [B, 1, T] (T divisible by M); hk_poly: [Mb, M, L] where M is the
    phase count (= full band count) and Mb the output bands computed here.
    Mb == M offline; under a band-sharded mesh each device passes its
    even-sized row shard of the bank (Mb must be even so the local band
    parity of the fused sign mask equals the global one).
    Returns [B, Mb, T/M] — equal to
    ``reverse_half(polyphase_forward(x, hk_poly))[:, :Mb]``.
    """
    B, _, T = x.shape
    Mb, M, L = hk_poly.shape
    if L > 128:
        raise ValueError(
            f"halo L={L} wider than one lane tile; gate with supports()")
    if Mb % 2:
        raise ValueError("band shards must be even-sized (sign-mask parity)")
    Tm = T // M
    cap = max(128, _FRAMES_VMEM_BYTES // (L * M * 4))
    Tt = int(min(tile, cap, max(128, 1 << (Tm - 1).bit_length())))
    nt = -(-Tm // Tt)
    # DMA window: halo rounded up so slice sizes/offsets are 128-aligned
    # (Mosaic requires it when the compiler places the input in VMEM)
    win = Tt + -(-L // 128) * 128
    Mb_pad = -(-Mb // 8) * 8  # sublane-aligned output rows

    # de-interleave "b c (t m) -> b m t" + halo pad: ONE aligned pass
    xp = x[:, 0, :].reshape(B, Tm, M)
    xp = jnp.swapaxes(xp, 1, 2)  # [B, M, Tm]
    xp = jnp.pad(xp, ((0, 0), (0, 0),
                      (L // 2, (nt - 1) * Tt + win - Tm - L // 2)))

    # W2[c, l*M + m] = hk_poly[c, m, l]
    w2 = jnp.transpose(hk_poly, (0, 2, 1)).reshape(Mb, L * M)
    if Mb_pad > Mb:
        w2 = jnp.pad(w2, ((0, Mb_pad - Mb), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_analysis_kernel, M=M, Mout=Mb_pad, L=L, Tt=Tt),
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
    out = out[:, :Mb, :Tm]
    if not fuse_mask:  # undo (for callers wanting the raw conv)
        from pqmf_tpu.ops.filterbank import reverse_half

        out = reverse_half(out)
    return out


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------


def _synthesis_kernel(x_hbm, v_ref, out_ref, xw, frames, sem, *, M, Mout, L,
                      Tt):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * Tt, xw.shape[-1])], xw, sem)
    copy.start()
    copy.wait()
    # fused reverse_half on the input: sample index tau = i*Tt + t + l -
    # (L//2 - 1); parity(tau) = parity(t + l - L//2 + 1) for even Tt.
    off = L // 2 - 1
    _build_frames(xw[:], frames, M, L, Tt,
                  mask_fn=lambda l: _sign_mask(M, Tt, l - off, xw.dtype))
    y = jax.lax.dot_general(
        frames[:], v_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Tt, Mout]
    out_ref[:] = y[None]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def polyphase_synthesis(x, hk_ipoly, tile=DEFAULT_TILE, interpret=None):
    """Fused reverse_half + polyphase synthesis.

    x: [B, Mb, T'] sub-bands; hk_ipoly: [M, Mb, L] with M the phase count
    (= full band count; also the reference's ``*M`` gain) and Mb the bands
    contracted here. Mb == M offline; under a band-sharded mesh each
    device passes its even-sized band shard of x and of the bank's band
    axis, and psums the partial outputs over the band axis.
    Returns [B, 1, M*T'] — equal to
    ``polyphase_inverse(reverse_half(x), hk_ipoly)`` when Mb == M.
    """
    B, Mb, Tp = x.shape
    M, Mw, L = hk_ipoly.shape
    if Mw != Mb:
        raise ValueError(f"band dims disagree: x has {Mb}, bank has {Mw}")
    if L > 128:
        raise ValueError(
            f"halo L={L} wider than one lane tile; gate with supports()")
    if Mb % 2:
        raise ValueError("band shards must be even-sized (sign-mask parity)")
    Mb_pad = -(-Mb // 8) * 8  # sublane-aligned frame row groups
    cap = max(128, _FRAMES_VMEM_BYTES // (L * Mb_pad * 4))
    Tt = int(min(tile, cap, max(128, 1 << (Tp - 1).bit_length())))
    nt = -(-Tp // Tt)
    win = Tt + -(-L // 128) * 128

    # final[c, t] = M * sum_{m,l} hk_ipoly[M-1-c, m, l] *
    #              reverse_half(x)[m, t + l - (L//2 - 1)]
    xq = jnp.pad(x, ((0, 0), (0, Mb_pad - Mb),
                     (L // 2 - 1,
                      win - (L // 2 - 1) + (nt - 1) * Tt - Tp)))
    v2 = M * jnp.flip(hk_ipoly, axis=0)  # phase flip; gain = full M
    v2 = jnp.transpose(v2, (0, 2, 1))  # [M, L, Mb]
    if Mb_pad > Mb:
        v2 = jnp.pad(v2, ((0, 0), (0, 0), (0, Mb_pad - Mb)))
    v2 = v2.reshape(M, L * Mb_pad)

    out = pl.pallas_call(
        functools.partial(_synthesis_kernel, M=Mb_pad, Mout=M, L=L, Tt=Tt),
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
    )(xq, v2)
    return out[:, :Tp, :].reshape(B, 1, Tp * M)

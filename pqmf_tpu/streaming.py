"""L2 — streaming/real-time layer: explicit-state cached convolutions.

TPU-native rebuild of the reference's ``CachedPQMF`` (pqmf.py:306-354) and
the external ``cached_conv`` package it depends on (pqmf.py:3, 316-337).

The reference's streaming story is a Conv1d whose centered padding is
replaced, in cached mode, by a carried buffer of past input samples so that
block-wise calls reproduce the offline (causally padded) output exactly.
Here that is a *pure function over explicit state*:

    state', y = streaming_conv(state, x, w, stride)

with the state pytree owned by the caller — jit-safe, vmap-safe,
``lax.scan``-able over blocks, and free of the reference's
shared-mutable-buffer hazard (SURVEY.md §5 "race detection").

Key property (tested in tests/test_streaming.py, incl. a hypothesis
partition property): concatenating the outputs of block-wise calls equals
the offline causal conv of the concatenated input, for any block partition
whose per-block SUB-BAND length is even (block size a multiple of 2*M for
analysis). The evenness constraint comes from ``reverse_half``'s
block-local alternating sign — shared with the reference's CachedPQMF,
and never triggered by real-time hosts' power-of-two buffers. Latency
bookkeeping mirrors ``cached_conv``'s ``cumulative_delay``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pqmf_tpu.ops import filterbank as fb

__all__ = [
    "centered_padding",
    "streaming_conv",
    "conv_state_init",
    "kernels_from_params",
    "StreamingPQMF",
    "scan_blocks",
]


def kernels_from_params(params) -> tuple:
    """Derive the streaming conv kernels from a filterbank params pytree
    (designed or fine-tuned): analysis ``make_odd(hk)[:, None, :]``
    ([M, 1, P(+1)]) and synthesis ``make_odd(hk_ipoly)`` ([M, M, L(+1)])
    — the CachedPQMF geometry, reference pqmf.py:316-333."""
    hkf = fb.make_odd(np.asarray(params["hk"]))[:, None, :]
    hki = fb.make_odd(np.asarray(params["hk_ipoly"]))
    return jnp.asarray(hkf), jnp.asarray(hki)


def centered_padding(kernel: int) -> tuple[int, int]:
    """Centered padding of the reference's exported convs: ``(K//2, K//2)``
    for the odd ``make_odd`` kernels.

    The reference constructs both cached convs with
    ``cc.get_padding(K)`` and never passes the stride
    (pqmf.py:316-333), so the strided analysis conv is padded as if
    stride were 1 — the exported artifact's baked ``forward_conv._pad``
    is ``(256, 256)`` for K=513/stride=16, NOT the stride-aware
    ``(248, 249)`` split ``cached_conv`` would produce with the stride
    passed. Round 4 verified this against the live
    ``PitchShifterPvoc/torchscript/pqmfpvoc.ts`` module: (256, 256)
    matches its decompose bit-for-bit (~2900 dB), the stride-aware split
    is an 8-sample analysis-grid shift (~2 dB). See
    tests/test_reference_artifact.py."""
    total = kernel - 1
    return total // 2, total - total // 2


def conv_state_init(batch: int, in_ch: int, kernel: int, stride: int,
                    dtype=jnp.float32) -> jax.Array:
    """Zero cache of the ``kernel - stride`` past input samples."""
    return jnp.zeros((batch, in_ch, kernel - stride), dtype)


def streaming_conv(state: jax.Array, x: jax.Array, w: jax.Array,
                   stride: int = 1, precision: str = "highest"):
    """One streaming step of a cached Conv1d.

    state: [B, Cin, K-S] carried past samples; x: [B, Cin, T] (T % S == 0);
    w: [Cout, Cin, K]. Returns (state', y [B, Cout, T/S]).
    """
    K = w.shape[-1]
    S = stride
    xx = jnp.concatenate([state, x], axis=-1)
    y = fb._conv1d(xx, w, stride=S, padding=(0, 0), precision=precision)
    new_state = xx[..., xx.shape[-1] - (K - S):]
    return new_state, y


def offline_conv(x: jax.Array, w: jax.Array, stride: int = 1,
                 causal: bool = False, precision: str = "highest"):
    """Offline reference for the streaming property: centered (the
    reference's exported non-cached mode) or causal (what streaming
    reproduces from zero initial state)."""
    K = w.shape[-1]
    if causal:
        pad = (K - stride, 0)
    else:
        pad = centered_padding(K)
    return fb._conv1d(x, w, stride=stride, padding=pad, precision=precision)


# ---------------------------------------------------------------------------
# Streaming PQMF
# ---------------------------------------------------------------------------


def shard_map_nocheck(f, mesh, in_specs, out_specs):
    """``shard_map`` with varying-mesh-axes checking off — ``pallas_call``
    outputs carry no vma metadata, so the checker rejects them (the psum
    placement is asserted by the equality tests instead)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax keeps it in experimental
        from jax.experimental.shard_map import shard_map

    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def shard_band_analysis(mesh, conv, x, w):
    """Band-partitioned analysis under ``shard_map``: every device runs
    ``conv(x_local, w_shard)`` with its ROW shard of the bank (w sharded
    on axis 0) against the batch-sharded, band-replicated signal. Manual
    SPMD — XLA cannot partition a pallas_call on its own. Shared by the
    streaming and offline-polyphase paths (the sharding contract lives in
    exactly one place)."""
    from jax.sharding import PartitionSpec as P

    data_ax, band_ax = mesh.axis_names
    dspec = data_ax if x.shape[0] % mesh.shape[data_ax] == 0 else None
    return shard_map_nocheck(
        conv, mesh,
        in_specs=(P(dspec, None, None), P(band_ax, None, None)),
        out_specs=P(dspec, band_ax, None))(x, w)


def shard_band_synthesis(mesh, conv, x, w):
    """Band-partitioned synthesis: each device contracts its band shard
    (signal axis 1, bank axis 1) via ``conv(x_shard, w_shard)`` and the
    partial outputs are summed over the band axis — the one ICI
    collective of the round-trip, matching the lax path's GSPMD choice."""
    from jax.sharding import PartitionSpec as P

    data_ax, band_ax = mesh.axis_names
    dspec = data_ax if x.shape[0] % mesh.shape[data_ax] == 0 else None

    def local(x_l, w_l):
        return jax.lax.psum(conv(x_l, w_l), band_ax)

    return shard_map_nocheck(
        local, mesh,
        in_specs=(P(dspec, band_ax, None), P(None, band_ax, None)),
        out_specs=P(dspec, None, None))(x, w)


@partial(jax.jit, static_argnames=("mode", "precision", "use_pallas", "mesh"))
def _cached_analysis(x, hkf, state, mode="offline", precision="highest",
                     use_pallas=False, mesh=None):
    """CachedPQMF.forward (pqmf.py:339-343): strided 1->M conv, sign mask."""
    M = hkf.shape[0]
    if use_pallas:
        from pqmf_tpu.kernels import cached_conv as cc

        K = hkf.shape[-1]
        if mode == "offline":
            al, ar = centered_padding(K)
            xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))
            new_state = state
        elif mode == "causal":
            xx = jnp.pad(x, ((0, 0), (0, 0), (K - M, 0)))
            new_state = state
        else:
            xx = jnp.concatenate([state, x], axis=-1)
            new_state = xx[..., xx.shape[-1] - (K - M):]
        if mesh is not None:
            return new_state, shard_band_analysis(
                mesh, lambda v, w: cc.strided_analysis_conv(
                    v, w, M, mxu_precision=precision),
                xx, hkf)
        return new_state, cc.strided_analysis_conv(
            xx, hkf, M, mxu_precision=precision)
    if mode == "offline":
        y = offline_conv(x, hkf, stride=M, causal=False, precision=precision)
        new_state = state
    elif mode == "causal":
        y = offline_conv(x, hkf, stride=M, causal=True, precision=precision)
        new_state = state
    else:  # streaming
        new_state, y = streaming_conv(state, x, hkf, stride=M,
                                      precision=precision)
    return new_state, fb.reverse_half(y)


@partial(jax.jit, static_argnames=("mode", "precision", "use_pallas", "mesh"))
def _cached_synthesis(x, hki, state, mode="offline", precision="highest",
                      use_pallas=False, mesh=None):
    """CachedPQMF.inverse (pqmf.py:345-354): sign mask, M->M conv * M,
    band flip, phase interleave."""
    M = hki.shape[0]
    if use_pallas:
        from pqmf_tpu.kernels import cached_conv as cc

        def syn(xx, fuse_mask, x_offset=0):
            if mesh is not None:
                return shard_band_synthesis(
                    mesh,
                    lambda v, w: cc.dense_synthesis_conv(
                        v, w, fuse_mask=fuse_mask, x_offset=x_offset,
                        mxu_precision=precision),
                    xx, hki)
            return cc.dense_synthesis_conv(xx, hki, fuse_mask=fuse_mask,
                                           x_offset=x_offset,
                                           mxu_precision=precision)

        K = hki.shape[-1]
        if mode == "offline":
            sl, sr = centered_padding(K)
            xx = jnp.pad(x, ((0, 0), (0, 0), (sl, sr)))
            y = syn(xx, True, x_offset=-sl)
            new_state = state
        elif mode == "causal":
            xx = jnp.pad(x, ((0, 0), (0, 0), (K - 1, 0)))
            y = syn(xx, True, x_offset=-(K - 1))
            new_state = state
        else:
            # block-local sign mask first (the carried tail keeps the
            # previous block's masked samples, like the lax path)
            xx = jnp.concatenate([state, fb.reverse_half(x)], axis=-1)
            new_state = xx[..., xx.shape[-1] - (K - 1):]
            y = syn(xx, False)
        B = y.shape[0]
        return new_state, y.reshape(B, 1, -1)
    x = fb.reverse_half(x)
    if mode == "offline":
        y = offline_conv(x, hki, stride=1, causal=False, precision=precision)
        new_state = state
    elif mode == "causal":
        y = offline_conv(x, hki, stride=1, causal=True, precision=precision)
        new_state = state
    else:
        new_state, y = streaming_conv(state, x, hki, stride=1,
                                      precision=precision)
    y = y * M
    y = jnp.flip(y, axis=1)
    B, _, Tp = y.shape
    y = jnp.swapaxes(y, 1, 2).reshape(B, 1, Tp * M)
    return new_state, y


class StreamingPQMF:
    """Streaming PQMF with explicit functional state.

    The reference's CachedPQMF is mono-only (pqmf.py:292-305). Here batch
    is free and ``n_channels > 1`` folds channels into the batch of the
    mono conv core (exceeding parity the same way the offline PQMF's
    channel support already does): ``forward`` maps [B, C, T] ->
    [B, C*M, T/M] and the streaming state carries one cache per (batch,
    channel) signal.

    Modes
    -----
    - ``forward(x)`` / ``inverse(x)``: offline, centered padding — the exact
      behavior of the reference's exported (non-cached) artifact.
    - ``init_state(batch)`` + ``forward_block(state, x)`` /
      ``inverse_block(state, x)``: streaming; concatenated block outputs
      equal the causal offline output for any block partition.

    Conv geometry at (atten=100, M=16): analysis 1->16ch k=513 s=16,
    synthesis 16->16ch k=33 s=1 (reference pqmf.py:310-333; BASELINE.md).
    """

    def __init__(self, attenuation: float, n_band: int,
                 precision: str = "highest", use_pallas="auto", mesh=None,
                 n_channels: int = 1):
        # ValueError, not assert (stripped under `python -O`, and the
        # downstream polyphase matrices would be silently empty)
        power = math.log2(n_band)
        if power != math.floor(power):
            raise ValueError(f"n_band must be a power of 2, got {n_band}")
        self.n_band = n_band
        self.attenuation = attenuation
        self.precision = precision
        self.n_channels = int(n_channels)

        params = fb.build_filterbank(attenuation, n_band)
        self.params = params
        M = n_band
        self.hkf, self.hki = kernels_from_params(params)

        halos = (-(-self.hkf.shape[-1] // M), self.hki.shape[-1])
        if use_pallas == "auto":
            from pqmf_tpu.kernels import polyphase as _pk

            use_pallas = _pk.pallas_available() and _pk.supports(n_band,
                                                                 halos)
        self.use_pallas = bool(use_pallas)
        # validate the mesh even when the Pallas path is off — an invalid
        # mesh should fail loudly here, and a valid-but-unused one should
        # at least warn (the lax branch runs unsharded)
        self.mesh = self._check_mesh(mesh)
        if mesh is not None and not self.use_pallas:
            import warnings

            warnings.warn(
                "mesh provided but the Pallas band-partitioned path is "
                "off (use_pallas resolved False); convs run unsharded",
                stacklevel=2)

        self._update_delays()

    def _check_mesh(self, mesh):
        """Validate a (data, band) mesh for the band-partitioned Pallas
        path (see kernels.polyphase.check_band_mesh)."""
        from pqmf_tpu.kernels.polyphase import check_band_mesh

        return check_band_mesh(mesh, self.n_band)

    def set_weights(self, params, hkf, hki):
        """Install filterbank weights (e.g. restored from an artifact or a
        fine-tuned bank) in place of the designed ones, recomputing the
        latency bookkeeping, which depends on the kernel lengths."""
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.hkf = jnp.asarray(hkf)
        self.hki = jnp.asarray(hki)
        # caches that BAKE the weights at trace time (pipelines'
        # stream_ola programs) key on this counter so a weight swap
        # invalidates them instead of silently serving stale audio
        self.weights_version = getattr(self, "weights_version", 0) + 1
        M = self.n_band
        if self.use_pallas:
            # re-gate the kernel halos: a longer restored bank must
            # degrade to the lax path like the construction-time "auto"
            # gate, not raise inside the kernel at call time
            from pqmf_tpu.kernels import polyphase as _pk

            halos = (-(-self.hkf.shape[-1] // M), self.hki.shape[-1])
            if not _pk.supports(M, halos):
                self.use_pallas = False
                if self.mesh is not None:
                    # same condition __init__ warns about: with the
                    # Pallas path off, a configured (data, band) mesh is
                    # silently unused and the convs run unsharded
                    import warnings

                    warnings.warn(
                        "restored weights' halos disable the Pallas "
                        "band-partitioned path (use_pallas degraded to "
                        "False); the configured mesh is unused and convs "
                        "run unsharded", stacklevel=2)
        self._update_delays()

    def _update_delays(self):
        """Latency bookkeeping (cached_conv's cumulative_delay analog), in
        full-rate samples, verified empirically in tests/test_streaming.py:
        - stream_vs_centered_delay: how much later the streamed output is
          than the centered-offline output — the extra left padding each
          causal conv carries over its centered counterpart, the
          synthesis term scaled to full rate by the interleave.
        - centered_delay: the centered round-trip's own group delay vs
          the input (the reference artifact measures 16 at M=16 — an
          impulse through pqmfpvoc.ts forward peaks 16 samples late).
        - latency_samples: total streamed round-trip delay vs the input.
        """
        M = self.n_band
        Ka = self.hkf.shape[-1]
        Ks = self.hki.shape[-1]
        a_left, _ = centered_padding(Ka)
        s_left, _ = centered_padding(Ks)
        self.stream_vs_centered_delay = ((Ka - M - a_left)
                                         + M * (Ks - 1 - s_left))
        self.centered_delay = a_left - Ka // 2 + M
        self.latency_samples = (self.stream_vs_centered_delay
                                + self.centered_delay)

    # -- channel folding ------------------------------------------------------

    def _fold(self, x):
        """[B, C, T] (or [C, T] / [T]) -> ([B*C, 1, T], B)."""
        x = self._norm(x)
        B, C, T = x.shape
        if C != self.n_channels:
            raise ValueError(
                f"expected {self.n_channels} channel(s), got {C}")
        return x.reshape(B * C, 1, T), B

    def _fold_bands(self, x):
        """[B, C*M, T'] (or [C*M, T']) -> ([B*C, M, T'], B)."""
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        B, CM, Tp = x.shape
        if CM != self.n_channels * self.n_band:
            raise ValueError(
                f"expected {self.n_channels * self.n_band} rows "
                f"(C*M), got {CM}")
        return x.reshape(B * self.n_channels, self.n_band, Tp), B

    # -- offline (centered) ------------------------------------------------

    def forward(self, x):
        """[B, C, T] -> [B, C*M, T/M]."""
        xf, B = self._fold(x)
        if self.n_band == 1:
            return xf.reshape(B, self.n_channels, -1)
        _, y = _cached_analysis(xf, self.hkf, _EMPTY, mode="offline",
                                precision=self.precision,
                                use_pallas=self.use_pallas, mesh=self.mesh)
        return y.reshape(B, self.n_channels * self.n_band, -1)

    def inverse(self, x):
        """[B, C*M, T'] -> [B, C, T'*M]."""
        xf, B = self._fold_bands(x)
        if self.n_band == 1:
            return xf.reshape(B, self.n_channels, -1)
        _, y = _cached_synthesis(xf, self.hki, _EMPTY, mode="offline",
                                 precision=self.precision,
                                 use_pallas=self.use_pallas, mesh=self.mesh)
        return y.reshape(B, self.n_channels, -1)

    def roundtrip(self, x):
        """``inverse(forward(x))`` as one fused program ([B, C, T] ->
        [B, C, T]). On the time-grouped Pallas path the sub-bands stay in
        the kernels' grouped layout between the two convs
        (kernels.cached_conv.fused_roundtrip_conv — no re-interleave
        transposes, and the two reverse_half masks cancel); other
        configurations fall back to the composition. Output equals the
        composition exactly on CPU (interpret mode) and to f32 rounding
        (~2e-7) on the chip, where the fused path's row-sliced scheme
        computes transposed MXU dots."""
        from pqmf_tpu.kernels import cached_conv as cc

        M = self.n_band
        sl, sr = centered_padding(self.hki.shape[-1])
        if (not self.use_pallas or self.mesh is not None or M == 1
                or not cc.fused_roundtrip_supported(M, sl)):
            return self.inverse(self.forward(x))
        xf, B = self._fold(x)
        Ka = self.hkf.shape[-1]
        al, ar = centered_padding(Ka)
        xx = jnp.pad(xf, ((0, 0), (0, 0), (al, ar)))
        out = cc.fused_roundtrip_conv(xx, self.hkf, self.hki, M, (sl, sr),
                                      mxu_precision=self.precision)
        return out.reshape(B, self.n_channels, -1)

    # -- streaming ----------------------------------------------------------

    def init_state(self, batch: int = 1, dtype=jnp.float32) -> dict:
        M = self.n_band
        rows = batch * self.n_channels  # one cache per (batch, channel)
        return {
            "analysis": conv_state_init(rows, 1, self.hkf.shape[-1], M, dtype),
            "synthesis": conv_state_init(rows, M, self.hki.shape[-1], 1, dtype),
        }

    def _check_block_parity(self, sub_len: int, what: str):
        """The documented even-sub-band-length streaming constraint (see
        module docstring): ``reverse_half``'s block-local alternating
        sign means any other partition SILENTLY diverges from the
        offline output from the next block on — reject it loudly.
        Shapes are static, so under jit this raises at trace time."""
        if self.n_band >= 2 and sub_len % 2:
            raise ValueError(
                f"streaming {what} block has odd sub-band length "
                f"{sub_len}; blocks must be a multiple of 2*n_band="
                f"{2 * self.n_band} full-rate samples (reverse_half's "
                f"block-local sign parity would silently corrupt every "
                f"later block)")

    def forward_block(self, state: dict, x):
        xf, B = self._fold(x)
        T = xf.shape[-1]
        if T % self.n_band:
            raise ValueError(
                f"block length {T} must be a multiple of "
                f"n_band={self.n_band}")
        self._check_block_parity(T // self.n_band, "analysis")
        new, y = _cached_analysis(xf, self.hkf, state["analysis"],
                                  mode="streaming", precision=self.precision,
                                  use_pallas=self.use_pallas, mesh=self.mesh)
        return ({**state, "analysis": new},
                y.reshape(B, self.n_channels * self.n_band, -1))

    def inverse_block(self, state: dict, x):
        xf, B = self._fold_bands(x)
        self._check_block_parity(xf.shape[-1], "synthesis")
        new, y = _cached_synthesis(xf, self.hki, state["synthesis"],
                                   mode="streaming", precision=self.precision,
                                   use_pallas=self.use_pallas, mesh=self.mesh)
        return ({**state, "synthesis": new},
                y.reshape(B, self.n_channels, -1))

    def process_block(self, state: dict, x):
        """Analysis + synthesis round-trip of one block."""
        state, bands = self.forward_block(state, x)
        state, y = self.inverse_block(state, bands)
        return state, y

    # -- causal offline (ground truth for the streaming property) -----------

    def forward_causal(self, x):
        xf, B = self._fold(x)
        _, y = _cached_analysis(xf, self.hkf, _EMPTY, mode="causal",
                                precision=self.precision,
                                use_pallas=self.use_pallas, mesh=self.mesh)
        return y.reshape(B, self.n_channels * self.n_band, -1)

    def inverse_causal(self, x):
        xf, B = self._fold_bands(x)
        _, y = _cached_synthesis(xf, self.hki, _EMPTY, mode="causal",
                                 precision=self.precision,
                                 use_pallas=self.use_pallas, mesh=self.mesh)
        return y.reshape(B, self.n_channels, -1)

    @staticmethod
    def _norm(x):
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None, None, :]
        elif x.ndim == 2:
            x = x[None]
        return x


# numpy, not jnp: a module-level jnp constant would initialize (and pin)
# the JAX backend at import time, breaking the CLIs' --cpu flag on setups
# where the default backend is selected lazily
_EMPTY = np.zeros((1, 1, 0), np.float32)


def scan_blocks(step_fn, state, blocks):
    """``lax.scan`` a streaming step over pre-framed blocks
    [n_blocks, B, C, T_block] — the whole stream compiles to ONE XLA
    program with zero host round-trips (SURVEY.md §5 long-context story).
    """
    return jax.lax.scan(step_fn, state, blocks)

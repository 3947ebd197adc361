"""Multi-chip sharding over a jax.sharding.Mesh.

The reference is single-device (SURVEY.md §2.4: no DP/TP/PP/SP/EP anywhere);
its latent parallel axes become first-class shardings here:

- **data** axis  <- the batch dimension (the reference's Python recursion
  over batch items, pqmf.py:248-249);
- **band** axis  <- the 16 independent per-band pitch shifters (the
  reference's unrolled Python loop, 1-PitchShifterWrapper.py:249-292) —
  embarrassingly parallel, EP-style.

Everything rides ``jax.jit`` + ``NamedSharding``: XLA inserts the ICI
collectives (the synthesis conv contracts over the band axis, so an
all-gather of the shifted bands appears exactly once, at the end of the
fused program). DCN/multi-host is out of scope, matching the survey.

The Pallas kernels partition too: when the wrapper's filterbank runs the
Pallas path, :class:`ShardedPitchShift` hands the mesh to
``StreamingPQMF``, which wraps the kernels in ``shard_map`` over the
band axis (each device runs its even-sized band shard of the bank;
synthesis psums the partial outputs) — see
``pqmf_tpu.streaming.shard_band_analysis`` /
``shard_band_synthesis``. Odd band shards (band axis > n_band/2) fall
back to replicated kernels, which stay correct.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ShardedPitchShift"]


def make_mesh(n_devices: int | None = None, n_band: int = 16,
              devices=None) -> Mesh:
    """Build a (data, band) mesh. The band axis gets the largest divisor of
    ``n_band`` that fits; the rest goes to data."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    band = math.gcd(n, n_band)
    data = n // band
    dev = np.asarray(devices).reshape(data, band)
    return Mesh(dev, axis_names=("data", "band"))


class ShardedPitchShift:
    """The flagship pitch-shift pipeline laid out over a device mesh.

    Input  x [B, 1, T]      -> sharded (data, None, None)
    Bands  [B, M, Tb]       -> sharded (data, band, None): every device
                               stretches only its bands
    Output y [B, T]         -> sharded (data, None)
    Crossfade state [M, L]  -> sharded (band, None)
    """

    def __init__(self, wrapper, mesh: Mesh):
        self.mesh = mesh
        # Band-partition the Pallas kernels under this mesh (shard_map —
        # XLA cannot partition a pallas_call on its own). The caller's
        # wrapper object is NOT mutated: this view gets a shallow copy
        # with its own mesh-enabled filterbank (the design chain is
        # memoized, so the rebuild is cheap), leaving single-device use
        # of the original wrapper untouched. Meshes whose band axis would
        # give odd per-device shards keep the kernels replicated, which
        # is correct, just not band-parallel.
        pq = wrapper.pqmf
        if pq.use_pallas and pq.mesh is None:
            try:
                pq_mesh = pq._check_mesh(mesh)
            except ValueError:
                pq_mesh = None
            if pq_mesh is not None:
                import copy

                from pqmf_tpu.streaming import StreamingPQMF

                wrapper = copy.copy(wrapper)
                new_pq = StreamingPQMF(
                    pq.attenuation, pq.n_band, precision=pq.precision,
                    use_pallas=True, mesh=pq_mesh,
                    n_channels=pq.n_channels)
                # carry the ORIGINAL filterbank's weights: an artifact-
                # restored (or fine-tuned) bank must survive the rebuild,
                # not be replaced by a fresh design-chain run
                new_pq.set_weights(pq.params, pq.hkf, pq.hki)
                wrapper.pqmf = new_pq
                if hasattr(wrapper, "_pitchshifter_jit"):
                    # a shallow copy's cached bound-method jit still
                    # wraps the ORIGINAL wrapper's method (and so its
                    # mesh-less pqmf config); rebind it to the view
                    wrapper._pitchshifter_jit = jax.jit(
                        wrapper._pitchshifter_impl,
                        static_argnames=("FO_max", "pad_left", "Lbuf",
                                         "resample_kind"))
        self.wrapper = wrapper
        self._x_s = NamedSharding(mesh, P("data", None, None))
        self._tail_s = NamedSharding(mesh, P("band", None))
        self._y_s = NamedSharding(mesh, P("data", None))

        def step(prev_tail, x):
            state, y = wrapper.pitchshift_fn({"prev_tail": prev_tail}, x)
            return state["prev_tail"], y

        self._step = jax.jit(
            step,
            in_shardings=(self._tail_s, self._x_s),
            out_shardings=(self._tail_s, self._y_s),
        )

    def init_state(self):
        tail = self.wrapper.init_state()["prev_tail"]
        return jax.device_put(tail, self._tail_s)

    def __call__(self, prev_tail, x):
        x = jax.device_put(jax.numpy.asarray(x), self._x_s)
        return self._step(prev_tail, x)

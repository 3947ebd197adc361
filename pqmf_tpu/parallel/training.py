"""Differentiable filterbank + sharded training step.

The reference has no training loop, but its lineage (RAVE's PQMF) exists
to sit inside trained models. Here the modulated bank ``hk`` is a
first-class learnable parameter: the polyphase analysis/synthesis matrices
are derived from it *inside* the jitted graph (pure reshapes), so
gradients flow, and the reconstruction loss can fine-tune the filterbank
(e.g. to sharpen alias cancellation for a specific corpus).

``train_step`` is the framework's canonical multi-chip program: batch
sharded over the mesh's ``data`` axis, parameters replicated, gradients
combined by XLA's automatic collectives under ``jax.jit`` +
``NamedSharding``. This is what ``__graft_entry__.dryrun_multichip``
compiles and runs.
"""

from __future__ import annotations


import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # optional: only the optimizer steps need it, not bank loading
    import optax
except ImportError:  # pragma: no cover - exercised on minimal installs
    optax = None
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqmf_tpu.ops import filterbank as fb

__all__ = ["analysis_from_hk", "synthesis_from_hk", "reconstruction_loss",
           "make_finetune_loss", "finetune_filterbank",
           "load_pretrained_bank", "available_pretrained_banks",
           "streaming_roundtrip_snr",
           "TrainState", "make_train_step",
           "TrainablePQMF", "save_train_state", "load_train_state"]


def analysis_from_hk(x: jax.Array, hk: jax.Array, precision="highest"):
    """Differentiable polyphase analysis with the polyphase matrix derived
    from ``hk`` in-graph. x: [B, 1, T]; hk: [M, P]."""
    M, Pn = hk.shape
    hk_poly = jnp.swapaxes(hk.reshape(M, Pn // M, M), 1, 2)
    y = fb.polyphase_forward(x, hk_poly, precision=precision)
    return fb.reverse_half(y)


def synthesis_from_hk(x: jax.Array, hk: jax.Array, precision="highest"):
    """Differentiable polyphase synthesis. x: [B, M, T']; hk: [M, P]."""
    M, Pn = hk.shape
    hk_flip = jnp.flip(hk, -1)
    hk_ipoly = jnp.transpose(hk_flip.reshape(M, Pn // M, M), (2, 0, 1))
    return fb.polyphase_inverse(fb.reverse_half(x), hk_ipoly,
                                precision=precision)


def reconstruction_loss(hk: jax.Array, x: jax.Array, precision="highest"):
    """Round-trip MSE through the filterbank (the quantity the reference's
    design chain minimizes offline via loss_wc, here trainable online)."""
    y = synthesis_from_hk(analysis_from_hk(x, hk, precision), hk, precision)
    return jnp.mean((y - x) ** 2)


class TrainState:
    """Minimal functional train state pytree."""

    def __init__(self, hk, opt_state):
        self.hk = hk
        self.opt_state = opt_state

    def tree_flatten(self):
        return (self.hk, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def make_finetune_loss(n_band: int, n_taps: int, trim: int | None = None,
                       stopband_weight: float = 1e-4, nfft: int = 2048):
    """Loss for fine-tuning the bank toward better reconstruction without
    collapsing alias attenuation — the plain round-trip MSE is the WRONG
    objective for short batches: with T=4096 and a 512-tap bank the
    boundary transients dominate the mean, and an optimizer chasing them
    destroys the interior quality AND the stopband (measured: 2000 Adam
    steps on noise took flute SNR 65 -> 56.5 dB and stopband -107 ->
    -27 dB). This loss (a) trims ``trim`` samples (default: one filter
    length) from each edge so only steady-state reconstruction counts,
    and (b) penalizes per-band stopband energy (response more than one
    band-width outside the passband, via an in-graph matmul DFT).

    Measured on TPU (2000 steps, Adam 3e-6, noise batches [8, 1, 4096],
    M=16/atten=100): interior loss 1.0e-6 -> 3.1e-8; flute.wav SNR
    65.1 -> 80.1 dB (held out); worst stopband -107 -> -62 dB.
    ``stopband_weight`` trades the two (1e-2 gave 68.0 dB at the same
    -62 dB floor; 0 collapses the stopband entirely).
    """
    M, Pn = n_band, n_taps
    t = trim if trim is not None else Pn
    w = np.linspace(0, np.pi, nfft // 2 + 1)
    n = np.arange(Pn)
    masks = np.stack([
        (w < k * np.pi / M - np.pi / M) | (w > (k + 1) * np.pi / M
                                           + np.pi / M)
        for k in range(M)])
    Cm = jnp.asarray(np.cos(np.outer(n, w)).astype(np.float32))
    Sm = jnp.asarray(np.sin(np.outer(n, w)).astype(np.float32))
    masks = jnp.asarray(masks)

    def loss_fn(hk, x, precision="highest"):
        if x.shape[-1] <= 2 * t:
            # the interior slice below would be EMPTY and jnp.mean would
            # silently train on NaN losses (advisor r2); shapes are static
            # under jit so this raises at trace time
            raise ValueError(
                f"batch length {x.shape[-1]} must exceed 2*trim={2 * t} "
                f"for the interior loss (trim defaults to n_taps="
                f"{n_taps}); use longer batches or pass a smaller trim")
        y = synthesis_from_hk(analysis_from_hk(x, hk, precision), hk,
                              precision)
        e = (y - x)[..., t:-t]
        mse = jnp.mean(e * e)
        re, im = hk @ Cm, hk @ Sm
        sb = jnp.sum(jnp.where(masks, re * re + im * im, 0.0)) / M
        return mse + stopband_weight * sb

    return loss_fn


def _require_optax():
    if optax is None:
        raise ImportError(
            "optax is required for filterbank training/fine-tuning "
            "(pip install optax, or pqmf-tpu[train]); loading committed "
            "pretrained banks does not need it")


def make_train_step(optimizer=None, mesh: Mesh | None = None,
                    precision: str = "highest", remat: bool = False,
                    loss_fn=None):
    """Build (init_fn, step_fn). With a mesh, the batch is sharded over
    every mesh axis (full DP) and parameters are replicated; XLA inserts
    the gradient all-reduce over ICI. ``remat=True`` rematerializes the
    analysis pass in the backward computation (jax.checkpoint), trading
    one extra forward for not keeping the sub-band activations — useful
    for long audio batches near the HBM limit. ``loss_fn(hk, x,
    precision)`` defaults to the plain :func:`reconstruction_loss`; pass
    :func:`make_finetune_loss`'s result for quality fine-tuning."""
    _require_optax()
    if optimizer is None:
        optimizer = optax.adam(1e-4)

    if loss_fn is None:
        loss_fn = reconstruction_loss
    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=(2,))

    def init_fn(hk):
        return TrainState(hk, optimizer.init(hk))

    def step(state: TrainState, x):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.hk, x, precision)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.hk)
        hk = optax.apply_updates(state.hk, updates)
        return TrainState(hk, opt_state), loss

    if mesh is not None:
        # batch shards over BOTH axes (full data-parallel across every
        # device): the band axis only carries meaning for inference
        x_sharding = NamedSharding(mesh, P(("data", "band"), None, None))
        repl = NamedSharding(mesh, P())
        # one template: state (params + opt state) fully replicated
        state_sharding = jax.tree.map(
            lambda _: repl, TrainState(0, optimizer.init(jnp.zeros((1,)))))
        step = jax.jit(
            step,
            in_shardings=(state_sharding, x_sharding),
            out_shardings=(state_sharding, repl),
        )
    else:
        step = jax.jit(step)
    return init_fn, step


def finetune_filterbank(attenuation: float, n_band: int, steps: int = 2000,
                        batch: int = 8, length: int = 4096, lr: float = 3e-6,
                        stopband_weight: float = 1e-4, seed: int = 0,
                        mesh: Mesh | None = None,
                        precision: str = "highest",
                        lr_schedule: str = "constant"):
    """Fine-tune the designed bank's reconstruction on white noise (one
    jitted scan over ``steps`` Adam steps) and return ``(params,
    losses)`` — a params pytree installable via
    ``fb.params_from_hk``-derived tensors /
    ``StreamingPQMF.set_weights(params, *kernels_from_params(params))``.

    White noise is the right training signal for a linear system: the
    interior round-trip MSE equals the Frobenius norm of (roundtrip -
    identity), so the result generalizes to any program material.
    Defaults reproduce the measured M=16/atten=100 result: flute.wav
    (held out) SNR 65.1 -> 80.1 dB at a -62 dB worst stopband
    (designed: -107 dB; see :func:`make_finetune_loss` for the
    trade-off knob).

    ``lr_schedule="cosine"`` decays ``lr`` (as the peak) to 0 over
    ``steps`` — it breaks the constant-lr convergence plateau: at M=32
    (constant 3e-6 stalled at noise-MSE ~1e-7 ≈ 71 dB on every fixture)
    the cosine run with lr=2e-5, steps=8000, batch=4, length=8192
    reached 1.27e-8 and 93.6 / 79.9 / 100.5 dB on flute / violin /
    flutemulti (designed: 50.6 / 50.7 / 74.0). Every committed bank
    (:func:`load_pretrained_bank`) is that exact recipe at its band
    count — at M=16 it lifts the constant-lr result a further
    84.4 -> 98.1 dB on flute.
    """
    _require_optax()
    base = fb.build_filterbank(attenuation, n_band)
    hk0 = jnp.asarray(base["hk"])
    if length <= 2 * hk0.shape[-1]:
        raise ValueError(
            f"length={length} must exceed 2*n_taps={2 * hk0.shape[-1]} "
            f"(the interior-loss trim) for this bank; the interior slice "
            f"would be empty and training would silently produce NaNs")
    loss_fn = make_finetune_loss(n_band, hk0.shape[-1],
                                 stopband_weight=stopband_weight)
    if lr_schedule == "cosine":
        rate = optax.cosine_decay_schedule(lr, steps)
    elif lr_schedule == "constant":
        rate = lr
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}: expected "
                         f"'constant' or 'cosine'")
    init_fn, step_fn = make_train_step(optax.adam(rate), mesh=mesh,
                                       precision=precision,
                                       loss_fn=loss_fn)
    state = init_fn(hk0)
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal(
        (steps, batch, 1, length)).astype(np.float32))

    @jax.jit
    def run(state, xs):
        return jax.lax.scan(lambda s, b: step_fn(s, b), state, xs)

    state, losses = run(state, xs)
    return (fb.params_from_hk(jax.device_get(state.hk), h=base["h"]),
            jax.device_get(losses))


def load_pretrained_bank(name: str = "hk16_atten100_finetuned"):
    """Load a committed fine-tuned bank (pqmf_tpu/data/<name>.npz) as a
    params pytree. Shipped banks — all trained on white noise only with
    :func:`finetune_filterbank` (lr=2e-5, steps=8000, batch=4,
    length=8192, lr_schedule="cosine"; the schedule matters, see that
    docstring), reproducible via ``tools/finetune_bank.py``.
    Steady-state streaming-path round-trip SNR on flute / violin /
    flutemulti (:func:`streaming_roundtrip_snr`, round-4 definition),
    worst stopband -59 to -64 dB:

    - ``hk16_atten100_finetuned``: 104.9 / 106.9 / 105.1 dB
      (designed Kaiser bank: 65.1 / 58.8 / 67.5 dB the same way).
    - ``hk8_atten100_finetuned``: 102.2 / 102.3 / 103.3 dB
      (designed: 60.9 / 72.9 / 82.0 dB).
    - ``hk32_atten100_finetuned``: 104.6 / 106.4 / 106.6 dB
      (designed: 50.6 / 50.7 / 74.0 dB).
    - ``hk64_atten100_finetuned``: 101.5 / 102.3 / 106.1 dB
      (designed: 56.5 / 50.1 / 73.8 dB). The 2048-tap bank needs the
      longer interior window: length=16384, steps=12000, batch=2.
    """
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "data", f"{name}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no committed bank named {name!r}; available: "
            f"{available_pretrained_banks()}")
    with np.load(path) as z:
        return fb.params_from_hk(z["hk"],
                                 h=z["h"] if "h" in z.files else None)


def streaming_roundtrip_snr(params, attenuation: float, n_band: int,
                            wav_path: str, **streaming_kwargs) -> float:
    """Group-delay-aligned STEADY-STATE round-trip SNR (dB) of a wav file
    through ``StreamingPQMF.roundtrip`` with ``params`` installed
    (``None`` = the designed Kaiser bank). Multichannel fixtures are
    mono-averaged first (2-TestBlocks.py:30). Extra kwargs reach the
    ``StreamingPQMF`` constructor (e.g. ``use_pallas=True`` for the
    on-chip checks). This is THE measurement behind every committed
    fine-tuned-bank number (docstring above, README, the pins in
    tests/test_parallel.py) — keep it single-sourced so the alignment
    math can't drift between the tool, the demo, the tests, and
    tools/tpu_checks.py.

    One bank length is trimmed from each edge before the SNR: the
    centered conv's edge transient is a fixed O(P)-sample artifact of
    where the file happens to end, not a property of the bank — on
    flute.wav (which ends loud) the last 512 samples alone carried 95%
    of the whole-file error, swamping a 104.9 dB interior. This matches
    the training objective (``make_finetune_loss`` trims the same edge
    region, for the same documented reason). Round 4 re-pinned every
    committed number under this definition together with the corrected
    (256,256) analysis padding. The alignment/trim math itself is
    single-sourced in ``utils.metrics.aligned_roundtrip_snr_db`` (the
    steady-state definition of its definition pair)."""
    from pqmf_tpu.streaming import StreamingPQMF, kernels_from_params
    from pqmf_tpu.utils.audio import read_wav
    from pqmf_tpu.utils.metrics import aligned_roundtrip_snr_db

    x, _ = read_wav(wav_path)
    if x.shape[0] > 1:
        x = x.mean(axis=0, keepdims=True)
    x = x[:1, : (x.shape[-1] // n_band) * n_band].astype(np.float32)
    sp = StreamingPQMF(attenuation, n_band, **streaming_kwargs)
    if params is not None:
        sp.set_weights(params, *kernels_from_params(params))
    y = np.asarray(sp.roundtrip(x[None]))
    return aligned_roundtrip_snr_db(
        x[0], y[0, 0], sp.centered_delay,
        edge_trim=int(sp.params["hk"].shape[-1]))


def available_pretrained_banks() -> list[str]:
    """Names accepted by :func:`load_pretrained_bank` (the committed
    ``pqmf_tpu/data/*.npz`` artifacts)."""
    data_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "data")
    return sorted(f[:-4] for f in os.listdir(data_dir)
                  if f.endswith(".npz"))


class TrainablePQMF:
    """Convenience module: start from the designed bank, fine-tune hk."""

    def __init__(self, attenuation: float, n_band: int,
                 optimizer=None, mesh: Mesh | None = None):
        params = fb.build_filterbank(attenuation, n_band)
        self.n_band = n_band
        init_fn, self.step = make_train_step(optimizer, mesh)
        self.state = init_fn(params["hk"])

    def train_batch(self, x):
        self.state, loss = self.step(self.state, x)
        return float(loss)

    @property
    def hk(self):
        return self.state.hk


def save_train_state(state: TrainState, path: str) -> str:
    """Checkpoint the training state (hk + optimizer moments) to one npz.

    The reference's only persistence is TorchScript archives of inference
    modules (SURVEY.md §5); training state checkpointing is new surface.
    """
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(x)
                      for i, x in enumerate(flat)})
    return path


def load_train_state(template: TrainState, path: str) -> TrainState:
    """Restore a checkpoint into the structure of ``template``."""
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)

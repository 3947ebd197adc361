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


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqmf_tpu.ops import filterbank as fb

__all__ = ["analysis_from_hk", "synthesis_from_hk", "reconstruction_loss",
           "TrainState", "make_train_step", "TrainablePQMF",
           "save_train_state", "load_train_state"]


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


def make_train_step(optimizer=None, mesh: Mesh | None = None,
                    precision: str = "highest", remat: bool = False):
    """Build (init_fn, step_fn). With a mesh, the batch is sharded over
    every mesh axis (full DP) and parameters are replicated; XLA inserts
    the gradient all-reduce over ICI. ``remat=True`` rematerializes the
    analysis pass in the backward computation (jax.checkpoint), trading
    one extra forward for not keeping the sub-band activations — useful
    for long audio batches near the HBM limit."""
    if optimizer is None:
        optimizer = optax.adam(1e-4)

    loss_fn = reconstruction_loss
    if remat:
        loss_fn = jax.checkpoint(reconstruction_loss,
                                 static_argnums=(2,))

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
        state_sharding = TrainState(repl, jax.tree.map(lambda _: repl,
                                                       optimizer.init(
                                                           jnp.zeros((1,)))))
        step = jax.jit(
            step,
            in_shardings=(jax.tree.map(lambda _: repl,
                                       TrainState(0, optimizer.init(
                                           jnp.zeros((1,))))),
                          x_sharding),
            out_shardings=(jax.tree.map(lambda _: repl,
                                        TrainState(0, optimizer.init(
                                            jnp.zeros((1,))))), repl),
        )
    else:
        step = jax.jit(step)
    return init_fn, step


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

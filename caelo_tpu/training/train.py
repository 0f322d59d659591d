"""Unsupervised training loops for both auto-encoders (optax + pjit).

Replaces the reference's Keras ``multi_gpu_model`` 2-GPU data-parallel
training (``AE4SphericalRingPC.py:117-170``: MSE/Adam, 10 epochs;
``AE4VoxelPatch.py:163-235``: BCE/Adadelta) with jitted optax steps whose
parallelism is expressed as shardings over a named mesh:

* **DP**: the batch axis is sharded over ``"data"``; gradients all-reduce
  over ICI automatically via XLA's SPMD partitioner.
* **TP** (optional): the patch-AE dense kernels (2048x200 / 200x2048) are
  sharded over ``"model"`` — unnecessary at this model size (SURVEY.md
  section 2.4) but wired so the same code scales.

No parameter servers, no Manager lists — one ``jit`` with in/out shardings.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.patch_encoder import VoxelPatchAE
from ..models.respond_net import SphericalRingAE


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def respond_loss(params, model: SphericalRingAE, batch):
    """MSE reconstruction (``AE4SphericalRingPC.py:150``)."""
    recon = model.apply(params, batch)
    return jnp.mean((recon - batch) ** 2)


def patch_loss(params, model: VoxelPatchAE, batch):
    """Binary cross-entropy on occupancy (``AE4VoxelPatch.py:213``),
    computed from logits for stability."""
    logits = model.apply(params, batch)[..., 0]
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits, batch)
    )


def create_train_state(model, rng, sample, optimizer=None) -> TrainState:
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    params = model.init(rng, sample)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model, loss_fn, optimizer=None):
    if optimizer is None:
        optimizer = optax.adam(1e-3)

    @jax.jit
    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, model, batch)
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


# ------------------------------------------------------------------ sharding
def _tp_spec_for_path(path) -> P:
    """Tensor-parallel PartitionSpec for a param leaf path: shard the wide
    dense kernels of the patch AE over the 'model' axis, replicate the rest."""
    names = [getattr(p, "key", str(p)) for p in path]
    if "kernel" in names:
        for layer in ("fn1", "fn4"):
            if layer in names:
                return P(None, "model")      # (in, out): split output features
        for layer in ("fn2", "fn3"):
            if layer in names:
                return P("model", None)      # consume the split axis
    return P()


def shard_train_state(state: TrainState, mesh: Mesh,
                      tensor_parallel: bool = False) -> TrainState:
    """Place params/opt-state on the mesh (replicated, or TP for the patch AE)."""
    def spec_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: NamedSharding(
                mesh, _tp_spec_for_path(path) if tensor_parallel else P()
            ),
            tree,
        )

    params = jax.device_put(state.params, spec_tree(state.params))
    opt_state = jax.device_put(state.opt_state, spec_tree(state.opt_state))
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step)


def make_sharded_train_step(model, loss_fn, mesh: Mesh, optimizer=None):
    """DP (+ optional TP) training step: batch sharded over 'data', params
    as placed by ``shard_train_state``; XLA inserts the grad all-reduce."""
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    batch_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(None, batch_sharding))
    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, model, batch)
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step, batch_sharding

"""3D voxel-patch auto-encoder / descriptor encoder (Flax).

Re-implements the reference Keras model (``AE4VoxelPatch.py:184-213``): a 3D
conv AE over 16^3 binary occupancy patches whose 20-dim bottleneck is the
per-scale descriptor; three scales concatenate to the 60-dim CAE-LO
descriptor (``Match.py:130-135``).

The *shipped* encoder weights (``TrainedModels/EncoderModel4VoxelPatch.h5``)
use **tanh** activations everywhere including the 20-dim code — that artifact
is authoritative for inference parity, so ``activation='tanh'`` is the
default; the training script in the reference uses relu/linear, which remains
available via the module parameters.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def _act(name: str) -> Callable:
    return {
        "tanh": nn.tanh,
        "relu": nn.relu,
        "linear": lambda x: x,
        "sigmoid": nn.sigmoid,
    }[name]


class PatchEncoder(nn.Module):
    """16^3 occupancy patch -> code_dim descriptor."""

    code_dim: int = 20
    activation: str = "tanh"       # shipped weights; reference training: relu
    code_activation: str = "tanh"  # shipped weights; reference training: linear

    @nn.compact
    def __call__(self, x):
        # x: (N, 16, 16, 16) or (N, 16, 16, 16, 1)
        if x.ndim == 4:
            x = x[..., None]
        a = _act(self.activation)
        h = a(nn.Conv(8, (3, 3, 3), padding="SAME", name="conv1")(x))
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        h = a(nn.Conv(16, (3, 3, 3), padding="SAME", name="conv2")(h))
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        h = a(nn.Conv(32, (3, 3, 3), padding="SAME", name="conv3")(h))
        h = h.reshape(h.shape[0], -1)  # Keras Flatten: channels-last C-order
        h = a(nn.Dense(200, name="fn1")(h))
        code = _act(self.code_activation)(nn.Dense(self.code_dim, name="fn2")(h))
        return code


class VoxelPatchAE(nn.Module):
    """Full AE for unsupervised training (binary cross-entropy loss).

    Decoder mirrors ``AE4VoxelPatch.py:198-207``: Dense 200 -> Dense 2048 ->
    reshape 4^3 x 32 -> conv/upsample stack -> sigmoid occupancy logits.
    """

    code_dim: int = 20
    activation: str = "relu"
    code_activation: str = "linear"

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:
            x = x[..., None]
        code = PatchEncoder(
            code_dim=self.code_dim,
            activation=self.activation,
            code_activation=self.code_activation,
            name="encoder",
        )(x)
        a = _act(self.activation)
        h = a(nn.Dense(200, name="fn3")(code))
        h = a(nn.Dense(2048, name="fn4")(h))
        h = h.reshape(h.shape[0], 4, 4, 4, 32)
        h = a(nn.Conv(16, (3, 3, 3), padding="SAME", name="conv2_1")(h))
        h = _upsample2x3d(h)
        h = a(nn.Conv(8, (3, 3, 3), padding="SAME", name="conv2_2")(h))
        h = _upsample2x3d(h)
        logits = nn.Conv(1, (3, 3, 3), padding="SAME", name="out")(h)
        return logits  # apply sigmoid in the loss for stability


def _upsample2x3d(x):
    n, d, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :], (n, d, 2, h, 2, w, 2, c)
    )
    return x.reshape(n, d * 2, h * 2, w * 2, c)


def describe(encoder_apply, params, patches3, batch_chunk: int | None = None):
    """Concatenate per-scale codes into the 60-dim descriptor
    (``GetFeaturesFromPatches``, ``Match.py:130-135``).

    Args:
      encoder_apply: the bound/unbound PatchEncoder apply fn.
      params: encoder params.
      patches3: tuple of three ``(K, 16, 16, 16)`` patch tensors.
    """
    codes = [encoder_apply(params, p) for p in patches3]
    return jnp.concatenate(codes, axis=-1)

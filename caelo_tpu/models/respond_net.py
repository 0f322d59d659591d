"""2D convolutional auto-encoder over spherical-ring images (Flax).

Re-implements the reference Keras model (``AE4SphericalRingPC.py:128-146``):
an unsupervised conv AE on the x,y,z channels whose first two conv layers
form the **respond layer** — the 8-channel full-resolution feature map used
for interest-point detection.  Shipped-weights architecture verified from
``TrainedModels/SphericalRingPCRespondLayer.h5``:
Conv2D(32, 3x3, relu, same) -> Conv2D(8, 1x1, relu, same).

All convs are NHWC / channels-last, matching Keras, so the shipped weights
import 1:1 (``caelo_tpu.models.weights_io``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RespondLayer(nn.Module):
    """The keypoint-saliency feature extractor (encoder head only)."""

    features: int = 8
    width: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.width, (3, 3), padding="SAME", name="conv1_1")(x))
        x = nn.relu(nn.Conv(self.features, (1, 1), padding="SAME", name="conv1_1_2")(x))
        return x


class SphericalRingAE(nn.Module):
    """Full auto-encoder for unsupervised training (MSE reconstruction).

    Layer stack mirrors ``AE4SphericalRingPC.py:132-142``: the respond layer,
    two pool+conv encoder stages, and an upsampling decoder back to the
    3-channel input.
    """

    channels: int = 3

    @nn.compact
    def __call__(self, x):
        h = RespondLayer(name="respond")(x)
        h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        h = nn.relu(nn.Conv(16, (3, 3), padding="SAME", name="conv1_2")(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        h = nn.relu(nn.Conv(16, (3, 3), padding="SAME", name="conv2_2")(h))
        h = _upsample2x(h)
        h = nn.relu(nn.Conv(8, (3, 3), padding="SAME", name="conv2_3")(h))
        h = _upsample2x(h)
        r = nn.Conv(self.channels, (1, 1), padding="SAME", name="out")(h)
        return r

    def respond(self, x):
        return RespondLayer(name="respond")(x)


def _upsample2x(x):
    """Nearest-neighbor 2x upsampling (Keras ``UpSampling2D``)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)

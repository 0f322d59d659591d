"""Keypoint-source ablation: any detector x the CAE-LO descriptor.

The reference's evaluation matrix crosses keypoint sources (CAE-LO /
3DFeatNet / USIP / ISS / Harris / SIFT / random) with descriptor sources
(``PoseEstimation.py:30-39,187-189`` keypoint-source switch;
``EvalOnReg_KeyPts.py``; ``GenerateTrajactory.m:57-199``).  This module
builds ``FrameFeatures`` from *any* keypoint source so the same odometry /
evaluation stack runs every combination:

* built-in detectors: ``cae-lo`` (the respond-net NMS), ``iss``,
  ``harris``, ``random`` (``frontend/baselines.py``);
* external keypoints (e.g. precomputed 3DFeatNet/USIP outputs) enter via
  ``features_from_keypoints`` — pass the (K, 3) points directly.

Descriptors are always the 3-scale voxel-patch codes; external descriptor
sources can replace ``FrameFeatures.descriptors`` downstream if desired.
"""
from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models.patch_encoder import PatchEncoder
from ..voxel.grid import extract_patches, voxelize
from .baselines import (harris3d_keypoints, iss_keypoints, random_keypoints,
                        sift3d_keypoints)
from .registration import FrameFeatures

KeypointSource = Literal["cae-lo", "iss", "harris", "sift", "random"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def features_from_keypoints(encoder_params, pts: jnp.ndarray,
                            mask: jnp.ndarray, key_pts: jnp.ndarray,
                            key_mask: jnp.ndarray,
                            cfg: PipelineConfig = PipelineConfig()
                            ) -> FrameFeatures:
    """Describe an externally-chosen keypoint set with the CAE-LO encoder."""
    pyramid = voxelize(pts[:, :3], mask, cfg.voxel)
    patches = extract_patches(key_pts, key_mask, pyramid, cfg.voxel)
    enc = PatchEncoder(activation=cfg.encoder_activation,
                       code_activation=cfg.encoder_code_activation)
    codes = [enc.apply(encoder_params, p) for p in patches]
    descriptors = jnp.concatenate(codes, axis=-1)
    descriptors = jnp.where(key_mask[:, None], descriptors, 0.0)
    return FrameFeatures(
        key_pts=key_pts,
        descriptors=descriptors,
        mask=key_mask,
        key_pixels=jnp.zeros((key_pts.shape[0], 2), jnp.int32),
    )


def make_ablation_feature_fn(source: KeypointSource, respond_params,
                             encoder_params,
                             cfg: PipelineConfig = PipelineConfig(),
                             seed: int = 0):
    """A ``feature_fn(pts, mask) -> FrameFeatures`` for ``run_odometry``
    using the chosen keypoint detector."""
    if source == "cae-lo":
        from .registration import extract_frame_features

        return lambda pts, mask: extract_frame_features(
            respond_params, encoder_params, jnp.asarray(pts),
            jnp.asarray(mask), cfg
        )

    n_kp = cfg.keypoint.n_keypoints
    key = jax.random.key(seed)

    def fn(pts, mask):
        p = jnp.asarray(pts)[:, :3]
        m = jnp.asarray(mask)
        if source == "iss":
            res = iss_keypoints(p, m, n_keypoints=n_kp)
        elif source == "harris":
            res = harris3d_keypoints(p, m, n_keypoints=n_kp)
        elif source == "sift":
            res = sift3d_keypoints(p, m, n_keypoints=n_kp)
        elif source == "random":
            res = random_keypoints(key, p, m, n_keypoints=n_kp)
        else:
            raise ValueError(source)
        return features_from_keypoints(
            encoder_params, jnp.asarray(pts), m, res.key_pts, res.key_mask, cfg
        )

    return fn

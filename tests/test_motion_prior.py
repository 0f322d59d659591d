"""Constant-velocity motion prior for matching (GenerateTrajactory.m:210).

The prior gates candidate matches geometrically around the predicted
keypoint positions, suppressing descriptor aliasing on repetitive
structure — the failure mode of descriptor-only matching at high yaw rates.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caelo_tpu.config import small_test_config
from caelo_tpu.data.synthetic import synthetic_scan_pair
from caelo_tpu.frontend.matching import match_descriptors
from caelo_tpu.frontend.registration import (extract_frame_features,
                                             register_pair,
                                             register_pair_with_prior)
from caelo_tpu.geometry import se3
from caelo_tpu.models import weights_io

needs_ref = pytest.mark.skipif(
    not weights_io.reference_models_available(),
    reason="reference .h5 models not present",
)

CFG = small_test_config()


def test_gate_resolves_descriptor_alias():
    """Two frame-0 keypoints share a descriptor; the geometric gate must
    select the one consistent with the prior-predicted position."""
    code = jnp.asarray(np.full((1, 60), 0.3, np.float32))
    codes0 = jnp.concatenate([code, code], axis=0)        # identical descs
    pts0 = jnp.asarray([[50.0, 0.0, 0.0], [0.0, 50.0, 0.0]], jnp.float32)
    codes1 = code
    pts1 = jnp.asarray([[0.2, 49.8, 0.0]], jnp.float32)   # near pts0[1]
    m0 = jnp.ones((2,), bool)
    m1 = jnp.ones((1,), bool)

    # ungated: argmin tie resolves to index 0 (the WRONG keypoint)
    idx_plain, mask_plain, _ = match_descriptors(codes0, m0, codes1, m1)
    assert int(idx_plain[0]) == 0 and bool(mask_plain[0])

    # identity prior + 3 m gate: only the geometrically consistent keypoint
    # is eligible
    idx, mask, _ = match_descriptors(
        codes0, m0, codes1, m1, pts0=pts0, pts1=pts1,
        prior_R=jnp.eye(3), prior_t=jnp.zeros(3), gate_m=3.0,
    )
    assert int(idx[0]) == 1 and bool(mask[0])

    # a gate that excludes everything masks the pair out
    idx, mask, _ = match_descriptors(
        codes0, m0, codes1, m1, pts0=pts0, pts1=pts1,
        prior_R=jnp.eye(3), prior_t=jnp.asarray([500.0, 0.0, 0.0]),
        gate_m=3.0,
    )
    assert not bool(mask[0])


@needs_ref
def test_prior_registration_at_high_yaw(params=None):
    """25 deg/frame yaw (far beyond KITTI motion): with the true motion as
    prior, registration must succeed within the reference gates."""
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    scan0, mask0, scan1, mask1, R_gt, t_gt = synthetic_scan_pair(
        seed=3, cfg=CFG, angle_deg=25.0, translation=(1.0, 0.1, 0.0)
    )
    f0 = extract_frame_features(respond, encoder, jnp.asarray(scan0),
                                jnp.asarray(mask0), CFG)
    f1 = extract_frame_features(respond, encoder, jnp.asarray(scan1),
                                jnp.asarray(mask1), CFG)
    reg = register_pair_with_prior(
        jax.random.key(0), f0, f1,
        jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32), CFG,
    )
    assert bool(reg.success)
    ang = float(se3.rotation_geodesic_deg(reg.R, jnp.asarray(R_gt)))
    terr = float(np.linalg.norm(np.asarray(reg.t) - t_gt))
    assert ang < 1.0, ang
    assert terr < 0.5, terr


@needs_ref
def test_prior_does_not_regress_easy_pair():
    """On an easy KITTI-like pair the prior-gated result matches the plain
    result within the evaluation gates."""
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    scan0, mask0, scan1, mask1, R_gt, t_gt = synthetic_scan_pair(
        seed=0, cfg=CFG, angle_deg=1.5, translation=(1.2, 0.15, 0.02)
    )
    f0 = extract_frame_features(respond, encoder, jnp.asarray(scan0),
                                jnp.asarray(mask0), CFG)
    f1 = extract_frame_features(respond, encoder, jnp.asarray(scan1),
                                jnp.asarray(mask1), CFG)
    plain = register_pair(jax.random.key(0), f0, f1, CFG)
    prior = register_pair_with_prior(
        jax.random.key(0), f0, f1, jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), CFG,
    )
    assert bool(plain.success) and bool(prior.success)
    assert float(se3.rotation_geodesic_deg(prior.R, jnp.asarray(R_gt))) < 1.0
    assert float(np.linalg.norm(np.asarray(prior.t) - t_gt)) < 0.5
    # the prior pass keeps at least comparable support
    assert int(prior.n_inliers) > 0.5 * int(plain.n_inliers)

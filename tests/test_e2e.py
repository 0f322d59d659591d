"""End-to-end: synthetic scenes through the full pipeline with the shipped
reference weights (the framework's 'Match.py demo' and 'PoseEstimation'
equivalents, run as assertions instead of eyeball checks — SURVEY.md sec 4).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caelo_tpu.config import small_test_config
from caelo_tpu.data.synthetic import synthetic_scan_pair
from caelo_tpu.frontend.odometry import run_odometry
from caelo_tpu.frontend.registration import extract_frame_features, register_pair
from caelo_tpu.geometry import se3
from caelo_tpu.models import weights_io

needs_ref = pytest.mark.skipif(
    not weights_io.reference_models_available(),
    reason="reference .h5 models not present",
)

CFG = small_test_config()


@pytest.fixture(scope="module")
def params():
    return (
        weights_io.load_respond_layer_params(),
        weights_io.load_patch_encoder_params(),
    )


@needs_ref
def test_pair_registration_within_gates(params):
    respond, encoder = params
    scan0, mask0, scan1, mask1, R_gt, t_gt = synthetic_scan_pair(
        seed=0, cfg=CFG, angle_deg=1.5, translation=(1.2, 0.15, 0.02)
    )
    f0 = extract_frame_features(respond, encoder, jnp.asarray(scan0),
                                jnp.asarray(mask0), CFG)
    f1 = extract_frame_features(respond, encoder, jnp.asarray(scan1),
                                jnp.asarray(mask1), CFG)
    assert int(f0.mask.sum()) > 200 and int(f1.mask.sum()) > 200
    reg = register_pair(jax.random.key(0), f0, f1, CFG)
    assert bool(reg.success)
    ang = float(se3.rotation_geodesic_deg(reg.R, jnp.asarray(R_gt)))
    terr = float(np.linalg.norm(np.asarray(reg.t) - t_gt))
    # the reference's success thresholds (EvaluationOnRegistration.py:23-24)
    assert ang < 1.0, ang
    assert terr < 0.5, terr


@needs_ref
def test_short_sequence_odometry(params):
    """4-frame odometry chain stays within the per-pair gates."""
    respond, encoder = params
    from caelo_tpu.data.synthetic import (make_scene, range_filter,
                                          sample_scene_points)
    from caelo_tpu.ops.masking import pad_points

    scene = make_scene(seed=1)
    world = sample_scene_points(scene, seed=1, n_points=CFG.max_points)
    rng = np.random.default_rng(0)
    scans, gt_t = [], []
    for i in range(4):
        t = np.array([1.0 * i, 0.1 * i, 0.0])
        gt_t.append(t)
        local = range_filter((world - t).astype(np.float32), CFG.sensor)
        local = local + rng.normal(0, 0.005, local.shape).astype(np.float32)
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        scans.append(pad_points(np.concatenate([local, refl], 1), CFG.max_points))

    res = run_odometry(iter(scans), respond, encoder, cfg=CFG)
    assert res.successes.all(), res.successes
    # poses are lidar-frame here (identity calib): pose k translation ~ gt
    T = res.poses.reshape(-1, 3, 4)[:, :, 3]
    for i in range(4):
        assert np.linalg.norm(T[i] - gt_t[i]) < 0.5 * (i + 1), (i, T[i], gt_t[i])
    # inlier pair index bookkeeping: arrays of equal length per pair
    for idx0, idx1 in res.inlier_pairs:
        assert idx0.shape == idx1.shape

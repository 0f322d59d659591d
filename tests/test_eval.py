"""Evaluation metrics vs closed-form expectations."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from caelo_tpu.eval.metrics import (absolute_trajectory_error, kitti_drift,
                                    registration_summary,
                                    relative_pose_errors)


def trajectory(n, yaw_rate_deg=0.0, step=1.0):
    poses = np.zeros((n, 12))
    R = np.eye(3)
    t = np.zeros(3)
    for i in range(n):
        poses[i] = np.hstack([R, t[:, None]]).reshape(12)
        R = R @ Rotation.from_euler("z", yaw_rate_deg, degrees=True).as_matrix()
        t = t + R @ np.array([step, 0, 0])
    return poses


def test_zero_error_on_identical():
    gt = trajectory(50, yaw_rate_deg=1.0)
    errs = relative_pose_errors(gt, gt, np.eye(3), np.zeros(3))
    s = registration_summary(errs)
    assert s["rre_deg"] < 1e-6 and s["rte_m"] < 1e-9
    assert s["success_rate"] == 1.0


def test_known_translation_error():
    gt = trajectory(10)
    est = gt.copy()
    # perturb every relative step by +0.1 x: rebuild with step 1.1
    est = trajectory(10, step=1.1)
    errs = relative_pose_errors(gt, est, np.eye(3), np.zeros(3))
    s = registration_summary(errs)
    np.testing.assert_allclose(s["rte_m"], 0.1, atol=1e-9)
    assert s["success_rate"] == 1.0  # 0.1 < 0.5 gate


def test_rre_is_sum_abs_eulers():
    gt = trajectory(5)
    est = gt.copy()
    # rotate frame 1..4 by 0.3 deg yaw relative: est has yaw rate 0.3
    est = trajectory(5, yaw_rate_deg=0.3)
    errs = relative_pose_errors(gt, est, np.eye(3), np.zeros(3))
    np.testing.assert_allclose(np.asarray(errs.rre_deg), 0.3, atol=1e-5)


def test_calib_conjugation_invariance():
    """Lidar-frame errors must be computed through the calib conjugation
    (GetLidarRelRtBetween2Poses) — identical trajectories give zero error
    under any calibration."""
    gt = trajectory(20, yaw_rate_deg=2.0)
    R_tr = Rotation.from_euler("xyz", [90, 0, 90], degrees=True).as_matrix()
    t_tr = np.array([0.3, -0.1, 0.8])
    errs = relative_pose_errors(gt, gt, R_tr, t_tr)
    assert float(np.max(np.asarray(errs.rre_deg))) < 1e-5


def test_ate_alignment_invariant():
    gt = trajectory(30, yaw_rate_deg=1.5)
    # estimated = rigidly transformed copy -> ATE ~ 0 after alignment
    Rg = Rotation.from_euler("z", 33, degrees=True).as_matrix()
    tg = np.array([5.0, -2.0, 0.7])
    est = gt.copy().reshape(-1, 3, 4)
    est[:, :, :3] = Rg @ est[:, :, :3]
    est[:, :, 3] = est[:, :, 3] @ Rg.T + tg
    out = absolute_trajectory_error(gt, est.reshape(-1, 12))
    assert out["ate_rmse"] < 1e-4


def test_kitti_drift_zero_and_nonzero():
    gt = trajectory(500)
    out = kitti_drift(gt, gt, lengths=(100, 200))
    assert out["t_rel_pct"] < 1e-9
    est = trajectory(500, step=1.01)  # 1% scale drift
    out2 = kitti_drift(gt, est, lengths=(100, 200))
    np.testing.assert_allclose(out2["t_rel_pct"], 1.0, rtol=0.1)


def test_keypoint_repeatability():
    from caelo_tpu.eval.metrics import keypoint_repeatability
    import jax.numpy as jnp

    rng_ = np.random.default_rng(3)
    kp0 = rng_.uniform(-20, 20, (128, 3)).astype(np.float32)
    R = Rotation.from_euler("z", 2.0, degrees=True).as_matrix()
    t = np.array([1.0, 0.2, 0.0])
    # frame-1 keypoints = same world points seen from the moved sensor:
    # kp1 = R^T (kp0 - t), so R kp1 + t == kp0 exactly
    kp1 = ((kp0 - t) @ R).astype(np.float32)
    out = keypoint_repeatability(
        jnp.asarray(kp0), jnp.ones(128, bool),
        jnp.asarray(kp1), jnp.ones(128, bool), R, t,
    )
    assert out["median_m"] < 1e-4
    assert out["fraction_within"][0] == 1.0  # all within 0.1 m
    # unrelated keypoints are not repeatable
    kp_bad = rng_.uniform(-20, 20, (128, 3)).astype(np.float32)
    out2 = keypoint_repeatability(
        jnp.asarray(kp0), jnp.ones(128, bool),
        jnp.asarray(kp_bad), jnp.ones(128, bool), np.eye(3), np.zeros(3),
    )
    assert out2["median_m"] > out["median_m"]


def test_loop_closure_pr():
    from caelo_tpu.eval.metrics import loop_closure_pr

    # square loop: 40 steps of 2 m per side, frame 160 back at the origin
    t = []
    p = np.zeros(3)
    dirs = [(2, 0, 0), (0, 2, 0), (-2, 0, 0), (0, -2, 0)]
    for d in dirs:
        for _ in range(40):
            t.append(p.copy())
            p = p + np.asarray(d, float)
    t.append(np.zeros(3))
    t = np.asarray(t)

    # one correct closure (160, 2) and one bogus (100, 0)
    pr = loop_closure_pr([2, 0], [160, 100], t, min_gap=50, revisit_m=5.0,
                         window=5)
    assert pr["n_revisit_events"] >= 1
    assert pr["precision"] == 0.5
    assert pr["recall"] == 1.0

    # no edges: precision undefined, recall zero
    pr2 = loop_closure_pr([], [], t, min_gap=50, revisit_m=5.0)
    assert np.isnan(pr2["precision"]) and pr2["recall"] == 0.0

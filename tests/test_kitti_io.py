"""KITTI tree IO + calib conjugation + windowed-vs-sequential odometry.

Builds a miniature synthetic KITTI tree on disk and drives the real data
path: .bin scans through the native loader, calib.txt parsing, GT poses,
odometry, and the evaluate CLI.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from caelo_tpu.config import tiny_test_config
from caelo_tpu.data.kitti import KittiOdometry, save_kitti_poses
from caelo_tpu.frontend.odometry import run_odometry, run_odometry_windowed
from caelo_tpu.geometry.kitti_pose import load_calib_tr
from caelo_tpu.models.patch_encoder import PatchEncoder
from caelo_tpu.models.respond_net import RespondLayer

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """5-frame synthetic sequence in KITTI layout with a nontrivial calib."""
    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "sequences" / "99" / "velodyne"
    seq_dir.mkdir(parents=True)
    (root / "poses").mkdir()

    rng = np.random.default_rng(0)
    # structured world: ground + walls
    g = rng.uniform([-40, -40, -1.8], [40, 40, -1.78], (4000, 3))
    w = rng.uniform([10, -20, -1.8], [10.2, 20, 2], (1500, 3))
    w2 = rng.uniform([-20, 15, -1.8], [20, 15.2, 2], (1500, 3))
    world = np.concatenate([g, w, w2]).astype(np.float32)

    # lidar->cam calib: the standard KITTI-style axis permutation + offset
    R_tr = Rotation.from_euler("xyz", [-90, 0, -90], degrees=True).as_matrix()
    t_tr = np.array([0.05, -0.1, -0.3])
    with open(root / "sequences" / "99" / "calib.txt", "w") as f:
        for k in ("P0", "P1", "P2", "P3"):
            f.write(f"{k}: " + " ".join(["0"] * 12) + "\n")
        Tr = np.hstack([R_tr, t_tr[:, None]]).reshape(-1)
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in Tr) + "\n")

    # trajectory: straight line in lidar x with slight yaw
    poses_cam = []
    Rl = np.eye(3)
    tl = np.zeros(3)
    gt_lidar = []
    for i in range(5):
        gt_lidar.append((Rl.copy(), tl.copy()))
        # camera pose = Tr * T_lidar * Tr^-1 chained appropriately:
        Rc = R_tr @ Rl @ R_tr.T
        tc = R_tr @ (Rl @ (-R_tr.T @ t_tr) + tl) + t_tr
        poses_cam.append(np.hstack([Rc, tc[:, None]]).reshape(12))
        # advance
        dR = Rotation.from_euler("z", 0.6, degrees=True).as_matrix()
        tl = tl + Rl @ np.array([1.0, 0.05, 0.0])
        Rl = Rl @ dR
        # write the scan for frame i (sensor at (Rl_prev, tl_prev))
    np.savetxt(root / "poses" / "99.txt", np.array(poses_cam))

    for i, (Rl_i, tl_i) in enumerate(gt_lidar):
        local = (world - tl_i) @ Rl_i
        keep = np.linalg.norm(local, axis=1) < 60
        local = local[keep][: CFG.max_points - 1]
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        arr = np.concatenate([local, refl], 1).astype(np.float32)
        arr.tofile(str(seq_dir / f"{i:06d}.bin"))
    return str(root), R_tr, t_tr


def test_kitti_reader(kitti_tree):
    root, R_tr, t_tr = kitti_tree
    ds = KittiOdometry(root, CFG)
    assert ds.n_frames("99") == 5
    pts, mask = ds.load_scan("99", 0)
    assert pts.shape == (CFG.max_points, 4) and mask.sum() > 1000
    Rl, tl = ds.load_calib("99")
    np.testing.assert_allclose(Rl, R_tr, atol=1e-7)
    np.testing.assert_allclose(tl, t_tr, atol=1e-7)
    poses = ds.load_poses("99")
    assert poses.shape == (5, 12)
    scans = list(ds.iter_scans("99"))
    assert len(scans) == 5
    np.testing.assert_allclose(scans[2][0], ds.load_scan("99", 2)[0])


@pytest.fixture(scope="module")
def params():
    rng = jax.random.key(0)
    respond = RespondLayer().init(
        rng, jnp.zeros((1, CFG.sensor.model_h, CFG.sensor.model_w, 3))
    )
    encoder = PatchEncoder().init(rng, jnp.zeros((1, 16, 16, 16)))
    return respond, encoder


def test_windowed_matches_sequential(kitti_tree, params):
    """run_odometry_windowed produces the same relative poses as the
    frame-by-frame driver (same seed => same RANSAC draws per pair is NOT
    guaranteed, so compare against GT instead of bitwise)."""
    root, R_tr, t_tr = kitti_tree
    respond, encoder = params
    ds = KittiOdometry(root, CFG)
    scans = list(ds.iter_scans("99"))
    seq = run_odometry(iter(scans), respond, encoder, R_tr, t_tr, CFG, seed=0)
    win, feats = run_odometry_windowed(
        scans, respond, encoder, R_tr, t_tr, CFG, window=3, seed=0,
        keep_features=True,
    )
    assert win.poses.shape == seq.poses.shape == (5, 12)
    # features come back as ONE stacked pytree with leading axis n_frames
    assert feats.key_pts.shape[0] == 5
    assert feats.descriptors.shape[0] == 5
    assert feats.mask.shape[0] == 5
    # both drivers register the same pairs; success flags agree
    np.testing.assert_array_equal(win.successes.shape, seq.successes.shape)
    # each pair's translation estimates agree within RANSAC noise when both
    # succeed (random weights -> registration may fail; tolerate that)
    both = win.successes & seq.successes
    if both.any():
        d = np.linalg.norm(win.rel_ts[both] - seq.rel_ts[both], axis=1)
        assert np.median(d) < 0.5


def test_evaluate_cli_on_kitti_tree(kitti_tree, tmp_path):
    root, R_tr, t_tr = kitti_tree
    est = np.loadtxt(os.path.join(root, "poses", "99.txt"))
    out = tmp_path / "est.txt"
    np.savetxt(out, est)
    r = subprocess.run(
        [sys.executable, "-m", "caelo_tpu.cli", "evaluate",
         "--gt", os.path.join(root, "poses", "99.txt"),
         "--est", str(out),
         "--calib", os.path.join(root, "sequences", "99", "calib.txt"),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-500:]
    import json

    res = json.loads(r.stdout[r.stdout.index("{"):])
    assert res["rre_deg"] < 1e-6 and res["rte_m"] < 1e-9
    assert res["success_rate"] == 1.0

"""Real-KITTI ready-path (VERDICT r4 item 7): a synthetic sequence written
to disk in the EXACT KITTI odometry layout (.bin scans, calib.txt with a
nontrivial Tr row, poses/<seq>.txt), then driven end-to-end through the
same two commands a real dataset day would use —

    python -m caelo_tpu.cli full --data <tree> --seq 00 ...
    python examples/kitti_golden.py --data <tree> --seqs 00 ...

— so the only untested step between "tree mounted" and "golden row
comparison" is the data itself.  Reference layout: ``Dirs.py:19-27``;
golden row semantics: ``EvaluationOnRegistration.py:108-130``.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from caelo_tpu.models import weights_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 8

needs_ref = pytest.mark.skipif(
    not weights_io.reference_models_available(),
    reason="reference .h5 models not present",
)


@pytest.fixture(scope="module")
def kitti_format_tree(tmp_path_factory):
    """Hard-synthetic ray-cast scans in the standard KITTI odometry tree."""
    from caelo_tpu.config import ci_config
    from caelo_tpu.data.hard_synthetic import generate_benchmark

    cfg = ci_config()
    scans, gt = generate_benchmark(n_frames=N_FRAMES, seed=0, cfg=cfg,
                                   side=30.0, yaw_rate_deg=6.0,
                                   az_step_deg=1.6, n_cars=3)

    root = tmp_path_factory.mktemp("kitti_ready")
    seq_dir = root / "sequences" / "00" / "velodyne"
    seq_dir.mkdir(parents=True)
    (root / "poses").mkdir()

    for i, (pts, mask) in enumerate(scans):
        raw = np.asarray(pts)[np.asarray(mask)]      # unpadded (n, 4) f32
        raw.astype(np.float32).tofile(seq_dir / f"{i:06d}.bin")

    # standard KITTI-style lidar->cam0 axis permutation + offset
    R_tr = Rotation.from_euler("xyz", [-90, 0, -90],
                               degrees=True).as_matrix()
    t_tr = np.array([0.05, -0.1, -0.3])
    with open(root / "sequences" / "00" / "calib.txt", "w") as f:
        for k in ("P0", "P1", "P2", "P3"):
            f.write(f"{k}: " + " ".join(["0"] * 12) + "\n")
        Tr = np.hstack([R_tr, t_tr[:, None]]).reshape(-1)
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in Tr) + "\n")

    # generate_benchmark's GT is lidar-frame world poses; the KITTI poses
    # file stores CAM poses: T_cam = Tr T_lidar Tr^-1
    gt = np.asarray(gt).reshape(-1, 3, 4)
    rows = []
    for Rl, tl in zip(gt[:, :, :3], gt[:, :, 3]):
        Rc = R_tr @ Rl @ R_tr.T
        tc = R_tr @ (Rl @ (-R_tr.T @ t_tr) + tl) + t_tr
        rows.append(np.hstack([Rc, tc[:, None]]).reshape(-1))
    np.savetxt(root / "poses" / "00.txt", np.asarray(rows))
    return str(root)


def _run(cmd, cwd=REPO, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(cmd, cwd=cwd, env=env, timeout=timeout,
                          capture_output=True, text=True)


@needs_ref
@pytest.mark.slow
def test_cli_full_on_kitti_tree(kitti_format_tree, tmp_path):
    out = str(tmp_path / "runs")
    r = _run([sys.executable, "-m", "caelo_tpu.cli", "full",
              "--data", kitti_format_tree, "--seq", "00", "--out", out,
              "--no-loops", "--ci", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["frames"] == N_FRAMES
    assert res["pair_success_rate"] >= 0.99, res
    # all four reference-convention trajectories written
    for name in ("poses_", "poses__", "poses___", "poses____"):
        p = os.path.join(out, name, "00.txt")
        assert os.path.exists(p), p
        assert np.loadtxt(p).shape == (N_FRAMES, 12)


@needs_ref
@pytest.mark.slow
def test_kitti_golden_on_kitti_tree(kitti_format_tree, tmp_path):
    json_out = str(tmp_path / "KITTI_GOLDEN.json")
    r = _run([sys.executable, "examples/kitti_golden.py",
              "--data", kitti_format_tree, "--seqs", "00",
              "--frames", str(N_FRAMES), "--no-loops", "--ci-config",
              "--platform", "cpu", "--out", str(tmp_path / "runs"),
              "--json-out", json_out])
    # exit 0 = beats the golden row, 1 = machinery ran but the synthetic
    # mini-sequence missed a tolerance — both prove the ready path; 2+ is
    # a wiring failure
    assert r.returncode in (0, 1), r.stderr[-3000:]
    with open(json_out) as f:
        out = json.load(f)
    assert set(out) >= {"aggregate", "golden", "diff", "pass", "per_seq"}
    agg = out["aggregate"]
    assert agg["n_pairs"] == N_FRAMES - 1
    # the quality itself: the CI-scale hard generator registers cleanly
    assert agg["success_rate"] == 1.0, out
    assert out["per_seq"]["00"]["frames"] == N_FRAMES

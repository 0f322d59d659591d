"""Full-stack demo: square loop trajectory with drift -> loop closure fixes it.

Drives the complete odometry stack on a synthetic sequence that revisits its
start: front end, de-jump, loop-closure detection (place recognition +
geometric verification with the shipped weights) and the distributed-ready
pose-graph solve.  Prints before/after ATE and writes a trajectory plot.
"""
import os
import time

import numpy as np
import jax

from caelo_tpu.config import PipelineConfig
from caelo_tpu.data.synthetic import make_scene, range_filter, sample_scene_points
from caelo_tpu.eval.metrics import absolute_trajectory_error
from caelo_tpu.eval.viz import plot_trajectories
from caelo_tpu.models import weights_io
from caelo_tpu.ops.masking import pad_points
from caelo_tpu.pipeline import run_full_pipeline


def square_path(n_side=10, step=2.0):
    """Poses along a closed square (yaw turns at corners)."""
    from scipy.spatial.transform import Rotation

    Rs, ts = [], []
    R, t = np.eye(3), np.zeros(3)
    for leg in range(4):
        for _ in range(n_side):
            Rs.append(R.copy())
            ts.append(t.copy())
            t = t + R @ np.array([step, 0, 0])
        R = R @ Rotation.from_euler("z", 90, degrees=True).as_matrix()
    Rs.append(np.eye(3))
    ts.append(np.zeros(3))  # exact revisit of the start
    return np.array(Rs), np.array(ts)


def main():
    cfg = PipelineConfig()
    print("devices:", jax.devices())
    scene = make_scene(seed=5, n_boxes=60, extent=40.0)
    world = sample_scene_points(scene, seed=5, n_points=cfg.max_points)
    Rs, ts = square_path()
    n = len(Rs)
    rng = np.random.default_rng(0)
    scans = []
    for i in range(n):
        local = (world - ts[i]) @ Rs[i]
        local = range_filter(local.astype(np.float32), cfg.sensor)
        local = local + rng.normal(0, 0.01, local.shape).astype(np.float32)
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        scans.append(pad_points(np.concatenate([local, refl], 1), cfg.max_points))
    print(f"{n} frames around a {10*2.0:.0f} m square")

    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    t0 = time.time()
    out = run_full_pipeline(
        scans, respond, encoder, cfg=cfg,
        enable_refinement=False,           # isolate the loop-closure effect
        enable_loop_closure=True, min_loop_gap=25,
    )
    print(f"pipeline: {time.time()-t0:.1f}s, "
          f"pair success {out.odometry.successes.mean()*100:.0f}%, "
          f"loop closures accepted: {out.n_loop_closures}")

    gt = np.concatenate([Rs.reshape(n, 9), ts.reshape(n, 3)], axis=1)
    gt = np.concatenate(
        [np.concatenate([Rs[i], ts[i][:, None]], 1).reshape(1, 12)
         for i in range(n)]
    )
    ate_raw = absolute_trajectory_error(gt, out.poses_raw)
    ate_final = absolute_trajectory_error(gt, out.poses_final)
    print(f"ATE raw:   {ate_raw['ate_rmse']:.3f} m rmse "
          f"(max {ate_raw['ate_max']:.3f})")
    print(f"ATE final: {ate_final['ate_rmse']:.3f} m rmse "
          f"(max {ate_final['ate_max']:.3f})")

    os.makedirs("runs", exist_ok=True)
    p = plot_trajectories(
        "runs/loop_demo.png",
        {"ground truth": gt, "odometry": out.poses_raw,
         "after loop closure": out.poses_final},
        axes=(0, 1),
    )
    print("trajectory plot:", p)
    assert out.n_loop_closures >= 1, "no loop closures accepted"
    print("OK")


if __name__ == "__main__":
    main()

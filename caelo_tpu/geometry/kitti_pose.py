"""KITTI pose-row algebra: camera<->lidar conjugation and pose chaining.

The reference stores trajectories as KITTI 3x4 row-major pose rows and
conjugates lidar-frame relative motions with the camera-lidar calibration
``Tr`` (``Transformations.py:106-150``, ``PoseEstimation.py:259-267``).
This module provides the batched TPU-friendly equivalents.

Definitions (matching the reference exactly):
* ``pose`` row = flattened ``[R | t]`` (3x4) mapping *camera-frame* points of
  frame k into the world frame of frame 0.
* ``rel_pose_cam(pose0, pose1)`` is the transform of frame-1 points into
  frame 0 (``GetRelRtBetween2Poses``, ``Transformations.py:106-113``).
* ``rel_pose_lidar`` additionally conjugates with ``Tr``
  (``GetLidarRelRtBetween2Poses``, ``Transformations.py:118-125``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import se3


def poses_to_rt(poses: jnp.ndarray):
    """``(..., 12)`` pose rows -> ``(R, t)`` (``GetRtFromOnePose``,
    ``Transformations.py:164-168``)."""
    P = poses.reshape(poses.shape[:-1] + (3, 4))
    return P[..., :, 0:3], P[..., :, 3]


def rt_to_poses(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    P = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return P.reshape(P.shape[:-2] + (12,))


def rel_pose_cam(pose0: jnp.ndarray, pose1: jnp.ndarray):
    """Camera-frame relative transform frame1 -> frame0
    (``Transformations.py:106-113``)."""
    R0, t0 = poses_to_rt(pose0)
    R1, t1 = poses_to_rt(pose1)
    R0i, t0i = se3.inverse(R0, t0)
    return se3.compose(R0i, t0i, R1, t1)


def rel_pose_lidar(pose0, pose1, R_tr, t_tr):
    """Lidar-frame relative transform frame1 -> frame0, conjugated with the
    camera-lidar calibration (``GetLidarRelRtBetween2Poses``,
    ``Transformations.py:118-125``):  ``rel_l = Tr^-1 * pose0^-1 * pose1 * Tr``.
    """
    Rc, tc = rel_pose_cam(pose0, pose1)
    R_tri, t_tri = se3.inverse(R_tr, t_tr)
    R, t = se3.compose(Rc, tc, R_tr, t_tr)
    return se3.compose(R_tri, t_tri, R, t)


def lidar_rel_to_cam(relR, relT, R_tr, t_tr):
    """Conjugate a lidar-frame relative motion into the camera pose-delta used
    for chaining (``PoseEstimation.py:259-263``, ``AdjustPoses``
    ``Transformations.py:68-69``): ``delta_cam = Tr * rel_l * Tr^-1``."""
    R_tri, t_tri = se3.inverse(R_tr, t_tr)
    R, t = se3.compose(relR, relT, R_tri, t_tri)
    return se3.compose(R_tr, t_tr, R, t)


def chain_poses(rel_Rs: jnp.ndarray, rel_ts: jnp.ndarray, R_tr, t_tr,
                pose0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Chain per-frame lidar relative motions into KITTI pose rows.

    Replaces the sequential consumer loop of ``PoseEstimation.py:254-267``
    with a ``lax.associative_scan`` over 4x4 homogeneous matrices — the pose
    chain is a prefix product, so on TPU it runs in O(log N) depth instead of
    a Python loop.

    Args:
      rel_Rs: ``(N, 3, 3)`` lidar-frame relative rotations (frame k+1 -> k).
      rel_ts: ``(N, 3)`` lidar-frame relative translations.
      R_tr, t_tr: camera-lidar calibration.
      pose0: optional ``(12,)`` starting pose row (defaults to identity).

    Returns:
      ``(N + 1, 12)`` pose rows.
    """
    dR, dt = lidar_rel_to_cam(rel_Rs, rel_ts, R_tr, t_tr)
    T = jnp.tile(jnp.eye(4), (dR.shape[0] + 1, 1, 1))
    T = T.at[1:, :3, :3].set(dR)
    T = T.at[1:, :3, 3].set(dt)
    if pose0 is not None:
        R0, t0 = poses_to_rt(pose0)
        T = T.at[0, :3, :3].set(R0)
        T = T.at[0, :3, 3].set(t0)
    acc = jax.lax.associative_scan(jnp.matmul, T)
    return rt_to_poses(acc[:, :3, :3], acc[:, :3, 3])


def load_calib_tr(path: str):
    """Load the 3x4 lidar->camera ``Tr`` row from a KITTI ``calib.txt``.

    The reference reads a pre-stripped ``calib_.txt`` whose 5th row is ``Tr``
    (``Match.py:362-364``); we handle both the raw ``key: values`` format and
    the stripped numeric table.
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if ":" in line:
                key, vals = line.split(":", 1)
                rows.append((key.strip(), np.fromstring(vals, sep=" ")))
            else:
                rows.append((None, np.fromstring(line, sep=" ")))
    for key, vals in rows:
        if key == "Tr":
            M = vals.reshape(3, 4)
            return M[:, :3].astype(np.float64), M[:, 3].astype(np.float64)
    # stripped format: 5th numeric row is Tr
    M = rows[4][1].reshape(3, 4)
    return M[:, :3].astype(np.float64), M[:, 3].astype(np.float64)

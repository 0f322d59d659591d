"""Sequence odometry driver: pipelined feature extraction + pose chaining.

The TPU-native equivalent of ``PoseEstimation.py``'s producer/consumer
design (``:48-149`` generator process + 4 loader subprocesses feeding a
sequential consumer ``:241-268``): here feature extraction is the expensive
device-parallel part (optionally sharded over a mesh via
``caelo_tpu.parallel.pipeline``) while the pose chain — the only truly
sequential dependency — is cheap host float64 algebra.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, List, Optional

import jax
import numpy as np

from ..config import PipelineConfig
from ..geometry.kitti_pose import chain_poses, lidar_rel_to_cam
from .registration import (FrameFeatures, PairRegistration,
                           extract_frame_features, register_pair)


@dataclasses.dataclass
class OdometryResult:
    poses: np.ndarray                 # (N, 12) KITTI rows
    rel_Rs: np.ndarray                # (N-1, 3, 3) lidar-frame rels
    rel_ts: np.ndarray                # (N-1, 3)
    successes: np.ndarray             # (N-1,) bool
    n_inliers: np.ndarray             # (N-1,) int
    inlier_pairs: List                # per pair: (idx0, idx1) int arrays


def run_odometry(scans: Iterable, respond_params, encoder_params,
                 R_tr=None, t_tr=None,
                 cfg: PipelineConfig = PipelineConfig(),
                 seed: int = 0,
                 feature_fn: Optional[Callable] = None,
                 progress: Optional[Callable[[int], None]] = None
                 ) -> OdometryResult:
    """Run frame-to-frame odometry over an iterable of (pts, mask) scans.

    On RANSAC failure the reference chains the (bad) estimate anyway and
    relies on the de-jump stage (``RefinePoses.py:233-262``); we instead
    substitute constant-velocity propagation immediately and still record
    the failure for the back end.
    """
    if R_tr is None:
        R_tr = np.eye(3)
    if t_tr is None:
        t_tr = np.zeros(3)
    if feature_fn is None:
        feature_fn = lambda pts, mask: extract_frame_features(
            respond_params, encoder_params, pts, mask, cfg
        )

    key = jax.random.key(seed)
    rel_Rs, rel_ts, succ, n_inl, pairs = [], [], [], [], []
    prev_feat: FrameFeatures | None = None
    prevR, prevT = np.eye(3), np.zeros(3)
    for i, (pts, mask) in enumerate(scans):
        feat = feature_fn(pts, mask)
        if prev_feat is not None:
            key, sub = jax.random.split(key)
            reg: PairRegistration = register_pair(sub, prev_feat, feat, cfg)
            ok = bool(reg.success)
            R = np.asarray(reg.R, np.float64)
            t = np.asarray(reg.t, np.float64)
            if not ok:
                R, t = prevR, prevT  # constant-velocity fallback
            inl = np.asarray(reg.inlier_mask)
            pairs.append(
                (np.asarray(reg.inlier_idx0)[inl], np.asarray(reg.inlier_idx1)[inl])
            )
            rel_Rs.append(R)
            rel_ts.append(t)
            succ.append(ok)
            n_inl.append(int(reg.n_inliers))
            prevR, prevT = R, t
        prev_feat = feat
        if progress is not None:
            progress(i)

    rel_Rs = np.array(rel_Rs).reshape(-1, 3, 3)
    rel_ts = np.array(rel_ts).reshape(-1, 3)
    poses = np.asarray(
        chain_poses(rel_Rs, rel_ts, np.asarray(R_tr), np.asarray(t_tr))
    )
    return OdometryResult(
        poses=poses,
        rel_Rs=rel_Rs,
        rel_ts=rel_ts,
        successes=np.array(succ, bool),
        n_inliers=np.array(n_inl, np.int32),
        inlier_pairs=pairs,
    )

"""Full odometry stack: front end -> de-jump -> refinement -> loop closure
-> pose-graph solve.

The reference runs this as four hand-sequenced scripts communicating through
pose text files (``PoseEstimation.py`` -> ``poses_``, ``RefinePoses.py``
de-jump -> ``poses__``, refinement -> ``poses___``, loop closure ->
``poses____``; naming convention ``Dirs.py:19-24``).  Here it is one
function with the same staging — every stage's output is kept so the
four-trajectory convention (and its evaluation) is preserved.
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backend import refine
from .backend.loopclosure import detect_and_close
from .backend.posegraph import concat_graphs, odometry_graph, optimize
from .backend.refine_runner import (extract_refinement_features,
                                    make_batched_icp_fn, make_icp_fn)
from .config import PipelineConfig
from .frontend.odometry import OdometryResult, run_odometry
from .frontend.registration import register_pair
from .geometry.kitti_pose import lidar_rel_to_cam, poses_to_rt, rt_to_poses


@dataclasses.dataclass
class FullPipelineResult:
    poses_raw: np.ndarray        # poses_     — chained odometry
    poses_dejumped: np.ndarray   # poses__    — after de-jump
    poses_refined: np.ndarray    # poses___   — after ICP refinement
    poses_final: np.ndarray      # poses____  — after loop closure + graph solve
    odometry: OdometryResult
    dejumped_frames: List
    refine_stats: "refine.RefineStats"
    n_loop_closures: int
    # accepted closure endpoints (frame indices) — score with
    # eval.metrics.loop_closure_pr against GT positions
    loop_edge_i: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32))
    loop_edge_j: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32))


def run_full_pipeline(scans: Iterable, respond_params, encoder_params,
                      R_tr=None, t_tr=None,
                      cfg: PipelineConfig = PipelineConfig(),
                      enable_refinement: bool = True,
                      enable_loop_closure: bool = True,
                      min_loop_gap: int = 100,
                      seed: int = 0,
                      batched_refine: bool = True) -> FullPipelineResult:
    if R_tr is None:
        R_tr = np.eye(3)
    if t_tr is None:
        t_tr = np.zeros(3)
    scans = list(scans)

    # ---- stage 1: odometry front end (windowed: one jitted program per
    # 16-frame window; features kept for loop closure)
    from .frontend.odometry import run_odometry_windowed

    odo, feats = run_odometry_windowed(
        scans, respond_params, encoder_params, R_tr, t_tr, cfg,
        window=min(16, len(scans)), seed=seed, keep_features=True,
    )
    poses_raw = odo.poses

    # ---- stage 2: de-jump (FixJumpPoses)
    poses_dj, dejumped = refine.fix_jump_poses(poses_raw, cfg.refine)

    # ---- stage 3: keyframe-transfer ICP refinement
    if enable_refinement:
        # batched feature extraction (one dispatch per 16-frame chunk)
        vext = jax.jit(jax.vmap(
            lambda p, m: extract_refinement_features(respond_params, p, m, cfg)
        ))
        ref_feats = []
        chunk = min(16, len(scans))
        for s in range(0, len(scans), chunk):
            grp = scans[s:s + chunk]
            pad = chunk - len(grp)
            grp = grp + [grp[-1]] * pad
            pts = jnp.stack([jnp.asarray(p) for p, _ in grp])
            msk = jnp.stack([jnp.asarray(m) for _, m in grp])
            batched = vext(pts, msk)
            for j in range(chunk - pad):
                ref_feats.append(jax.tree.map(lambda x: x[j], batched))
        def rel_lidar_fn(p0, p1):
            from .geometry.kitti_pose import rel_pose_lidar

            R, t = rel_pose_lidar(
                jnp.asarray(p0), jnp.asarray(p1),
                jnp.asarray(R_tr, jnp.float64), jnp.asarray(t_tr, jnp.float64),
            )
            return np.asarray(R), np.asarray(t)

        def apply_rel_fn(pose0, relR, relT):
            dR, dt = lidar_rel_to_cam(
                jnp.asarray(relR), jnp.asarray(relT),
                jnp.asarray(R_tr, jnp.float64), jnp.asarray(t_tr, jnp.float64),
            )
            R0, t0 = refine._rt(pose0)
            return refine._row(R0 @ np.asarray(dR),
                               R0 @ np.asarray(dt) + t0)

        if batched_refine:
            # Jacobi-style: all keyframe-span ICP solves in two batched
            # device passes (refine_runner.refine_pairs_batched)
            poses_ref, stats = refine.refine_odometry_batched(
                poses_dj, make_batched_icp_fn(ref_feats, cfg),
                rel_lidar_fn, apply_rel_fn,
                inlier_idx_pairs=odo.inlier_pairs, cfg=cfg.refine,
            )
        else:
            poses_ref, stats = refine.refine_odometry(
                poses_dj, make_icp_fn(ref_feats, cfg), rel_lidar_fn,
                apply_rel_fn, inlier_idx_pairs=odo.inlier_pairs,
                cfg=cfg.refine,
            )
    else:
        poses_ref, stats = poses_dj, refine.RefineStats()

    # ---- stage 4: loop closure + pose-graph solve (lidar-frame graph)
    n_loops = 0
    poses_final = poses_ref
    loop_ei = np.zeros(0, np.int32)
    loop_ej = np.zeros(0, np.int32)
    if enable_loop_closure and len(scans) > min_loop_gap:
        key = jax.random.key(seed + 7)
        from .backend.scancontext import yaw_rotation
        from .frontend.registration import register_pair_with_prior

        def register_fn(i, j, yaw=None):
            reg = register_pair(key, feats[i], feats[j], cfg)
            if not bool(reg.success) and yaw is not None:
                # retry with the ScanContext yaw as a motion prior (wide
                # gate: the prior carries no translation)
                reg = register_pair_with_prior(
                    key, feats[i], feats[j], yaw_rotation(yaw),
                    jnp.zeros(3, jnp.float32), cfg, gate_m=15.0,
                )
            return (np.asarray(reg.R), np.asarray(reg.t),
                    bool(reg.success), int(reg.n_inliers))

        loops = detect_and_close(feats, register_fn, min_gap=min_loop_gap,
                                 use_scan_context=True)
        n_loops = loops.n_accepted
        loop_ei = np.asarray(loops.edges.edge_i, np.int32)
        loop_ej = np.asarray(loops.edges.edge_j, np.int32)
        if n_loops > 0:
            # build lidar-frame world poses from the refined camera poses
            # via the calib conjugation: T_world_lidar = pose @ Tr
            P = poses_ref.reshape(-1, 3, 4)
            R_w = np.einsum("nij,jk->nik", P[:, :, :3], np.asarray(R_tr))
            t_w = (
                np.einsum("nij,j->ni", P[:, :, :3], np.asarray(t_tr))
                + P[:, :, 3]
            )
            g = concat_graphs(
                odometry_graph(odo.rel_Rs, odo.rel_ts), loops.edges
            )
            Ro, to, _ = optimize(
                jnp.asarray(R_w, jnp.float32), jnp.asarray(t_w, jnp.float32),
                jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if x.dtype in (jnp.float64,) else x, g
                ),
                n_iters=8, cg_iters=60,
            )
            # back to camera pose rows: pose = T_world_lidar @ Tr^-1
            Rti = np.asarray(R_tr).T
            tti = -Rti @ np.asarray(t_tr)
            Rc = np.einsum("nij,jk->nik", np.asarray(Ro, np.float64), Rti)
            tc = (
                np.einsum("nij,j->ni", np.asarray(Ro, np.float64), tti)
                + np.asarray(to, np.float64)
            )
            poses_final = np.asarray(
                rt_to_poses(jnp.asarray(Rc), jnp.asarray(tc))
            )

    return FullPipelineResult(
        poses_raw=poses_raw,
        poses_dejumped=poses_dj,
        poses_refined=poses_ref,
        poses_final=poses_final,
        odometry=odo,
        dejumped_frames=dejumped,
        refine_stats=stats,
        n_loop_closures=n_loops,
        loop_edge_i=loop_ei,
        loop_edge_j=loop_ej,
    )

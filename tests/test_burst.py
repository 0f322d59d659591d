"""Multi-frame burst rescue (backend.burst): scan-to-local-map joint
registration recovers a degraded span where pairwise evidence is thin."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caelo_tpu.backend.burst import (burst_map_icp, find_burst_spans,
                                     rescue_bursts)
from caelo_tpu.backend.refine_runner import RefinementFeatures
from caelo_tpu.config import IcpConfig, PipelineConfig


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _make_world(rng, n=4000):
    """Structured world: ground plane + two walls + scattered posts."""
    g = rng.uniform([-30, -30, -1.8], [30, 30, -1.75], (n // 2, 3))
    w1 = rng.uniform([12, -25, -1.8], [12.3, 25, 2.5], (n // 4, 3))
    w2 = rng.uniform([-25, 14, -1.8], [25, 14.3, 2.5], (n // 8, 3))
    posts = rng.uniform([-20, -20, -1.8], [20, 20, 3.0], (n // 8, 3))
    return np.concatenate([g, w1, w2, posts]).astype(np.float32)


def _frame_cloud(world, R, t, E, wedge_deg=None, rng=None, keep=0.9):
    """World points in the sensor frame at pose (R, t), optionally masked
    to an azimuth wedge (the degraded-sensor geometry: only a narrow
    sensor-locked sector visible)."""
    local = (world - t) @ R            # R maps sensor->world; inverse = R^T
    sel = np.ones(len(local), bool)
    if wedge_deg is not None:
        az = np.degrees(np.arctan2(local[:, 1], local[:, 0]))
        sel &= np.abs(az) < wedge_deg / 2.0
    if rng is not None:
        sel &= rng.uniform(size=len(local)) < keep
    local = local[sel] + (rng.normal(0, 0.01, (sel.sum(), 3))
                          if rng is not None else 0.0)
    pts = np.zeros((E, 3), np.float32)
    msk = np.zeros((E,), bool)
    m = min(len(local), E)
    pts[:m] = local[:m]
    msk[:m] = True
    return pts, msk


def test_find_burst_spans():
    h = np.ones(30, bool)
    h[5:12] = False       # 7-frame burst
    h[20:22] = False      # too short
    assert find_burst_spans(h, min_burst=4) == [(4, 12)]
    assert find_burst_spans(h, min_burst=2) == [(4, 12), (19, 22)]
    # burst at the sequence edge clamps
    h2 = np.ones(10, bool)
    h2[0:5] = False
    assert find_burst_spans(h2, min_burst=4) == [(0, 5)]
    # long runs split
    h3 = np.ones(40, bool)
    h3[2:38] = False
    spans = find_burst_spans(h3, min_burst=4, max_span=16)
    assert spans[0] == (1, 17) and spans[-1][1] == 38


def test_burst_map_icp_recovers_turn():
    """6 degraded frames (90-deg wedge) through a 6 deg/frame yaw turn:
    the wrong constant-velocity initialization must be pulled back to the
    true motion by registering against the accumulated local map."""
    rng = np.random.default_rng(0)
    world = _make_world(rng)
    E = 2048
    n_frames = 8           # anchor + 6 burst + anchor
    gt_R, gt_t = [], []
    R, t = np.eye(3), np.zeros(3)
    for k in range(n_frames):
        gt_R.append(R.copy())
        gt_t.append(t.copy())
        dR = _rotz(np.radians(6.0))
        t = t + R @ np.array([0.8, 0.0, 0.0])
        R = R @ dR
    pts, msk = [], []
    for k in range(n_frames):
        wedge = None if k in (0, n_frames - 1) else 90.0
        p, m = _frame_cloud(world, gt_R[k], gt_t[k], E, wedge_deg=wedge,
                            rng=rng)
        assert m.sum() > 300, (k, m.sum())
        pts.append(p)
        msk.append(m)
    # true rels (frame k+1 -> frame k): R_rel = R_k^T R_{k+1}
    true_R = [gt_R[k].T @ gt_R[k + 1] for k in range(n_frames - 1)]
    true_t = [gt_R[k].T @ (gt_t[k + 1] - gt_t[k])
              for k in range(n_frames - 1)]
    # wrong init: straight-line constant velocity (no turn)
    init_R = [np.eye(3)] * (n_frames - 1)
    init_t = [np.array([0.8, 0.0, 0.0])] * (n_frames - 1)

    icp_cfg = IcpConfig(max_points=E, max_iters=20, min_inliers=60)
    max_span = n_frames - 1
    rRs, rTs, oks, r0s, r1s, R_cl, t_cl, ok_cl, cl_res = burst_map_icp(
        jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(msk)),
        jnp.asarray(np.stack(init_R), jnp.float32),
        jnp.asarray(np.stack(init_t), jnp.float32),
        jnp.asarray(max_span, jnp.int32), icp_cfg=icp_cfg,
        max_span=max_span, frame_budget=512, thr_scale=2.0)
    rRs, rTs = np.asarray(rRs, np.float64), np.asarray(rTs, np.float64)
    oks = np.asarray(oks)
    assert oks.all(), oks
    # residual gain must be material (the acceptance evidence)
    r0s, r1s = np.asarray(r0s), np.asarray(r1s)
    assert (r0s - r1s).mean() > 0.05, (r0s, r1s)
    # the healthy-to-healthy closure (exit anchor vs entry anchor) must
    # succeed and pin the span's total transform
    assert bool(ok_cl)
    true_cl_R = gt_R[0].T @ gt_R[-1]
    true_cl_t = gt_R[0].T @ (gt_t[-1] - gt_t[0])
    ang_cl = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(R_cl).T @ true_cl_R) - 1) / 2, -1, 1)))
    assert ang_cl < 0.5, ang_cl
    assert np.linalg.norm(np.asarray(t_cl) - true_cl_t) < 0.3
    # interior rels solved to well under the 6-deg init error
    for k in range(max_span):
        ang_new = np.degrees(np.arccos(np.clip(
            (np.trace(rRs[k].T @ true_R[k]) - 1) / 2, -1, 1)))
        assert ang_new < 1.5, (k, ang_new)
    # interior (non-anchor-adjacent) pairs essentially exact
    for k in range(1, max_span - 1):
        ang_new = np.degrees(np.arccos(np.clip(
            (np.trace(rRs[k].T @ true_R[k]) - 1) / 2, -1, 1)))
        assert ang_new < 0.3, (k, ang_new)
        assert np.linalg.norm(rTs[k] - true_t[k]) < 0.1


def test_rescue_bursts_splices_trajectory():
    """End-to-end host wrapper: unhealthy run detected, solved, accepted by
    the residual-gain gate, and the trajectory re-chained."""
    rng = np.random.default_rng(1)
    world = _make_world(rng)
    E = 2048
    n_frames = 10
    gt_R, gt_t = [], []
    R, t = np.eye(3), np.zeros(3)
    for k in range(n_frames):
        gt_R.append(R.copy())
        gt_t.append(t.copy())
        t = t + R @ np.array([0.8, 0.0, 0.0])
        R = R @ _rotz(np.radians(5.0))
    healthy = np.ones(n_frames, bool)
    healthy[2:8] = False
    pts, msk = [], []
    for k in range(n_frames):
        p, m = _frame_cloud(world, gt_R[k], gt_t[k], E,
                            wedge_deg=None if healthy[k] else 100.0,
                            rng=rng)
        pts.append(p)
        msk.append(m)
    feats = RefinementFeatures(
        ext_pts=jnp.asarray(np.stack(pts)),
        ext_mask=jnp.asarray(np.stack(msk)),
        planar=jnp.zeros((n_frames, 8, 6), jnp.float32),
        planar_mask=jnp.zeros((n_frames, 8), bool))
    # corrupted trajectory: straight line through the turn (identity calib)
    poses = []
    Rc, tc = np.eye(3), np.zeros(3)
    for k in range(n_frames):
        poses.append(np.hstack([Rc, tc[:, None]]).reshape(12))
        if healthy[min(k + 1, n_frames - 1)] and healthy[k]:
            Rn = gt_R[k].T @ gt_R[k + 1] if k + 1 < n_frames else np.eye(3)
            tn = gt_R[k].T @ (gt_t[k + 1] - gt_t[k]) \
                if k + 1 < n_frames else np.zeros(3)
        else:
            Rn, tn = np.eye(3), np.array([0.8, 0.0, 0.0])
        tc = tc + Rc @ tn
        Rc = Rc @ Rn
    poses = np.stack(poses)

    def rel_fn(p0, p1):
        P0 = np.asarray(p0).reshape(3, 4)
        P1 = np.asarray(p1).reshape(3, 4)
        return P0[:, :3].T @ P1[:, :3], P0[:, :3].T @ (P1[:, 3] - P0[:, 3])

    def apply_fn(p0, Rr, tr_):
        P0 = np.asarray(p0).reshape(3, 4)
        return np.hstack([P0[:, :3] @ Rr,
                          (P0[:, :3] @ tr_ + P0[:, 3])[:, None]]).reshape(12)

    cfg = PipelineConfig(icp=IcpConfig(max_points=E, max_iters=20,
                                       min_inliers=60))
    new_poses, stats = rescue_bursts(poses, feats, healthy, rel_fn,
                                     apply_fn, cfg)
    assert stats.spans == [(1, 8)]
    assert stats.accepted == [(1, 8)], (stats.rejected, stats.gains)
    gt_pos = np.stack(gt_t)
    err_old = np.linalg.norm(
        poses.reshape(-1, 3, 4)[:, :, 3] - gt_pos, axis=1)
    err_new = np.linalg.norm(
        new_poses.reshape(-1, 3, 4)[:, :, 3] - gt_pos, axis=1)
    assert err_new.max() < 0.35 * err_old.max(), (err_old.max(),
                                                  err_new.max())

"""Back-end refinement logic: de-jump, forward/backward update, transfer chains."""
import numpy as np
from scipy.spatial.transform import Rotation

from caelo_tpu.backend import refine
from caelo_tpu.config import RefineConfig


def straight_trajectory(n, step=1.0):
    poses = np.zeros((n, 12))
    for i in range(n):
        poses[i] = np.hstack([np.eye(3), [[i * step], [0], [0]]]).reshape(12)
    return poses


def test_forward_update_rechains():
    poses = straight_trajectory(6)
    rel_Rs, rel_ts = refine._all_rels(poses)
    new_pose = poses[2].copy()
    new_pose[3] += 0.5  # shift frame 2 by +0.5 in x
    out, _, _ = refine.forward_update(poses, 2, new_pose, rel_Rs, rel_ts)
    # all later frames shift by the same amount (rels preserved)
    np.testing.assert_allclose(out[2:, 3], poses[2:, 3] + 0.5, atol=1e-9)
    np.testing.assert_allclose(out[:2], poses[:2], atol=1e-9)


def test_backward_update_distributes():
    poses = straight_trajectory(8)
    rel_Rs, rel_ts = refine._all_rels(poses)
    new_pose = poses[6].copy()
    new_pose[7] += 0.6  # shift frame 6 by +0.6 in y
    out, rR, rt = refine.backward_update(poses, 2, 6, new_pose, rel_Rs, rel_ts)
    # frame 6 lands exactly on the new pose
    np.testing.assert_allclose(out[6], new_pose, atol=1e-6)
    # frames 3..5 move by interpolated fractions of the correction
    np.testing.assert_allclose(out[3, 7], 0.15, atol=1e-6)
    np.testing.assert_allclose(out[4, 7], 0.30, atol=1e-6)
    np.testing.assert_allclose(out[5, 7], 0.45, atol=1e-6)
    # frames outside the window untouched
    np.testing.assert_allclose(out[:3], poses[:3], atol=1e-9)


def test_backward_update_near_gimbal_exact():
    """Spans whose rotation delta sits near pitch +-90 deg must distribute
    exactly.  Regression for the Euler-interpolation edge case (observed as
    a ~9e-3 deg endpoint error at span (171, 173) on the hard circuit): the
    ``_euler_deg`` -> ``from_euler`` round trip is degenerate near gimbal
    lock, so the delta is now interpolated as a rotation vector, which
    rebuilds the endpoint to float64 round-off by construction."""
    rng = np.random.default_rng(7)
    n = 8
    poses = np.zeros((n, 12))
    R = np.eye(3)
    t = np.zeros(3)
    for i in range(n):
        poses[i] = np.hstack([R, t.reshape(3, 1)]).reshape(12)
        R = R @ Rotation.from_euler(
            "xyz", rng.normal(0, 0.05, 3)).as_matrix()
        t = t + R @ np.array([1.0, 0.0, 0.0])
    rel_Rs, rel_ts = refine._all_rels(poses)
    # correction whose delta rotation has pitch ~89.9 deg (gimbal edge)
    R6, t6 = refine._rt(poses[6])
    dR = Rotation.from_euler("xyz", [10.0, 89.9, -35.0],
                             degrees=True).as_matrix()
    new_pose = refine._row(R6 @ dR, t6 + np.array([0.3, -0.2, 0.1]))
    out, _, _ = refine.backward_update(poses, 2, 6, new_pose, rel_Rs, rel_ts)
    # must not raise BackwardUpdateInexact, and the endpoint is exact
    Rv, tv = refine._rel(out[6], new_pose)
    assert np.linalg.norm(refine._euler_deg(Rv)) < 1e-6
    assert np.linalg.norm(tv) < 1e-6


def test_fix_jump_poses():
    poses = straight_trajectory(10)
    # inject a jump: frame 5 displaced sideways by 2 m
    poses[5, 7] += 2.0
    fixed, frames = refine.fix_jump_poses(poses, RefineConfig())
    assert len(frames) >= 1
    # after de-jump the trajectory is straight again (constant velocity)
    rel_Rs, rel_ts = refine._all_rels(fixed)
    steps = np.linalg.norm(rel_ts, axis=1)
    np.testing.assert_allclose(steps, 1.0, atol=1e-6)


def test_fix_jump_detects_sign_flip():
    """A translation REVERSAL (+1 m/frame -> -1 m/frame) must read as a jump.

    Regression for an abs-before-diff bug: |abs(t_i) - abs(t_{i-1})| is zero
    for a sign flip, so the jump was silently missed; the reference diffs the
    signed vectors (``Transformations.py:148``)."""
    poses = straight_trajectory(10)
    # frame 5 steps BACKWARD: positions ... 3, 4, 3, 4, 5 ...
    poses[5:, 3] -= 2.0
    fixed, frames = refine.fix_jump_poses(poses, RefineConfig())
    assert 5 in frames
    rel_Rs, rel_ts = refine._all_rels(fixed)
    np.testing.assert_allclose(rel_ts[:, 0], 1.0, atol=1e-6)


def test_fix_jump_detects_yaw_sign_flip():
    """+2 deg/frame -> -2 deg/frame yaw flip is a jump (same regression)."""
    n = 10
    poses = np.zeros((n, 12))
    yaw = 0.0
    pos = np.zeros(3)
    rates = [2.0] * 5 + [-2.0] + [2.0] * (n - 6)
    for i in range(n):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        poses[i] = np.hstack([R, pos[:, None]]).reshape(12)
        pos = pos + R @ np.array([1.0, 0.0, 0.0])
        yaw += np.radians(rates[i])
    fixed, frames = refine.fix_jump_poses(poses, RefineConfig())
    assert len(frames) >= 1
    eul = np.array([refine._euler_deg(R)
                    for R in refine._all_rels(fixed)[0]])
    # after de-jump every step turns at the constant +2 deg/frame rate
    np.testing.assert_allclose(eul[:, 2], 2.0, atol=1e-6)


def test_fix_jump_keeps_clean_trajectory():
    poses = straight_trajectory(10)
    fixed, frames = refine.fix_jump_poses(poses, RefineConfig())
    assert frames == []
    np.testing.assert_allclose(fixed, poses, atol=1e-12)


def test_transfer_pair_chain():
    # tracks: keypoint 7 survives pairs 0-1-2-3; others die
    pairs = [
        (np.array([1, 7, 9]), np.array([11, 17, 19])),
        (np.array([17, 30]), np.array([27, 40])),
        (np.array([27]), np.array([37])),
        (np.array([99]), np.array([98])),
    ]
    end, n = refine.transfer_pair_chain(pairs, 0, max_frames=20)
    assert end == 3 and n == 1
    end2, _ = refine.transfer_pair_chain(pairs, 3, max_frames=20)
    assert end2 == 4


def test_transfer_chain_respects_max_frames():
    pairs = [(np.arange(10), np.arange(10)) for _ in range(30)]
    end, n = refine.transfer_pair_chain(pairs, 0, max_frames=5)
    assert end - 0 <= 6


def test_refine_odometry_accepts_good_correction():
    poses = straight_trajectory(6)
    # odometry has a constant small bias; "ICP" knows the truth
    drifted = poses.copy()
    for i in range(1, 6):
        drifted[i, 7] = 0.1 * i  # y drift 0.1/frame

    def rel_lidar_fn(p0, p1):
        return refine._rel(p0, p1)

    def icp_fn(i, j, relR, relT):
        # true relative motion is (1, 0, 0) per frame span
        true_t = np.array([1.0 * (j - i), 0.0, 0.0])
        dt = true_t - relT
        return np.eye(3), dt, True

    def apply_rel_fn(pose0, R, t):
        R0, t0 = refine._rt(pose0)
        return refine._row(R0 @ R, R0 @ t + t0)

    out, stats = refine.refine_odometry(
        drifted, icp_fn, rel_lidar_fn, apply_rel_fn
    )
    assert len(stats.refined) > 0 and len(stats.failed) == 0
    np.testing.assert_allclose(out[:5, 7], 0.0, atol=1e-9)


def test_refine_odometry_rejects_large_correction():
    poses = straight_trajectory(6)

    def icp_fn(i, j, relR, relT):
        return np.eye(3), np.array([50.0, 0, 0]), True  # absurd correction

    out, stats = refine.refine_odometry(
        poses, icp_fn, refine._rel,
        lambda p, R, t: refine._row(*(lambda R0, t0: (R0 @ R, R0 @ t + t0))(*refine._rt(p))),
    )
    assert len(stats.rejected) > 0
    np.testing.assert_allclose(out, poses, atol=1e-9)  # unchanged


def _apply_rel(pose0, R, t):
    R0, t0 = refine._rt(pose0)
    return refine._row(R0 @ R, R0 @ t + t0)


def _as_batched(icp_fn):
    """Lift a scalar icp_fn into the batched contract (thr_scale is the
    coarse-to-fine retry rung, forwarded if the scalar fn takes it)."""
    import inspect

    takes_scale = "thr_scale" in inspect.signature(icp_fn).parameters

    def batched(idx_i, idx_j, relRs, relTs, thr_scale=1.0):
        kw = {"thr_scale": thr_scale} if takes_scale else {}
        out = [icp_fn(int(a), int(b), R, t, **kw)
               for a, b, R, t in zip(idx_i, idx_j, relRs, relTs)]
        return (np.stack([o[0] for o in out]),
                np.stack([o[1] for o in out]),
                np.array([o[2] for o in out], bool))
    return batched


def test_refine_batched_matches_sequential_on_accept_path():
    poses = straight_trajectory(8)
    drifted = poses.copy()
    for i in range(1, 8):
        drifted[i, 7] = 0.1 * i

    def icp_fn(i, j, relR, relT):
        true_t = np.array([1.0 * (j - i), 0.0, 0.0])
        return np.eye(3), true_t - relT, True

    seq, seq_stats = refine.refine_odometry(
        drifted, icp_fn, refine._rel, _apply_rel
    )
    bat, bat_stats = refine.refine_odometry_batched(
        drifted, _as_batched(icp_fn), refine._rel, _apply_rel
    )
    np.testing.assert_allclose(bat, seq, atol=1e-9)
    assert bat_stats.refined == seq_stats.refined


def test_refine_batched_matches_sequential_with_chains():
    """Multi-frame spans via inlier transfer chains, all accepted."""
    poses = straight_trajectory(10)
    drifted = poses.copy()
    for i in range(1, 10):
        drifted[i, 7] = 0.05 * i
    # tracks alive for 3 consecutive pairs, then break
    pairs = []
    for k in range(9):
        if k % 3 == 2:
            pairs.append((np.array([900 + k]), np.array([901 + k])))
        else:
            pairs.append((np.array([5, 6, 7]), np.array([5, 6, 7])))

    def icp_fn(i, j, relR, relT):
        true_t = np.array([1.0 * (j - i), 0.0, 0.0])
        return np.eye(3), true_t - relT, True

    seq, seq_stats = refine.refine_odometry(
        drifted, icp_fn, refine._rel, _apply_rel, inlier_idx_pairs=pairs
    )
    bat, bat_stats = refine.refine_odometry_batched(
        drifted, _as_batched(icp_fn), refine._rel, _apply_rel,
        inlier_idx_pairs=pairs,
    )
    assert any(j - i > 1 for i, j in seq_stats.refined)  # real chains formed
    np.testing.assert_allclose(bat, seq, atol=1e-9)
    assert bat_stats.refined == seq_stats.refined


def test_refine_retry_ladder_rescues_failed_steps():
    """A step that fails at the default ICP gate but succeeds at a wider
    rung is rescued by the coarse-to-fine ladder (pass 3)."""
    poses = straight_trajectory(6)
    drifted = poses.copy()
    drifted[3:, 7] += 2.0   # one bad step at pair (2, 3)

    def icp_fn(i, j, relR, relT, thr_scale=1.0):
        true_t = np.array([1.0 * (j - i), 0.0, 0.0])
        err = np.linalg.norm(relT - true_t)
        if err > 0.5 * thr_scale:     # gate too tight at rung 1
            return np.eye(3), np.zeros(3), False
        return np.eye(3), true_t - relT, True

    out, stats = refine.refine_odometry_batched(
        drifted, _as_batched(icp_fn), refine._rel, _apply_rel
    )
    assert (2, 3) in stats.refined       # rescued at a wider rung
    assert not stats.failed
    np.testing.assert_allclose(out[:, 7], 0.0, atol=1e-9)


def test_refine_distributes_span_correction():
    """With backward_distribute (default), an accepted multi-frame span
    correction spreads over the intermediate frames instead of landing as a
    kink at the endpoint; the endpoint and tail match the forward-only
    variant exactly."""
    import dataclasses

    poses = straight_trajectory(10)
    drifted = poses.copy()
    for i in range(1, 10):
        drifted[i, 7] = 0.05 * i
    pairs = [(np.array([5, 6, 7]), np.array([5, 6, 7])) for _ in range(9)]

    def icp_fn(i, j, relR, relT):
        true_t = np.array([1.0 * (j - i), 0.0, 0.0])
        return np.eye(3), true_t - relT, True

    cfg_fwd = dataclasses.replace(RefineConfig(), backward_distribute=False)
    out_b, st_b = refine.refine_odometry(
        drifted, icp_fn, refine._rel, _apply_rel, inlier_idx_pairs=pairs
    )
    out_f, st_f = refine.refine_odometry(
        drifted, icp_fn, refine._rel, _apply_rel, inlier_idx_pairs=pairs,
        cfg=cfg_fwd,
    )
    assert st_b.refined == st_f.refined
    spans = [s for s in st_b.refined if s[1] - s[0] > 1]
    assert spans
    i, j = spans[0]
    # endpoints agree between the two modes...
    np.testing.assert_allclose(out_b[j], out_f[j], atol=1e-9)
    # ...but the distributed mode moves an intermediate frame toward the
    # corrected line while forward-only leaves it at the drifted value
    mid = (i + j) // 2
    assert abs(out_b[mid, 7]) < abs(out_f[mid, 7]) - 1e-3
    # batched path distributes identically
    out_bb, _ = refine.refine_odometry_batched(
        drifted, _as_batched(icp_fn), refine._rel, _apply_rel,
        inlier_idx_pairs=pairs,
    )
    np.testing.assert_allclose(out_bb, out_b, atol=1e-9)


def test_refine_batched_single_step_fallback():
    """A long span whose ICP fails falls back to batched single steps."""
    poses = straight_trajectory(10)
    pairs = [(np.array([5, 6, 7]), np.array([5, 6, 7])) for _ in range(9)]

    def icp_fn(i, j, relR, relT):
        if j - i > 1:
            return np.eye(3), np.zeros(3), False   # long spans fail
        return np.eye(3), np.array([0.0, 0.2, 0.0]), True

    bat, stats = refine.refine_odometry_batched(
        poses, _as_batched(icp_fn), refine._rel, _apply_rel,
        inlier_idx_pairs=pairs,
    )
    # every single step accepted in fallback; corrections propagated
    assert len(stats.refined) > 0
    assert all(j - i == 1 for i, j in stats.refined)
    assert bat[-1, 7] > 0.2  # y corrections accumulated

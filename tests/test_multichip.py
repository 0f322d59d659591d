"""Multi-chip sharding paths on the 8-virtual-device CPU mesh.

The reference has zero multi-node capability (SURVEY.md section 5); these
tests validate the framework's mesh code the way the driver's
``dryrun_multichip`` does.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caelo_tpu.config import tiny_test_config
from caelo_tpu.parallel.mesh import make_mesh
from caelo_tpu.parallel.pipeline import (make_batched_feature_extractor,
                                         neighbor_pose_exchange)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == 8


@needs_8
def test_dp_training_step_matches_single_device():
    """DP-sharded loss == single-device loss on the same batch."""
    from caelo_tpu.models.patch_encoder import VoxelPatchAE
    from caelo_tpu.training.train import (create_train_state,
                                          make_sharded_train_step,
                                          make_train_step, patch_loss,
                                          shard_train_state)

    model = VoxelPatchAE()
    batch = (np.random.default_rng(0).uniform(size=(16, 16, 16, 16))
             < 0.2).astype(np.float32)
    state = create_train_state(model, jax.random.key(0),
                               jnp.asarray(batch[:1]))

    step1 = make_train_step(model, patch_loss)
    _, loss1 = step1(state, jnp.asarray(batch))

    mesh = make_mesh(n_data=8, n_model=1)
    stateN = shard_train_state(state, mesh)
    stepN, bshard = make_sharded_train_step(model, patch_loss, mesh)
    _, lossN = stepN(stateN, jax.device_put(jnp.asarray(batch), bshard))
    np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-5)


@needs_8
def test_tp_training_step_runs():
    from caelo_tpu.models.patch_encoder import VoxelPatchAE
    from caelo_tpu.training.train import (create_train_state,
                                          make_sharded_train_step, patch_loss,
                                          shard_train_state)

    model = VoxelPatchAE()
    mesh = make_mesh(n_data=4, n_model=2)
    batch = (np.random.default_rng(1).uniform(size=(8, 16, 16, 16))
             < 0.2).astype(np.float32)
    state = create_train_state(model, jax.random.key(0), jnp.asarray(batch[:1]))
    state = shard_train_state(state, mesh, tensor_parallel=True)
    step, bshard = make_sharded_train_step(model, patch_loss, mesh)
    _, loss = step(state, jax.device_put(jnp.asarray(batch), bshard))
    assert np.isfinite(float(loss))


@needs_8
def test_halo_exchange_residual():
    mesh = make_mesh(n_data=8, n_model=1)
    n = 8 * 3
    poses = np.tile(np.eye(3, 4).reshape(12), (n, 1)).astype(np.float32)
    poses[:, 3] = np.arange(n)  # x advances 1/frame
    total, halo = neighbor_pose_exchange(mesh)(jnp.asarray(poses))
    # every consecutive-pose residual is 1 (x step), n-1 terms total
    np.testing.assert_allclose(float(total), n - 1, atol=1e-4)


@needs_8
def test_batched_feature_extractor_sharded():
    cfg = tiny_test_config()
    from caelo_tpu.models.patch_encoder import PatchEncoder
    from caelo_tpu.models.respond_net import RespondLayer

    mesh = make_mesh(n_data=8, n_model=1)
    rng = jax.random.key(0)
    respond = RespondLayer().init(
        rng, jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3))
    )
    encoder = PatchEncoder().init(rng, jnp.zeros((1, 16, 16, 16)))
    B = 8
    r = np.random.default_rng(0)
    pts = np.zeros((B, cfg.max_points, 4), np.float32)
    pts[..., 0] = r.uniform(10, 50, (B, cfg.max_points))
    pts[..., 1] = r.uniform(-20, 20, (B, cfg.max_points))
    pts[..., 2] = r.uniform(-2, 2, (B, cfg.max_points))
    msk = np.ones((B, cfg.max_points), bool)
    ex = make_batched_feature_extractor(mesh, cfg)
    feats = ex(respond, encoder, jnp.asarray(pts), jnp.asarray(msk))
    assert feats.key_pts.shape == (B, cfg.keypoint.n_keypoints, 3)
    assert feats.descriptors.shape == (B, cfg.keypoint.n_keypoints, 60)
    # frame axis is sharded over 'data'
    shard_axes = feats.key_pts.sharding.spec
    assert shard_axes[0] == "data"


def test_sharded_refinement_matches_batched():
    """Span-sharded hybrid-ICP refinement (make_sharded_icp_fn, span axis
    over the mesh 'data' axis) produces the same refined trajectory as the
    single-device batched path — SURVEY section 2.4's keyframe-span
    partitioning actually driving the production refine stage."""
    from caelo_tpu.backend import refine
    from caelo_tpu.backend.refine_runner import (RefinementFeatures,
                                                 make_batched_icp_fn)
    from caelo_tpu.parallel.pipeline import make_sharded_icp_fn

    cfg = tiny_test_config()
    r = np.random.default_rng(5)
    n = 10
    E, Pl = cfg.icp.max_points, cfg.icp.max_planar
    # structured per-frame clouds so ICP has signal: a shared base cloud
    # translated per frame
    base = r.uniform(-20, 20, (E, 3)).astype(np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (Pl, 1))
    plbase = r.uniform(-10, 10, (Pl, 3)).astype(np.float32)
    plbase[:, 2] = 0.0
    feats = RefinementFeatures(
        ext_pts=jnp.asarray(np.stack(
            [base + np.array([0.9 * i, 0.02 * i, 0.0], np.float32)
             for i in range(n)])),
        ext_mask=jnp.ones((n, E), bool),
        planar=jnp.asarray(np.stack(
            [np.concatenate(
                [plbase + np.array([0.9 * i, 0.02 * i, 0.0], np.float32),
                 normals], axis=1)
             for i in range(n)])),
        planar_mask=jnp.ones((n, Pl), bool),
    )
    # drifted odometry poses (identity rotation, noisy translation chain)
    poses = []
    t = np.zeros(3)
    for i in range(n):
        row = np.concatenate([np.eye(3), t.reshape(3, 1)], 1).reshape(12)
        poses.append(row)
        t = t + np.array([-0.9, -0.02, 0.0]) + r.normal(0, 0.02, 3)
    poses = np.stack(poses)

    def rel_lidar_fn(p0, p1):
        P0 = np.asarray(p0, np.float64).reshape(3, 4)
        P1 = np.asarray(p1, np.float64).reshape(3, 4)
        R = P0[:, :3].T @ P1[:, :3]
        tt = P0[:, :3].T @ (P1[:, 3] - P0[:, 3])
        return R, tt

    def apply_rel_fn(pose0, relR, relT):
        P0 = np.asarray(pose0, np.float64).reshape(3, 4)
        R = P0[:, :3] @ np.asarray(relR)
        tt = P0[:, :3] @ np.asarray(relT) + P0[:, 3]
        return np.concatenate([R, tt.reshape(3, 1)], 1).reshape(12)

    mesh = make_mesh(n_data=8, n_model=1)
    p_plain, s_plain = refine.refine_odometry_batched(
        poses, make_batched_icp_fn(feats, cfg), rel_lidar_fn, apply_rel_fn,
        cfg=cfg.refine)
    p_shard, s_shard = refine.refine_odometry_batched(
        poses, make_sharded_icp_fn(feats, mesh, cfg), rel_lidar_fn,
        apply_rel_fn, cfg=cfg.refine)
    assert len(s_plain.refined) == len(s_shard.refined)
    np.testing.assert_allclose(p_shard, p_plain, atol=1e-5)


@needs_8
def test_sharded_sc_correlation_matches_single_device():
    """Row-sharded ScanContext correlation (loop-closure candidate search
    over 'data') is bit-identical to the single-device matrix."""
    from caelo_tpu.backend.scancontext import sc_correlation_matrix
    from caelo_tpu.parallel.pipeline import make_sharded_sc_correlation

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(11)
    scs = jnp.asarray(rng.uniform(0, 8, (24, 16, 64)), jnp.float32)
    score_s, yaw_s = make_sharded_sc_correlation(mesh)(scs)
    score_1, yaw_1 = sc_correlation_matrix(scs)
    np.testing.assert_array_equal(np.asarray(score_s), np.asarray(score_1))
    np.testing.assert_array_equal(np.asarray(yaw_s), np.asarray(yaw_1))

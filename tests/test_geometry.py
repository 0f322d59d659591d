"""Unit tests for SE(3) algebra against closed-form / scipy oracles."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from caelo_tpu.geometry import se3, kitti_pose


def random_rotation(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Rotation.from_quat(q).as_matrix()


def test_euler_roundtrip(rng):
    R = random_rotation(rng, (32,))
    ang_deg = np.asarray(se3.rotmat_to_euler_xyz_deg(jnp.asarray(R)))
    R2 = np.asarray(se3.euler_xyz_to_rotmat(jnp.radians(ang_deg)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_euler_matches_scipy(rng):
    R = random_rotation(rng, (16,))
    ours = np.asarray(se3.rotmat_to_euler_xyz_deg(jnp.asarray(R)))
    # scipy 'xyz' extrinsic == R = Rz Ry Rx decomposition
    ref = Rotation.from_matrix(R).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_quat_roundtrip(rng):
    R = random_rotation(rng, (32,))
    q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    R2 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_compose_inverse(rng):
    R = random_rotation(rng, (8,))
    t = rng.normal(size=(8, 3))
    Ri, ti = se3.inverse(jnp.asarray(R), jnp.asarray(t))
    Rc, tc = se3.compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


def test_horn_exact(rng):
    """Horn solve recovers an exact rigid transform."""
    R = random_rotation(rng)
    t = rng.normal(size=(3,))
    p1 = rng.normal(size=(50, 3))
    p0 = p1 @ R.T + t
    Re, te = se3.solve_rigid_horn(jnp.asarray(p0), jnp.asarray(p1))
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-5)
    assert np.linalg.det(np.asarray(Re)) > 0


def test_horn_weighted_ignores_outliers(rng):
    R = random_rotation(rng)
    t = rng.normal(size=(3,))
    p1 = rng.normal(size=(60, 3))
    p0 = p1 @ R.T + t
    p0_noisy = p0.copy()
    p0_noisy[:10] += rng.normal(size=(10, 3)) * 50.0  # corrupt 10 points
    w = np.ones(60)
    w[:10] = 0.0
    Re, te = se3.solve_rigid_horn(
        jnp.asarray(p0_noisy), jnp.asarray(p1), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-5)


def test_horn_batched(rng):
    R = random_rotation(rng, (16,))
    t = rng.normal(size=(16, 3))
    p1 = rng.normal(size=(16, 4, 3))
    p0 = np.einsum("bij,bnj->bni", R, p1) + t[:, None]
    Re, te = se3.solve_rigid_horn(jnp.asarray(p0), jnp.asarray(p1))
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-4)


def test_rel_pose_lidar_conjugation(rng):
    """rel_pose_lidar then lidar_rel_to_cam+chaining must reproduce poses."""
    Rtr = random_rotation(rng)
    ttr = rng.normal(size=(3,))
    # two camera poses
    Rs = random_rotation(rng, (2,))
    ts = rng.normal(size=(2, 3))
    poses = np.concatenate([Rs, ts[:, :, None]], axis=2).reshape(2, 12)
    relR, relT = kitti_pose.rel_pose_lidar(
        jnp.asarray(poses[0]), jnp.asarray(poses[1]),
        jnp.asarray(Rtr), jnp.asarray(ttr),
    )
    # chain from pose0 using the lidar rel must give pose1
    chained = kitti_pose.chain_poses(
        jnp.asarray(relR)[None], jnp.asarray(relT)[None],
        jnp.asarray(Rtr), jnp.asarray(ttr), pose0=jnp.asarray(poses[0]),
    )
    np.testing.assert_allclose(np.asarray(chained[1]), poses[1], atol=1e-5)


def test_chain_poses_identity():
    relR = jnp.tile(jnp.eye(3), (5, 1, 1))
    relT = jnp.zeros((5, 3))
    poses = kitti_pose.chain_poses(relR, relT, jnp.eye(3), jnp.zeros(3))
    expect = np.tile(np.eye(3, 4).reshape(12), (6, 1))
    np.testing.assert_allclose(np.asarray(poses), expect, atol=1e-6)


def test_rotation_geodesic(rng):
    R0 = random_rotation(rng)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R1 = R0 @ Rotation.from_rotvec(np.radians(7.5) * axis).as_matrix()
    ang = se3.rotation_geodesic_deg(jnp.asarray(R0), jnp.asarray(R1))
    np.testing.assert_allclose(float(ang), 7.5, atol=1e-4)

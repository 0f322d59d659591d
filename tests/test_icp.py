"""ICP: alignment recovery, masks, planar path, failure mode."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from caelo_tpu.config import IcpConfig
from caelo_tpu.backend.icp import icp_hybrid, icp_point_to_point, nearest_neighbors

CFG = IcpConfig(max_iters=15, max_points=1024)


def structured_cloud(rng, n=800):
    """Two walls + ground: enough constraint for a unique rigid fit."""
    g = rng.uniform([-10, -10, 0], [10, 10, 0.01], (n // 2, 3))
    w1 = rng.uniform([-10, -0.01, 0], [10, 0.01, 5], (n // 4, 3)) + [0, 8, 0]
    w2 = rng.uniform([-0.01, -10, 0], [0.01, 10, 5], (n - n // 2 - n // 4, 3)) + [7, 0, 0]
    return np.concatenate([g, w1, w2]).astype(np.float32)


def test_nearest_neighbors(rng):
    ref = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    q = ref[rng.integers(0, 256, 64)] + 0.01
    idx, dist = nearest_neighbors(
        jnp.asarray(q), jnp.ones(64, bool), jnp.asarray(ref), jnp.ones(256, bool)
    )
    from scipy.spatial import cKDTree

    d_ref, i_ref = cKDTree(ref).query(q)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-5)


def test_icp_recovers_small_motion(rng):
    pc0 = structured_cloud(rng)
    R = Rotation.from_euler("xyz", [0.5, -0.3, 1.0], degrees=True).as_matrix()
    t = np.array([0.3, -0.2, 0.05])
    # pc1 such that R pc1 + t ~ pc0  =>  pc1 = R^T (pc0 - t)
    pc1 = ((pc0 - t) @ R).astype(np.float32)
    res = icp_point_to_point(
        jnp.asarray(pc0), jnp.ones(len(pc0), bool),
        jnp.asarray(pc1), jnp.ones(len(pc1), bool), CFG,
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)


def test_icp_respects_masks(rng):
    pc0 = structured_cloud(rng)
    pad0 = np.concatenate([pc0, np.full((200, 3), 1e3, np.float32)])
    m0 = np.r_[np.ones(len(pc0), bool), np.zeros(200, bool)]
    res = icp_point_to_point(
        jnp.asarray(pad0), jnp.asarray(m0),
        jnp.asarray(pc0), jnp.ones(len(pc0), bool), CFG,
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-3)


def test_icp_fails_without_overlap(rng):
    pc0 = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    pc1 = pc0 + np.array([100.0, 0, 0], np.float32)
    res = icp_point_to_point(
        jnp.asarray(pc0), jnp.ones(300, bool),
        jnp.asarray(pc1), jnp.ones(300, bool), CFG,
    )
    assert not bool(res.success)


def test_icp_hybrid_plane_constraint(rng):
    """Hybrid ICP converges with point + plane constraints."""
    pc0 = structured_cloud(rng)
    # planar points with normals: ground plane samples, normal +z
    pl = rng.uniform([-10, -10, 0], [10, 10, 0], (256, 3)).astype(np.float32)
    normals = np.tile([0, 0, 1.0], (256, 1)).astype(np.float32)
    planar0 = np.concatenate([pl, normals], 1)
    R = Rotation.from_euler("xyz", [0.3, 0.2, -0.6], degrees=True).as_matrix()
    t = np.array([0.2, 0.1, -0.05])
    pc1 = ((pc0 - t) @ R).astype(np.float32)
    planar1 = planar0.copy()
    planar1[:, :3] = ((pl - t) @ R).astype(np.float32)
    planar1[:, 3:] = (normals @ R).astype(np.float32)
    res = icp_hybrid(
        jnp.asarray(pc0), jnp.ones(len(pc0), bool),
        jnp.asarray(pc1), jnp.ones(len(pc1), bool),
        jnp.asarray(planar0), jnp.ones(256, bool),
        jnp.asarray(planar1), jnp.ones(256, bool), CFG,
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)

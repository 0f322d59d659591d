"""Batched RANSAC: recovery under outliers, masks, and threshold escalation."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from caelo_tpu.config import RansacConfig
from caelo_tpu.frontend.ransac import ransac_rigid
from caelo_tpu.frontend.matching import match_descriptors


def make_pairs(rng, n=1024, outlier_frac=0.35, noise=0.02):
    R = Rotation.from_euler("xyz", [1.0, -0.5, 2.0], degrees=True).as_matrix()
    t = np.array([1.5, 0.2, -0.1])
    p1 = rng.uniform(-40, 40, size=(n, 3))
    p0 = p1 @ R.T + t + rng.normal(0, noise, (n, 3))
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    p0[out_idx] += rng.uniform(-20, 20, (n_out, 3))
    return p0.astype(np.float32), p1.astype(np.float32), R, t, out_idx


def test_ransac_recovers_pose(rng):
    p0, p1, R, t, out_idx = make_pairs(rng)
    res = ransac_rigid(
        jax.random.key(0), jnp.asarray(p0), jnp.asarray(p1),
        jnp.ones(p0.shape[0], bool),
    )
    assert bool(res.success)
    assert abs(float(res.threshold) - 0.4) < 1e-6  # first rung suffices
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=2e-2)
    inl = np.asarray(res.inlier_mask)
    assert inl.sum() >= 0.6 * p0.shape[0]
    assert inl[out_idx].mean() < 0.1  # outliers excluded


def test_ransac_respects_mask(rng):
    p0, p1, R, t, _ = make_pairs(rng, outlier_frac=0.0)
    # corrupt masked-out pairs grossly; they must not affect the solution
    mask = np.ones(p0.shape[0], bool)
    mask[500:] = False
    p0[500:] += 100.0
    res = ransac_rigid(
        jax.random.key(1), jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask)
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
    assert not np.asarray(res.inlier_mask)[500:].any()


def test_ransac_threshold_escalation(rng):
    """Noisy correspondences beyond rung 0 escalate the ladder
    (Match.py:207-214 semantics)."""
    p0, p1, R, t, _ = make_pairs(rng, n=512, outlier_frac=0.0, noise=0.5)
    res = ransac_rigid(
        jax.random.key(2), jnp.asarray(p0), jnp.asarray(p1),
        jnp.ones(p0.shape[0], bool),
    )
    assert bool(res.success)
    assert float(res.threshold) >= 0.8 - 1e-6


def test_ransac_failure_on_garbage(rng):
    p0 = rng.uniform(-50, 50, (512, 3)).astype(np.float32)
    p1 = rng.uniform(-50, 50, (512, 3)).astype(np.float32)
    res = ransac_rigid(
        jax.random.key(3), jnp.asarray(p0), jnp.asarray(p1),
        jnp.ones(512, bool),
        RansacConfig(min_inlier_abs=100),
    )
    assert not bool(res.success)


def test_match_descriptors(rng):
    c0 = rng.normal(size=(64, 60)).astype(np.float32)
    perm = rng.permutation(64)
    c1 = c0[perm] + rng.normal(0, 1e-3, (64, 60)).astype(np.float32)
    idx, mask, dist = match_descriptors(
        jnp.asarray(c0), jnp.ones(64, bool), jnp.asarray(c1), jnp.ones(64, bool)
    )
    np.testing.assert_array_equal(np.asarray(idx), perm)
    assert np.asarray(mask).all()
    # masked frame-0 rows are never matched
    m0 = np.ones(64, bool)
    m0[perm[0]] = False
    idx2, _, _ = match_descriptors(
        jnp.asarray(c0), jnp.asarray(m0), jnp.asarray(c1), jnp.ones(64, bool)
    )
    assert int(idx2[0]) != perm[0]

"""ISS / Harris3D baseline detectors on synthetic geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from caelo_tpu.frontend.baselines import (harris3d_keypoints, iss_keypoints,
                                          random_keypoints, sift3d_keypoints)


def corner_scene(rng, n=3000):
    """Flat ground + one sharp corner structure; corner points should win."""
    g = rng.uniform([-20, -20, 0], [20, 20, 0.02], (n - 600, 3))
    # corner at (5, 5): two walls meeting
    w1 = rng.uniform([5, 5, 0], [5.02, 10, 3], (300, 3))
    w2 = rng.uniform([5, 5, 0], [10, 5.02, 3], (300, 3))
    return np.concatenate([g, w1, w2]).astype(np.float32)


def test_iss_prefers_structure(rng):
    pts = corner_scene(rng)
    mask = np.ones(len(pts), bool)
    res = iss_keypoints(jnp.asarray(pts), jnp.asarray(mask), n_keypoints=128)
    kp = np.asarray(res.key_pts)[np.asarray(res.key_mask)]
    assert kp.shape[0] > 10
    # top_k returns keypoints in descending saliency: the strongest ones sit
    # on or at the base of the wall structure (l3 there is ~7x the flat-
    # ground noise floor); flat ground still contributes many low-rank
    # NMS-cell maxima, as real ISS does on a large plane.
    near_wall = (
        (np.abs(kp[:8, 0] - 5) < 2) & (kp[:8, 1] > 3) & (kp[:8, 1] < 12)
    ) | (
        (np.abs(kp[:8, 1] - 5) < 2) & (kp[:8, 0] > 3) & (kp[:8, 0] < 12)
    ) | (kp[:8, 2] > 0.1)
    assert near_wall.mean() >= 0.6


def test_harris_prefers_corner(rng):
    pts = corner_scene(rng)
    mask = np.ones(len(pts), bool)
    res = harris3d_keypoints(jnp.asarray(pts), jnp.asarray(mask),
                             n_keypoints=128)
    kp = np.asarray(res.key_pts)[np.asarray(res.key_mask)]
    assert kp.shape[0] >= 1
    # Harris fires only where normals span 3 directions: near the corner and
    # the wall-ground junctions, never on the open plane
    d_corner = np.linalg.norm(kp[:, :2] - [5, 5], axis=1)
    on_walls = (np.abs(kp[:, 0] - 5) < 1.5) | (np.abs(kp[:, 1] - 5) < 1.5)
    assert (on_walls | (d_corner < 8)).mean() > 0.7


def test_sift_fires_on_height_structure_not_flat(rng):
    """DoG of the z field: a flat plane has no contrast anywhere; adding a
    box gives strong extrema at its height discontinuities."""
    n = 2000
    flat = rng.uniform([-20, -20, 0], [20, 20, 0.01], (n, 3)).astype(
        np.float32)
    mask = np.ones(n, bool)
    res = sift3d_keypoints(jnp.asarray(flat), jnp.asarray(mask),
                           n_keypoints=64)
    assert int(res.key_mask.sum()) == 0  # no contrast on a plane

    box = rng.uniform([4, 4, 1.9], [8, 8, 2.0], (400, 3)).astype(np.float32)
    pts = np.concatenate([flat[:-400], box])
    res = sift3d_keypoints(jnp.asarray(pts), jnp.asarray(mask),
                           n_keypoints=64)
    kp = np.asarray(res.key_pts)[np.asarray(res.key_mask)]
    assert kp.shape[0] > 5
    # keypoints concentrate at/around the box footprint where z jumps
    near_box = (kp[:, 0] > 2) & (kp[:, 0] < 10) & (kp[:, 1] > 2) & \
        (kp[:, 1] < 10)
    assert near_box.mean() > 0.8


def test_sift_respects_mask(rng):
    """Masked-out points neither fire nor influence the scale space."""
    n = 1000
    flat = rng.uniform([-20, -20, 0], [20, 20, 0.01], (n, 3)).astype(
        np.float32)
    pts = flat.copy()
    pts[500:] += [0.0, 0.0, 100.0]  # would be huge contrast if unmasked
    mask = np.zeros(n, bool)
    mask[:500] = True
    res = sift3d_keypoints(jnp.asarray(pts), jnp.asarray(mask),
                           n_keypoints=64)
    assert int(res.key_mask.sum()) == 0


def test_random_keypoints_masked(rng):
    pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    mask = np.zeros(500, bool)
    mask[:50] = True
    res = random_keypoints(jax.random.key(0), jnp.asarray(pts),
                           jnp.asarray(mask), n_keypoints=64)
    chosen = np.asarray(res.key_pts)
    assert np.asarray(res.key_mask).all()
    # all picks come from the valid prefix
    assert np.abs(chosen).max() <= np.abs(pts[:50]).max() + 1e-6

"""ScanContext-style place signatures (backend/scancontext.py)."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.backend.scancontext import (align_score, align_score_batch,
                                           ring_key, scan_context,
                                           sc_correlation_matrix,
                                           yaw_rotation, N_SECTORS)


def _cloud(seed=0, n=512):
    rng = np.random.default_rng(seed)
    r = rng.uniform(5.0, 70.0, n)
    th = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-1.5, 4.0, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


def test_scan_context_shape_and_mask():
    pts = _cloud()
    mask = np.ones(len(pts), bool)
    mask[256:] = False
    sc = scan_context(jnp.asarray(pts), jnp.asarray(mask))
    assert sc.shape == (16, 64)
    # masked-out points must not contribute: zeroing them changes nothing
    pts2 = pts.copy()
    pts2[256:] = 1e6
    sc2 = scan_context(jnp.asarray(pts2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc2))
    # occupancy is positive somewhere, zero in empty bins
    assert float(sc.max()) > 0.0
    assert float(sc.min()) == 0.0


def test_ring_key_rotation_invariant():
    pts = _cloud(seed=1)
    mask = np.ones(len(pts), bool)
    yaw = np.radians(73.0)
    R = np.asarray(yaw_rotation(yaw))
    sc_a = scan_context(jnp.asarray(pts), jnp.asarray(mask))
    sc_b = scan_context(jnp.asarray(pts @ R.T), jnp.asarray(mask))
    rk_a = np.asarray(ring_key(sc_a))
    rk_b = np.asarray(ring_key(sc_b))
    # ranges are invariant; only sector binning jitter can differ
    assert np.abs(rk_a - rk_b).max() <= 2.0 / 64 + 1e-6


def test_align_recovers_yaw():
    pts = _cloud(seed=2)
    mask = jnp.ones(len(pts), bool)
    for yaw_deg in (0.0, 45.0, 90.0, 168.75, -90.0):
        yaw = np.radians(yaw_deg)
        R = np.asarray(yaw_rotation(yaw))
        sc_a = scan_context(jnp.asarray(pts), mask)
        sc_b = scan_context(jnp.asarray((pts @ R.T).astype(np.float32)), mask)
        score, est = align_score(sc_a, sc_b)
        sector = 2 * np.pi / N_SECTORS
        err = np.abs((float(est) - yaw + np.pi) % (2 * np.pi) - np.pi)
        assert err <= sector + 1e-6, (yaw_deg, float(est), float(score))
        assert float(score) > 0.8, (yaw_deg, float(score))


def test_align_discriminates_scenes():
    pts_a, pts_b = _cloud(seed=3), _cloud(seed=4)
    mask = jnp.ones(len(pts_a), bool)
    sc_a = scan_context(jnp.asarray(pts_a), mask)
    sc_b = scan_context(jnp.asarray(pts_b), mask)
    same, _ = align_score(sc_a, sc_a)
    diff, _ = align_score(sc_a, sc_b)
    assert float(same) > 0.99
    assert float(diff) < float(same) - 0.1


def test_sc_correlation_matrix_matches_align():
    """The all-pairs rolled-matmul correlation must agree with the pairwise
    ``align_score`` on ranking and recovered yaw (the two differ only in
    normalization: whole-matrix vs per-column cosine)."""
    mask = jnp.ones(512, bool)
    yaw = np.radians(135.0)
    R = np.asarray(yaw_rotation(yaw))
    pts = _cloud(seed=8)
    scs = jnp.stack([
        scan_context(jnp.asarray(pts), mask),
        scan_context(jnp.asarray(_cloud(seed=9)), mask),
        scan_context(jnp.asarray((pts @ R.T).astype(np.float32)), mask),
        scan_context(jnp.asarray(_cloud(seed=10)), mask),
    ])
    score, yaws = sc_correlation_matrix(scs)
    score, yaws = np.asarray(score), np.asarray(yaws)
    # the rotated revisit (frame 2) beats the unrelated scenes for frame 0
    assert score[0, 2] > score[0, 1] + 0.1
    assert score[0, 2] > score[0, 3] + 0.1
    # self-similarity is ~1 with zero yaw
    np.testing.assert_allclose(np.diag(score), 1.0, atol=1e-5)
    assert abs(yaws[0, 0]) < 1e-6
    # recovered yaw rotates frame 2 into frame 0, within one sector
    sector = 2 * np.pi / N_SECTORS
    err = np.abs((yaws[0, 2] - yaw + np.pi) % (2 * np.pi) - np.pi)
    assert err <= sector + 1e-6
    # convention agreement with align_score on the genuinely-matching pairs
    # (for unrelated scenes the best shift is noise — either scorer may
    # legitimately pick a different one)
    for a, b in ((0, 2), (2, 0)):
        s_ref, y_ref = align_score(scs[a], scs[b])
        err = np.abs((yaws[a, b] - float(y_ref) + np.pi)
                     % (2 * np.pi) - np.pi)
        assert err <= sector + 1e-6, (a, b, yaws[a, b], float(y_ref))


def test_align_batch_matches_single():
    pts = _cloud(seed=5)
    mask = jnp.ones(len(pts), bool)
    sc_q = scan_context(jnp.asarray(pts), mask)
    cands = jnp.stack([
        scan_context(jnp.asarray(_cloud(seed=s)), mask) for s in (5, 6, 7)
    ])
    scores, yaws = align_score_batch(sc_q, cands)
    s0, y0 = align_score(sc_q, cands[0])
    np.testing.assert_allclose(float(scores[0]), float(s0), rtol=1e-6)
    assert float(scores[0]) > float(scores[1])

"""Loop-closure detection: place recognition + verification contract."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.backend.loopclosure import (LoopClosures, detect_and_close,
                                           frame_global_descriptor,
                                           loop_candidates)
from caelo_tpu.frontend.registration import FrameFeatures


def fake_features(rng, n_frames=250, K=64, loop=(0, 240)):
    """Frames with random descriptors; frames `loop` share a signature."""
    feats = []
    base = rng.normal(size=(K, 60)).astype(np.float32)
    for i in range(n_frames):
        if i in loop:
            d = base + rng.normal(0, 0.01, (K, 60)).astype(np.float32)
        else:
            d = rng.normal(size=(K, 60)).astype(np.float32)
        feats.append(FrameFeatures(
            key_pts=jnp.zeros((K, 3)),
            descriptors=jnp.asarray(d),
            mask=jnp.ones((K,), bool),
            key_pixels=jnp.zeros((K, 2), jnp.int32),
        ))
    return feats


def test_global_descriptor_masked(rng):
    d = jnp.asarray(rng.normal(size=(32, 60)).astype(np.float32))
    m_all = jnp.ones(32, bool)
    m_half = jnp.zeros(32, bool).at[:16].set(True)
    g1 = frame_global_descriptor(d, m_all)
    g2 = frame_global_descriptor(d, m_half)
    g3 = frame_global_descriptor(d[:16], jnp.ones(16, bool))
    assert g1.shape == (120,)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g3), atol=1e-5)


def test_loop_candidates_finds_revisit(rng):
    feats = fake_features(rng)
    gd = jnp.stack([
        frame_global_descriptor(f.descriptors, f.mask) for f in feats
    ])
    pi, pj, score, mask = loop_candidates(
        gd, jnp.ones(len(feats), bool), min_gap=100, max_candidates=8
    )
    assert bool(mask[0])
    assert (int(pi[0]), int(pj[0])) == (0, 240)


def test_loop_candidates_respects_gap(rng):
    feats = fake_features(rng, loop=(0, 50))  # revisit within the gap
    gd = jnp.stack([
        frame_global_descriptor(f.descriptors, f.mask) for f in feats
    ])
    pi, pj, _, mask = loop_candidates(
        gd, jnp.ones(len(feats), bool), min_gap=100, max_candidates=8
    )
    pairs = set(zip(np.asarray(pi)[np.asarray(mask)].tolist(),
                    np.asarray(pj)[np.asarray(mask)].tolist()))
    assert (0, 50) not in pairs


def test_detect_and_close_verification_gate(rng):
    feats = fake_features(rng)
    calls = []

    def register_fn(i, j):
        calls.append((i, j))
        ok = (i, j) == (0, 240)
        return np.eye(3), np.array([1.0, 0, 0]), ok, 150

    out: LoopClosures = detect_and_close(
        feats, register_fn, min_gap=100, max_candidates=8
    )
    assert out.n_accepted == 1
    assert (0, 240) in calls
    assert int(out.edges.edge_i[0]) == 0 and int(out.edges.edge_j[0]) == 240
    np.testing.assert_allclose(np.asarray(out.edges.rel_t[0]), [1, 0, 0])
    assert float(out.edges.weight[0]) == 1.5  # inliers / 100


def test_detect_and_close_scan_context_yaw(rng):
    """With use_scan_context=True, candidates are re-ranked by polar
    alignment and register_fn receives the aligning yaw."""
    from caelo_tpu.backend.scancontext import yaw_rotation

    K = 64
    r = rng.uniform(10, 60, K)
    th = rng.uniform(-np.pi, np.pi, K)
    cloud = np.stack([r * np.cos(th), r * np.sin(th),
                      rng.uniform(-1.5, 4.0, K)], 1).astype(np.float32)
    yaw_gt = np.radians(90.0)
    R = np.asarray(yaw_rotation(yaw_gt))
    base_desc = rng.normal(size=(K, 60)).astype(np.float32)

    feats = []
    for i in range(250):
        if i == 0:
            pts, d = cloud, base_desc
        elif i == 240:
            # revisit, rotated by yaw_gt (frame j = frame i rotated)
            pts = (cloud @ R).astype(np.float32)  # world pts in rotated frame
            d = base_desc + rng.normal(0, 0.01, (K, 60)).astype(np.float32)
        else:
            rr = rng.uniform(10, 60, K)
            tt = rng.uniform(-np.pi, np.pi, K)
            pts = np.stack([rr * np.cos(tt), rr * np.sin(tt),
                            rng.uniform(-1.5, 4.0, K)], 1).astype(np.float32)
            d = rng.normal(size=(K, 60)).astype(np.float32)
        feats.append(FrameFeatures(
            key_pts=jnp.asarray(pts),
            descriptors=jnp.asarray(d),
            mask=jnp.ones((K,), bool),
            key_pixels=jnp.zeros((K, 2), jnp.int32),
        ))

    got = {}

    def register_fn(i, j, yaw):
        got[(i, j)] = yaw
        ok = (i, j) == (0, 240)
        return np.eye(3), np.zeros(3), ok, 120

    out = detect_and_close(feats, register_fn, min_gap=100, max_candidates=8,
                           use_scan_context=True)
    assert out.n_accepted == 1
    assert (0, 240) in got
    yaw_est = got[(0, 240)]
    # frame 240's points are cloud @ R = R^T applied; the yaw rotating frame
    # j into frame i should recover ±yaw_gt up to a sector (5.6 deg)
    err = abs((abs(yaw_est) - yaw_gt + np.pi) % (2 * np.pi) - np.pi)
    assert err < 2 * np.pi / 64 + 1e-6, yaw_est


def test_scancontext_candidates_beat_descriptor_aliasing(rng):
    """A revisit traversed the other way (yaw ~180 deg) with
    rotation-variant descriptors: the pooled-descriptor proposal ranks it
    like any random frame, while the rotation-searched ScanContext
    correlation surfaces it — the round-5 aliasing fix."""
    from caelo_tpu.backend.scancontext import yaw_rotation

    K = 64
    r = rng.uniform(10, 60, K)
    th = rng.uniform(-np.pi, np.pi, K)
    cloud = np.stack([r * np.cos(th), r * np.sin(th),
                      rng.uniform(-1.5, 4.0, K)], 1).astype(np.float32)
    R = np.asarray(yaw_rotation(np.radians(180.0)))

    feats = []
    for i in range(250):
        if i == 0:
            pts = cloud
        elif i == 240:
            pts = (cloud @ R).astype(np.float32)   # reverse traversal
        else:
            rr = rng.uniform(10, 60, K)
            tt = rng.uniform(-np.pi, np.pi, K)
            pts = np.stack([rr * np.cos(tt), rr * np.sin(tt),
                            rng.uniform(-1.5, 4.0, K)], 1).astype(np.float32)
        # descriptors are random EVERYWHERE — view-dependent features do not
        # match across a 180 deg viewpoint change
        d = rng.normal(size=(K, 60)).astype(np.float32)
        feats.append(FrameFeatures(
            key_pts=jnp.asarray(pts),
            descriptors=jnp.asarray(d),
            mask=jnp.ones((K,), bool),
            key_pixels=jnp.zeros((K, 2), jnp.int32),
        ))

    def make_register_fn(log):
        def register_fn(i, j, yaw):
            log.append((i, j))
            ok = (i, j) == (0, 240)
            return np.eye(3), np.zeros(3), ok, 120
        return register_fn

    sc_calls = []
    out_sc = detect_and_close(
        feats, make_register_fn(sc_calls), min_gap=100, max_candidates=8,
        use_scan_context=True, candidate_source="scancontext")
    assert out_sc.n_accepted == 1
    assert (0, 240) in sc_calls
    # the descriptor path never even proposes the revisit for verification
    d_calls = []
    detect_and_close(
        feats, make_register_fn(d_calls), min_gap=100, max_candidates=8,
        use_scan_context=True, candidate_source="descriptor")
    assert (0, 240) not in d_calls

"""Projection scatter vs a straightforward numpy oracle.

The oracle implements the reference binning (``SphericalRing.py:81-93``)
with the framework's deterministic nearest-range collision rule.
"""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.config import SensorConfig
from caelo_tpu.ops.masking import pad_points
from caelo_tpu.projection import spherical


def numpy_oracle(pts, cfg: SensorConfig, n_padded=8192):
    """Reference binning with the framework's collision rule: nearest by
    1/64 m-quantized range, lowest point index breaking bucket ties
    (the packed scatter-min key in ``project_to_spherical_ring``)."""
    H, W = cfg.img_h, cfg.img_w
    img = np.zeros((H, W, 5), np.float32)
    cnt = np.zeros((H, W), np.int32)
    idx_bits = max(int(n_padded) - 1, 1).bit_length()
    rq_max = (1 << (30 - idx_bits)) - 1
    best = np.full((H, W), np.iinfo(np.int64).max, np.int64)
    for i, p in enumerate(pts):
        x, y, z = p[:3]
        r = np.sqrt(np.float32(x * x + y * y + z * z))
        if r <= 0:
            continue
        col = int(np.floor((np.pi - np.arctan2(y, x)) / cfg.azimuth_res))
        col = min(max(col, 0), W - 1)
        row = H - int(
            np.floor(np.arcsin(z / r) / cfg.vertical_res + cfg.vertical_pixel_offset)
        )
        if row < 0 or row >= H:
            continue
        cnt[row, col] += 1
        key = (min(int(np.float32(r * 64.0)), rq_max) << idx_bits) | i
        if key < best[row, col]:
            best[row, col] = key
            img[row, col, :4] = p[:4]
            img[row, col, 4] = r
    return img, cnt


def test_projection_matches_oracle(rng):
    cfg = SensorConfig()
    n = 5000
    pts = np.zeros((n, 4), np.float32)
    r = rng.uniform(2, 80, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(
        np.radians(cfg.vertical_view_down_deg),
        np.radians(cfg.vertical_view_up_deg),
        n,
    )
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)

    padded, mask = pad_points(pts, 8192)
    img, cnt = spherical.project_to_spherical_ring(
        jnp.asarray(padded), jnp.asarray(mask), cfg
    )
    ref_img, ref_cnt = numpy_oracle(pts.astype(np.float32), cfg)
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-5)


def test_projection_masks_padding(rng):
    cfg = SensorConfig()
    pts = np.zeros((100, 4), np.float32)
    pts[:10] = [[10, 0, 0, 0.5]] * 10
    mask = np.zeros(100, bool)
    mask[:10] = True
    img, cnt = spherical.project_to_spherical_ring(
        jnp.asarray(pts), jnp.asarray(mask), cfg
    )
    assert int(np.asarray(cnt).sum()) == 10  # padded zeros never binned


def test_pixel_roundtrip(rng):
    cfg = SensorConfig()
    n = 500
    r = rng.uniform(5, 80, n)
    az = rng.uniform(-np.pi + 0.01, np.pi - 0.01, n)
    el = rng.uniform(np.radians(-24.0), np.radians(1.5), n)
    pts = np.stack(
        [
            r * np.cos(el) * np.cos(az),
            r * np.cos(el) * np.sin(az),
            r * np.sin(el),
        ],
        axis=1,
    ).astype(np.float32)
    rr = np.linalg.norm(pts, axis=1)
    col = np.floor((np.pi - np.arctan2(pts[:, 1], pts[:, 0])) / cfg.azimuth_res)
    row = cfg.img_h - np.floor(
        np.arcsin(pts[:, 2] / rr) / cfg.vertical_res + cfg.vertical_pixel_offset
    )
    rec = np.asarray(
        spherical.pixel_to_point(
            jnp.asarray(row, jnp.float32), jnp.asarray(col, jnp.float32),
            jnp.asarray(rr, jnp.float32), cfg
        )
    )
    # reconstruction is quantized to the pixel grid: tolerance ~ r * resolution
    err = np.linalg.norm(rec - pts, axis=1)
    assert np.median(err) < 0.6
    assert (err < 1.5).mean() > 0.95


def test_extend_keypoints():
    cfg = SensorConfig()
    img = np.zeros((cfg.img_h, cfg.img_w, 5), np.float32)
    cnt = np.zeros((cfg.img_h, cfg.img_w), np.int32)
    # occupied 3x3 patch around (20, 100) and one far pixel
    for dr in range(-1, 2):
        for dc in range(-1, 2):
            cnt[20 + dr, 100 + dc] = 1
            img[20 + dr, 100 + dc, :3] = [dr, dc, 1.0]
    cnt[40, 500] = 1
    img[40, 500, :3] = [9, 9, 9]
    kp = jnp.asarray([[20, 100], [40, 500]], jnp.int32)
    kmask = jnp.asarray([True, True])
    pts, mask = spherical.extend_keypoints(
        jnp.asarray(img), jnp.asarray(cnt), kp, kmask, cfg, radius=6
    )
    m = np.asarray(mask)
    assert m[0].sum() == 9 and m[1].sum() == 1
    # dedup: overlapping windows collect each pixel once
    kp2 = jnp.asarray([[20, 100], [20, 102]], jnp.int32)
    pts2, mask2 = spherical.extend_keypoints(
        jnp.asarray(img), jnp.asarray(cnt), kp2, kmask, cfg, radius=6
    )
    assert np.asarray(mask2).sum() == 9  # 9 occupied pixels total, no doubles

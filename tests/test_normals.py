"""Planar-point extraction: normals on synthetic ground/wall geometry."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.config import PipelineConfig
from caelo_tpu.projection.normals import extract_planar_points
from caelo_tpu.projection.spherical import project_to_spherical_ring
from caelo_tpu.ops.masking import pad_points

CFG = PipelineConfig()


def test_ground_plane_normals(rng):
    # dense ground plane at z = -1.8 (sensor height)
    n = 40000
    r = np.sqrt(rng.uniform(5**2, 50**2, n))
    th = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack(
        [r * np.cos(th), r * np.sin(th), np.full(n, -1.8)], axis=1
    ).astype(np.float32)
    pts4 = np.concatenate([pts, rng.uniform(0, 1, (n, 1)).astype(np.float32)], 1)
    padded, mask = pad_points(pts4, CFG.max_points)
    img, cnt = project_to_spherical_ring(
        jnp.asarray(padded), jnp.asarray(mask), CFG.sensor
    )
    sal = jnp.zeros((CFG.sensor.n_lines, CFG.sensor.model_w), jnp.float32)
    planar, pmask = extract_planar_points(img, cnt, sal, CFG.sensor,
                                          max_planar=1024)
    m = np.asarray(pmask)
    assert m.sum() > 100
    normals = np.asarray(planar)[m][:, 3:6]
    # ground normals point up (toward the sensor at z=0 above the plane)
    assert (np.abs(normals[:, 2]) > 0.9).mean() > 0.9
    assert (normals[:, 2] > 0).mean() > 0.9  # oriented toward sensor


def test_planar_respects_saliency_gate(rng):
    n = 20000
    r = np.sqrt(rng.uniform(5**2, 50**2, n))
    th = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack(
        [r * np.cos(th), r * np.sin(th), np.full(n, -1.8)], axis=1
    ).astype(np.float32)
    pts4 = np.concatenate([pts, np.zeros((n, 1), np.float32)], 1)
    padded, mask = pad_points(pts4, CFG.max_points)
    img, cnt = project_to_spherical_ring(
        jnp.asarray(padded), jnp.asarray(mask), CFG.sensor
    )
    # everything highly salient -> nothing passes the planar gate
    sal = jnp.full((CFG.sensor.n_lines, CFG.sensor.model_w), 10.0, jnp.float32)
    _, pmask = extract_planar_points(img, cnt, sal, CFG.sensor, max_planar=256)
    assert int(np.asarray(pmask).sum()) == 0

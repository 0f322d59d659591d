"""Planar-point extraction with normals from the spherical-ring image.

The reference left this path dormant: ``GetKeyPtsByAE`` returns an empty
``PlanarPts`` array (``SphericalRing.py:219,285``) and the point-to-plane
half of the hybrid ICP therefore never fires with real data (the intended
computation survives as the commented block ``SphericalRing.py:268-276``:
5x5-window covariance eigendecomposition, keep near-vertical normals).
README.md:30 lists it as future work.  Here it is implemented for real, as
batched TPU ops:

* per-pixel 5x5 window covariance over the ring image (shifted-slice sums,
  same trick as the NMS kernel — pure VPU work);
* smallest-eigenvector normal via one batched 3x3 ``eigh``;
* planarity gate: smallest eigenvalue ratio + the reference's low-saliency
  criterion (min-diff < PlanarThreshold, ``SphericalRing.py:129``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SensorConfig


@functools.partial(jax.jit, static_argnames=("sensor", "max_planar",
                                             "stride", "window"))
def extract_planar_points(image: jnp.ndarray, counter: jnp.ndarray,
                          saliency: jnp.ndarray,
                          sensor: SensorConfig = SensorConfig(),
                          max_planar: int = 4096,
                          planar_threshold: float = 0.4,
                          stride: int = 4,
                          window: int = 5):
    """Return ``(P, 6)`` rows of (x, y, z, nx, ny, nz) + mask.

    Args:
      image: ``(ImgH, ImgW, 5)`` ring image.
      counter: occupancy counter.
      saliency: ``(n_lines, model_w)`` NMS min-diff map (planar = LOW
        saliency, the complement of keypoints).
      stride: subsample the pixel grid to bound the candidate count.
    """
    H, W = saliency.shape
    rad = window // 2
    pts = image[:H, :W, 0:3]
    occ = (counter[:H, :W] > 0).astype(jnp.float32)

    ppad = jnp.pad(pts * occ[..., None], ((rad, rad), (rad, rad), (0, 0)))
    opad = jnp.pad(occ, ((rad, rad), (rad, rad)))

    # accumulate window sums of p, p p^T, and count with shifted slices
    s1 = jnp.zeros((H, W, 3))
    s2 = jnp.zeros((H, W, 3, 3))
    cnt = jnp.zeros((H, W))
    for dy in range(-rad, rad + 1):
        for dx in range(-rad, rad + 1):
            p = jax.lax.dynamic_slice(ppad, (rad + dy, rad + dx, 0), (H, W, 3))
            o = jax.lax.dynamic_slice(opad, (rad + dy, rad + dx), (H, W))
            s1 = s1 + p
            s2 = s2 + p[..., :, None] * p[..., None, :]
            cnt = cnt + o
    n = jnp.maximum(cnt, 1.0)
    mean = s1 / n[..., None]
    cov = s2 / n[..., None, None] - mean[..., :, None] * mean[..., None, :]

    evals, evecs = jnp.linalg.eigh(cov)          # ascending
    normal = evecs[..., :, 0]                     # smallest-eigval direction
    # orient normals toward the sensor (origin)
    flip = jnp.sum(normal * pts, axis=-1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)

    # planarity: smallest eigval much smaller than the window spread
    lam0 = jnp.maximum(evals[..., 0], 0.0)
    lam1 = jnp.maximum(evals[..., 1], 1e-12)
    planar = (
        (occ > 0)
        & (cnt >= 8)
        & (lam0 < 0.01)
        & (lam0 / lam1 < 0.1)
        & (saliency < planar_threshold)
    )
    # stride subsample for a bounded candidate set
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    planar = planar & (rows % stride == 0) & (cols % stride == 0)

    feat = jnp.concatenate([pts, normal], axis=-1).reshape(-1, 6)
    score = jnp.where(planar.reshape(-1), -lam0.reshape(-1), -jnp.inf)
    vals, idx = jax.lax.top_k(score, max_planar)
    out = feat[idx]
    mask = jnp.isfinite(vals)
    return jnp.where(mask[:, None], out, 0.0), mask

"""Pallas TPU kernel: fused keypoint-saliency (min-neighbor-diff) map.

The hot kernel of the reference pipeline — its cupy implementation
(``SphericalRing.py:137-194``) materializes a (H, W, 25, C) neighbor-diff
tensor (64x1792x25x8 floats = 92 MB) and reduces it; 1.8 s/frame on GPU.

Speed-of-light design (SURVEY.md section 2.3 row 1):

* **channel-planes layout** ``(C, H, W)``: W = 1792 rides the 128-lane axis
  and H the sublanes, so every (H, W) plane tiles the VPU perfectly.  The
  naive (H, W, C=8) layout puts 8 channels on the lane axis — a 16x VMEM
  blow-up that also explodes Mosaic compile time.
* the whole image stack stays in VMEM (8 x 68 x 1796 f32 = 3.9 MB) for all
  24 offset passes — zero HBM traffic between them; the reference's 92 MB
  intermediate never exists.
* occupancy masking, neighbor counting and the min fold happen in
  registers.

The XLA lowering in ``caelo_tpu.ops.nms`` is the portable fallback;
``select_keypoints`` auto-dispatches here on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 2
WINDOW = 2 * RADIUS + 1


def _nms_kernel(resp_ref, occ_ref, min_d2_ref, count_ref):
    """resp (C, H+4, W+4), occ (H+4, W+4) f32 0/1 ->
    min_d2 (H, W) f32, count (H, W) int32."""
    C = resp_ref.shape[0]
    H = min_d2_ref.shape[0]
    W = min_d2_ref.shape[1]

    center = resp_ref[:, RADIUS:RADIUS + H, RADIUS:RADIUS + W]
    min_d2 = jnp.full((H, W), jnp.inf, jnp.float32)
    count = jnp.zeros((H, W), jnp.float32)
    for dy in range(WINDOW):
        for dx in range(WINDOW):
            if dy == RADIUS and dx == RADIUS:
                continue
            nb = resp_ref[:, dy:dy + H, dx:dx + W]
            occ = occ_ref[dy:dy + H, dx:dx + W]
            diff = nb - center
            d2 = jnp.sum(diff * diff, axis=0)
            min_d2 = jnp.minimum(min_d2, jnp.where(occ > 0, d2, jnp.inf))
            count = count + occ
    min_d2_ref[:, :] = min_d2
    count_ref[:, :] = count.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def saliency_map_pallas(respond: jnp.ndarray, occupancy: jnp.ndarray,
                        interpret: bool = False):
    """Fused min-neighbor-diff saliency.

    Args:
      respond: ``(H, W, C)`` float32 respond image.
      occupancy: ``(H, W)`` bool.

    Returns:
      min_d2: ``(H, W)`` squared min feature diff to occupied neighbors
        (inf where no occupied neighbor).
      n_occ: ``(H, W)`` int32 occupied-neighbor count (excl. self).
    """
    H, W, C = respond.shape
    resp = jnp.transpose(respond, (2, 0, 1))           # (C, H, W) planes
    resp = jnp.pad(resp, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS)))
    occ = jnp.pad(
        occupancy.astype(jnp.float32), ((RADIUS, RADIUS), (RADIUS, RADIUS))
    )
    min_d2, count = pl.pallas_call(
        _nms_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(resp, occ)
    return min_d2, count

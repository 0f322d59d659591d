"""bfloat16 inference option: descriptor fidelity + registration quality."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caelo_tpu.config import small_test_config
from caelo_tpu.data.synthetic import synthetic_scan_pair
from caelo_tpu.frontend.registration import (extract_frame_features,
                                             register_pair)
from caelo_tpu.geometry import se3
from caelo_tpu.models import weights_io

needs_ref = pytest.mark.skipif(
    not weights_io.reference_models_available(),
    reason="reference .h5 models not present",
)

CFG32 = small_test_config()
CFG16 = dataclasses.replace(CFG32, compute_dtype="bfloat16")


@needs_ref
def test_bf16_descriptors_close_and_registration_within_gates():
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    scan0, mask0, scan1, mask1, R_gt, t_gt = synthetic_scan_pair(
        seed=0, cfg=CFG32, angle_deg=1.5, translation=(1.2, 0.15, 0.02)
    )
    args0 = (respond, encoder, jnp.asarray(scan0), jnp.asarray(mask0))
    args1 = (respond, encoder, jnp.asarray(scan1), jnp.asarray(mask1))
    f0_32 = extract_frame_features(*args0, CFG32)
    f0_16 = extract_frame_features(*args0, CFG16)

    # outputs stay float32 regardless of compute dtype
    assert f0_16.descriptors.dtype == jnp.float32

    # keypoint sets substantially overlap (bf16 can flip marginal saliency)
    px32 = {tuple(p) for p in np.asarray(f0_32.key_pixels[f0_32.mask])}
    px16 = {tuple(p) for p in np.asarray(f0_16.key_pixels[f0_16.mask])}
    inter = len(px32 & px16) / max(len(px32), 1)
    assert inter > 0.7, inter

    # descriptors of the shared keypoints agree to bf16 tolerance
    common = sorted(px32 & px16)[:64]
    lut32 = {tuple(p): i for i, p in
             enumerate(np.asarray(f0_32.key_pixels))}
    lut16 = {tuple(p): i for i, p in
             enumerate(np.asarray(f0_16.key_pixels))}
    d32 = np.asarray(f0_32.descriptors)[[lut32[c] for c in common]]
    d16 = np.asarray(f0_16.descriptors)[[lut16[c] for c in common]]
    assert np.abs(d32 - d16).max() < 0.1, np.abs(d32 - d16).max()

    # end-to-end: bf16 features register within the reference gates
    f1_16 = extract_frame_features(*args1, CFG16)
    reg = register_pair(jax.random.key(0), f0_16, f1_16, CFG16)
    assert bool(reg.success)
    assert float(se3.rotation_geodesic_deg(reg.R, jnp.asarray(R_gt))) < 1.0
    assert float(np.linalg.norm(np.asarray(reg.t) - t_gt)) < 0.5

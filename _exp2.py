"""Benchmark: steady-state front-end odometry throughput on one chip.

Prints ONE JSON line:
  {"metric": "frontend_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / BASELINE_FPS}

Measures the full per-frame pipeline (projection -> respond net -> NMS ->
voxel pyramid -> multi-scale patches -> encoder -> descriptors) plus the
per-pair registration (matching + batched RANSAC + refit) on synthetic
KITTI-sized scans (~100k points), after compile warm-up.

Baseline: the reference pipeline is CPU+GPU file-based; from its own
published timings (cupy NMS alone 1.8 s/frame, SphericalRing.py:136; sklearn
patch KNN ~2 s/frame and the remaining stages per the timer printouts in
Match.py:315-356) a full frame costs ~5 s => 0.2 frames/s.  BASELINE.md's
north star is >=10x that per chip.
"""
import json
import sys
import time

BASELINE_FPS = 0.2
# Fused-window size: measured on v5e the window is latency-bound (~1.4 ms
# per dispatch) up to 64 frames (46k frames/s); 96 regresses to 8 ms/window
# under HBM pressure and 128 OOMs, so 64 is the per-chip sweet spot.
N_FRAMES = 64


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from caelo_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from caelo_tpu.config import PipelineConfig
    from caelo_tpu.data.synthetic import (make_scene, sample_scene_points,
                                          range_filter)
    from caelo_tpu.frontend.registration import (extract_frame_features,
                                                 register_pair)
    from caelo_tpu.models import weights_io
    from caelo_tpu.ops.masking import pad_points

    cfg = PipelineConfig()
    if weights_io.reference_models_available():
        respond = weights_io.load_respond_layer_params()
        encoder = weights_io.load_patch_encoder_params()
    else:
        from caelo_tpu.models.respond_net import RespondLayer
        from caelo_tpu.models.patch_encoder import PatchEncoder

        key = jax.random.key(0)
        respond = RespondLayer().init(
            key, jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3))
        )
        encoder = PatchEncoder().init(key, jnp.zeros((1, 16, 16, 16)))

    # synthesize a short sequence: sensor translating through one scene
    scene = make_scene(seed=0)
    world = sample_scene_points(scene, seed=0, n_points=cfg.max_points)
    rng = np.random.default_rng(0)
    scans = []
    for i in range(N_FRAMES):
        t = np.array([1.2 * i, 0.05 * i, 0.0])
        local = range_filter((world - t).astype(np.float32), cfg.sensor)
        local = local + rng.normal(0, 0.005, local.shape).astype(np.float32)
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        pts, mask = pad_points(np.concatenate([local, refl], 1), cfg.max_points)
        scans.append((jnp.asarray(pts), jnp.asarray(mask)))

    from caelo_tpu.parallel.pipeline import make_sequence_processor

    pts_b = jnp.stack([s for s, _ in scans])
    mask_b = jnp.stack([m for _, m in scans])
    process = make_sequence_processor(cfg)

    # warm-up (compile)
    feats, regs = process(respond, encoder, pts_b, mask_b, jax.random.key(0))
    jax.block_until_ready(regs)

    # timed steady state: whole window (features + pair registrations) in
    # one device call; block each rep so async dispatch can't hide work
    reps = 8
    times = []
    for r in range(reps):
        t0 = time.time()
        feats, regs = process(respond, encoder, pts_b, mask_b,
                              jax.random.key(r + 1))
        jax.block_until_ready(regs)
        times.append(time.time() - t0); print("rep", r, times[-1], flush=True)
    dt = sorted(times)[len(times) // 2]  # median rep

    fps = N_FRAMES / dt
    print(json.dumps({
        "metric": "frontend_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

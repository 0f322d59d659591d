"""Benchmark: steady-state front-end odometry throughput on one chip.

Prints ONE JSON line:
  {"metric": "frontend_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / BASELINE_FPS, "mfu": ..., "p50_ms": ..., ...}

Measures the full per-frame pipeline (projection -> respond net -> NMS ->
voxel pyramid -> multi-scale patches -> merged 3-scale encoder ->
descriptors) plus per-pair registration (matching + 2048-hypothesis RANSAC
+ refit) on synthetic KITTI-sized scans (~100k points), as one fused
N_FRAMES-frame window program.

Timing methodology (the r1 lesson — VERDICT Weak #1): through the remote-TPU
tunnel, ``jax.block_until_ready`` is NOT a reliable execution barrier — it
can return before the device has executed, which inflated r1's claimed
8.9k-55.7k frames/s numbers by orders of magnitude (the honest pre-
optimization number was 2.6 frames/s).  The only trustworthy sync is a host
data fetch of a value computed from the output, so every timed rep ends
with ``float(jnp.sum(...))`` over the rep's own results, with a per-rep
varied RNG key.  Sanity anchors measured with this method on v5e: a chained
4096^3 bf16 matmul gives 151.8 TFLOP/s (77% of the 197 TFLOP/s peak), and
key-fixed vs key-varied reps time identically (no server memoization).

MFU: XLA's own post-optimization FLOP count of the compiled window program
(``compiled.cost_analysis()['flops']``) divided by measured time and the
chip's bf16 peak.

Baseline: the reference pipeline is CPU+GPU file-based; from its own
published timings (cupy NMS alone 1.8 s/frame, SphericalRing.py:136; sklearn
patch KNN ~2 s/frame and the remaining stages per the timer printouts in
Match.py:315-356) a full frame costs ~5 s => 0.2 frames/s.  BASELINE.md's
north star is >=10x that per chip.
"""
import json
import os
import sys
import time

BASELINE_FPS = 0.2
# 64-frame window: r4's lax.map-chunked extraction bounds the scale-0 bit
# table to 16 live frames, restoring windows past 16 (the r3 limit); 64
# amortizes per-window overhead to 33.8 ms/frame vs 37.9 at 16 (honest
# fetch-synced, v5e).  run_full_pipeline's production default is its
# `window` parameter — see pipeline.py and CLAUDE.md for the currently
# validated value (the degraded-rescue benchmark is re-validated across
# seeds before any default change).
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "64"))
COMPUTE_DTYPE = os.environ.get("BENCH_DTYPE", "float32")
REPS = int(os.environ.get("BENCH_REPS", "12"))

_PEAK_FLOPS = {
    # chip bf16 peak (the MXU path XLA uses for f32 convs/matmuls by
    # default precision on TPU)
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

_PEAK_HBM_BYTES = {
    # chip HBM bandwidth (bytes/s) — the binding resource for this
    # gather/scatter/sort-bound pipeline, so utilization is reported on
    # BOTH axes (MFU for the conv/matmul fraction, HBM for the rest)
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def _lookup_peak(table, device_kind):
    if device_kind not in table:
        raise SystemExit(
            f"bench.py: unknown device_kind {device_kind!r} — add its peak "
            f"to the table instead of silently assuming a v5e"
        )
    return table[device_kind]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from caelo_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from caelo_tpu.config import PipelineConfig
    from caelo_tpu.data.synthetic import (make_scene, sample_scene_points,
                                          range_filter)
    from caelo_tpu.models import weights_io
    from caelo_tpu.ops.masking import pad_points
    from caelo_tpu.parallel.pipeline import make_sequence_processor
    from caelo_tpu.utils.telemetry import MetricsLog

    cfg = PipelineConfig(compute_dtype=COMPUTE_DTYPE)
    if os.environ.get("BENCH_PALLAS_NMS", "0") == "1":
        # A/B knob for the fused Pallas saliency kernel (ROADMAP "Pallas
        # settlement"): flip the NMS backend without touching defaults
        import dataclasses

        cfg = dataclasses.replace(
            cfg, keypoint=dataclasses.replace(cfg.keypoint,
                                              use_pallas_nms=True))
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

    pts_b = jnp.stack([s for s, _ in scans])
    mask_b = jnp.stack([m for _, m in scans])
    process = make_sequence_processor(cfg)

    t0 = time.time()
    compiled = process.lower(
        respond, encoder, pts_b, mask_b, jax.random.key(0)
    ).compile()
    compile_s = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        flops_per_window = float(ca.get("flops", 0.0))
        bytes_per_window = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops_per_window = 0.0
        bytes_per_window = 0.0

    # warm-up, fetch-synced (module docstring: a host fetch of a value
    # derived from the output is the only trustworthy execution barrier)
    _, regs = process(respond, encoder, pts_b, mask_b, jax.random.key(0))
    n_success = float(jnp.sum(regs.success))

    times = []
    for r in range(REPS):
        t0 = time.time()
        _, regs = process(respond, encoder, pts_b, mask_b,
                          jax.random.key(r + 1))
        float(jnp.sum(regs.t) + jnp.sum(regs.n_inliers))  # fetch barrier
        times.append(time.time() - t0)

    ts = sorted(times)
    p50 = ts[len(ts) // 2]
    p95 = ts[min(len(ts) - 1, int(round(0.95 * (len(ts) - 1))))]
    fps = N_FRAMES / p50

    dev = jax.devices()[0]
    peak = _lookup_peak(_PEAK_FLOPS, dev.device_kind)
    peak_hbm = _lookup_peak(_PEAK_HBM_BYTES, dev.device_kind)
    mfu = flops_per_window / p50 / peak if flops_per_window else 0.0
    # XLA cost-model bytes over peak HBM bandwidth.  This is NOT an
    # achieved-bandwidth utilization: XLA's "bytes accessed" counts fused
    # reads more than once, so the ratio can exceed 1.0 (VERDICT r3 weak
    # #5).  It is published under an explicit cost-model name; read it as
    # "the window is HBM-bound", nothing more.
    costmodel_hbm = (bytes_per_window / p50 / peak_hbm
                     if bytes_per_window else 0.0)

    # capacity-saturation observability (ADVICE r2): per-scale occupancy vs
    # the static supercell caps / bitgrid slots, logged per run so silent
    # patch truncation on real data is detectable
    from caelo_tpu.voxel.grid import occupancy_stats, voxelize

    pyr = voxelize(pts_b[0, :, :3], mask_b[0], cfg.voxel)
    occ = jax.tree.map(int, occupancy_stats(pyr, cfg.voxel))

    os.makedirs("runs", exist_ok=True)
    log = MetricsLog(os.environ.get("BENCH_METRICS",
                                    "runs/bench_metrics.jsonl"))
    log.log("bench", device=str(dev.device_kind), frames=N_FRAMES,
            dtype=COMPUTE_DTYPE, compile_s=round(compile_s, 1),
            window_ms=[round(t * 1e3, 3) for t in times],
            pair_success=n_success,
            flops_per_window=flops_per_window,
            bytes_per_window=bytes_per_window,
            occupancy=occ,
            supercell_caps=list(cfg.voxel.supercell_caps),
            bitgrid_slots=list(cfg.voxel.bitgrid_slots))

    print(json.dumps({
        "metric": "frontend_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "mfu": round(mfu, 4),
        "xla_costmodel_hbm_frac": round(costmodel_hbm, 4),
        "bytes_per_window": bytes_per_window,
        "p50_ms": round(p50 * 1e3, 3),
        "p95_ms": round(p95 * 1e3, 3),
        "n_frames_window": N_FRAMES,
        "reps": REPS,
        "dtype": COMPUTE_DTYPE,
        "flops_per_window": flops_per_window,
        "device": str(dev.device_kind),
        "compile_s": round(compile_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

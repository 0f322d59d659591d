"""Pallas-vs-XLA A/B for the two optional kernels, fetch-synced on TPU.

Settles ROADMAP "Pallas settlement" (VERDICT r3 weak #6): r1's published
Pallas numbers came from the discredited block_until_ready timing; this
script measures both backends of each op with the honest methodology
(per-rep varied inputs, host fetch of an output-derived scalar per rep)
and writes PALLAS_AB.json.  Defaults follow the winner.

  * keypoint NMS: ``ops.nms.select_keypoints`` (XLA windowed reduce) vs
    ``ops.pallas_nms`` (VMEM-resident stencil) — flag
    ``KeypointConfig.use_pallas_nms``.
  * (historical) ICP nearest neighbor: the Pallas streaming-argmin kernel
    lost the same A/B (1.93 vs 1.81 ms/call) and was deleted; the measured
    numbers live in the committed PALLAS_AB.json.

Usage: python -u examples/pallas_ab.py [--reps 7] [--frames 16]
"""
import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--json-out", default="PALLAS_AB.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from caelo_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from caelo_tpu.config import PipelineConfig
    from caelo_tpu.data.synthetic import (make_scene, range_filter,
                                          sample_scene_points)
    from caelo_tpu.models import weights_io
    from caelo_tpu.models.respond_net import RespondLayer
    from caelo_tpu.ops.masking import pad_points
    from caelo_tpu.ops.nms import select_keypoints
    from caelo_tpu.projection.spherical import (model_input,
                                                project_to_spherical_ring)

    cfg = PipelineConfig()
    B = args.frames
    respond = weights_io.load_respond_layer_params()
    scene = make_scene(seed=0)
    world = sample_scene_points(scene, seed=0, n_points=cfg.max_points)
    rng = np.random.default_rng(0)
    pts_l, msk_l = [], []
    for i in range(B):
        t = np.array([1.2 * i, 0.05 * i, 0.0])
        local = range_filter((world - t).astype(np.float32), cfg.sensor)
        p, m = pad_points(np.concatenate(
            [local, rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)],
            1), cfg.max_points)
        pts_l.append(p)
        msk_l.append(m)
    pts = jnp.asarray(np.stack(pts_l))
    msk = jnp.asarray(np.stack(msk_l))

    prep = jax.jit(jax.vmap(lambda p, m: project_to_spherical_ring(
        p, m, cfg.sensor)))
    images, counters = prep(pts, msk)
    rl = jax.jit(jax.vmap(lambda im: RespondLayer().apply(
        respond, model_input(im, cfg.sensor)[None])[0]))
    responds = rl(images)
    jax.block_until_ready(responds)

    def timed(fn, *arrays, perturb):
        f = jax.jit(fn)
        out = f(*arrays)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts = []
        for r in range(args.reps):
            arrs = perturb(r, *arrays)
            t0 = time.time()
            out = f(*arrs)
            float(jnp.sum(jax.tree.leaves(out)[0]))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    results = {}

    # ---- NMS A/B
    def nms_with(flag):
        kp = dataclasses.replace(cfg.keypoint, use_pallas_nms=flag)

        def run(images, counters, responds):
            return jax.vmap(lambda im, cn, rs: select_keypoints(
                im, cn, rs, cfg.sensor, kp))(images, counters, responds)
        return run

    def perturb_nms(r, images, counters, responds):
        return images, counters, responds + 1e-6 * (r + 1)

    for name, flag in (("xla", False), ("pallas", True)):
        t = timed(nms_with(flag), images, counters, responds,
                  perturb=perturb_nms)
        results[f"nms_{name}_ms_per_frame"] = round(t * 1e3 / B, 3)

    results["nms_winner"] = ("pallas" if results["nms_pallas_ms_per_frame"]
                             < results["nms_xla_ms_per_frame"] else "xla")

    # ---- scale-0 plane gather A/B (ops/pallas_patches.py: one 1 KB row
    # DMA per (keypoint, covering cell) vs XLA's element-granular gather)
    from caelo_tpu.voxel.grid import (_patches_one_scale_bitgrid,
                                      keypoint_voxels, voxelize)

    kp_all = jax.jit(jax.vmap(lambda im, cn, rs: select_keypoints(
        im, cn, rs, cfg.sensor, cfg.keypoint)))(images, counters, responds)
    key_pts, _, key_mask, _ = kp_all
    pyr = jax.jit(jax.vmap(lambda p, m: voxelize(
        p[:, :3], m, cfg.voxel)))(pts, msk)
    jax.block_until_ready(pyr.coords[0])

    def s0_with(flag):
        vx = dataclasses.replace(cfg.voxel, use_pallas_plane_gather=flag)

        def run(kp, km, coords, masks):
            def one(a, b, c, d):
                kv = keypoint_voxels(a, 0, vx)
                return _patches_one_scale_bitgrid(
                    kv, b, c, d, vx, 0, vx.bitgrid_slots[0])
            return jax.vmap(one)(kp, km, coords, masks)
        return run

    def perturb_s0(r, kp, km, coords, masks):
        return kp + 1e-4 * (r + 1), km, coords, masks

    parity = None
    outs = {}
    for name, flag in (("xla", False), ("pallas", True)):
        t = timed(s0_with(flag), key_pts, key_mask,
                  pyr.coords[0], pyr.masks[0], perturb=perturb_s0)
        results[f"plane_gather_{name}_s0_ms_per_frame"] = round(
            t * 1e3 / B, 3)
        outs[name] = s0_with(flag)(key_pts, key_mask, pyr.coords[0],
                                   pyr.masks[0])
    parity = float(jnp.max(jnp.abs(outs["xla"] - outs["pallas"])))
    results["plane_gather_parity_maxdiff"] = parity
    results["plane_gather_winner"] = (
        "pallas" if parity == 0.0
        and results["plane_gather_pallas_s0_ms_per_frame"]
        < results["plane_gather_xla_s0_ms_per_frame"] else "xla")
    # (the Pallas streaming-argmin NN kernel lost its A/B — 1.93 vs
    # 1.81 ms/call on v5e, recorded in PALLAS_AB.json — and was deleted)
    results["device"] = str(jax.devices()[0].device_kind)
    results["reps"] = args.reps
    print(json.dumps(results, indent=2))
    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

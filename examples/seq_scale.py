"""Sequence-scale proof run: KITTI seq-00 frame count through the full
4-stage pipeline.

The reference's operating point is 4,541 frames (seq 00,
``PoseEstimation.py:241-268`` + ``RefinePoses.py`` over full sequences).
This run proves the framework at that scale on one chip: memory behavior of
the stacked feature pytrees, dispatch count of the windowed front end,
loop-closure candidate search at N ~ 4.6k (the all-pairs descriptor GEMM +
batched verification), and the exact host pose-graph solve at 27k unknowns.

The trajectory is the hard ray-cast circuit driven for ~8.7 laps, so every
place is revisited ~8 times — a multi-revisit loop-closure stress the
520-frame benchmark cannot produce.

Usage:  python examples/seq_scale.py [--frames 4541] [--json-out SEQ_SCALE.json]
"""
import argparse
import json
import os
import resource
import sys
import time

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4541)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default="SEQ_SCALE.json")
    ap.add_argument("--scan-cache", default="",
                    help="base path for the on-disk scan stack (<path>."
                         "pts.npy/.msk.npy/.gt.npy, ~9.5 GB at 4,541 "
                         "frames) — generated in RAM-bounded chunks if "
                         "missing, then read frame-by-frame (host RSS "
                         "stays O(window))")
    ap.add_argument("--window", type=int, default=0,
                    help="front-end window size (0 = pipeline default)")
    ap.add_argument("--candidate-source", default="descriptor",
                    choices=["descriptor", "scancontext"],
                    help="loop-closure candidate source (the SC "
                         "correlation-matrix A/B, VERDICT r4 item 5)")
    args = ap.parse_args()

    from caelo_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from caelo_tpu.config import PipelineConfig
    from caelo_tpu.data.hard_synthetic import generate_benchmark
    from caelo_tpu.eval.metrics import (absolute_trajectory_error,
                                        loop_closure_pr,
                                        registration_summary,
                                        relative_pose_errors)
    from caelo_tpu.models import weights_io
    from caelo_tpu.pipeline import run_full_pipeline
    from caelo_tpu.utils.telemetry import StageTimer

    cfg = PipelineConfig()
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()

    from caelo_tpu.data.scancache import NpyScanReader, write_benchmark_cache

    t0 = time.time()
    base = args.scan_cache or "/tmp/seq_scale_cache"
    if not os.path.exists(base + ".pts.npy"):
        write_benchmark_cache(
            base, args.frames, cfg, seed=args.seed, lap_frames=520,
            progress=lambda b: print(f"  generated {b}/{args.frames}",
                                     file=sys.stderr))
    poses_gt = np.load(base + ".gt.npy")[:args.frames]
    scans = NpyScanReader(base)
    assert len(scans) >= args.frames, (len(scans), args.frames)
    if len(scans) > args.frames:
        class _Slice:
            def __init__(self, r, n):
                self.r, self.n = r, n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return self.r[i]

            def mask(self, i):
                return self.r.mask(i)
        scans = _Slice(scans, args.frames)
    gen_s = time.time() - t0
    print(f"generated {args.frames} ray-cast frames in {gen_s:.0f} s "
          f"(rss {rss_gb():.1f} GB)", file=sys.stderr)

    timer = StageTimer(sync=False)
    t0 = time.time()
    pipe_kwargs = {"window": args.window} if args.window > 0 else {}
    result = run_full_pipeline(scans, respond, encoder, cfg=cfg,
                               enable_loop_closure=True, timer=timer,
                               seed=args.seed,
                               candidate_source=args.candidate_source,
                               **pipe_kwargs)
    wall = time.time() - t0
    print(f"pipeline: {wall:.1f} s ({args.frames / wall:.2f} frames/s e2e, "
          f"rss {rss_gb():.1f} GB)", file=sys.stderr)

    errs = relative_pose_errors(poses_gt, result.poses_raw, np.eye(3),
                                np.zeros(3))
    summary = registration_summary(errs)
    ate = {name: absolute_trajectory_error(poses_gt, p)["ate_rmse"]
           for name, p in [("raw", result.poses_raw),
                           ("dejumped", result.poses_dejumped),
                           ("refined", result.poses_refined),
                           ("final", result.poses_final)]}
    pr = loop_closure_pr(result.loop_edge_i, result.loop_edge_j,
                         poses_gt.reshape(-1, 3, 4)[:, :, 3])
    out = {
        "frames": args.frames,
        "window": args.window,
        "candidate_source": args.candidate_source,
        "gen_seconds": round(gen_s, 1),
        "pipeline_seconds": round(wall, 1),
        "frames_per_s_e2e": round(args.frames / wall, 2),
        "peak_rss_gb": round(rss_gb(), 2),
        "stage_seconds": timer.summary(),
        "success_rate": summary["success_rate"],
        "rre_deg": summary["rre_deg"],
        "rte_m": summary["rte_m"],
        "ate_m": {k: round(v, 3) for k, v in ate.items()},
        "n_loop_closures": int(result.n_loop_closures),
        "loop_precision": pr["precision"],
        "loop_recall": pr["recall"],
        "loop_edges": [[int(a), int(b)] for a, b in
                       zip(result.loop_edge_i, result.loop_edge_j)],
        "dejumped": len(result.dejumped_frames),
        "refined_spans": len(result.refine_stats.refined),
    }
    print(json.dumps(out, indent=2))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    # loop-pin coverage: the largest frame span with no accepted-edge
    # endpoint.  On this heavily self-similar synthetic world the pooled
    # place descriptor aliases away from the circuit-start region, so the
    # strict verification gates keep precision 1.0 but concentrate the
    # pins — a concentrated pin set cannot collapse multi-lap drift
    # (documented limitation; the 520-frame benchmarks DO collapse ATE).
    pinned = np.unique(np.concatenate(
        [[0, args.frames - 1], result.loop_edge_i, result.loop_edge_j]))
    out["max_unpinned_span"] = int(np.max(np.diff(pinned))) if len(
        pinned) > 1 else args.frames
    # RSS/fps gates per VERDICT r4 item 3: streamed scans + the window-64
    # front end must hold >=20 fps e2e under 8 GB host RSS
    ok = (summary["success_rate"] >= 0.99
          and out["frames_per_s_e2e"] >= 20.0
          and out["peak_rss_gb"] < 8.0
          and pr["precision"] >= 0.9
          and out["ate_m"]["final"] <= 0.5 * out["ate_m"]["raw"])
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"SEQ-SCALE {'PASS' if ok else 'FAIL'} "
          f"(gates: success>=99%, >=20 fps e2e, rss<8 GB, loop P>=0.9, "
          f"ATE halved): "
          f"{args.frames} frames, success "
          f"{summary['success_rate']*100:.2f}%, ATE "
          f"{out['ate_m']['raw']:.2f}->{out['ate_m']['final']:.2f} m, "
          f"loop P {pr['precision']:.2f} R {pr['recall']:.2f} "
          f"(max unpinned span {out['max_unpinned_span']}), "
          f"rss {out['peak_rss_gb']:.1f} GB", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

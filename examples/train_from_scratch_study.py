"""Train both auto-encoders from scratch and compare against shipped weights.

ROADMAP item 3 (training to convergence): runs the reference's unsupervised
recipe (AE4SphericalRingPC.py:117-170 MSE/Adam; AE4VoxelPatch.py:163-235
BCE — we use Adam over the reference's Adadelta, which converges in far
fewer steps at these model sizes) on synthetic scenes, then evaluates the
trained descriptors head-to-head with the shipped reference weights on
held-out registration pairs:

  * registration success rate / RRE / RTE (EvaluationOnRegistration.py
    semantics),
  * RANSAC inlier ratio (the matchability metric of GenerateTrajactory.m's
    Matchablity_*.mat artifacts).

Usage:
  python examples/train_from_scratch_study.py [--steps2d N] [--steps3d N]
                                              [--out runs/scratch]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from caelo_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from caelo_tpu.config import PipelineConfig
from caelo_tpu.data.synthetic import synthetic_scan_pair
from caelo_tpu.frontend.registration import extract_frame_features, register_pair
from caelo_tpu.models import weights_io
from caelo_tpu.models.patch_encoder import VoxelPatchAE
from caelo_tpu.models.respond_net import SphericalRingAE
from caelo_tpu.training.drivers import (patch_batches, respond_batches,
                                        synthetic_scan_stream)
from caelo_tpu.training.train import (create_train_state, make_train_step,
                                      patch_loss, respond_loss)


def _train_loop(state, step, batches, max_steps: int, tag: str,
                plateau_window: int = 0, plateau_tol: float = 0.01,
                min_steps: int = 0):
    """Run until ``max_steps`` or, with ``plateau_window``, until the
    median loss over the last window improves on the previous window by
    less than ``plateau_tol`` (relative) — the convergence criterion of
    VERDICT r4 item 6."""
    losses = []
    t0 = time.time()
    for i, batch in enumerate(batches):
        if i >= max_steps:
            break
        state, loss = step(state, jnp.asarray(batch))
        losses.append(float(loss))
        if i % 25 == 0:
            print(f"{tag} step {i}: loss={losses[-1]:.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        W = plateau_window
        if (W and i >= max(min_steps, 2 * W) and i % W == 0):
            prev = float(np.median(losses[-2 * W:-W]))
            cur = float(np.median(losses[-W:]))
            if prev - cur < plateau_tol * max(abs(prev), 1e-9):
                print(f"{tag}: plateau at step {i} "
                      f"({prev:.5f} -> {cur:.5f})", flush=True)
                break
    return state, losses


def train_both(cfg: PipelineConfig, steps2d: int, steps3d: int, out: str,
               scan_stream_fn=None, plateau_window: int = 0):
    """Train both AEs.  ``scan_stream_fn(seed) -> iterator`` selects the
    training distribution (default: easy synthetic scenes; the convergence
    study passes the hard-circuit cache stream)."""
    if scan_stream_fn is None:
        scan_stream_fn = lambda seed: synthetic_scan_stream(cfg, seed=seed)
    # ---- 2D respond AE (MSE/Adam, AE4SphericalRingPC.py:150)
    model2 = SphericalRingAE()
    opt2 = optax.adam(1e-3)
    state2 = create_train_state(
        model2, jax.random.key(0),
        jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3)), opt2,
    )
    step2 = make_train_step(model2, respond_loss, opt2)
    state2, losses2 = _train_loop(
        state2, step2,
        respond_batches(scan_stream_fn(100), cfg, batch=4),
        steps2d, "respond", plateau_window=plateau_window)
    respond_trained = weights_io.respond_params_from_ae(state2.params)

    # ---- 3D voxel-patch AE (BCE, AE4VoxelPatch.py:213), patches anchored at
    # keypoints detected by the freshly trained respond net
    model3 = VoxelPatchAE()
    opt3 = optax.adam(1e-3)
    state3 = create_train_state(
        model3, jax.random.key(1), jnp.zeros((1, 16, 16, 16)), opt3,
    )
    step3 = make_train_step(model3, patch_loss, opt3)
    state3, losses3 = _train_loop(
        state3, step3,
        patch_batches(scan_stream_fn(200), cfg, batch=128,
                      respond_params=respond_trained),
        steps3d, "patch", plateau_window=plateau_window)
    encoder_trained = weights_io.encoder_params_from_ae(state3.params)

    weights_io.save_checkpoint(os.path.join(out, "respond_ae"), state2.params)
    weights_io.save_checkpoint(os.path.join(out, "patch_ae"), state3.params)
    return respond_trained, encoder_trained, losses2, losses3


def _hard_pairs(n_pairs: int, cfg: PipelineConfig, seed: int = 7,
                span: int = 220):
    """Ray-cast pairs sampled EVENLY across a ``span``-frame stretch of the
    hard circuit — covering straights AND the 20 deg/s turns (a
    consecutive-from-frame-0 sample sees only the first straight)."""
    from caelo_tpu.data.hard_synthetic import generate_benchmark

    span = max(span, n_pairs + 1)
    scans, gt = generate_benchmark(n_frames=span, seed=seed, cfg=cfg)
    gt = gt.reshape(-1, 3, 4)
    starts = np.unique((np.arange(n_pairs) * (span - 1)) // max(n_pairs, 1))
    out = []
    for i in starts[:n_pairs]:
        i = int(i)
        R0, t0 = gt[i, :, :3], gt[i, :, 3]
        R1, t1 = gt[i + 1, :, :3], gt[i + 1, :, 3]
        # frame-1 -> frame-0: x0 = R0^T (R1 x1 + t1 - t0)
        Rg = R0.T @ R1
        tg = R0.T @ (t1 - t0)
        (s0, m0), (s1, m1) = scans[i], scans[i + 1]
        out.append((s0, m0, s1, m1, Rg, tg))
    return out


def evaluate(tag: str, respond_params, encoder_params, cfg: PipelineConfig,
             n_pairs: int, seed0: int = 900, hard: bool = False):
    """Held-out pair registration quality (scenes unseen in training)."""
    stats = {"success": [], "rot_err_deg": [], "t_err_m": [],
             "inlier_ratio": []}
    hard_set = _hard_pairs(n_pairs, cfg) if hard else None
    for i in range(n_pairs):
        if hard:
            s0, m0, s1, m1, R_gt, t_gt = hard_set[i]
        else:
            s0, m0, s1, m1, R_gt, t_gt = synthetic_scan_pair(
                seed=seed0 + i, cfg=cfg,
                angle_deg=float(np.random.default_rng(i).uniform(0.5, 3.0)),
            )
        f0 = extract_frame_features(respond_params, encoder_params,
                                    jnp.asarray(s0), jnp.asarray(m0), cfg)
        f1 = extract_frame_features(respond_params, encoder_params,
                                    jnp.asarray(s1), jnp.asarray(m1), cfg)
        reg = register_pair(jax.random.key(i), f0, f1, cfg)
        R, t = np.asarray(reg.R, np.float64), np.asarray(reg.t, np.float64)
        cosang = (np.trace(R.T @ R_gt) - 1) / 2
        rot_err = float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        t_err = float(np.linalg.norm(t - t_gt))
        n_valid = int(np.asarray(f1.mask).sum())
        stats["success"].append(bool(reg.success))
        stats["rot_err_deg"].append(rot_err)
        stats["t_err_m"].append(t_err)
        stats["inlier_ratio"].append(
            float(np.asarray(reg.n_inliers)) / max(n_valid, 1))
    ok = np.array(stats["success"])
    summary = {
        "tag": tag + ("/hard" if hard else "/easy"),
        "n_pairs": n_pairs,
        "success_rate": float(ok.mean()),
        "rot_err_deg_mean": float(np.mean(stats["rot_err_deg"])),
        "t_err_m_mean": float(np.mean(stats["t_err_m"])),
        "inlier_ratio_mean": float(np.mean(stats["inlier_ratio"])),
    }
    print(json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps2d", type=int, default=300)
    ap.add_argument("--steps3d", type=int, default=400)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--hard-pairs", type=int, default=8,
                    help="also score on hard ray-cast pairs (0 = skip)")
    ap.add_argument("--out", default="runs/scratch")
    ap.add_argument("--eval-only", default="",
                    help="skip training; load respond_ae/patch_ae "
                         "checkpoints from this directory")
    ap.add_argument("--hard-caches", default="",
                    help="comma-separated hard-benchmark scan caches "
                         "(.npz) to TRAIN on — the hard-circuit "
                         "distribution incl. degraded bursts (VERDICT r4 "
                         "item 6); with --plateau the loops run to a "
                         "loss-plateau convergence criterion")
    ap.add_argument("--plateau", type=int, default=0,
                    help="plateau window (steps); 0 = fixed step counts")
    args = ap.parse_args()

    cfg = PipelineConfig()
    if args.eval_only:
        p2 = weights_io.load_checkpoint(
            os.path.join(args.eval_only, "respond_ae"))
        p3 = weights_io.load_checkpoint(
            os.path.join(args.eval_only, "patch_ae"))
        respond_t = weights_io.respond_params_from_ae(p2)
        encoder_t = weights_io.encoder_params_from_ae(p3)
        l2 = l3 = [float("nan"), float("nan")]
    else:
        stream_fn = None
        if args.hard_caches:
            from caelo_tpu.training.drivers import cached_scan_stream

            paths = [p for p in args.hard_caches.split(",") if p]
            stream_fn = lambda seed: cached_scan_stream(paths,
                                                        shuffle_seed=seed)
        respond_t, encoder_t, l2, l3 = train_both(
            cfg, args.steps2d, args.steps3d, args.out,
            scan_stream_fn=stream_fn, plateau_window=args.plateau)
        print(f"respond loss {l2[0]:.5f} -> {l2[-1]:.5f} "
              f"({len(l2)} steps); patch loss {l3[0]:.5f} -> {l3[-1]:.5f} "
              f"({len(l3)} steps)", flush=True)

    # trained checkpoints use the training activations (relu convs + linear
    # code); the shipped artifact is tanh (see models/patch_encoder.py)
    cfg_trained = dataclasses.replace(
        cfg, encoder_activation="relu", encoder_code_activation="linear")
    results = [evaluate("trained-from-scratch", respond_t, encoder_t,
                        cfg_trained, args.pairs)]
    if args.hard_pairs:
        results.append(evaluate("trained-from-scratch", respond_t, encoder_t,
                                cfg_trained, args.hard_pairs, hard=True))
    if weights_io.reference_models_available():
        respond_s = weights_io.load_respond_layer_params()
        encoder_s = weights_io.load_patch_encoder_params()
        results.append(evaluate("shipped-reference", respond_s, encoder_s,
                                cfg, args.pairs))
        if args.hard_pairs:
            results.append(evaluate("shipped-reference", respond_s, encoder_s,
                                    cfg, args.hard_pairs, hard=True))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "study.json"), "w") as f:
        json.dump({"results": results,
                   "loss2d": [l2[0], l2[-1]],
                   "loss3d": [l3[0], l3[-1]]}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training drivers: data pipelines + epoch loops for both auto-encoders.

Replaces the reference's file-shard Keras generators
(``AE4SphericalRingPC.py:65-89`` ``BatchInputData``/``YieldBatchData`` over
``SphericalRing/*.mat`` files; ``AE4VoxelPatch.py:58-145`` keypoint-anchored
patch sampling over ``VoxelModel/*.mat``) with host-side numpy pipelines that
feed the jitted optax steps of ``caelo_tpu.training.train``.  Either source
works:

* ``--synthetic``: scenes from ``caelo_tpu.data.synthetic`` (no dataset);
* KITTI: scans from ``caelo_tpu.data.kitti``.

Patch sampling matches the reference's strategy: anchor patches at detected
interest points (``AE4VoxelPatch.py:66`` ``RandDataSource=1``) so the encoder
trains on the distribution it will describe.
"""
from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import PipelineConfig
from ..models import weights_io
from ..models.patch_encoder import VoxelPatchAE
from ..models.respond_net import SphericalRingAE
from .train import (TrainState, create_train_state, make_train_step,
                    patch_loss, respond_loss)


# ----------------------------------------------------------------- data feeds
def synthetic_scan_stream(cfg: PipelineConfig, seed: int = 0
                          ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    from ..data.synthetic import (make_scene, range_filter,
                                  sample_scene_points)
    from ..ops.masking import pad_points

    rng = np.random.default_rng(seed)
    i = 0
    while True:
        scene = make_scene(seed=seed + i // 4)
        world = sample_scene_points(scene, seed=seed + i, n_points=cfg.max_points)
        t = rng.uniform(-5, 5, 3) * np.array([1, 1, 0.02])
        local = range_filter((world - t).astype(np.float32), cfg.sensor)
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        yield pad_points(np.concatenate([local, refl], 1), cfg.max_points)
        i += 1


def cached_scan_stream(npz_paths, shuffle_seed: int = 0
                       ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Cycle scans from on-disk benchmark caches (the ``pts``/``msk``
    stacks ``examples/hard_benchmark.py --scan-cache`` writes).  This is
    how training runs on the HARD distribution — ray-cast circuit scans
    including degraded bursts — without paying per-step ray casting
    (~0.3 s/frame); frames are drawn in shuffled order, reshuffled per
    pass."""
    rng = np.random.default_rng(shuffle_seed)
    stacks = []
    for p in npz_paths:
        z = np.load(p)
        stacks.append((z["pts"], z["msk"]))
    n_total = sum(s[0].shape[0] for s in stacks)
    while True:
        order = rng.permutation(n_total)
        bounds = np.cumsum([0] + [s[0].shape[0] for s in stacks])
        for g in order:
            si = int(np.searchsorted(bounds, g, side="right") - 1)
            i = int(g - bounds[si])
            yield stacks[si][0][i], stacks[si][1][i]


def kitti_scan_stream(root: str, cfg: PipelineConfig, seqs=None
                      ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    from ..data.kitti import KittiOdometry

    ds = KittiOdometry(root, cfg)
    seqs = seqs or sorted(os.listdir(os.path.join(root, "sequences")))
    while True:
        for seq in seqs:
            for scan, mask in ds.iter_scans(seq):
                yield scan, mask


def respond_batches(scan_stream, cfg: PipelineConfig, batch: int):
    """Batches of (B, n_lines, model_w, 3) model inputs (the AE trains on
    the x,y,z channels of the ring image, ``AE4SphericalRingPC.py:66-75``)."""
    from ..projection.spherical import model_input, project_to_spherical_ring

    buf = []
    for pts, mask in scan_stream:
        img, _ = project_to_spherical_ring(
            jnp.asarray(pts), jnp.asarray(mask), cfg.sensor
        )
        buf.append(np.asarray(model_input(img, cfg.sensor)))
        if len(buf) == batch:
            yield np.stack(buf)
            buf = []


def patch_batches(scan_stream, cfg: PipelineConfig, batch: int,
                  respond_params=None, seed: int = 0):
    """Batches of (B, 16, 16, 16) occupancy patches anchored at detected
    keypoints across the 3 scales (``AE4VoxelPatch.py:58-133``)."""
    from ..frontend.registration import extract_frame_features
    from ..models.patch_encoder import PatchEncoder
    from ..models.respond_net import RespondLayer
    from ..ops.nms import select_keypoints
    from ..projection.spherical import model_input, project_to_spherical_ring
    from ..voxel.grid import extract_patches, voxelize

    if respond_params is None:
        if weights_io.reference_models_available():
            respond_params = weights_io.load_respond_layer_params()
        else:
            respond_params = RespondLayer().init(
                jax.random.key(0),
                jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3)),
            )
    rng = np.random.default_rng(seed)
    buf = []
    for pts, mask in scan_stream:
        img, counter = project_to_spherical_ring(
            jnp.asarray(pts), jnp.asarray(mask), cfg.sensor
        )
        respond = RespondLayer().apply(
            respond_params, model_input(img, cfg.sensor)[None]
        )[0]
        key_pts, _, key_mask, _ = select_keypoints(
            img, counter, respond, cfg.sensor, cfg.keypoint
        )
        pyr = voxelize(jnp.asarray(pts)[:, :3], jnp.asarray(mask), cfg.voxel)
        patches = extract_patches(key_pts, key_mask, pyr, cfg.voxel)
        km = np.asarray(key_mask)
        for s in range(3):
            ps = np.asarray(patches[s])[km]
            if ps.shape[0]:
                take = rng.choice(ps.shape[0], min(batch, ps.shape[0]),
                                  replace=False)
                buf.extend(ps[take])
        while len(buf) >= batch:
            yield np.stack(buf[:batch])
            buf = buf[batch:]


# ----------------------------------------------------------------- main loops
def _run_loop(state: TrainState, step_fn, batches, n_steps: int, tag: str):
    t0 = time.time()
    loss = float("nan")
    for i, batch in enumerate(batches):
        if 0 <= n_steps <= i:
            break
        state, loss = step_fn(state, jnp.asarray(batch))
        if i % 10 == 0:
            print(f"{tag} step {i}: loss={float(loss):.5f} "
                  f"({(time.time()-t0):.1f}s)", flush=True)
    return state, float(loss)


def train_respond_main(args):
    cfg = PipelineConfig()
    model = SphericalRingAE()
    opt = optax.adam(args.lr)
    sample = jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3))
    state = create_train_state(model, jax.random.key(0), sample, opt)
    step = make_train_step(model, respond_loss, opt)
    stream = (synthetic_scan_stream(cfg) if args.synthetic
              else kitti_scan_stream(args.data, cfg))
    n_steps = args.steps if args.steps > 0 else args.epochs * 100
    state, loss = _run_loop(
        state, step, respond_batches(stream, cfg, args.batch), n_steps,
        "respond",
    )
    weights_io.save_checkpoint(args.out, state.params)
    print(f"final loss {loss:.5f}; saved to {args.out}")
    return 0


def train_patch_main(args):
    cfg = PipelineConfig()
    model = VoxelPatchAE()
    opt = optax.adam(args.lr)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 16)), opt
    )
    step = make_train_step(model, patch_loss, opt)
    stream = (synthetic_scan_stream(cfg) if args.synthetic
              else kitti_scan_stream(args.data, cfg))
    n_steps = args.steps if args.steps > 0 else args.epochs * 100
    state, loss = _run_loop(
        state, step, patch_batches(stream, cfg, args.batch), n_steps, "patch"
    )
    weights_io.save_checkpoint(args.out, state.params)
    print(f"final loss {loss:.5f}; saved to {args.out}")
    return 0

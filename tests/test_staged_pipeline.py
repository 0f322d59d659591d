"""Stage-wise restartable pipeline: the back end re-runs from stored
artifacts alone and reproduces the in-memory ``run_full_pipeline`` results
(the reference's core operational contract — per-frame files + stage
toggles, ``Dirs.py:19-27``, ``RefinePoses.py:526-531``).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from caelo_tpu.backend import refine
from caelo_tpu.config import small_test_config
from caelo_tpu.data.artifacts import ArtifactStore
from caelo_tpu.models import weights_io
from caelo_tpu.ops.masking import pad_points
from caelo_tpu.pipeline import (load_stage_inputs, preprocess_to_store,
                                run_full_pipeline, stage_loop_closure,
                                stage_refinement)

needs_ref = pytest.mark.skipif(
    not weights_io.reference_models_available(),
    reason="reference .h5 models not present",
)

CFG = small_test_config()


def _make_scans(n=8, seed=3):
    from caelo_tpu.data.synthetic import (make_scene, range_filter,
                                          sample_scene_points)

    scene = make_scene(seed=seed)
    world = sample_scene_points(scene, seed=seed, n_points=CFG.max_points)
    rng = np.random.default_rng(seed)
    scans = []
    for i in range(n):
        t = np.array([1.0 * i, 0.05 * i, 0.0])
        local = range_filter((world - t).astype(np.float32), CFG.sensor)
        local = local + rng.normal(0, 0.005, local.shape).astype(np.float32)
        refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
        scans.append(
            pad_points(np.concatenate([local, refl], 1), CFG.max_points)
        )
    return scans


@needs_ref
def test_staged_reproduces_full_pipeline(tmp_path):
    """preprocess -> (dejump+refine from artifacts) -> (loops from
    artifacts) reproduces run_full_pipeline's poses without re-reading
    scans."""
    scans = _make_scans(n=8)
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    R_tr, t_tr = np.eye(3), np.zeros(3)

    full = run_full_pipeline(
        scans, respond, encoder, R_tr, t_tr, CFG,
        enable_refinement=True, enable_loop_closure=True, min_loop_gap=3,
        seed=0,
    )

    store = ArtifactStore(str(tmp_path / "artifacts"))
    odo = preprocess_to_store(scans, respond, encoder, R_tr, t_tr, CFG,
                              store, "00", seed=0)
    np.testing.assert_allclose(odo.poses, full.poses_raw, atol=1e-12)

    # back end purely from artifacts (no scans in scope)
    data = load_stage_inputs(store, "00")
    assert data["n_frames"] == len(scans)
    poses_dj, dejumped = refine.fix_jump_poses(
        odo.poses, CFG.refine, pair_trusted=data["successes"])
    np.testing.assert_allclose(poses_dj, full.poses_dejumped, atol=1e-12)

    poses_ref, stats = stage_refinement(
        poses_dj, data["ref_feats"], data["inlier_pairs"],
        data["R_tr"], data["t_tr"], CFG, pair_trusted=data["successes"],
    )
    np.testing.assert_allclose(poses_ref, full.poses_refined, atol=1e-9)
    assert len(stats.refined) == len(full.refine_stats.refined)

    poses_final, n_loops, ei, ej = stage_loop_closure(
        poses_ref, data["feats"], data["rel_Rs"], data["rel_ts"],
        data["R_tr"], data["t_tr"], CFG, min_loop_gap=3, seed=0,
    )
    assert n_loops == full.n_loop_closures
    np.testing.assert_allclose(poses_final, full.poses_final, atol=1e-6)


@needs_ref
def test_artifact_store_roundtrip_dtypes(tmp_path):
    """Stored artifacts reload with the exact shapes the stage fns need."""
    scans = _make_scans(n=3)
    respond = weights_io.load_respond_layer_params()
    encoder = weights_io.load_patch_encoder_params()
    store = ArtifactStore(str(tmp_path / "a"))
    preprocess_to_store(scans, respond, encoder, np.eye(3), np.zeros(3),
                        CFG, store, "07", seed=1)
    data = load_stage_inputs(store, "07")
    f = data["feats"]          # stacked pytree, leading axis n_frames
    assert f.key_pts.shape == (3, CFG.keypoint.n_keypoints, 3)
    assert f.descriptors.shape[:2] == (3, CFG.keypoint.n_keypoints)
    assert data["rel_Rs"].shape == (2, 3, 3)
    rf = data["ref_feats"]
    assert rf.ext_pts.shape[:2] == (3, CFG.icp.max_points)
    assert rf.planar.shape == (3, CFG.icp.max_planar, 6)
    assert store.frames_done("features", "07") == 3

"""Artifact store (checkpoint/resume) and headless visualization."""
import os

import numpy as np
import pytest

from caelo_tpu.data.artifacts import ArtifactStore
from caelo_tpu.eval.viz import (export_fused_ply, export_ply,
                                plot_matches, plot_saliency,
                                plot_trajectories)


def test_artifact_roundtrip(tmp_path, rng):
    store = ArtifactStore(str(tmp_path))
    data = {"a": rng.normal(size=(5, 3)), "b": np.arange(4)}
    assert not store.has("keypts", "00", 7)
    store.save("keypts", "00", 7, **data)
    assert store.has("keypts", "00", 7)
    out = store.load("keypts", "00", 7)
    np.testing.assert_array_equal(out["a"], data["a"])
    assert store.frames_done("keypts", "00") == 1


def test_get_or_compute_caches(tmp_path):
    store = ArtifactStore(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"x": np.ones(3)}

    store.get_or_compute("features", "01", 0, compute)
    store.get_or_compute("features", "01", 0, compute)
    assert len(calls) == 1
    store.get_or_compute("features", "01", 0, compute, refresh=True)
    assert len(calls) == 2


def test_viz_outputs(tmp_path, rng):
    poses = np.tile(np.eye(3, 4).reshape(12), (20, 1))
    poses[:, 3] = np.arange(20)
    p1 = plot_trajectories(str(tmp_path / "traj.png"),
                           {"gt": poses, "est": poses + 0.1})
    kp0 = rng.normal(size=(64, 3))
    p2 = plot_matches(str(tmp_path / "matches.png"), kp0, kp0 + 0.5,
                      rng.uniform(size=64) < 0.3)
    p3 = plot_saliency(str(tmp_path / "sal.png"), rng.uniform(size=(64, 256)))
    p4 = export_ply(str(tmp_path / "cloud.ply"), kp0,
                    colors=np.full((64, 3), 128, np.uint8))
    p5 = export_fused_ply(
        str(tmp_path / "fused.ply"), [kp0, kp0],
        [(np.eye(3), np.zeros(3)), (np.eye(3), np.ones(3))],
    )
    for p in (p1, p2, p3, p4, p5):
        assert os.path.getsize(p) > 100
    # PLY header sane
    head = open(p5).read(200)
    assert head.startswith("ply") and "element vertex 128" in head

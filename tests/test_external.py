"""External keypoint/descriptor binary-format loaders (the reference's
3DFeatNet / USIP / xyzdesc trees: ``Utils.m:57-75``, ``PclKeyPts.py:130-149``,
``EvalOnReg_KeyPts.py:73-204``) — synthesized binary files, exact layouts."""
import os

import numpy as np
import pytest

from caelo_tpu.data.external import (R90, ExternalSequence, load_3dfeatnet,
                                     load_descriptors_only, load_point_bin,
                                     load_usip_keypoints,
                                     load_xyz_descriptors)


def _write_bin(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.asarray(arr, np.float32).tofile(path)


def test_r90_matches_reference_chain():
    """R90 = Rz(-pi/2) @ Rx(-pi/2) (EulerAngle2RotateMat(-pi/2, 0, -pi/2),
    PclKeyPts.py:146-149): maps USIP-frame axes back to Velodyne axes."""
    # The USIP frame stores (x, y, z)_velo as ... verify orthonormality and
    # the exact matrix entries.
    np.testing.assert_allclose(R90 @ R90.T, np.eye(3), atol=1e-12)
    expect = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float) @ np.array(
        [[0, 1, 0], [-1, 0, 0], [0, 0, 1]], float)
    # Rz(-90): [[0,1,0],[-1,0,0],[0,0,1]]; Rx(-90): [[1,0,0],[0,0,1],[0,-1,0]]
    np.testing.assert_allclose(
        R90, np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], float)
        @ np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float), atol=1e-12)
    del expect


def test_load_point_bin_shape_and_error(tmp_path, rng):
    p = str(tmp_path / "a.bin")
    data = rng.normal(size=(17, 35)).astype(np.float32)
    _write_bin(p, data)
    out = load_point_bin(p, 35)
    np.testing.assert_array_equal(out, data)
    with pytest.raises(ValueError, match="not divisible"):
        load_point_bin(p, 34)


def test_load_3dfeatnet_layout(tmp_path, rng):
    """35 cols = xyz + 32-d descriptor (PclKeyPts.py:136-138)."""
    kp = rng.uniform(-50, 50, (64, 3)).astype(np.float32)
    desc = rng.normal(size=(64, 32)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    _write_bin(p, np.concatenate([kp, desc], 1))
    kp2, desc2 = load_3dfeatnet(p)
    np.testing.assert_array_equal(kp2, kp)
    np.testing.assert_array_equal(desc2, desc)


def test_load_usip_r90_roundtrip(tmp_path, rng):
    """USIP keypoints are stored in the rotated frame; loading applies R90
    so velodyne-frame keypoints round-trip exactly."""
    kp_velo = rng.uniform(-50, 50, (40, 3)).astype(np.float32)
    kp_usip = (R90.T @ kp_velo.T).T.astype(np.float32)  # store rotated
    p = str(tmp_path / "000000.bin")
    _write_bin(p, kp_usip)
    out = load_usip_keypoints(p, apply_r90=True)
    np.testing.assert_allclose(out, kp_velo, atol=1e-5)
    out_raw = load_usip_keypoints(p, apply_r90=False)
    np.testing.assert_array_equal(out_raw, kp_usip)


def test_load_xyzdesc_and_desc_only(tmp_path, rng):
    kp = rng.uniform(-50, 50, (10, 3)).astype(np.float32)
    desc = rng.normal(size=(10, 16)).astype(np.float32)
    p1 = str(tmp_path / "x.bin")
    _write_bin(p1, np.concatenate([kp, desc], 1))
    kp2, d2 = load_xyz_descriptors(p1, 16)
    np.testing.assert_array_equal(kp2, kp)
    np.testing.assert_array_equal(d2, desc)
    p2 = str(tmp_path / "d.bin")
    _write_bin(p2, desc)
    np.testing.assert_array_equal(load_descriptors_only(p2, 16), desc)


def _make_tree(tmp_path, rng, fmt, n_frames=3, n_kp=50, desc_dim=32):
    root = str(tmp_path / fmt)
    desc_root = str(tmp_path / (fmt + "_desc"))
    kps, descs = [], []
    for f in range(n_frames):
        kp = rng.uniform(-50, 50, (n_kp, 3)).astype(np.float32)
        desc = rng.normal(size=(n_kp, desc_dim)).astype(np.float32)
        kps.append(kp)
        descs.append(desc)
        p = os.path.join(root, "00", f"{f:06d}.bin")
        if fmt == "3dfeatnet":
            _write_bin(p, np.concatenate([kp, desc], 1))
        elif fmt == "xyzdesc":
            _write_bin(p, np.concatenate([kp, desc], 1))
        elif fmt == "usip":
            _write_bin(p, (R90.T @ kp.T).T)
            _write_bin(os.path.join(desc_root, "00", f"{f:06d}.bin"), desc)
    return root, desc_root, kps, descs


def test_external_sequence_3dfeatnet(tmp_path, rng):
    root, _, kps, descs = _make_tree(tmp_path, rng, "3dfeatnet")
    ext = ExternalSequence(root, seq="00", fmt="3dfeatnet", n_slots=64)
    assert ext.n_frames() == 3
    f = ext.features(1)
    assert f.key_pts.shape == (64, 3)
    assert f.descriptors.shape == (64, 32)
    assert f.mask.sum() == 50
    np.testing.assert_array_equal(f.key_pts[:50], kps[1])
    np.testing.assert_array_equal(f.descriptors[:50], descs[1])
    assert not f.mask[50:].any()


def test_external_sequence_usip_with_desc_tree(tmp_path, rng):
    root, desc_root, kps, descs = _make_tree(tmp_path, rng, "usip",
                                             desc_dim=16)
    ext = ExternalSequence(root, seq="00", fmt="usip", desc_root=desc_root,
                          desc_dim=16, n_slots=64)
    f = ext.features(2)
    np.testing.assert_allclose(f.key_pts[:50], kps[2], atol=1e-5)
    np.testing.assert_array_equal(f.descriptors[:50], descs[2])


def test_external_sequence_usip_keypoints_only(tmp_path, rng):
    root, _, kps, _ = _make_tree(tmp_path, rng, "usip")
    ext = ExternalSequence(root, seq="00", fmt="usip", n_slots=64)
    out = ext.features(0)
    assert isinstance(out, tuple)          # (kp, mask): descriptor-less
    kp, mask = out
    np.testing.assert_allclose(kp[:50], kps[0], atol=1e-5)
    assert mask.sum() == 50


def test_external_sequence_count_mismatch(tmp_path, rng):
    root, desc_root, *_ = _make_tree(tmp_path, rng, "usip", desc_dim=16)
    # corrupt: drop one descriptor row in frame 0
    p = os.path.join(desc_root, "00", "000000.bin")
    d = np.fromfile(p, np.float32).reshape(-1, 16)[:-1]
    d.tofile(p)
    ext = ExternalSequence(root, seq="00", fmt="usip", desc_root=desc_root,
                          desc_dim=16, n_slots=64)
    with pytest.raises(ValueError, match="keypoints vs"):
        ext.load(0)


def test_external_truncation_beyond_slots(tmp_path, rng):
    root, _, kps, _ = _make_tree(tmp_path, rng, "3dfeatnet", n_kp=50)
    ext = ExternalSequence(root, seq="00", fmt="3dfeatnet", n_slots=16)
    f = ext.features(0)
    assert f.mask.all() and f.key_pts.shape == (16, 3)
    np.testing.assert_array_equal(f.key_pts, kps[0][:16])


def test_external_registration_end_to_end(tmp_path, rng):
    """Two frames of shared external keypoints under a known rigid motion
    register through the standard front end (the matrix row 'external
    keypoints + their descriptors')."""
    import jax
    import jax.numpy as jnp

    from caelo_tpu.config import small_test_config
    from caelo_tpu.frontend.registration import register_pair

    cfg = small_test_config()
    n = 200
    kp1 = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    desc = rng.normal(size=(n, 32)).astype(np.float32)
    R_gt = np.array([[np.cos(0.1), -np.sin(0.1), 0],
                     [np.sin(0.1), np.cos(0.1), 0],
                     [0, 0, 1]], np.float32)
    t_gt = np.array([1.0, 0.3, 0.0], np.float32)
    kp0 = (kp1 @ R_gt.T) + t_gt          # frame-0 view of the same points
    root = str(tmp_path / "ext")
    _write_bin(os.path.join(root, "00", "000000.bin"),
               np.concatenate([kp0, desc], 1))
    _write_bin(os.path.join(root, "00", "000001.bin"),
               np.concatenate([kp1, desc], 1))
    ext = ExternalSequence(root, seq="00", fmt="3dfeatnet", n_slots=256)
    f0 = jax.tree.map(jnp.asarray, ext.features(0))
    f1 = jax.tree.map(jnp.asarray, ext.features(1))
    reg = register_pair(jax.random.key(0), f0, f1, cfg)
    assert bool(reg.success)
    np.testing.assert_allclose(np.asarray(reg.R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg.t), t_gt, atol=1e-2)

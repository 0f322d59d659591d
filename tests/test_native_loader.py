"""Native C++ scan loader + prefetcher (with numpy-fallback contract)."""
import os

import numpy as np
import pytest

from caelo_tpu.data.native_loader import (ScanPrefetcher, load_scan,
                                          native_available)


@pytest.fixture
def scan_dir(tmp_path):
    paths = []
    for i in range(6):
        a = (np.arange(40, dtype=np.float32) + i * 100).reshape(10, 4)
        p = tmp_path / f"{i:06d}.bin"
        a.tofile(str(p))
        paths.append(str(p))
    return paths


def test_native_builds():
    assert native_available(), "g++ toolchain present; native build must work"


def test_load_scan_pads_and_masks(scan_dir):
    out, mask = load_scan(scan_dir[3], 16)
    assert out.shape == (16, 4)
    assert mask.sum() == 10
    np.testing.assert_allclose(out[0, 0], 300.0)
    np.testing.assert_allclose(out[10:], 0.0)


def test_load_scan_truncates(scan_dir):
    out, mask = load_scan(scan_dir[0], 4)
    assert mask.all()
    np.testing.assert_allclose(out[:, 0], [0, 4, 8, 12])


def test_load_scan_missing():
    with pytest.raises(FileNotFoundError):
        load_scan("/nonexistent/file.bin", 8)


def test_prefetcher_ordered(scan_dir):
    pf = ScanPrefetcher(scan_dir, max_points=16, depth=2, n_threads=3)
    seen = []
    for out, mask in pf:
        assert mask.sum() == 10
        seen.append(float(out[0, 0]))
    pf.close()
    np.testing.assert_allclose(seen, [0, 100, 200, 300, 400, 500])

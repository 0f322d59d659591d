"""Disk-backed scan cache (data.scancache): chunked generation is
bit-identical to the one-shot generator, and the positional reader returns
the same frames without holding a mapping."""
import numpy as np

from caelo_tpu.data.hard_synthetic import generate_benchmark
from caelo_tpu.data.scancache import NpyScanReader, write_benchmark_cache

from test_hard_benchmark import hard_ci_config


def test_chunked_cache_roundtrip(tmp_path):
    cfg = hard_ci_config()
    n = 7
    base = str(tmp_path / "cache")
    gt = write_benchmark_cache(base, n, cfg, seed=3, chunk=3)
    scans_ref, gt_ref = generate_benchmark(n_frames=n, seed=3, cfg=cfg)
    np.testing.assert_array_equal(gt, gt_ref)
    reader = NpyScanReader(base)
    assert len(reader) == n
    for i in range(n):
        p, m = reader[i]
        np.testing.assert_array_equal(p, scans_ref[i][0])
        np.testing.assert_array_equal(m, scans_ref[i][1])
        np.testing.assert_array_equal(reader.mask(i), scans_ref[i][1])
    # negative index + iteration protocol (run_odometry_windowed consumes
    # the reader through __len__/__getitem__)
    p, m = reader[-1]
    np.testing.assert_array_equal(p, scans_ref[-1][0])
    assert sum(1 for _ in reader) == n


def test_cache_with_laps_and_degraded(tmp_path):
    cfg = hard_ci_config()
    n, lap = 9, 5
    spans = [(2, 5, 0.7, 120.0)]
    base = str(tmp_path / "cache_deg")
    write_benchmark_cache(base, n, cfg, seed=1, chunk=4, lap_frames=lap,
                          degraded_spans=spans)
    scans_ref, _ = generate_benchmark(n_frames=n, seed=1, cfg=cfg,
                                      lap_frames=lap, degraded_spans=spans)
    reader = NpyScanReader(base)
    for i in range(n):
        np.testing.assert_array_equal(reader[i][0], scans_ref[i][0])
    # the degraded burst really thinned the returns
    assert reader.mask(3).sum() < 0.7 * reader.mask(0).sum()

import numpy as np
import jax.numpy as jnp

from caelo_tpu.ops.masking import compact, dedup_int_rows, pad_points


def test_pad_points(rng):
    pts = rng.normal(size=(10, 4)).astype(np.float32)
    out, mask = pad_points(pts, 16)
    assert out.shape == (16, 4) and mask.sum() == 10
    np.testing.assert_array_equal(out[:10], pts)
    out2, mask2 = pad_points(pts, 6)
    np.testing.assert_array_equal(out2, pts[:6])
    assert mask2.all()


def test_compact(rng):
    data = jnp.asarray(rng.integers(0, 100, size=(20, 3)), dtype=jnp.int32)
    mask = jnp.asarray(rng.uniform(size=20) < 0.5)
    out, out_mask, count = compact(data, mask, 16)
    expect = np.asarray(data)[np.asarray(mask)]
    assert int(count) == expect.shape[0]
    np.testing.assert_array_equal(np.asarray(out)[: expect.shape[0]], expect)
    assert np.asarray(out_mask).sum() == expect.shape[0]


def test_compact_overflow(rng):
    data = jnp.arange(20, dtype=jnp.int32)[:, None]
    mask = jnp.ones(20, bool)
    out, out_mask, count = compact(data, mask, 8)
    assert int(count) == 20
    np.testing.assert_array_equal(np.asarray(out)[:, 0], np.arange(8))
    assert np.asarray(out_mask).all()


def test_dedup_int_rows(rng):
    rows = jnp.asarray(rng.integers(0, 5, size=(200, 3)), dtype=jnp.int32)
    mask = jnp.asarray(rng.uniform(size=200) < 0.8)
    out, out_mask, count = dedup_int_rows(rows, mask, 150)
    ref = np.unique(np.asarray(rows)[np.asarray(mask)], axis=0)
    assert int(count) == ref.shape[0]
    got = np.asarray(out)[np.asarray(out_mask)]
    np.testing.assert_array_equal(got, ref)  # lexicographic order matches


def test_dedup_empty():
    rows = jnp.zeros((10, 3), jnp.int32)
    mask = jnp.zeros((10,), bool)
    out, out_mask, count = dedup_int_rows(rows, mask, 8)
    assert int(count) == 0 and not np.asarray(out_mask).any()

"""Pallas kernels vs their XLA/numpy oracles (interpret mode on CPU; the
same kernels compile natively on TPU — exercised by bench/demo runs)."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.ops.pallas_nms import saliency_map_pallas


def test_pallas_saliency_matches_oracle(rng):
    H, W, C = 16, 256, 8
    resp = rng.normal(size=(H, W, C)).astype(np.float32)
    occ = rng.uniform(size=(H, W)) < 0.6

    rp = np.pad(resp, ((2, 2), (2, 2), (0, 0)))
    op = np.pad(occ, 2)
    md_ref = np.full((H, W), np.inf, np.float32)
    cnt_ref = np.zeros((H, W), np.int32)
    for dy in range(5):
        for dx in range(5):
            if dy == 2 and dx == 2:
                continue
            nb = rp[dy:dy + H, dx:dx + W]
            o = op[dy:dy + H, dx:dx + W]
            d2 = ((nb - resp) ** 2).sum(-1)
            md_ref = np.minimum(md_ref, np.where(o, d2, np.inf))
            cnt_ref += o

    md, cnt = saliency_map_pallas(
        jnp.asarray(resp), jnp.asarray(occ), interpret=True
    )
    md, cnt = np.asarray(md), np.asarray(cnt)
    np.testing.assert_array_equal(cnt, cnt_ref)
    fin = np.isfinite(md_ref)
    np.testing.assert_array_equal(np.isfinite(md), fin)
    np.testing.assert_allclose(md[fin], md_ref[fin], atol=1e-4)


def test_pallas_plane_gather_matches_indexing(rng):
    from caelo_tpu.ops.pallas_patches import gather_planes_pallas

    S, P, K = 300, 16, 32
    table2 = rng.integers(0, 2**31 - 1, (S + 1, P, P)).astype(np.int32)
    table2[S] = 0                       # zero plane for missing cells
    slot = rng.integers(0, S + 1, (K, 2, 2, 2)).astype(np.int32)
    out = gather_planes_pallas(jnp.asarray(table2), jnp.asarray(slot),
                               interpret=True)
    ref = table2[slot]
    np.testing.assert_array_equal(np.asarray(out), ref)

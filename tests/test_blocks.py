"""Block-sparse structure: CSR layout, crop, partitioning."""
import numpy as np
import jax.numpy as jnp

from caelo_tpu.config import VoxelConfig
from caelo_tpu.voxel.blocks import (build_blocks, interior_block_mask,
                                    partition_blocks)

CFG = VoxelConfig()


def test_build_blocks_csr(rng):
    # voxels in 3 known blocks
    blocks = np.array([[10, 20, 5], [10, 21, 5], [100, 100, 11]])
    counts = [7, 3, 5]
    vox = []
    for b, c in zip(blocks, counts):
        local = rng.integers(0, CFG.block_size, (c, 3))
        vox.append(b * CFG.block_size + local)
    vox = np.unique(np.concatenate(vox), axis=0).astype(np.int32)
    M = 64
    pad = np.zeros((M - len(vox), 3), np.int32)
    allv = np.concatenate([vox, pad])
    mask = np.r_[np.ones(len(vox), bool), np.zeros(M - len(vox), bool)]

    bs = build_blocks(jnp.asarray(allv), jnp.asarray(mask), CFG, max_blocks=16)
    assert int(bs.n_blocks) == 3
    got_blocks = np.asarray(bs.block_ids)[np.asarray(bs.block_mask)]
    np.testing.assert_array_equal(
        got_blocks, blocks[np.lexsort(blocks.T[::-1])]
    )
    # CSR runs partition the sorted voxel array
    off = np.asarray(bs.offsets)
    svox = np.asarray(bs.voxels)
    for i in range(3):
        run = svox[off[i]:off[i + 1]]
        assert len(run) > 0
        np.testing.assert_array_equal(
            run // CFG.block_size, np.tile(got_blocks[i], (len(run), 1))
        )
    assert off[3] == len(vox)


def test_interior_block_mask():
    ids = jnp.asarray([[0, 50, 10], [4, 50, 10], [80, 80, 4], [152, 50, 10]])
    m = jnp.ones(4, bool)
    out = np.asarray(interior_block_mask(ids, m, CFG))
    # crop_blocks = 4: block x=0 excluded, x=4 included, x=152 excluded (156-4)
    np.testing.assert_array_equal(out, [False, True, True, False])


def test_partition_blocks_halo():
    ids = jnp.asarray([[0, 0, 0], [77, 0, 0], [78, 0, 0], [155, 0, 0]])
    m = jnp.ones(4, bool)
    owner, halo = partition_blocks(ids, m, n_parts=2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(owner), [0, 0, 1, 1])
    h = np.asarray(halo)
    # blocks near the x=78 boundary are needed by both partitions
    assert h[1].all() and h[2].all()
    assert h[0, 0] and not h[0, 1]
    assert h[3, 1] and not h[3, 0]

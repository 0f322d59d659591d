"""Block-sparse decomposition of the voxel grid (CSR-style, jittable).

The reference organizes scale-0 voxels into 64^3 blocks of 1.28 m over a
156x156x23 block grid, stored as ``avlBlocksList`` + ``cntVoxelsLength``
(CSR offsets) + ``AllVoxels`` (``Voxel.py:100-173``), and uses boundary-block
cropping (``CropBlocks``, ``Voxel.py:41``; ``Match.py:76-96``).  The dense
pyramid in ``caelo_tpu.voxel.grid`` replaces blocks for *patch extraction*,
but the block structure itself remains the framework's spatial-partitioning
primitive (SURVEY.md section 5 'long-context' analog): the refinement back
end partitions blocks across hosts with a ``crop_blocks`` halo.

All outputs are fixed-size + masked: sort voxels by block id, emit unique
block list and CSR offsets via searchsorted.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import VoxelConfig
from ..ops.masking import compact


class BlockSparse(NamedTuple):
    block_ids: jnp.ndarray     # (B, 3) int32 unique occupied blocks (padded)
    block_mask: jnp.ndarray    # (B,) bool
    n_blocks: jnp.ndarray      # () int32
    offsets: jnp.ndarray       # (B + 1,) int32 CSR offsets into voxels
    voxels: jnp.ndarray        # (M, 3) int32 voxel coords sorted by block
    voxel_mask: jnp.ndarray    # (M,) bool


@functools.partial(jax.jit, static_argnames=("cfg", "max_blocks"))
def build_blocks(vox: jnp.ndarray, vox_mask: jnp.ndarray,
                 cfg: VoxelConfig = VoxelConfig(),
                 max_blocks: int = 4096) -> BlockSparse:
    """Group scale-0 voxel coords into the reference's block layout.

    Args:
      vox: ``(M, 3)`` int32 scale-0 voxel coords (deduped, padded).
      vox_mask: validity.
    """
    M = vox.shape[0]
    bs = cfg.block_size
    nb = cfg.n_blocks
    blk = vox // bs                                        # (M, 3)
    # linear block key for sorting; invalid -> max
    key = (blk[:, 0] * nb[1] + blk[:, 1]) * nb[2] + blk[:, 2]
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(vox_mask, key, big)
    order = jnp.argsort(key)
    skey = key[order]
    svox = vox[order]
    smask = vox_mask[order]

    first = jnp.ones((M,), bool).at[1:].set(skey[1:] != skey[:-1])
    ub_key, ub_mask, n_blocks = compact(
        skey[:, None], first & smask, max_blocks, fill=0
    )
    ub_key = ub_key[:, 0]
    # CSR offsets: start of each block's run in the sorted voxel array;
    # invalid block slots point at the end so their runs are empty
    total = jnp.sum(smask).astype(jnp.int32)
    offsets = jnp.searchsorted(skey, ub_key, side="left").astype(jnp.int32)
    offsets_full = jnp.concatenate(
        [jnp.where(ub_mask, offsets, total), total[None]]
    )
    bx = ub_key // (nb[1] * nb[2])
    by = (ub_key // nb[2]) % nb[1]
    bz = ub_key % nb[2]
    block_ids = jnp.stack([bx, by, bz], axis=1) * ub_mask[:, None]
    return BlockSparse(
        block_ids=block_ids.astype(jnp.int32),
        block_mask=ub_mask,
        n_blocks=n_blocks,
        offsets=offsets_full,
        voxels=svox,
        voxel_mask=smask,
    )


def interior_block_mask(block_ids: jnp.ndarray, block_mask: jnp.ndarray,
                        cfg: VoxelConfig = VoxelConfig()) -> jnp.ndarray:
    """Boundary-block crop (``GetKeyVoxelsAroundKeyPts``, ``Match.py:94-97``):
    blocks within ``crop_blocks`` of the scene edge are excluded so every
    scale-2 patch window stays in bounds."""
    c = cfg.crop_blocks
    nb = jnp.array(cfg.n_blocks, jnp.int32)
    inb = jnp.all(
        (block_ids >= c) & (block_ids < nb[None, :] - c), axis=1
    )
    return inb & block_mask


def partition_blocks(block_ids: jnp.ndarray, block_mask: jnp.ndarray,
                     n_parts: int, cfg: VoxelConfig = VoxelConfig(),
                     halo: int | None = None):
    """Spatial map-partitioning for the distributed back end: assign each
    block to one of ``n_parts`` contiguous x-slabs, and mark halo membership
    (blocks within ``halo`` of a slab boundary belong to both neighbors).

    Returns ``(owner, halo_mask)``: owner (B,) int32 in [0, n_parts);
    halo_mask (B, n_parts) bool — block needed by partition p.
    """
    halo = cfg.crop_blocks if halo is None else halo
    nbx = cfg.n_blocks[0]
    slab = -(-nbx // n_parts)
    owner = jnp.clip(block_ids[:, 0] // slab, 0, n_parts - 1)
    parts = jnp.arange(n_parts)[None, :]
    lo = parts * slab - halo
    hi = (parts + 1) * slab + halo
    x = block_ids[:, 0:1]
    halo_mask = (x >= lo) & (x < hi) & block_mask[:, None]
    return jnp.where(block_mask, owner, n_parts).astype(jnp.int32), halo_mask

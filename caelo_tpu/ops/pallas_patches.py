"""Pallas TPU kernel: bit-table plane gather for scale-0 patch extraction.

The scale-0 bitgrid patch query (``voxel.grid._patches_one_scale_bitgrid``)
gathers, per keypoint, the 8 covering supercells' whole (P, P) word planes
from an ~84 MB HBM table.  XLA lowers ``table2[slot]`` to element-granular
gathers (2M scattered int32 loads/frame, measured 3.7 ms/frame — ROADMAP
r4 item 4); the natural unit is one contiguous 1 KB row DMA per (keypoint,
covering-cell).  This kernel issues exactly those DMAs, all of a
16-keypoint block's 128 copies in flight at once, with the slot indices
scalar-prefetched so the addresses are known before the body runs.

The z-combine / x-y alignment / bit-unpack stays in XLA (0.5 ms/frame,
fuses fine); only the gather moves here.  ``use_pallas_plane_gather``
(VoxelConfig) gates the dispatch; the A/B is recorded in PALLAS_AB.json.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBR = 8          # covering supercells per keypoint (2x2x2)
CK = 16          # keypoints per grid program


def _gather_kernel(slots_ref, table_ref, out_ref, sems):
    """slots (K*NBR,) int32 prefetch; table (slots+1, P*P) int32 in ANY;
    out block (CK, NBR, P*P) int32 in VMEM."""
    prog = pl.program_id(0)

    def get_dma(k_local, j):
        s = slots_ref[prog * (CK * NBR) + k_local * NBR + j]
        return pltpu.make_async_copy(
            table_ref.at[s],
            out_ref.at[k_local, j],
            sems.at[k_local, j],
        )

    # start the whole block's copies, then wait — the DMA engine overlaps
    # them; issue order is irrelevant
    for k in range(CK):
        for j in range(NBR):
            get_dma(k, j).start()
    for k in range(CK):
        for j in range(NBR):
            get_dma(k, j).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_planes_pallas(table2: jnp.ndarray, slot: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """``table2 (slots+1, P, P) int32``, ``slot (K, 2, 2, 2) int32`` ->
    gathered planes ``(K, 2, 2, 2, P, P)``.

    K must be a multiple of CK (16); slot values must be in
    ``[0, slots]`` (the last row is the zero plane for missing cells)."""
    S1, P, _ = table2.shape
    K = slot.shape[0]
    assert K % CK == 0, K
    flat = table2.reshape(S1, P * P)
    slots_flat = slot.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // CK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (CK, NBR, P * P), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((CK, NBR))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((K, NBR, P * P), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slots_flat, flat)
    return out.reshape(K, 2, 2, 2, P, P)

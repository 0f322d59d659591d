"""Pallas TPU kernel: bit-table plane gather for scale-0 patch extraction.

The scale-0 bitgrid patch query (``voxel.grid._patches_one_scale_bitgrid``)
gathers, per keypoint, the 8 covering supercells' whole (P, P) word planes
from an ~84 MB HBM table.  XLA lowers ``table2[slot]`` to element-granular
gathers (2M scattered int32 loads/frame, measured 3.7 ms/frame — ROADMAP
r4 item 4); the natural unit is one contiguous DMA per (keypoint,
covering-cell).

Mosaic constraint shaping the design: HBM memrefs are (8, 128)-tiled, so a
single 256-word row cannot be sliced out (dim-0 slices must be 8-aligned).
The table is therefore viewed as ``(G, 8, 256)`` — 8 slots per group, the
group axis untiled — and each copy moves the 8 KB group containing the
wanted slot; the kernel selects the slot's row with a VPU masked-sum.  8x
the bytes of the ideal 1 KB copy, but still only ~64 MB/frame (~80 us of
HBM bandwidth) against the gather-COUNT cost it replaces.

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
GRP = 8          # slots per DMA group (the HBM sublane tile)


def _gather_kernel(slots_ref, table_ref, out_ref, scratch, sems):
    """slots (K*NBR,) int32 prefetch; table (G, 8, 256) int32 in HBM;
    out block (CK, NBR, 256) int32 in VMEM; scratch (CK*NBR, 8, 256)."""
    prog = pl.program_id(0)
    n = CK * NBR

    def get_dma(idx):
        s = slots_ref[prog * n + idx]
        return pltpu.make_async_copy(
            table_ref.at[s // GRP],
            scratch.at[idx],
            sems.at[idx],
        )

    # start every copy of the block, then drain — the DMA engine overlaps
    for idx in range(n):
        get_dma(idx).start()
    rows = jax.lax.broadcasted_iota(jnp.int32, (GRP, 256), 0)
    for k in range(CK):
        for j in range(NBR):
            idx = k * NBR + j
            get_dma(idx).wait()
            o = slots_ref[prog * n + idx] % GRP
            # masked-sum row select (dynamic sublane indexing without a
            # sublane-granular slice)
            out_ref[k, j] = jnp.sum(
                jnp.where(rows == o, scratch[idx], 0), axis=0)


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
    G = -(-S1 // GRP)
    flat = table2.reshape(S1, P * P)
    pad = G * GRP - S1
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, P * P), jnp.int32)])
    grouped = flat.reshape(G, GRP, P * P)
    slots_flat = slot.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // CK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (CK, NBR, P * P), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CK * NBR, GRP, P * P), jnp.int32),
            pltpu.SemaphoreType.DMA((CK * NBR,)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((K, NBR, P * P), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slots_flat, grouped)
    return out.reshape(K, 2, 2, 2, P, P)

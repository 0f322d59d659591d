"""Pallas TPU kernel: streaming nearest-neighbor argmin (ICP correspondence).

The ICP inner loop needs, for every source point, the index of its nearest
reference point (``MyICP.py:33-34`` does this with a sklearn KD-tree per
iteration).  The XLA path (``caelo_tpu.backend.icp.nearest_neighbors``)
computes a chunked distance matrix; this kernel is the speed-of-light
version:

* the full reference cloud lives in VMEM for the whole kernel
  (131072 x 3 f32 = 1.5 MB — tiny against the 16 MB budget), zero re-reads
  from HBM across query tiles;
* queries are tiled by the grid; each tile computes its distances to a
  2048-point reference stripe at a time with one MXU matmul
  ``(TQ, 3) x (3, 2048)`` and folds a running (min, argmin) in registers;
* nothing of size (N, M) ever exists anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 256
R_STRIPE = 2048


def _nn_kernel(q_ref, r_ref, r2_ref, idx_ref, d2_ref):
    """q (TQ, 3), r (M, 3), r2 (1, M) -> idx (TQ,) int32, d2 (TQ,) f32."""
    TQ = q_ref.shape[0]
    M = r_ref.shape[0]
    q = q_ref[:, :]                                     # (TQ, 3)

    n_stripes = M // R_STRIPE

    def body(s, carry):
        best_d2, best_idx = carry
        r = r_ref[pl.ds(s * R_STRIPE, R_STRIPE), :]     # (S, 3)
        r2 = r2_ref[0, pl.ds(s * R_STRIPE, R_STRIPE)]   # (S,)
        # -2 q.r  on the MXU; ||q||^2 is a per-query constant -> omitted
        cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
        d2 = r2[None, :] - 2.0 * cross                  # (TQ, S) + ||q||^2
        stripe_min = jnp.min(d2, axis=1)
        stripe_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + s * R_STRIPE
        take = stripe_min < best_d2
        return (
            jnp.where(take, stripe_min, best_d2),
            jnp.where(take, stripe_arg, best_idx),
        )

    init = (jnp.full((TQ,), jnp.inf, jnp.float32), jnp.zeros((TQ,), jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, n_stripes, body, init)
    idx_ref[:] = best_idx
    d2_ref[:] = best_d2 + jnp.sum(q * q, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor_pallas(query: jnp.ndarray, query_mask: jnp.ndarray,
                            ref: jnp.ndarray, ref_mask: jnp.ndarray,
                            interpret: bool = False):
    """Drop-in for ``backend.icp.nearest_neighbors`` (same contract).

    Returns (idx (N,) int32, dist (N,) f32 — +inf for masked queries).
    """
    N = query.shape[0]
    M = ref.shape[0]
    Np = -(-N // Q_TILE) * Q_TILE
    Mp = -(-M // R_STRIPE) * R_STRIPE
    qp = jnp.pad(query, ((0, Np - N), (0, 0)))
    rp = jnp.pad(ref, ((0, Mp - M), (0, 0)))
    r2 = jnp.sum(rp * rp, axis=1)
    # invalid reference points pushed out of contention
    rmask = jnp.pad(ref_mask, (0, Mp - M))
    r2 = jnp.where(rmask, r2, 1e12)[None, :]            # (1, Mp)

    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=(Np // Q_TILE,),
        in_specs=[
            pl.BlockSpec((Q_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np,), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.float32),
        ],
        interpret=interpret,
    )(qp, rp, r2)
    idx = idx[:N]
    # exact re-computation of the winning distance (cancellation guard, same
    # as the XLA path)
    d2_exact = jnp.sum((query - ref[idx]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(
        jnp.where(query_mask, d2_exact, jnp.inf), 0.0
    ))
    return idx, dist

"""Pose-graph optimization: matrix-free Gauss-Newton on TPU.

This component intentionally EXCEEDS the reference: its back end only
forward-propagates single-pair ICP corrections (``ForwardUpdatePoses``,
``RefinePoses.py:120-145``) and ships loop closure as a disabled skeleton
(``CloseLoopPipeline``, ``:477-518``).  A production odometry stack needs a
global solve over odometry + keyframe + loop edges (SURVEY.md section 7
build-plan item 8).

TPU-native design:
* poses are ``(R, t)`` arrays; the GN update is parameterized by per-node
  tangent increments ``delta in R^6`` (rotation right-increment, translation
  additive) with node 0 gauge-fixed;
* residuals per edge: ``log_SO3(R_meas^T (R_i^T R_j))`` and
  ``R_i^T (t_j - t_i) - t_meas`` — all batched, no Python loops over edges;
* the normal equations are solved matrix-free with conjugate gradients
  using jvp/vjp for the J and J^T products — no Jacobian is ever
  materialized, every CG step is a couple of batched 3x3 einsums (VPU/MXU)
  and a scatter-add;
* ``optimize_sharded`` runs the same solve with the *edge set* sharded over
  the mesh's 'data' axis inside ``shard_map``: each device computes its
  edges' J^T J contribution and a ``psum`` all-reduces the 6N-vector —
  exactly the "all-reduce of Hessian blocks over ICI" design the survey
  calls for.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3


class PoseGraph(NamedTuple):
    edge_i: jnp.ndarray    # (E,) int32 source node
    edge_j: jnp.ndarray    # (E,) int32 target node
    rel_R: jnp.ndarray     # (E, 3, 3) measured R (node j in node i frame)
    rel_t: jnp.ndarray     # (E, 3)
    weight: jnp.ndarray    # (E,) nonnegative (0 = padded/disabled edge)
    rot_info: jnp.ndarray  # (E,) rotation information weight


def odometry_graph(rel_Rs, rel_ts, weight=1.0, rot_info=100.0) -> PoseGraph:
    """Chain graph from per-frame relative motions."""
    n = rel_Rs.shape[0]
    return PoseGraph(
        edge_i=jnp.arange(n, dtype=jnp.int32),
        edge_j=jnp.arange(1, n + 1, dtype=jnp.int32),
        rel_R=jnp.asarray(rel_Rs),
        rel_t=jnp.asarray(rel_ts),
        weight=jnp.full((n,), weight, jnp.float32),
        rot_info=jnp.full((n,), rot_info, jnp.float32),
    )


def concat_graphs(a: PoseGraph, b: PoseGraph) -> PoseGraph:
    return PoseGraph(*(jnp.concatenate([x, y]) for x, y in zip(a, b)))


def _apply_delta(R, t, delta):
    """Right-increment retraction: R exp(dw), t + dt."""
    dw = delta[:, 0:3]
    dt = delta[:, 3:6]
    return R @ se3.exp_so3(dw), t + dt


def _residuals(R, t, g: PoseGraph):
    Ri = R[g.edge_i]
    Rj = R[g.edge_j]
    ti = t[g.edge_i]
    tj = t[g.edge_j]
    Rij = jnp.swapaxes(Ri, -1, -2) @ Rj
    r_rot = se3.log_so3(jnp.swapaxes(g.rel_R, -1, -2) @ Rij)
    r_t = jnp.einsum("eji,ej->ei", Ri, tj - ti) - g.rel_t
    w = jnp.sqrt(jnp.maximum(g.weight, 0.0))[:, None]
    wr = jnp.sqrt(jnp.maximum(g.weight * g.rot_info, 0.0))[:, None]
    return jnp.concatenate([wr * r_rot, w * r_t], axis=1)  # (E, 6)


def _gn_step(R, t, g: PoseGraph, damping: float, cg_iters: int):
    n = R.shape[0]

    def res_of_delta(delta_flat):
        delta = delta_flat.reshape(n, 6)
        # gauge: node 0 fixed
        delta = delta.at[0].set(0.0)
        Rn, tn = _apply_delta(R, t, delta)
        return _residuals(Rn, tn, g).reshape(-1)

    zero = jnp.zeros((n * 6,), R.dtype)
    r0 = res_of_delta(zero)

    def JTJv(v):
        _, jv = jax.jvp(res_of_delta, (zero,), (v,))
        _, vjp = jax.vjp(res_of_delta, zero)
        (jtjv,) = vjp(jv)
        return jtjv + damping * v

    _, vjp0 = jax.vjp(res_of_delta, zero)
    (b,) = vjp0(r0)
    delta, _ = jax.scipy.sparse.linalg.cg(JTJv, -b, maxiter=cg_iters)
    delta = delta.reshape(n, 6).at[0].set(0.0)
    Rn, tn = _apply_delta(R, t, delta)
    return Rn, tn, jnp.sum(r0 * r0)


@functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
def optimize(R0: jnp.ndarray, t0: jnp.ndarray, graph: PoseGraph,
             n_iters: int = 10, cg_iters: int = 30,
             damping: float = 1e-4):
    """Gauss-Newton pose-graph solve.  Returns (R, t, final_cost)."""

    def body(_, st):
        R, t, _ = st
        return _gn_step(R, t, graph, damping, cg_iters)

    R, t, cost = jax.lax.fori_loop(
        0, n_iters, body, (R0, t0, jnp.asarray(0.0, R0.dtype))
    )
    return R, t, cost


def optimize_sharded(mesh: Mesh, n_nodes: int, n_iters: int = 10,
                     cg_iters: int = 30, damping: float = 1e-4):
    """Distributed solve: edges sharded over 'data', poses replicated, the
    J^T J matvec psum-reduced across devices each CG step.

    Returns fn(R0, t0, graph_sharded) where every PoseGraph field's leading
    (edge) axis is sharded over 'data'; pad the edge count to a multiple of
    the axis size with weight-0 edges.
    """
    axis = "data"

    def solve(R0, t0, g: PoseGraph):
        n = n_nodes

        def res_of_delta(delta_flat, R, t):
            delta = delta_flat.reshape(n, 6).at[0].set(0.0)
            Rn, tn = _apply_delta(R, t, delta)
            return _residuals(Rn, tn, g).reshape(-1)   # local edges only

        def gn(R, t):
            zero = jnp.zeros((n * 6,), R0.dtype)
            r0 = res_of_delta(zero, R, t)

            def JTJv(v):
                _, jv = jax.jvp(lambda d: res_of_delta(d, R, t), (zero,), (v,))
                _, vjp = jax.vjp(lambda d: res_of_delta(d, R, t), zero)
                (jtjv,) = vjp(jv)
                # all-reduce the per-shard Hessian-vector contribution
                return jax.lax.psum(jtjv, axis) + damping * v

            _, vjp0 = jax.vjp(lambda d: res_of_delta(d, R, t), zero)
            (b_local,) = vjp0(r0)
            b = jax.lax.psum(b_local, axis)
            delta, _ = jax.scipy.sparse.linalg.cg(JTJv, -b, maxiter=cg_iters)
            delta = delta.reshape(n, 6).at[0].set(0.0)
            Rn, tn = _apply_delta(R, t, delta)
            cost = jax.lax.psum(jnp.sum(r0 * r0), axis)
            return Rn, tn, cost

        # static unrolled GN iterations (a scan carry would fight shard_map's
        # varying-axis typing; n_iters is small)
        R, t, cost = R0, t0, jnp.asarray(0.0, R0.dtype)
        for _ in range(n_iters):
            R, t, cost = gn(R, t)
        return R, t, cost

    return jax.jit(
        shard_map(
            solve,
            mesh=mesh,
            in_specs=(P(), P(), PoseGraph(*(P(axis) for _ in PoseGraph._fields))),
            out_specs=(P(), P(), P()),
            # replication of the outputs holds by construction (every update
            # passes through a psum) but can't be statically inferred through
            # the CG while_loop, so disable the static VMA check
            check_vma=False,
        )
    )

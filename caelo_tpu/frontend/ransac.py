"""Batched RANSAC rigid-pose estimation on TPU.

The reference runs 100-500 *sequential* trials of {sample 4 pairs, SVD
solve, 1024-point residual check} with an adaptive threshold ladder
(``RANSAC4RT``, ``Match.py:162-218``).  On TPU we instead:

* draw all hypotheses at once (``n_hypotheses`` x 4 masked categorical draws),
* solve every hypothesis in parallel with Horn's quaternion method (batched
  4x4 ``eigh`` — always a proper rotation, no reflection branch),
* evaluate all hypotheses against all pairs AND all three threshold rungs
  (0.4 / 0.8 / 1.6 m, the reference's escalation ladder ``Match.py:207-214``)
  with a single broadcasted residual tensor,
* pick the smallest rung whose best hypothesis clears the inlier gate
  ``>= min(100, 20% of pairs)`` (``Match.py:166``), then least-squares refit
  on that hypothesis's inliers (``Match.py:280-283``).

Fixed trip count, fixed shapes, no host round-trips — one jitted call.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RansacConfig
from ..geometry import se3


class RansacResult(NamedTuple):
    R: jnp.ndarray            # (3, 3)
    t: jnp.ndarray            # (3,)
    success: jnp.ndarray      # () bool
    inlier_mask: jnp.ndarray  # (K,) bool — over the input pairs
    n_inliers: jnp.ndarray    # () int32
    threshold: jnp.ndarray    # () float32 — accepted residual rung


@functools.partial(jax.jit, static_argnames=("cfg",))
def ransac_rigid(key: jax.Array, pairs0: jnp.ndarray, pairs1: jnp.ndarray,
                 pair_mask: jnp.ndarray,
                 cfg: RansacConfig = RansacConfig(),
                 pair_dist: jnp.ndarray | None = None) -> RansacResult:
    """Estimate the rigid transform mapping ``pairs1 -> pairs0``.

    Args:
      key: PRNG key.
      pairs0/pairs1: ``(K, 3)`` matched point pairs (padded).
      pair_mask: ``(K,)`` validity.
      pair_dist: optional ``(K,)`` match quality (descriptor distance);
        when given, hypothesis samples are drawn only from the best
        ``cfg.sample_top_frac`` of pairs (residuals still use all pairs).
    """
    K = pairs0.shape[0]
    H = cfg.n_hypotheses
    S = cfg.sample_size
    n_valid = jnp.sum(pair_mask)

    # --- sample S valid pair indices per hypothesis
    sample_ok = pair_mask
    if pair_dist is not None and cfg.sample_top_frac < 1.0:
        n_top = jnp.maximum(
            (cfg.sample_top_frac * n_valid).astype(jnp.int32), 4 * S
        )
        d = jnp.where(pair_mask, pair_dist, jnp.inf)
        cutoff = jnp.sort(d)[jnp.clip(n_top - 1, 0, K - 1)]
        sample_ok = pair_mask & (d <= cutoff)
    logits = jnp.where(sample_ok, 0.0, -jnp.inf)
    samp = jax.random.categorical(key, logits, shape=(H, S))

    # --- solve all hypotheses (batched Horn)
    s0 = pairs0[samp]                      # (H, S, 3)
    s1 = pairs1[samp]
    Rs, ts = se3.solve_rigid_horn(s0, s1)  # (H, 3, 3), (H, 3)

    # --- residuals of every hypothesis on every pair
    pred = jnp.einsum("hij,kj->hki", Rs, pairs1) + ts[:, None, :]
    dists = jnp.linalg.norm(pred - pairs0[None], axis=-1)      # (H, K)

    thresholds = jnp.array(cfg.residual_thresholds, jnp.float32)
    inl = (dists[None] < thresholds[:, None, None]) & pair_mask[None, None]
    counts = jnp.sum(inl, axis=-1)                             # (T, H)

    least = jnp.minimum(
        cfg.min_inlier_abs, (cfg.min_inlier_frac * n_valid).astype(jnp.int32)
    )
    least = jnp.maximum(least, S + 1)

    best_h = jnp.argmax(counts, axis=-1)                       # (T,)
    best_c = jnp.take_along_axis(counts, best_h[:, None], axis=-1)[:, 0]
    rung_ok = best_c >= least
    # smallest accepting rung; fall back to the last rung if none accept
    T = thresholds.shape[0]
    rung = jnp.where(jnp.any(rung_ok), jnp.argmax(rung_ok), T - 1)

    h = best_h[rung]
    success = rung_ok[rung]
    inlier_mask = inl[rung, h]
    # --- final least-squares refit on the winning inlier set (Match.py:280-283)
    w = inlier_mask.astype(jnp.float32)
    R_fit, t_fit = se3.solve_rigid_horn(pairs0, pairs1, w)
    R = jnp.where(success, R_fit, Rs[h])
    t = jnp.where(success, t_fit, ts[h])
    return RansacResult(
        R=R,
        t=t,
        success=success,
        inlier_mask=inlier_mask,
        n_inliers=counts[rung, h],
        threshold=thresholds[rung],
    )

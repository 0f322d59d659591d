"""Loop-closure detection and closure via place recognition + registration.

The reference ships loop closure as a disabled skeleton that only
re-registers keyframe pairs 2 frames apart (``CloseLoopPipeline``,
``RefinePoses.py:477-518``; every enable flag defaults off,
``:526-531``) — it never detects real revisits.  This module implements the
full capability, TPU-style:

* **global frame descriptor**: histogram-weighted mean + second moment of
  the frame's 60-dim keypoint descriptors (2x60 floats) — computed from
  features the front end already produced, zero extra model cost;
* **candidate search**: the all-pairs descriptor distance matrix is one
  matmul over the whole trajectory (N up to ~4600 frames -> a 4600^2 GEMM,
  trivial on the MXU), masked to exclude temporal neighbors;
* **geometric verification**: candidates re-register with the standard
  batched-RANSAC front end; accepted closures become ``PoseGraph`` loop
  edges for ``caelo_tpu.backend.posegraph.optimize``.
"""
from __future__ import annotations

import functools
from typing import Callable, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.matching import squared_distance_matrix
from .posegraph import PoseGraph
from .scancontext import align_score, scan_context


@jax.jit
def _align_score_pairs(scs: jnp.ndarray, idx_i: jnp.ndarray,
                       idx_j: jnp.ndarray):
    """Batched ScanContext alignment for candidate pairs: one device call
    for the whole candidate list instead of a host loop of scalar
    ``align_score`` dispatches (which costs ~100 ms each over a remote-TPU
    tunnel and scales with trajectory length)."""
    return jax.vmap(lambda a, b: align_score(scs[a], scs[b]))(idx_i, idx_j)


def frame_global_descriptor(descriptors: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """(K, 60) keypoint descriptors -> (120,) global place signature."""
    w = mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(descriptors * w, axis=0) / n
    var = jnp.sum((descriptors - mean) ** 2 * w, axis=0) / n
    return jnp.concatenate([mean, jnp.sqrt(var + 1e-12)])


@functools.partial(jax.jit, static_argnames=("max_candidates", "min_gap"))
def loop_candidates(global_desc: jnp.ndarray, valid: jnp.ndarray,
                    min_gap: int = 100, max_candidates: int = 64):
    """Top candidate frame pairs by global-descriptor similarity.

    Args:
      global_desc: ``(N, D)`` per-frame signatures.
      valid: ``(N,)`` frame validity.
      min_gap: minimum temporal separation (loops, not odometry neighbors).

    Returns (pair_i, pair_j, score, pair_mask): ``(max_candidates,)`` each.
    """
    N = global_desc.shape[0]
    d2 = squared_distance_matrix(global_desc, global_desc)
    ii = jnp.arange(N)
    far = jnp.abs(ii[:, None] - ii[None, :]) >= min_gap
    ok = far & valid[:, None] & valid[None, :] & (ii[:, None] < ii[None, :])
    score = jnp.where(ok, -d2, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_candidates)
    pair_i = idx // N
    pair_j = idx % N
    return pair_i, pair_j, -vals, jnp.isfinite(vals)


@functools.partial(jax.jit,
                   static_argnames=("max_candidates", "min_gap",
                                    "per_frame_k"))
def loop_candidates_per_frame(global_desc: jnp.ndarray, valid: jnp.ndarray,
                              min_gap: int = 100, max_candidates: int = 64,
                              per_frame_k: int = 3):
    """Per-frame candidate generation: every frame j proposes its
    ``per_frame_k`` best earlier matches i <= j - min_gap; the
    ``max_candidates`` best proposals (by descriptor distance) survive.
    Multiple proposals per frame matter because the pooled global
    descriptor aliases between look-alike places (parallel street
    canyons): the argmin alone is frequently the alias, and downstream
    geometric verification + the sequence-consistency gate are the
    reliable filters — give them the true co-location to find.

    Versus the global top-K over the full pair matrix (``loop_candidates``):
    on a multi-revisit sequence the global top-K concentrates at the single
    most-distinctive place (measured at 4,541 frames / 8.7 laps: all 16
    accepted edges pinned circuit positions 0-32, leaving multi-lap
    chain spans with no constraint — laps between pins sagged 170-200 m
    even though every pin's residual was ~0).  Per-frame proposals spread
    along the whole trajectory, which is what the pose graph needs.

    Returns (pair_i, pair_j, score, pair_mask), same contract as
    ``loop_candidates``.
    """
    N = global_desc.shape[0]
    d2 = squared_distance_matrix(global_desc, global_desc)
    pi, pj, vals, mask = _per_frame_topk(-d2, valid, min_gap,
                                         max_candidates, per_frame_k)
    return pi, pj, -vals, mask


def _per_frame_topk(sim: jnp.ndarray, valid: jnp.ndarray, min_gap: int,
                    max_candidates: int, per_frame_k: int):
    """Shared per-frame proposal core over a similarity matrix (higher =
    better; ``sim[j, i]`` scores later frame j against earlier frame i).
    Returns ``(pair_i, pair_j, similarity, mask)``."""
    N = sim.shape[0]
    ii = jnp.arange(N)
    # row = later frame j, col = earlier frame i
    ok = (valid[:, None] & valid[None, :]
          & ((ii[:, None] - ii[None, :]) >= min_gap))
    simm = jnp.where(ok, sim, -jnp.inf)
    kf = min(per_frame_k, N)
    vals_k, bi = jax.lax.top_k(simm, kf)       # per-row k best (N, kf)
    score = jnp.where(jnp.isfinite(vals_k), vals_k, -jnp.inf).reshape(-1)
    rows = jnp.repeat(jnp.arange(N, dtype=jnp.int32), kf)
    k = min(max_candidates, N * kf)
    vals, sel = jax.lax.top_k(score, k)
    pad = max_candidates - k
    if pad:
        vals = jnp.concatenate([vals, jnp.full((pad,), -jnp.inf)])
        sel = jnp.concatenate([sel, jnp.zeros((pad,), sel.dtype)])
    return (bi.reshape(-1)[sel].astype(jnp.int32), rows[sel], vals,
            jnp.isfinite(vals))


@functools.partial(jax.jit,
                   static_argnames=("max_candidates", "min_gap",
                                    "per_frame_k"))
def loop_candidates_scancontext(scs: jnp.ndarray, valid: jnp.ndarray,
                                min_gap: int = 100, max_candidates: int = 64,
                                per_frame_k: int = 3):
    """Per-frame candidates from the full rotation-searched ScanContext
    cross-correlation matrix (``backend.scancontext.sc_correlation_matrix``)
    instead of pooled-descriptor distance.

    The pooled keypoint descriptor collapses on repeated-texture scenes
    (street canyons: 219/231 of its seq-scale proposals failed the
    consistency gates) and is blind to traversal direction.  The ScanContext
    correlation searches all sector shifts, so a revisit driven the opposite
    way still surfaces, and the aligning yaw comes out of the same matrix —
    no separate re-rank pass.

    Returns ``(pair_i, pair_j, sc_score, yaw, mask)``: ``sc_score`` is the
    best-shift cosine (higher = better, gate with ``sc_min_score``), ``yaw``
    rotates frame j into frame i (``align_score`` convention).
    """
    from .scancontext import sc_correlation_matrix

    score, yaw = sc_correlation_matrix(scs)
    # rows must index the LATER frame j: score/yaw are (i-rows, j-cols) in
    # align_score's (a=earlier, b=later) orientation, so transpose score and
    # look yaw up at [i, j]
    pi, pj, vals, mask = _per_frame_topk(score.T, valid, min_gap,
                                         max_candidates, per_frame_k)
    return pi, pj, vals, yaw[pi, pj], mask


class LoopClosures(NamedTuple):
    edges: PoseGraph
    n_accepted: int
    candidates_checked: int
    # rejection counts by cause (observability: a silent acceptance
    # bottleneck at sequence scale looks like "loop closure works" with
    # too few pins to constrain the graph)
    rejects: dict = {}


def stack_frame_features(features):
    """Stack a list of per-frame ``FrameFeatures`` into one pytree with
    leading axis N (one device op per field).  A stacked pytree passes
    through unchanged — the windowed front end already returns one."""
    if isinstance(features, list) or (
            isinstance(features, tuple) and not hasattr(features, "_fields")):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *features)
    return features


@functools.partial(jax.jit, static_argnames=("with_sc",))
def _build_signatures(desc: jnp.ndarray, mask: jnp.ndarray,
                      key_pts: jnp.ndarray, with_sc: bool):
    """ONE device call for the whole trajectory's place-recognition
    features: per-frame global descriptors, validity, and (``with_sc``)
    scan contexts.  The per-frame host loop this replaces costs one device
    dispatch per frame per op (~100 ms each over a remote-TPU tunnel —
    ~15 min of pure dispatch on a 4,541-frame sequence)."""
    gd = jax.vmap(frame_global_descriptor)(desc, mask)
    valid = jnp.any(mask, axis=1)
    scs = None
    if with_sc:
        scs = jax.vmap(lambda p, m: scan_context(p[:, :3], m))(key_pts, mask)
    return gd, valid, scs


def detect_and_close(features, register_fn: Callable = None,
                     min_gap: int = 100, max_candidates: int = 32,
                     max_accept: int = 16,
                     dedup_window: int = 10,
                     use_scan_context: bool = False,
                     sc_min_score: float = 0.25,
                     sc_matrix_min_score: float = 0.45,
                     register_batch_fn: Callable = None,
                     edge_gate_fn: Callable = None,
                     frame_valid=None,
                     candidate_source: str = "descriptor") -> LoopClosures:
    """Full loop-closure pass over a sequence's FrameFeatures.

    Args:
      features: list of per-frame ``FrameFeatures`` or one stacked pytree
        with leading axis N (the windowed front end's output).
      register_fn: ``(i, j) -> (R, t, success, n_inliers)`` — geometric
        verification (normally the front end's ``register_pair``).  With
        ``use_scan_context=True`` it is called as ``(i, j, yaw_rad)`` where
        ``yaw_rad`` is the ScanContext-aligned yaw rotating frame j into
        frame i (a motion prior for the verification).
      use_scan_context: re-rank candidates with the polar ScanContext
        alignment score (``backend.scancontext``) and drop candidates below
        ``sc_min_score`` before (expensive) geometric verification — higher
        recall on revisits with orientation change, fewer wasted checks.
      register_batch_fn: ``(idx_i, idx_j, yaws) -> (Rs, ts, oks, n_inls)``
        over numpy index arrays — verifies ALL surviving candidates in one
        batched device call instead of one dispatch per candidate.  The
        accepted set is identical to the sequential path (acceptance of one
        candidate never changes another's verification result; dedup is
        applied to the batched results in the same score order).
      frame_valid: optional ``(N,)`` bool — frames eligible for place
        recognition (e.g. the pipeline's sensor-health gate: degraded
        frames alias heavily in descriptor space and would saturate the
        candidate list with burst-to-burst pairs).
      edge_gate_fn: optional ``(i, j, R, t) -> bool`` — a final plausibility
        gate on a geometrically-verified candidate (e.g. the drift-bound
        consistency check in ``pipeline.stage_loop_closure``: a loop
        correction larger than plausible odometry drift over the i..j path
        is a registration between look-alike places, not a revisit).
      candidate_source: ``"descriptor"`` proposes candidates by pooled
        keypoint-descriptor distance then (``use_scan_context``) re-ranks
        with per-pair ScanContext alignment; ``"scancontext"`` (requires
        ``use_scan_context``) proposes directly from the full
        rotation-searched correlation matrix
        (``loop_candidates_scancontext``) — robust to traversal-direction
        change and to repeated-texture descriptor aliasing, and the
        aligning yaws fall out of the candidate search itself.

    Returns loop edges mapping frame j into frame i (the front-end's
    relative-pose convention), weighted by inlier count.
    """
    if candidate_source not in ("descriptor", "scancontext"):
        raise ValueError(f"unknown candidate_source {candidate_source!r}")
    if candidate_source == "scancontext" and not use_scan_context:
        raise ValueError("candidate_source='scancontext' requires "
                         "use_scan_context=True")
    stacked = stack_frame_features(features)
    gd, valid, scs = _build_signatures(
        stacked.descriptors, stacked.mask, stacked.key_pts,
        with_sc=use_scan_context,
    )
    if frame_valid is not None:
        valid = valid & jnp.asarray(np.asarray(frame_valid, bool))

    if candidate_source == "scancontext":
        pi, pj, sc_s, y_all, pmask = loop_candidates_scancontext(
            scs, valid, min_gap=min_gap, max_candidates=max_candidates
        )
        pi, pj, pmask = np.asarray(pi), np.asarray(pj), np.asarray(pmask)
        yaws = [float(y) for y in np.asarray(y_all)]
        # Candidates come back similarity-ordered already; apply the
        # correlation-matrix score floor.  This floor is NOT sc_min_score:
        # the matrix score is a whole-matrix cosine of NONNEGATIVE
        # signatures, so even completely unrelated scenes measure
        # ~0.39-0.43 (measured; the per-column align_score shares the
        # bias) — a 0.25 floor discriminates nothing.  0.45 sits just
        # above the unrelated-scene baseline: it prunes clearly-unrelated
        # pairs from expensive geometric verification while the real
        # filters remain verification + the drift/consistency gates.
        pmask = pmask & (np.asarray(sc_s) >= sc_matrix_min_score)
    else:
        pi, pj, score, pmask = loop_candidates_per_frame(
            gd, valid, min_gap=min_gap, max_candidates=max_candidates
        )
        pi, pj = np.asarray(pi), np.asarray(pj)
        pmask = np.asarray(pmask)

        yaws = [None] * len(pi)
        if use_scan_context:
            # one batched device call for every candidate (masked slots
            # score 0 and are overwritten with -inf below)
            s_all, y_all = _align_score_pairs(
                scs, jnp.asarray(pi, jnp.int32), jnp.asarray(pj, jnp.int32)
            )
            s_all, y_all = np.asarray(s_all), np.asarray(y_all)
            sc_scores = np.where(pmask, s_all, -np.inf)
            yaws = [float(y) for y in y_all]
            order = np.argsort(-sc_scores, kind="stable")
            pi, pj, pmask = pi[order], pj[order], pmask[order]
            yaws = [yaws[k] for k in order]
            pmask = pmask & (sc_scores[order] >= sc_min_score)

    batch_results = None
    if register_batch_fn is not None:
        live = np.nonzero(pmask)[0]
        if live.size:
            bR, bt, bok, bni = register_batch_fn(
                pi[live], pj[live],
                np.asarray([yaws[k] if yaws[k] is not None else 0.0
                            for k in live], np.float32),
            )
            batch_results = {int(k): (bR[q], bt[q], bool(bok[q]), int(bni[q]))
                             for q, k in enumerate(live)}

    ei, ej, Rs, ts, ws = [], [], [], [], []
    seen = []
    checked = 0
    rejects = {"sc_or_invalid": 0, "dedup": 0, "registration": 0, "gate": 0}
    for slot, (i, j, m, yaw) in enumerate(zip(pi, pj, pmask, yaws)):
        if not m or len(ei) >= max_accept:
            rejects["sc_or_invalid"] += bool(not m)
            continue
        if any(abs(int(i) - a) < dedup_window and abs(int(j) - b) < dedup_window
               for a, b in seen):
            rejects["dedup"] += 1
            continue
        checked += 1
        if batch_results is not None:
            R, t, ok, n_inl = batch_results[slot]
        elif use_scan_context:
            R, t, ok, n_inl = register_fn(int(i), int(j), yaw)
        else:
            R, t, ok, n_inl = register_fn(int(i), int(j))
        if not ok:
            rejects["registration"] += 1
            continue
        if edge_gate_fn is not None and not edge_gate_fn(int(i), int(j), R, t):
            rejects["gate"] += 1
            continue
        seen.append((int(i), int(j)))
        ei.append(int(i))
        ej.append(int(j))
        Rs.append(np.asarray(R))
        ts.append(np.asarray(t))
        ws.append(float(n_inl))
    n = len(ei)
    if n == 0:
        edges = PoseGraph(
            edge_i=jnp.zeros((0,), jnp.int32),
            edge_j=jnp.zeros((0,), jnp.int32),
            rel_R=jnp.zeros((0, 3, 3)),
            rel_t=jnp.zeros((0, 3)),
            weight=jnp.zeros((0,)),
            rot_info=jnp.zeros((0,)),
        )
    else:
        w = jnp.asarray(ws) / 100.0
        edges = PoseGraph(
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            rel_R=jnp.asarray(np.stack(Rs)),
            rel_t=jnp.asarray(np.stack(ts)),
            weight=w,
            rot_info=jnp.full((n,), 100.0),
        )
    return LoopClosures(edges, n, checked, rejects)

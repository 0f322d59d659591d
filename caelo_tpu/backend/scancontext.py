"""ScanContext-style polar place signatures for loop-closure recall.

The reference's loop closure is a disabled skeleton (``CloseLoopPipeline``,
``RefinePoses.py:477-518``) with no place recognition at all; our first
implementation used mean/std descriptor pooling (``loopclosure.py``), which
is cheap but orientation-blind in a weak sense — it cannot *verify* spatial
layout nor propose a yaw.  This module adds a ScanContext-like signature
(Kim & Kim, IROS 2018 — public method, reimplemented from the paper idea):

* ``scan_context``: an (R x S) polar grid of max point height over the
  frame's keypoints — one ``segment_max`` scatter, fixed shapes;
* ``ring_key``: per-ring occupancy fraction — rotation invariant, used for
  candidate search (concatenated to the pooled-descriptor signature);
* ``align_score``: best column-shifted cosine similarity between two scan
  contexts — returns the score AND the aligning yaw, which seeds the
  motion-prior-gated geometric verification
  (``frontend.registration.register_pair_with_prior``).

Everything is a few tiny matmuls/gathers; the all-pairs search stays one
MXU GEMM over the trajectory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


N_RINGS = 16
N_SECTORS = 64


@functools.partial(jax.jit, static_argnames=("n_rings", "n_sectors",
                                             "max_range"))
def scan_context(pts: jnp.ndarray, mask: jnp.ndarray,
                 n_rings: int = N_RINGS, n_sectors: int = N_SECTORS,
                 max_range: float = 80.0) -> jnp.ndarray:
    """(K, 3) points -> (n_rings, n_sectors) max-height polar signature.

    Empty bins are 0; heights are shifted by +2 m and clipped to [0, 10] so
    ground-level structure (z ~ -1.7 m on KITTI) stays positive and empty
    stays distinguishable.
    """
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = jnp.hypot(x, y)
    ring = jnp.clip(
        (r / max_range * n_rings).astype(jnp.int32), 0, n_rings - 1
    )
    theta = jnp.arctan2(y, x)  # [-pi, pi)
    sector = jnp.clip(
        ((theta + jnp.pi) / (2.0 * jnp.pi) * n_sectors).astype(jnp.int32),
        0, n_sectors - 1,
    )
    seg = ring * n_sectors + sector
    h = jnp.clip(z + 2.0, 0.0, 10.0)
    h = jnp.where(mask & (r < max_range), h, -jnp.inf)
    sc = jax.ops.segment_max(
        h, seg, num_segments=n_rings * n_sectors, indices_are_sorted=False
    )
    return jnp.where(jnp.isfinite(sc), sc, 0.0).reshape(n_rings, n_sectors)


def ring_key(sc: jnp.ndarray) -> jnp.ndarray:
    """(R, S) -> (R,) occupancy fraction per ring (rotation invariant)."""
    return jnp.mean((sc > 0.0).astype(jnp.float32), axis=-1)


@jax.jit
def align_score(sc_a: jnp.ndarray, sc_b: jnp.ndarray):
    """Best circular column alignment of two scan contexts.

    Returns ``(score, yaw_rad)``: the max over all sector shifts of the mean
    column-wise cosine similarity, and the yaw that rotates frame *b* into
    frame *a* at that shift.  Column cosines for ALL shifts come from one
    (S x S) matmul of the column-normalized matrices.
    """
    S = sc_a.shape[-1]

    def _norm_cols(m):
        n = jnp.linalg.norm(m, axis=0)
        return m / jnp.maximum(n, 1e-9), n > 1e-9

    a_n, a_ok = _norm_cols(sc_a)
    b_n, b_ok = _norm_cols(sc_b)
    M = a_n.T @ b_n                               # (S, S) column cosines
    ok = a_ok[:, None] & b_ok[None, :]
    Mw = jnp.where(ok, M, 0.0)
    cnt = ok.astype(jnp.float32)
    j = jnp.arange(S)
    # score(s) = mean_j M[j, (j+s) % S] over columns non-empty in both
    idx = (j[None, :] + j[:, None]) % S           # idx[s, j] = (j+s) % S
    num = jnp.sum(Mw[j[None, :], idx], axis=-1)
    den = jnp.maximum(jnp.sum(cnt[j[None, :], idx], axis=-1), 1.0)
    scores = num / den
    s = jnp.argmax(scores)
    # column j of b aligns with column (j+s)%S of a: b's content appears
    # rotated by -s sectors relative to a, so rotating b by +s*2pi/S (about
    # +z, sector index grows with theta) maps it into a's frame.
    yaw = 2.0 * jnp.pi * s.astype(jnp.float32) / S
    yaw = jnp.where(yaw > jnp.pi, yaw - 2.0 * jnp.pi, yaw)
    return scores[s], yaw


@jax.jit
def align_score_batch(sc_q: jnp.ndarray, sc_cands: jnp.ndarray):
    """``(R, S)`` query vs ``(N, R, S)`` candidates -> (scores, yaws)."""
    return jax.vmap(lambda c: align_score(sc_q, c))(sc_cands)


@jax.jit
def sc_correlation_matrix(scs: jnp.ndarray):
    """All-pairs, all-shift ScanContext cross-correlation over a trajectory.

    ``scs``: (N, R, S) scan contexts.  Returns ``(score, yaw)``, both
    (N, N): ``score[i, j]`` is the best whole-matrix cosine similarity of
    frames i and j over all S circular sector shifts of j, and ``yaw[i, j]``
    the aligning yaw (radians, rotating frame j into frame i) at that shift —
    the same convention as :func:`align_score`.

    This is the candidate matrix the pooled keypoint descriptor cannot be:
    rotation-searched (a revisit traversed the other way still correlates)
    and layout-aware (repeated-texture places that alias in pooled-descriptor
    space differ in their polar height layout).  Computed as S matmuls of
    the (N, R*S) row-normalized signature matrix against its sector-rolled
    self with a running max — MXU work is S * 2 N^2 R S FLOPs (~2.7 TFLOP at
    seq-00 scale N=4541, tens of ms on a v5e) and live memory stays at two
    (N, N) buffers, never (N, N, S).  The circular shift in frequency space
    (FFT) would save the S-fold matmul but materializes the (N, N, S)
    correlation volume (5 TB at N=4541) to take the max — the rolled-matmul
    form IS the TPU-native FFT-correlation evaluation.

    Differences from :func:`align_score` (intentional, for matmul form):
    whole-matrix cosine instead of per-column mean cosine, and no
    empty-column masking.  Ranking agreement is tested; geometric
    verification downstream is the arbiter either way.
    """
    N, R, S = scs.shape
    flat = scs.reshape(N, R * S)
    inv = 1.0 / jnp.maximum(jnp.linalg.norm(flat, axis=1), 1e-9)
    A = flat * inv[:, None]

    def body(s, carry):
        best, best_s = carry
        # roll by -s: <A[i], roll(B[j], -s)> = sum_c <i_col(c), j_col(c+s)>,
        # matching align_score's scores[s]
        Bs = jnp.roll(scs, -s, axis=-1).reshape(N, R * S) * inv[:, None]
        sim = jnp.dot(A, Bs.T, preferred_element_type=jnp.float32)
        upd = sim > best
        return jnp.where(upd, sim, best), jnp.where(upd, s, best_s)

    best, best_s = jax.lax.fori_loop(
        0, S,
        body,
        (jnp.full((N, N), -jnp.inf, jnp.float32),
         jnp.zeros((N, N), jnp.int32)),
    )
    yaw = 2.0 * jnp.pi * best_s.astype(jnp.float32) / S
    yaw = jnp.where(yaw > jnp.pi, yaw - 2.0 * jnp.pi, yaw)
    return best, yaw


def yaw_rotation(yaw) -> jnp.ndarray:
    """Yaw (rad, about +z) -> (3, 3) rotation matrix."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                     jnp.float32)

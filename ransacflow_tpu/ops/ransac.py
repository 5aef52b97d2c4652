"""Fully vectorized RANSAC homography/affine fitting — single XLA dispatch.

The reference (utils/outil.py:117-164) samples minimal sets on GPU, drops
duplicate-index sets, then loops over ~500 sequential chunks of 100
hypotheses, each doing a host numpy SVD and a device inlier count. Here the
whole thing is one jitted program:

  sample -> mask duplicates -> batched DLT (on-device eigh) -> score ALL
  hypotheses -> argmax

Invalid hypotheses (duplicate indices, degenerate det) are masked to zero
inliers instead of being filtered, keeping every shape static. Matches are
padded-with-validity-mask arrays, so varying match counts re-use the same
compiled program per bucket size.

Behavioral notes vs. the reference:
- The reference's per-chunk early exit ("return None if a chunk's best has 0
  inliers", utils/outil.py:145-146) becomes a global `found = best > 0`.
- The reference gates on signed det of an arbitrarily-signed null vector
  (utils/outil.py:109-113 — sign depends on LAPACK conventions); the default
  here is the orientation-agnostic `|det| > eps`, with `det_gate='signed'`
  available for strict-parity experiments.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ransacflow_tpu.ops.homography import (
    dlt_homography,
    fit_affine,
    reprojection_error,
)

DET_EPS = 1e-6
# max hypotheses x matches scored in one shot (~128M elements = 512 MB per
# fp32 intermediate); larger problems stream hypothesis chunks
SCORE_ELEMS_LIMIT = 128 * 1024 * 1024


class RansacResult(NamedTuple):
    H21: jnp.ndarray          # (3, 3) best model (target -> source)
    num_inliers: jnp.ndarray  # () int32
    inlier_mask: jnp.ndarray  # (N,) bool over the (padded) match arrays
    found: jnp.ndarray        # () bool: num_inliers > 0 and enough matches
    best_sample: jnp.ndarray  # (n_points,) match indices of the winning
    #                           minimal set — lets the host re-solve the
    #                           winner in fp64 for exact reference parity.


def _sample_minimal_sets(key, n_valid, n_points, n_iter):
    """(n_iter, n_points) indices in [0, n_valid) + per-set uniqueness mask."""
    raw = jax.random.randint(
        key, (n_iter, n_points), 0, jnp.maximum(n_valid, 1), dtype=jnp.int32
    )
    # reject sets with any repeated index (reference: utils/outil.py:122-133)
    eq = raw[:, :, None] == raw[:, None, :]
    dup = jnp.sum(eq, axis=(1, 2)) > n_points  # diagonal contributes n_points
    return raw, ~dup


@partial(
    jax.jit,
    static_argnames=("n_iter", "n_points", "transform", "det_gate", "dlt_method"),
)
def ransac_homography(
    key,
    match1,
    match2,
    valid,
    tolerance,
    n_iter=10000,
    n_points=4,
    transform="homography",
    det_gate="abs",
    dlt_method="projective",
    injected_samples=None,
):
    """Vectorized RANSAC over padded match arrays.

    Args:
      key: PRNG key.
      match1: (N, 3) source homogeneous points (x, y, 1); padded rows allowed.
      match2: (N, 3) target homogeneous points.
      valid: (N,) bool; padded / masked-out matches are never sampled and
        never counted as inliers.
      tolerance: inlier threshold in normalized [-1, 1] units.
      n_iter: number of hypotheses (static).
      transform: 'homography' (4-pt DLT) or 'affine' (3-pt LSQ).
      injected_samples: optional (n_iter, n_points) int32 match indices to
        use INSTEAD of PRNG sampling — the deterministic parity mode
        (SURVEY.md §7): torch and JAX PRNG streams can't be bit-matched, but
        with identical minimal sets the solve/score path can be compared
        directly against the reference.

    Returns RansacResult.
    """
    N = match1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # TPU gathers are index-rate-bound (see ops/sampler.py): fetching X and
    # Y separately through an `order` indirection costs 3 gathers of
    # n_iter * n_points indices each. Concatenating the match arrays (and
    # pre-applying the valid-first permutation to the DATA, once, at N
    # rows) folds it into ONE gather of 24-byte rows — measured 5.8 ->
    # 5.0 ms for the full op on the 50k x 1200 HPatches config
    # (scripts/bench_ransac_bisect.py; sampling+DLT half 3.3 -> 2.7).
    m12 = jnp.concatenate([match1, match2], axis=1)  # (N, 6)

    if injected_samples is not None:
        raw = injected_samples
        eq = raw[:, :, None] == raw[:, None, :]
        unique = jnp.sum(eq, axis=(1, 2)) <= n_points
        XY = m12[raw]  # (n_iter, n_points, 6)
        sample_of = lambda i: raw[i]  # noqa: E731
    else:
        # stable partition: valid match indices first
        order = jnp.argsort(~valid, stable=True)  # (N,) int
        raw, unique = _sample_minimal_sets(key, n_valid, n_points, n_iter)
        XY = m12[order][raw]  # order applied at N rows, not n_iter*n_points
        # match-array indices are only needed for the WINNING set — gather
        # n_points indices at the end, not n_iter * n_points up front
        sample_of = lambda i: order[raw[i]]  # noqa: E731

    X = XY[..., :3]  # (n_iter, n_points, 3)
    Y = XY[..., 3:]

    if transform == "affine":
        H21 = fit_affine(X, Y)
        model_ok = jnp.ones((n_iter,), dtype=bool)
    else:
        H21 = dlt_homography(X, Y, method=dlt_method)
        dets = jnp.linalg.det(H21)
        if det_gate == "signed":
            model_ok = dets > DET_EPS
        else:
            model_ok = jnp.abs(dets) > DET_EPS

    # score ALL hypotheses, MXU-shaped: three (N, 3) @ (3, n_hyp) matmuls
    # give the projected homogeneous coordinates of every match under every
    # hypothesis; the squared-error compare and the inlier count fuse into
    # the matmul consumers. err < tol == err^2 < tol^2.
    def count_chunk(H_chunk):
        ex = jnp.dot(match2, H_chunk[:, 0, :].T,
                     preferred_element_type=jnp.float32)
        ey = jnp.dot(match2, H_chunk[:, 1, :].T,
                     preferred_element_type=jnp.float32)
        ez = jnp.dot(match2, H_chunk[:, 2, :].T,
                     preferred_element_type=jnp.float32)
        du = ex / ez - match1[:, 0:1]  # (N, chunk)
        dv = ey / ez - match1[:, 1:2]
        hit = (du * du + dv * dv < tolerance * tolerance) & valid[:, None]
        return jnp.sum(hit, axis=0).astype(jnp.int32)

    if n_iter * N <= SCORE_ELEMS_LIMIT:
        counts = count_chunk(H21)
    else:
        # KITTI-scale runs (50k hypotheses x 8k+ matches) would materialize
        # multi-GB intermediates; stream hypothesis chunks instead
        chunk = max(1, SCORE_ELEMS_LIMIT // N)
        n_pad = -(-n_iter // chunk) * chunk
        H_pad = jnp.pad(H21, ((0, n_pad - n_iter), (0, 0), (0, 0)))
        H_chunks = H_pad.reshape(n_pad // chunk, chunk, 3, 3)
        counts = jax.lax.map(count_chunk, H_chunks).reshape(-1)[:n_iter]
    counts = counts * (unique & model_ok).astype(jnp.int32)

    best = jnp.argmax(counts)
    best_H = H21[best]
    best_err = reprojection_error(match1, match2, best_H[None])[0]
    best_inliers = (best_err < tolerance) & valid
    n_inl = counts[best]
    found = (n_inl > 0) & (n_valid >= n_points)
    return RansacResult(best_H, n_inl, best_inliers, found, sample_of(best))

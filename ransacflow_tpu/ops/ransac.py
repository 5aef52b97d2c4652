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
from jax import lax

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


def _solve_models(X, Y, transform, det_gate, dlt_method):
    """Fit one model per minimal set; returns (H21 (n, 3, 3), model_ok (n,))."""
    n = X.shape[0]
    if transform == "affine":
        return fit_affine(X, Y), jnp.ones((n,), dtype=bool)
    H21 = dlt_homography(X, Y, method=dlt_method)
    dets = jnp.linalg.det(H21)
    if det_gate == "signed":
        return H21, dets > DET_EPS
    return H21, jnp.abs(dets) > DET_EPS


def _make_count_chunk(match1, match2, valid, tolerance):
    """Closure scoring a hypothesis chunk, MXU-shaped: three (N, 3) @
    (3, n_hyp) matmuls give the projected homogeneous coordinates of every
    match under every hypothesis; the squared-error compare and the inlier
    count fuse into the matmul consumers. err < tol == err^2 < tol^2."""

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

    return count_chunk


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

    H21, model_ok = _solve_models(X, Y, transform, det_gate, dlt_method)
    count_chunk = _make_count_chunk(match1, match2, valid, tolerance)

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


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "chunk", "n_points", "transform", "det_gate", "dlt_method",
    ),
)
def ransac_homography_adaptive(
    key,
    match1,
    match2,
    valid,
    tolerance,
    n_iter=50000,
    chunk=4096,
    confidence=0.999,
    n_points=4,
    transform="homography",
    det_gate="abs",
    dlt_method="projective",
):
    """RANSAC with confidence-based early termination (opt-in mode).

    Classic adaptive stopping (Fischler & Bolles; Hartley & Zisserman
    Alg. 4.5): with current best inlier ratio ``w`` over the valid matches,
    the number of hypotheses needed to draw one all-inlier minimal set with
    probability ``confidence`` is ``n_req = log(1-confidence) /
    log(1-w^n_points)``. Hypotheses are generated and scored in fixed-size
    ``chunk`` blocks inside a ``lax.while_loop``; the loop exits as soon as
    the number evaluated covers ``n_req`` (or ``n_iter`` is exhausted).

    The reference CANNOT do this: its RANSAC streams fixed chunks of 100
    hypotheses through a host numpy SVD loop with no stopping rule
    (utils/outil.py:136-160), so the 50k-iteration eval configs always pay
    full price. Here the whole loop stays device-resident — one extra
    while-iteration of latency per chunk, no host syncs — so typical pairs
    (inlier ratio >= ~0.25 => n_req < 4k) pay for ONE chunk instead of
    50k hypotheses. Fixed-``n_iter`` `ransac_homography` remains the
    parity default.

    Every chunk re-applies the same duplicate-index and degenerate-det
    masks as the fixed-count path, so the surviving hypothesis
    distribution is identical — only the stopping time differs
    (distributional parity: tests/test_matching_ransac.py).

    Args mirror `ransac_homography`; additionally:
      chunk: hypotheses per while-loop block (static).
      confidence: stopping confidence (traced; default 0.999).

    Returns (RansacResult, n_evaluated) where n_evaluated is the number of
    hypotheses actually generated+scored (a multiple of ``chunk``, capped
    at ``ceil(n_iter/chunk)*chunk``).
    """
    N = match1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    n_chunks = -(-n_iter // chunk)

    m12 = jnp.concatenate([match1, match2], axis=1)  # (N, 6)
    order = jnp.argsort(~valid, stable=True)
    m12o = m12[order]  # valid-first data permutation, applied once
    count_chunk = _make_count_chunk(match1, match2, valid, tolerance)

    conf = jnp.asarray(confidence, jnp.float32)

    def cond(st):
        return (~st["done"]) & (st["i"] < n_chunks)

    def body(st):
        k = jax.random.fold_in(key, st["i"])
        raw, unique = _sample_minimal_sets(k, n_valid, n_points, chunk)
        XY = m12o[raw]  # (chunk, n_points, 6) — one 24-byte-row gather
        H21, model_ok = _solve_models(
            XY[..., :3], XY[..., 3:], transform, det_gate, dlt_method
        )
        counts = count_chunk(H21) * (unique & model_ok).astype(jnp.int32)
        c_best = jnp.argmax(counts)
        better = counts[c_best] > st["best_count"]
        best_count = jnp.where(better, counts[c_best], st["best_count"])
        best_H = jnp.where(better, H21[c_best], st["best_H"])
        best_sample = jnp.where(better, order[raw[c_best]],
                                st["best_sample"])
        evaluated = (st["i"] + 1) * chunk
        # required draws for the current best ratio. log1p, not log(1-x):
        # for small w, 1 - w^4 rounds to 1.0 in fp32 and log() returns an
        # exact 0 => n_req = -inf => spurious instant stop. The minimum()
        # clamp keeps the denominator strictly negative at w == 0 (where
        # log1p(-0) == 0 would divide to -inf again) => n_req ~ 7e30,
        # i.e. keep going until n_iter exhausts.
        w = best_count.astype(jnp.float32) / jnp.maximum(n_valid, 1)
        w4 = jnp.minimum(w ** n_points, 1.0 - 1e-7)
        denom = jnp.minimum(jnp.log1p(-w4), -1e-30)
        n_req = jnp.log1p(-conf) / denom
        done = evaluated >= jnp.minimum(n_req, float(n_iter))
        return {
            "i": st["i"] + 1,
            "best_count": best_count,
            "best_H": best_H,
            "best_sample": best_sample,
            "done": done,
        }

    init = {
        "i": jnp.int32(0),
        "best_count": jnp.int32(0),
        "best_H": jnp.eye(3, dtype=match1.dtype),
        "best_sample": jnp.zeros((n_points,), jnp.int32),
        "done": jnp.asarray(False),
    }
    st = lax.while_loop(cond, body, init)

    best_err = reprojection_error(match1, match2, st["best_H"][None])[0]
    best_inliers = (best_err < tolerance) & valid & (st["best_count"] > 0)
    found = (st["best_count"] > 0) & (n_valid >= n_points)
    res = RansacResult(
        st["best_H"], st["best_count"], best_inliers, found,
        st["best_sample"],
    )
    return res, st["i"] * chunk

"""Iterative RANSAC refinement of an estimated dense flow ("--iterR").

TPU-native counterpart of the reference's iterative-refinement path
(evaluation/evalHpatch/utils.py:27-66 ``iterative`` plus the ``--iterR``
flag at evaluation/evalHpatch/evaluation.py:85): treat the current
composed flow as a dense set of target->source correspondences, gate them
by matchability and in-bounds-ness, fit one more RANSAC transform on them
(the reference's ``coarsePlus``), re-warp the source under the refined
transform, and run the fine stage once on top.

The reference's shipped scripts never actually reach this code
(``calculate_epe_hpatches`` has no caller), so it is surfaced here as a
public pipeline function with tests rather than wired into a harness CLI;
PARITY.md §2.6 records that status.

TPU redesign notes: the reference compacts matched pixels with
``np.where`` on host and loops RANSAC chunks (utils.py:30-39); here the
full H*W grid goes in as a fixed-shape padded match array with a validity
mask, so one jitted `ransac_homography` dispatch handles any matchability
pattern without shape-dependent recompiles.
"""

import jax.numpy as jnp

from ransacflow_tpu.ops.grid import normalized_grid
from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.ops.ransac import ransac_homography
from ransacflow_tpu.pipeline.fine import pred_flow_mask


def refine_flow_ransac(
    key,
    align_params,
    src,
    featt,
    flow_est,
    match_est,
    transform="homography",
    n_iter=1000,
    tolerance=0.03,
    n_points=4,
    kernel_size=7,
    match_th=0.5,
):
    """One iterative-refinement round on an estimated flow.

    Args:
      key: PRNG key for RANSAC minimal-set sampling.
      align_params: alignment net params (netFeatCoarse/netFlowCoarse/
        netMatch trees).
      src: (1, Hs, Ws, 3) source image tensor in [0, 1].
      featt: (1, Ht/8, Wt/8, 256) L2-normalized target features
        (`pipeline.fine.fine_features`).
      flow_est: (1, Ht, Wt, 2) current composed flow (target -> source,
        normalized sampling grid).
      match_est: (Ht, Wt) or (1, Ht, Wt, 1) matchability of the estimate.
      transform: 'homography' (4-pt DLT) or 'affine' (LSQ) — the
        reference's --transformation choice (evaluation.py:79).
      n_iter / tolerance / n_points: RANSAC knobs; defaults mirror
        ``iterative(..., nbIter=1000, tolerance=0.03, nbPoint=4)``.
      match_th: matchability acceptance threshold (utils.py:31).

    Returns dict: the `pred_flow_mask` outputs of the re-run fine stage
    (flow/match/flow_down8/match_down8) plus:
      refined_h: (3, 3) the fitted transform (identity when RANSAC found
        no inliers — the reference's ``bestParam = np.eye(3)`` fallback).
      num_inliers, found: the RANSAC result fields.
    """
    ht, wt = flow_est.shape[1:3]
    grid = normalized_grid(ht, wt, flow_est.dtype)[None]

    match = jnp.asarray(match_est).reshape(ht, wt)
    in_bounds = (
        (flow_est[0, :, :, 0] >= -1)
        & (flow_est[0, :, :, 0] <= 1)
        & (flow_est[0, :, :, 1] >= -1)
        & (flow_est[0, :, :, 1] <= 1)
    )
    # utils.py:30-31: match_est * in_bounds, thresholded at 0.5
    valid = ((match * in_bounds.astype(match.dtype)) > match_th).reshape(-1)

    ones = jnp.ones((ht * wt, 1), flow_est.dtype)
    match1 = jnp.concatenate([flow_est[0].reshape(-1, 2), ones], axis=1)
    match2 = jnp.concatenate([grid[0].reshape(-1, 2), ones], axis=1)

    res = ransac_homography(
        key, match1, match2, valid, tolerance,
        n_iter=n_iter, n_points=n_points, transform=transform,
    )
    # reference fallback: identity when there are not enough matches
    # (utils.py:40-41); `found` also covers the zero-inlier case
    refined_h = jnp.where(res.found, res.H21, jnp.eye(3, dtype=res.H21.dtype))

    # affine bestParam has last row [0,0,1], so warp_grid reproduces
    # F.affine_grid(bestParam[:2]) exactly (utils.py:49-54)
    coarse_grid = warp_grid(refined_h[None], ht, wt)
    out = pred_flow_mask(
        align_params, src, featt, coarse_grid,
        cycle_match=False, kernel_size=kernel_size,
    )
    out["refined_h"] = refined_h
    out["num_inliers"] = res.num_inliers
    out["found"] = res.found
    return out

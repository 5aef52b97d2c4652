"""Fine alignment: warp -> features -> correlation -> flow + matchability.

ONE parameterized implementation replacing the reference's four copies of
``PredFlowMask`` (SURVEY.md §2.4). The semantic fork between copies is the
`cycle_match` flag: HPatches uses match12 only
(evaluation/evalHpatch/evaluation.py:48-49), YFCC/KITTI/Corr multiply by
the back-warped match21 (evaluation/evalYFCC/evaluation.py:57).

The whole step is a single jitted program per image shape.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.feature_extractor import feature_extractor
from ransacflow_tpu.models.heads import net_flow_coarse, net_matchability
from ransacflow_tpu.models.layers import l2_normalize
from ransacflow_tpu.ops.correlation import correlation_volume
from ransacflow_tpu.ops.sampler import grid_sample, interpolate_bilinear
from ransacflow_tpu.ops.grid import normalized_grid


@partial(jax.jit, static_argnames=("cycle_match", "kernel_size", "out_hw"))
def pred_flow_mask(params, src, featt, flow_coarse, cycle_match=False,
                   kernel_size=7, out_hw=None):
    """Run the fine stage for one coarse hypothesis.

    Args:
      params: dict with 'netFeatCoarse', 'netFlowCoarse', 'netMatch' trees.
      src: (1, Hs, Ws, 3) source image tensor in [0, 1].
      featt: (1, Ht/8, Wt/8, 256) L2-normalized target fine features.
      flow_coarse: (1, Ht, Wt, 2) coarse sampling grid (target -> source).
      cycle_match: multiply match12 by back-warped match21.
      out_hw: optional (H, W) to compose/upsample at instead of the coarse
        grid's resolution (KITTI composes the full pass at the original GT
        resolution while warping at fineSize, evalKITTI/evaluation.py:302).

    Returns dict with:
      flow: (1, H, W, 2) composed fine flow (target -> source, normalized)
      match: (H, W) matchability * in-bounds indicator
      flow_down8: (1, Ht/8, Wt/8, 2) raw fine flow at stride 8
      match_down8: (1, Ht/8, Wt/8, 2) cat(match12, match21) at stride 8
    """
    ht, wt = out_hw if out_hw is not None else flow_coarse.shape[1:3]

    src_warp = grid_sample(src, flow_coarse)
    feats, _ = feature_extractor(params["netFeatCoarse"], src_warp)
    feats = l2_normalize(feats, axis=-1)

    corr12 = correlation_volume(featt, feats, kernel_size)
    flow_down8, _ = net_flow_coarse(
        params["netFlowCoarse"], corr12, up8=False, kernel_size=kernel_size
    )
    match12_down8, _ = net_matchability(params["netMatch"], corr12, up8=False)

    corr21 = correlation_volume(feats, featt, kernel_size)
    match21_down8, _ = net_matchability(params["netMatch"], corr21, up8=False)

    match12 = interpolate_bilinear(match12_down8, ht, wt)
    match21 = interpolate_bilinear(match21_down8, ht, wt)
    flow_up = interpolate_bilinear(flow_down8, ht, wt)

    grid = normalized_grid(ht, wt, flow_up.dtype)[None]
    flow_up = jnp.clip(flow_up + grid, -1.0, 1.0)

    # flow12 and the back-warped match21 sample the SAME grid — gather once
    # over concatenated channels (grid_sample cost is position-dominated on
    # TPU, so this halves the second-largest cost of the fine stage). Only
    # possible when both live at the same resolution (KITTI's cross-
    # resolution compose has flow_coarse at fineSize but match21 at out_hw).
    if cycle_match and match21.shape[1:3] == flow_coarse.shape[1:3]:
        sampled = grid_sample(
            jnp.concatenate([flow_coarse, match21], axis=-1), flow_up
        )
        flow12 = sampled[..., :2]
        match = match12 * sampled[..., 2:3]
    elif cycle_match:
        flow12 = grid_sample(flow_coarse, flow_up)
        match = match12 * grid_sample(match21, flow_up)
    else:
        flow12 = grid_sample(flow_coarse, flow_up)
        match = match12

    in_bounds = (
        (flow12[..., 0:1] >= -1)
        & (flow12[..., 0:1] <= 1)
        & (flow12[..., 1:2] >= -1)
        & (flow12[..., 1:2] <= 1)
    )
    match = match * in_bounds.astype(match.dtype)

    return {
        "flow": flow12,
        "match": match[0, :, :, 0],
        "flow_down8": flow_down8,
        "match_down8": jnp.concatenate([match12_down8, match21_down8], axis=-1),
    }


@jax.jit
def fine_features(params, img):
    """L2-normalized fine features of an image tensor (1, H, W, 3)."""
    feat, _ = feature_extractor(params["netFeatCoarse"], img)
    return l2_normalize(feat, axis=-1)

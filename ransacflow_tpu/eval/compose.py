"""Flow reconstruction + multi-homography compositing (shared metric core).

Every reference harness rebuilds the full-resolution flow the same way
(e.g. evaluation/evalHpatch/getResults.py:16-63,
evaluation/evalYFCC/getResults.py:150-190): warp-grid the coarse H stack,
bilinearly upsample the stride-8 fine flow, compose by sampling the coarse
grid at (flow + grid), build the matchability map, then merge the stack
per-pixel first-accept. This module implements that once, with flags for
each harness's variations:

- cycle_match: match = m12 * grid_sample(m21, flowUp) (YFCC/KITTI/Corr) vs
  m12 only (HPatches, getResults.py:44-46).
- aggregate_match: also composite the matchability map (Corr).
"""

import numpy as np
import jax.numpy as jnp

from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.ops.sampler import grid_sample, interpolate_bilinear
from ransacflow_tpu.ops.grid import normalized_grid


def reconstruct_flows(coarse_h, fine_flow_down8, fine_match_down8, out_h,
                      out_w, cycle_match=True):
    """Per-homography full-res flow + matchability.

    Args:
      coarse_h: (n, 3, 3) homography stack.
      fine_flow_down8: (n, h8, w8, 2) stride-8 fine flows.
      fine_match_down8: (n, h8, w8, 2) cat(match12, match21) at stride 8.
    Returns (flow, match): (n, out_h, out_w, 2) clamped flows and
    (n, out_h, out_w) matchability incl. in-bounds indicator.
    """
    n = coarse_h.shape[0]
    coarse = warp_grid(jnp.asarray(coarse_h), out_h, out_w)
    flow_up = interpolate_bilinear(jnp.asarray(fine_flow_down8), out_h, out_w)
    grid = normalized_grid(out_h, out_w)[None]
    flow_up = jnp.clip(flow_up + grid, -1.0, 1.0)
    flow = grid_sample(coarse, flow_up)

    match_up = interpolate_bilinear(jnp.asarray(fine_match_down8), out_h, out_w)
    m12 = match_up[..., 0:1]
    if cycle_match:
        m21 = grid_sample(match_up[..., 1:2], flow_up)
        match = m12 * m21
    else:
        match = m12
    in_bounds = (
        (flow[..., 0:1] >= -1) & (flow[..., 0:1] <= 1)
        & (flow[..., 1:2] >= -1) & (flow[..., 1:2] <= 1)
    )
    match = match * in_bounds.astype(match.dtype)
    flow = jnp.clip(flow, -1.0, 1.0)
    return np.asarray(flow), np.asarray(match[..., 0])


def merge_multi_h(flows, matches, th, multi_h=True, aggregate_match=False):
    """First-accept per-pixel merge over the homography stack
    (reference: evaluation/evalHpatch/getResults.py:53-61).

    Args:
      flows: (n, H, W, 2); matches: (n, H, W); th: acceptance threshold.
    Returns dict: 'flow' (H, W, 2), 'match_binary' (H, W) bool, and
    'match' (H, W) aggregated matchability when aggregate_match.
    """
    flow_global = flows[0].copy()
    match_binary = matches[0] >= th
    match_global = matches[0].copy() if aggregate_match else None
    if multi_h:
        for i in range(1, len(flows)):
            take = (matches[i] >= th) & (~match_binary)
            if aggregate_match:
                match_global[take] = matches[i][take]
            match_binary = match_binary | take
            flow_global[take] = flows[i][take]
    out = {"flow": flow_global, "match_binary": match_binary}
    if aggregate_match:
        out["match"] = match_global
    return out


def remove_small_cc(match, cc_th, match_th=0.99):
    """Zero connected components covering <= cc_th of the image
    (reference: evaluation/evalKITTI/evaluation.py:85-100). 8-connectivity,
    matching skimage measure.label's 2-D default."""
    if cc_th == 0:
        return match
    from scipy import ndimage

    binary = match > match_th
    labels, n = ndimage.label(binary, structure=np.ones((3, 3)))
    if n == 0:
        return match
    out = match.copy()
    sizes = ndimage.sum_labels(np.ones_like(match), labels, range(1, n + 1))
    frac = sizes / match.size
    for i in range(1, n + 1):
        if frac[i - 1] <= cc_th:
            out[labels == i] = 0
    return out


def fill_flow_nearest(flow, match_binary):
    """Fill unmatched pixels with the nearest matched pixel's flow
    (reference: evaluation/evalKITTI/getResults.py:87-93)."""
    from scipy import ndimage

    idx = ndimage.distance_transform_edt(
        ~match_binary, return_distances=False, return_indices=True
    )
    return flow[tuple(idx)]

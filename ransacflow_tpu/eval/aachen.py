"""Aachen Day-Night localization support.

The reference's evalAachan directory is documentation-only (a results
table; evaluation/evalAachan/README.md) — localization itself runs through
the external visuallocalization.net benchmark, which consumes 2D-2D
correspondences between query and database images. This module provides
the piece RANSAC-Flow contributes: dense-alignment-derived correspondence
export for query/database pairs.

Reference numbers to compare against (README table): MoCo features +
finetuning 74.5 / 88.8 / 100 at (0.5m,2deg)/(1m,5deg)/(5m,10deg).
"""

import os

import numpy as np
from PIL import Image

from ransacflow_tpu.pipeline.multihomo import multi_homography_predict
from ransacflow_tpu.eval.compose import reconstruct_flows, merge_multi_h


def export_correspondences(
    coarse,
    align_params,
    query_path,
    db_path,
    match_th=0.95,
    grid_step=8,
    max_coarse=10,
    mask_region_th=0.01,
):
    """Dense-alignment correspondences for one query/database pair.

    Runs the multi-homography pipeline with the query as source and the
    database image as target, then samples matched pixels on a regular
    grid of the target.

    Returns (pts_query, pts_db) pixel coords in the *resized* frames plus
    the resized sizes, or None when no alignment was found:
      dict(query_xy, db_xy, query_size, db_size).
    """
    q = Image.open(query_path).convert("RGB")
    d = Image.open(db_path).convert("RGB")
    coarse.set_pair(q, d)
    pred = multi_homography_predict(
        coarse, align_params, max_coarse=max_coarse,
        mask_region_th=mask_region_th, cycle_match=True,
    )
    if pred is None:
        return None
    h8, w8 = pred["fine_flow_down8"].shape[1:3]
    flows, matches = reconstruct_flows(
        pred["coarse_h"], pred["fine_flow_down8"], pred["fine_match_down8"],
        h8 * 8, w8 * 8, cycle_match=True,
    )
    merged = merge_multi_h(flows, matches, match_th, multi_h=True)
    flow, ok = merged["flow"], merged["match_binary"]

    ys, xs = np.mgrid[0 : h8 * 8 : grid_step, 0 : w8 * 8 : grid_step]
    keep = ok[ys, xs]
    xs, ys = xs[keep], ys[keep]
    hq, wq = coarse.src_array.shape[:2]
    qx = (flow[ys, xs, 0] + 1) * 0.5 * (wq - 1)
    qy = (flow[ys, xs, 1] + 1) * 0.5 * (hq - 1)
    return {
        "query_xy": np.stack([qx, qy], axis=1),
        "db_xy": np.stack([xs, ys], axis=1).astype(np.float64),
        "query_size": (wq, hq),
        "db_size": (w8 * 8, h8 * 8),
    }


def write_match_file(out_path, pair_name, corr):
    """Append a pair's correspondences in a simple text format
    (one 'qx qy dx dy' row per match) consumable by localization scripts."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a") as f:
        f.write(f"# {pair_name} {len(corr['query_xy'])}\n")
        for (qx, qy), (dx, dy) in zip(corr["query_xy"], corr["db_xy"]):
            f.write(f"{qx:.2f} {qy:.2f} {dx:.2f} {dy:.2f}\n")

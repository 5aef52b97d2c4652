"""MegaDepth validation: fine-stage precision under a frozen coarse warp.

Mirrors train/validation.py:57-113: per CSV row, resize both images
(min side 480, floored to stride 16) with correspondence coordinates
scaled accordingly, apply a *fixed precomputed* coarse affine (so the fine
net is evaluated in isolation and epochs are comparable), run one fine
pass, and report precision at 8 log-spaced pixel thresholds
[1, 2, 3, 5, 8, 14, 22, 36]. Model selection uses prec@8px (index 4).
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ransacflow_tpu.models.heads import net_flow_coarse, flow_to_grid
from ransacflow_tpu.models.layers import l2_normalize
from ransacflow_tpu.models.feature_extractor import feature_extractor
from ransacflow_tpu.ops.correlation import correlation_volume
from ransacflow_tpu.ops.sampler import grid_sample, affine_grid
from ransacflow_tpu.ops.grid import normalized_grid
from ransacflow_tpu.utils.image import min_size_shape_wh

PIXEL_GRID = np.around(np.logspace(0, np.log10(36), 8))  # 1..36 px


def resize_min_resolution(min_size, img, x, y, stride=16):
    """Resize min side to `min_size` (floor to stride), scaling coords."""
    w, h = img.size
    new_w, new_h = min_size_shape_wh((w, h), min_size, stride)
    img = img.resize((new_w, new_h), resample=Image.LANCZOS)
    return img, x * (new_w / float(w)), y * (new_h / float(h))


@partial(jax.jit, static_argnames=("kernel_size",))
def _fine_forward(params, src, tgt, theta, kernel_size=7):
    """One jitted fine pass under a fixed coarse affine.

    Compiles once per image shape; without it each CSV row paid per-op
    dispatch through the dev tunnel on every validation epoch.
    """
    ht, wt = tgt.shape[1:3]
    flow_global = affine_grid(theta, ht, wt)
    src_sample = grid_sample(src, flow_global)

    feats, _ = feature_extractor(params["netFeatCoarse"], src_sample)
    feats = l2_normalize(feats, axis=-1)
    featt, _ = feature_extractor(params["netFeatCoarse"], tgt)
    featt = l2_normalize(featt, axis=-1)

    corr21 = correlation_volume(featt, feats, kernel_size)
    flow, _ = net_flow_coarse(
        params["netFlowCoarse"], corr21, up8=True, kernel_size=kernel_size
    )
    grid = normalized_grid(ht, wt)[None]
    final = flow_to_grid(flow, grid)
    return grid_sample(flow_global, final)


def _parse_coords(field):
    return np.array([float(v) for v in str(field).split(";")], np.float32)


def alignment_error(flow, xa, ya, xb, yb, ws, hs):
    """Pixel error of predicted correspondences.

    Args:
      flow: (Ht, Wt, 2) normalized target->source sampling grid.
      (xa, ya): GT source pixel coords; (xb, yb): target pixel coords.
      (ws, hs): source image size.
    Returns per-correspondence distances (n,).
    """
    xb_i = xb.astype(int)
    yb_i = yb.astype(int)
    sx = (flow[yb_i, xb_i, 0] + 1) * 0.5 * (ws - 1)
    sy = (flow[yb_i, xb_i, 1] + 1) * 0.5 * (hs - 1)
    # the reference truncates the GT source coords too
    # (train/validation.py:42-44 int(XA[j]); golden-tested in
    # tests/test_reference_metrics.py)
    return np.sqrt((sx - xa.astype(int)) ** 2 + (sy - ya.astype(int)) ** 2)


def validate(df, val_dir, coarse_transforms, params, kernel_size=7,
             min_size=480):
    """Run the validation epoch.

    Args:
      df: DataFrame with columns scene, source_image, target_image,
        XA, YA, XB, YB (';'-separated pixel coords).
      coarse_transforms: list of (2, 3) affine matrices (the reference's
        coarse.pkl), one per row.
      params: alignment nets.
    Returns precision array (8,) over PIXEL_GRID thresholds.
    """
    hits = np.zeros(8)
    total = 0
    for i in range(len(df)):
        row = df.iloc[i]
        scene_dir = os.path.join(val_dir, str(row["scene"]))
        i_s = Image.open(os.path.join(scene_dir, row["source_image"])).convert("RGB")
        i_t = Image.open(os.path.join(scene_dir, row["target_image"])).convert("RGB")
        i_s, xa, ya = resize_min_resolution(
            min_size, i_s, _parse_coords(row["XA"]), _parse_coords(row["YA"])
        )
        i_t, xb, yb = resize_min_resolution(
            min_size, i_t, _parse_coords(row["XB"]), _parse_coords(row["YB"])
        )
        ws, hs = i_s.size
        src = jnp.asarray(np.asarray(i_s, np.float32) / 255.0)[None]
        tgt = jnp.asarray(np.asarray(i_t, np.float32) / 255.0)[None]
        ht, wt = tgt.shape[1:3]

        theta = jnp.asarray(np.asarray(coarse_transforms[i], np.float32))[None]
        flow_final = _fine_forward(params, src, tgt, theta,
                                   kernel_size=kernel_size)

        err = alignment_error(np.asarray(flow_final[0]), xa, ya, xb, yb, ws, hs)
        hits += (err.reshape(-1, 1) < PIXEL_GRID.reshape(1, -1)).sum(axis=0)
        total += len(err)
    return hits / max(total, 1)

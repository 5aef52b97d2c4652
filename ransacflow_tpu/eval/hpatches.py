"""HPatches dense-alignment harness (DGC-Net protocol, AEPE at 240x240).

Prediction pass mirrors evaluation/evalHpatch/evaluation.py:145-260
(min-side 480, 7 scales, 50k RANSAC iters, match12-only acceptance);
metric pass mirrors getResults.py:16-63,83-156,196-253 (flows composed on a
240x240 grid, GT grid from the scaled CSV homography, AEPE over pixels
whose GT lands in-bounds).
"""

import os

import numpy as np
import pandas as pd
from PIL import Image

from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.pipeline.multihomo import multi_homography_predict
from ransacflow_tpu.eval.artifacts import save_pair, load_pair
from ransacflow_tpu.eval.compose import reconstruct_flows, merge_multi_h
from ransacflow_tpu.ops.grid import normalized_grid

SCENES = (2, 3, 4, 5, 6)


def predict_hpatches(
    csv_dir,
    image_dir,
    out_dir,
    resnet_params,
    align_params,
    scenes=SCENES,
    min_size=480,
    nb_scale=7,
    n_iter=50000,
    tolerance=0.05,
    scale_r=2.0,
    max_coarse=10,
    mask_region_th=0.01,
    bg_mask_fn=None,
    begin_index=0,
    end_index=None,
    n_devices=None,
    batch_pairs=None,
    adaptive_chunk=0,
    anchor_stride=0,
    relax_cells=0,
):
    """Run prediction for HPatches scenes 1-2..1-6.

    Args:
      bg_mask_fn: optional callable(img_path, (Ht, Wt)) -> foreground mask
        (the segNet sky-removal hook).
      n_devices: shard pairs over a local device pool (eval/pooled.py) using
        the device-resident multi-homography loop; None keeps the
        reference-parity host loop (with fp64 hypothesis polish). The mask
        resize for bg_mask_fn needs the resized target shape, so the pooled
        path computes it from the PIL size with the same min-side rule.
    """
    coarse_kwargs = dict(
        nb_scale=nb_scale, n_iter=n_iter, tolerance=tolerance,
        min_size=min_size, scale_r=scale_r, resize_mode="min",
        adaptive_chunk=adaptive_chunk, anchor_stride=anchor_stride,
        relax_cells=relax_cells,
    )
    if n_devices is None:
        coarse = CoarseAligner(resnet_params, **coarse_kwargs)
    for scene in scenes:
        df = pd.read_csv(os.path.join(csv_dir, f"hpatches_1_{scene}.csv"))
        scene_out = os.path.join(out_dir, str(scene))
        end = len(df) if end_index is None else min(end_index, len(df))

        if n_devices is not None:
            from ransacflow_tpu.eval.pooled import pooled_multihomo_predict
            from ransacflow_tpu.utils.image import resized_shape_min_size

            def gen():
                for idx in range(begin_index, end):
                    row = df.iloc[idx]
                    obj = str(row.obj)
                    tgt_path = os.path.join(image_dir, obj, f"{row.im2}.ppm")
                    i_s = Image.open(
                        os.path.join(image_dir, obj, f"{row.im1}.ppm")
                    ).convert("RGB")
                    i_t = Image.open(tgt_path).convert("RGB")
                    bg = None
                    if bg_mask_fn is not None:
                        bg = bg_mask_fn(
                            tgt_path, resized_shape_min_size(i_t, min_size)
                        )
                    yield idx, i_s, i_t, bg

            pooled_multihomo_predict(
                gen(), resnet_params, align_params, n_devices, coarse_kwargs,
                save_fn=lambda idx, art: save_pair(scene_out, idx, art),
                max_coarse=max_coarse, mask_region_th=mask_region_th,
                cycle_match=False, batch_pairs=batch_pairs,
            )
            continue

        for idx in range(begin_index, end):
            row = df.iloc[idx]
            obj = str(row.obj)
            i_s = Image.open(
                os.path.join(image_dir, obj, f"{row.im1}.ppm")
            ).convert("RGB")
            i_t = Image.open(
                os.path.join(image_dir, obj, f"{row.im2}.ppm")
            ).convert("RGB")
            coarse.set_pair(i_s, i_t)
            ht, wt = coarse.tgt_array.shape[:2]
            bg = None
            if bg_mask_fn is not None:
                bg = bg_mask_fn(
                    os.path.join(image_dir, obj, f"{row.im2}.ppm"), (ht, wt)
                )
            pred = multi_homography_predict(
                coarse, align_params, max_coarse=max_coarse,
                mask_region_th=mask_region_th, cycle_match=False, bg_mask=bg,
            )
            if pred is not None:
                save_pair(scene_out, idx, pred)


def hpatches_gt_grid(row, out_size, image_dir):
    """DGC-Net ground-truth grid: the CSV homography, rescaled to
    (out_size, out_size), applied inversely to the pixel grid, normalized
    (getResults.py:83-144)."""
    import cv2

    obj = str(row.obj)
    h_ref, w_ref = int(row.Him), int(row.Wim)
    tgt = cv2.imread(os.path.join(image_dir, obj, f"{row.im2}.ppm"), -1)
    h_trg, w_trg = tgt.shape[:2]
    H = row.iloc[5:].astype("double").values.reshape(3, 3)

    S1 = np.diag([out_size / w_ref, out_size / h_ref, 1.0])
    S2 = np.diag([out_size / w_trg, out_size / h_trg, 1.0])
    H_scale = S2 @ H @ np.linalg.inv(S1)
    Hinv = np.linalg.inv(H_scale)

    X, Y = np.meshgrid(
        np.linspace(0, out_size - 1, out_size),
        np.linspace(0, out_size - 1, out_size),
    )
    pts = np.stack([X.ravel(), Y.ravel(), np.ones_like(X.ravel())])
    warp = Hinv @ pts
    xw = 2 * warp[0] / (warp[2] + 1e-8) / (out_size - 1) - 1
    yw = 2 * warp[1] / (warp[2] + 1e-8) / (out_size - 1) - 1
    return np.stack(
        [xw.reshape(out_size, out_size), yw.reshape(out_size, out_size)],
        axis=-1,
    ).astype(np.float32)


def evaluate_hpatches(
    pred_dir,
    csv_dir,
    image_dir,
    scenes=SCENES,
    out_size=240,
    multi_h=True,
    th=1.0,
    only_coarse=False,
):
    """AEPE per scene. Returns {scene: mean_aepe} (+ per-pair lists)."""
    grid = np.asarray(normalized_grid(out_size, out_size))
    results = {}
    per_pair = {}
    for scene in scenes:
        df = pd.read_csv(os.path.join(csv_dir, f"hpatches_1_{scene}.csv"))
        scene_dir = os.path.join(pred_dir, str(scene))
        aepes = []
        for idx in range(len(df)):
            art = load_pair(scene_dir, idx)
            if art is None:
                flow_est = grid
            elif only_coarse:
                from ransacflow_tpu.ops.homography import warp_grid
                import jax.numpy as jnp

                flow_est = np.asarray(
                    warp_grid(jnp.asarray(art["coarse_h"][:1]), out_size,
                              out_size)
                )[0]
            else:
                flows, matches = reconstruct_flows(
                    art["coarse_h"], art["fine_flow_down8"],
                    art["fine_match_down8"], out_size, out_size,
                    cycle_match=False,
                )
                flow_est = merge_multi_h(flows, matches, th, multi_h)["flow"]

            gt = hpatches_gt_grid(df.iloc[idx], out_size, image_dir)
            mask = (
                (gt[..., 0] >= -1) & (gt[..., 0] <= 1)
                & (gt[..., 1] >= -1) & (gt[..., 1] <= 1)
            )
            to_px = (out_size - 1) / 2.0
            diff = (flow_est - gt) * to_px
            epe = np.sqrt((diff[..., 0] ** 2 + diff[..., 1] ** 2))[mask]
            aepes.append(float(epe.mean()))
        results[scene] = float(np.mean(aepes))
        per_pair[scene] = aepes
    return results, per_pair

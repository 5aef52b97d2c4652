"""KITTI 2015 optical-flow harness (EPE over the 200 training pairs).

Prediction mirrors evaluation/evalKITTI/evaluation.py:220-344: fixed seeds,
coarse matching at coarseSize 800 (3 scales, scaleR 1.2, 50k iters), then a
two-resolution fine refinement — fine flow at fineSize//2 composed into a
new coarse grid at fineSize, then a second fine pass composed at the
original resolution — with connected-component cleanup of the matchability.
Metrics mirror getResults.py:95-141,201-235: three-level flow composition
(H -> d2 flow -> full flow) at GT resolution, cc cleanup, first-accept
merge, optional nearest-valid occlusion fill, EPE against the 16-bit PNG
ground truth ((v - 2^15) / 64).
"""

import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features
from ransacflow_tpu.eval.artifacts import save_pair, load_pair
from ransacflow_tpu.eval.compose import (
    merge_multi_h,
    remove_small_cc,
    fill_flow_nearest,
)
from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.ops.sampler import grid_sample, interpolate_bilinear
from ransacflow_tpu.ops.grid import normalized_grid
from ransacflow_tpu.utils.image import resize_round_stride, to_array


def read_kitti_flow(path):
    """16-bit PNG flow GT -> (u, v, valid) (getResults.py:17-24)."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    valid, v, u = raw[:, :, 0], raw[:, :, 1], raw[:, :, 2]
    u = (u.astype(float) - 32768) / 64.0
    v = (v.astype(float) - 32768) / 64.0
    return u, v, valid.astype(bool)


def _compose(flow_down, base_grid, out_h, out_w):
    """clamp(upsample(flow_down) + grid) sampled from base_grid."""
    up = interpolate_bilinear(flow_down, out_h, out_w)
    grid = normalized_grid(out_h, out_w)[None]
    up = jnp.clip(up + grid, -1.0, 1.0)
    return grid_sample(base_grid, up)


def predict_kitti(
    image_dir,
    out_dir,
    resnet_params,
    align_params,
    coarse_size=800,
    fine_size=650,
    nb_scale=3,
    scale_r=1.2,
    n_iter=50000,
    tolerance=0.05,
    mask_region_th=0.005,
    cc_th=0.01,
    begin_index=0,
    end_index=200,
    seed=1000,
    bg_mask_fn=None,
    max_coarse=None,
    adaptive_chunk=0,
    anchor_stride=0,
    relax_cells=0,
):
    """Predict flow for pairs ({i:06}_10.png target, {i:06}_11.png source).

    RANSAC keys are derived per pair index (fold_in(PRNGKey(seed), i)), so
    a --beginIndex/--endIndex restart produces the same artifacts as the
    full run — and `pooled_kitti_predict` is bit-identical for any pool
    size. (The reference seeds once globally, evalKITTI/evaluation.py:
    182-183, making shard artifacts depend on the shard start.)
    """
    coarse = CoarseAligner(
        resnet_params, nb_scale=nb_scale, n_iter=n_iter, tolerance=tolerance,
        min_size=coarse_size, scale_r=scale_r, resize_mode="min", seed=seed,
        adaptive_chunk=adaptive_chunk, anchor_stride=anchor_stride,
        relax_cells=relax_cells,
    )
    for i in range(begin_index, end_index):
        _predict_one_kitti_pair(
            coarse, align_params, image_dir, out_dir, i,
            fine_size=fine_size, mask_region_th=mask_region_th, cc_th=cc_th,
            seed=seed, bg_mask_fn=bg_mask_fn, max_coarse=max_coarse,
        )


def _predict_one_kitti_pair(
    coarse, align_params, image_dir, out_dir, i, *,
    fine_size, mask_region_th, cc_th, seed, bg_mask_fn, max_coarse,
):
    """One pair's two-resolution prediction (shared by the sequential and
    pooled drivers). The loop must stay host-orchestrated: the accept
    decision runs scipy connected-component cleanup on the matchability
    every iteration, which has no device equivalent here."""
    i_s = Image.open(
        os.path.join(image_dir, f"{i:06}_11.png")
    ).convert("RGB")
    i_t = Image.open(
        os.path.join(image_dir, f"{i:06}_10.png")
    ).convert("RGB")

    it_resize = resize_round_stride(i_t, fine_size, stride=8)
    it_d2 = resize_round_stride(i_t, fine_size // 2, stride=8)

    src = coarse.put(to_array(i_s))[None]
    tgt_org = to_array(i_t)
    tgt_resize = coarse.put(to_array(it_resize))[None]
    tgt_d2 = coarse.put(to_array(it_d2))[None]
    h_org, w_org = tgt_org.shape[:2]
    h_rs, w_rs = tgt_resize.shape[1:3]
    h_d2, w_d2 = tgt_d2.shape[1:3]

    coarse.set_pair(i_s, i_t)
    # per-pair deterministic RANSAC stream (order/shard independent)
    coarse.reseed(i, seed=seed)
    if bg_mask_fn is not None:
        bg = bg_mask_fn(os.path.join(image_dir, f"{i:06}_10.png"),
                        (h_org, w_org))
    else:
        bg = np.ones((h_org, w_org), np.float32)

    featt_d2 = fine_features(align_params, tgt_d2)
    featt_rs = fine_features(align_params, tgt_resize)

    mask = np.zeros((h_org, w_org), np.float32)
    hs, flows_d2, flows_full, matches_full = [], [], [], []
    nb_coarse = 0
    while True:
        fg = ((mask + (1.0 - bg)) > 0.5).astype(np.float32)
        H, _ = coarse.get_coarse(fg)
        if H is None:
            break
        h_grid_d2 = warp_grid(coarse.put(np.asarray(H))[None], h_d2, w_d2)
        h_grid_rs = warp_grid(coarse.put(np.asarray(H))[None], h_rs, w_rs)

        # pass 1: fine flow at half resolution
        out_d2 = pred_flow_mask(
            align_params, src, featt_d2, h_grid_d2, cycle_match=True,
        )
        # compose the d2 stride-8 flow into a new coarse grid at fineSize
        flow_coarse = _compose(out_d2["flow_down8"], h_grid_rs, h_rs, w_rs)

        # pass 2: fine at fineSize, composed at original resolution
        out_full = pred_flow_mask(
            align_params, src, featt_rs, flow_coarse, cycle_match=True,
            out_hw=(h_org, w_org),
        )
        match_fine = remove_small_cc(
            np.array(out_full["match"]), cc_th, match_th=0.99
        )

        accept = ((match_fine > 0.9999) * (1.0 - fg)).mean() > mask_region_th
        if accept or nb_coarse == 0:
            hs.append(H)
            flows_d2.append(np.asarray(out_d2["flow_down8"][0]))
            flows_full.append(np.asarray(out_full["flow_down8"][0]))
            matches_full.append(np.asarray(out_full["match_down8"][0]))
            nb_coarse += 1
            match_fine = match_fine * (1.0 - fg)
            mask = ((mask + match_fine) > 0.9999).astype(np.float32)
            if max_coarse is not None and nb_coarse > max_coarse:
                break
        else:
            break

    if hs:
        save_pair(
            out_dir, i,
            {
                "coarse_h": np.stack(hs),
                "fine_flow_down8": np.stack(flows_full),
                "fine_match_down8": np.stack(matches_full),
                "bg_mask": bg.astype(bool),
            },
            fine_flow_d2_down8=np.stack(flows_d2),
        )


def pooled_kitti_predict(
    image_dir,
    out_dir,
    resnet_params,
    align_params,
    n_devices,
    coarse_size=800,
    fine_size=650,
    nb_scale=3,
    scale_r=1.2,
    n_iter=50000,
    tolerance=0.05,
    mask_region_th=0.005,
    cc_th=0.01,
    begin_index=0,
    end_index=200,
    seed=1000,
    bg_mask_fn=None,
    max_coarse=None,
    adaptive_chunk=0,
    anchor_stride=0,
    relax_cells=0,
):
    """`predict_kitti` over a thread-per-device pool.

    KITTI's per-iteration accept decision runs host-side scipy
    connected-component cleanup, so the loop cannot be made device-resident
    like the other harnesses (eval/pooled.py); instead each local device
    gets a worker thread running the sequential per-pair procedure on its
    own pinned CoarseAligner, with pair indices statically striped across
    workers. Per-pair fold_in keys make the artifacts bit-identical to the
    sequential path for any pool size.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ransacflow_tpu.eval.pooled import make_device_pool

    pool = make_device_pool(
        resnet_params, align_params, n_devices,
        dict(nb_scale=nb_scale, n_iter=n_iter, tolerance=tolerance,
             min_size=coarse_size, scale_r=scale_r, resize_mode="min",
             seed=seed, adaptive_chunk=adaptive_chunk,
             anchor_stride=anchor_stride, relax_cells=relax_cells),
    )
    kwargs = dict(
        fine_size=fine_size, mask_region_th=mask_region_th, cc_th=cc_th,
        seed=seed, bg_mask_fn=bg_mask_fn, max_coarse=max_coarse,
    )

    def worker(w):
        aligner, ap = pool[w]
        for i in range(begin_index + w, end_index, n_devices):
            _predict_one_kitti_pair(
                aligner, ap, image_dir, out_dir, i, **kwargs
            )

    with ThreadPoolExecutor(max_workers=n_devices) as ex:
        list(ex.map(worker, range(n_devices)))


def compose_kitti_flow(art, ht, wt, th=1.0, cc_th=0.01, multi_h=True,
                       interpolate=False, only_coarse=False):
    """One pair's 3-level flow composition at GT resolution: the stride-8
    D2 flow into the homography grid, the full stride-8 flow into that,
    cycle matchability with cc cleanup, first-accept merge, optional
    nearest fill (reference getResults.py:95-151 getFlow_all /
    getFlow_onlyCoarse; golden-tested against the reference's own
    executing functions in tests/test_reference_metrics.py).

    Returns the absolute normalized sampling grid (ht, wt, 2).
    """
    n = art["coarse_h"].shape[0]
    h_grid = warp_grid(jnp.asarray(art["coarse_h"]), ht, wt)
    if only_coarse:
        return np.asarray(h_grid[0])
    grid = np.asarray(normalized_grid(ht, wt))
    # level 2: d2 stride-8 flow into the homography grid
    flow_d2 = _compose(
        jnp.asarray(art["fine_flow_d2_down8"]), h_grid, ht, wt
    )
    # level 3: full stride-8 flow into the d2-composed grid
    up = interpolate_bilinear(
        jnp.asarray(art["fine_flow_down8"]), ht, wt
    )
    flow_up = jnp.clip(up + grid[None], -1.0, 1.0)
    flow_full = grid_sample(flow_d2, flow_up)

    match_up = interpolate_bilinear(
        jnp.asarray(art["fine_match_down8"]), ht, wt
    )
    m12 = match_up[..., 0:1]
    m21 = grid_sample(match_up[..., 1:2], flow_up)
    in_b = (
        (flow_full[..., 0:1] >= -1) & (flow_full[..., 0:1] <= 1)
        & (flow_full[..., 1:2] >= -1) & (flow_full[..., 1:2] <= 1)
    )
    match = np.asarray(
        (m12 * m21 * in_b.astype(m12.dtype))[..., 0]
    )
    match = np.stack(
        [remove_small_cc(match[j], cc_th) for j in range(n)]
    )
    flows = np.clip(np.asarray(flow_full), -1, 1)
    merged = merge_multi_h(flows, match, th, multi_h)
    flow = merged["flow"]
    if interpolate:
        flow = fill_flow_nearest(flow, merged["match_binary"])
    return flow


def evaluate_kitti(
    pred_dir,
    gt_dir,
    n_pairs=200,
    multi_h=True,
    th=1.0,
    cc_th=0.01,
    interpolate=False,
    only_coarse=False,
):
    """Mean EPE over the training pairs. Returns (mean, per-pair list)."""
    epes = []
    for i in range(n_pairs):
        u, v, valid = read_kitti_flow(os.path.join(gt_dir, f"{i:06}_10.png"))
        ht, wt = u.shape
        grid = np.asarray(normalized_grid(ht, wt))

        art = load_pair(pred_dir, i)
        if art is None:
            flow = grid
        else:
            flow = compose_kitti_flow(
                art, ht, wt, th=th, cc_th=cc_th, multi_h=multi_h,
                interpolate=interpolate, only_coarse=only_coarse,
            )

        du = (flow[..., 0] - grid[..., 0]) * (wt - 1) / 2
        dv = (flow[..., 1] - grid[..., 1]) * (ht - 1) / 2
        err = np.sqrt((du - u) ** 2 + (dv - v) ** 2)
        epes.append(float((err * valid).sum() / valid.sum()))
    return float(np.mean(epes)), epes

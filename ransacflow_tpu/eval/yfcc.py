"""YFCC two-view geometry harness (pose accuracy via essential matrix).

Prediction mirrors evaluation/evalYFCC/evaluation.py:176-296: a 4-rotation
pre-test picks the target orientation with the most RANSAC inliers, then the
standard multi-homography loop runs on the chosen rotation; the winning
angle is stored with the artifact. Metrics mirror getResults.py:53-190:
composited flow -> pixel matches (target grid inverse-rotated), intrinsics
normalization, cv2 essential-matrix RANSAC + pose recovery, Acc@5/10/15/20
of max(rotation, translation) angular error (paper mAP = mean over
thresholds, evalYFCC/README.md "Metric").
"""

import os
import pickle

import numpy as np
from PIL import Image

from ransacflow_tpu.pipeline.multihomo import multi_homography_predict
from ransacflow_tpu.eval.artifacts import save_pair, load_pair
from ransacflow_tpu.eval.compose import reconstruct_flows, merge_multi_h

ANGLES = (0, 90, 180, 270)
SCENES = (
    "notre_dame_front_facade",
    "buckingham_palace",
    "reichstag",
    "sacre_coeur",
)


def pick_rotation(coarse, img_t, bg_mask_fn=None):
    """Try the target at 0/90/180/270 deg; keep the most-inlier rotation
    (reference: evaluation/evalYFCC/evaluation.py:190-209 — the foreground
    mask participates in each rotation's coarse fit).

    Args:
      coarse: CoarseAligner with set_source() done.
      bg_mask_fn: optional callable(angle, (Ht, Wt)) -> foreground mask for
        the rotated, resized target.
    Returns (angle, rotated PIL image, chosen index).
    """
    rotated = [img_t if a == 0 else img_t.rotate(a, expand=True) for a in ANGLES]
    n_inliers = []
    for j, img in enumerate(rotated):
        coarse.set_target(img)
        mask = None
        if bg_mask_fn is not None:
            bg = bg_mask_fn(ANGLES[j], coarse.tgt_array.shape[:2])
            mask = 1.0 - bg
        H, inlier = coarse.get_coarse(mask)
        n_inliers.append(0.0 if H is None else float(inlier.sum()))
    best = int(np.argmax(n_inliers))
    return ANGLES[best], rotated[best], best


def predict_yfcc(
    pairs_pkl,
    image_dir,
    out_dir,
    coarse,
    align_params,
    max_coarse=10,
    mask_region_th=0.01,
    begin_index=0,
    end_index=1000,
    bg_mask_fn=None,
):
    """Run prediction for one scene.

    Args:
      pairs_pkl: path to the scene's '<scene>-te-1000-pairs.pkl' (a list of
        [idxA, idxB] into images.txt, data/YFCC/pairs).
      image_dir: '<root>/<scene>/test' directory with images.txt.
      coarse: a configured CoarseAligner (minSize 480, 7 scales, 10k iters).
    """
    with open(pairs_pkl, "rb") as f:
        pairs = pickle.load(f)
    with open(os.path.join(image_dir, "images.txt")) as f:
        img_list = [l.strip() for l in f if l.strip()]

    for i in range(begin_index, min(end_index, len(pairs))):
        id_a, id_b = pairs[i]
        i_s = Image.open(os.path.join(image_dir, img_list[id_a])).convert("RGB")
        i_t = Image.open(os.path.join(image_dir, img_list[id_b])).convert("RGB")
        coarse.set_source(i_s)
        tgt_path = os.path.join(image_dir, img_list[id_b])
        rot_mask_fn = None
        if bg_mask_fn is not None:
            rot_mask_fn = lambda a, hw: bg_mask_fn(tgt_path, hw, a)
        angle, rotated, _ = pick_rotation(coarse, i_t, rot_mask_fn)
        coarse.set_target(rotated)
        bg = None
        if bg_mask_fn is not None:
            ht, wt = coarse.tgt_array.shape[:2]
            bg = bg_mask_fn(tgt_path, (ht, wt), angle)
        pred = multi_homography_predict(
            coarse, align_params, max_coarse=max_coarse,
            mask_region_th=mask_region_th, cycle_match=True, bg_mask=bg,
        )
        if pred is not None:
            save_pair(out_dir, i, pred, rotation=np.int32(angle))


def pooled_yfcc_predict(
    pairs_pkl,
    image_dir,
    out_dir,
    resnet_params,
    align_params,
    n_devices,
    coarse_kwargs,
    max_coarse=10,
    mask_region_th=0.01,
    begin_index=0,
    end_index=1000,
    bg_mask_fn=None,
    seed=0,
    batch_pairs=None,
):
    """`predict_yfcc` over a local device pool (eval/pooled.py layout).

    One CoarseAligner per device; pairs round-robin over the pool. The
    rotation pre-test dispatches all four rotations' RANSAC scores before
    reading any back (CoarseAligner.dispatch_inlier_count), and the
    multi-homography loop is the device-resident program, drained through a
    bounded pending queue — so every chip computes while the host does PIL
    decode/rotate for upcoming pairs.

    Artifacts are identical for any pool size: all PRNG keys derive from
    fold_in(PRNGKey(seed), pair_index), independent of dispatch order.
    (They differ from sequential `predict_yfcc`, whose keys advance one
    aligner's stream — same fitted geometry, different RANSAC draws.)

    batch_pairs > 1 additionally groups pairs whose resized shapes match
    (post-rotation) into single `_fused_multi_homo_batch` dispatches — same
    artifacts, one dispatch+readback per batch (eval/pooled.py
    BatchedMultiHomoDispatcher).
    """
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.pipeline.multihomo import multi_homography_dispatch
    from ransacflow_tpu.eval.pooled import (
        make_device_pool,
        PendingDrain,
        BatchedMultiHomoDispatcher,
    )

    with open(pairs_pkl, "rb") as f:
        pairs = pickle.load(f)
    with open(os.path.join(image_dir, "images.txt")) as f:
        img_list = [l.strip() for l in f if l.strip()]

    pool = make_device_pool(resnet_params, align_params, n_devices,
                            coarse_kwargs)
    base_key = jax.random.PRNGKey(seed)
    drain = PendingDrain(
        n_devices,
        lambda idx, art, angle: save_pair(out_dir, idx, art,
                                          rotation=np.int32(angle)),
    )
    batcher = None
    if batch_pairs and batch_pairs > 1:
        batcher = BatchedMultiHomoDispatcher(
            pool, drain, batch_pairs, max_coarse=max_coarse,
            mask_region_th=mask_region_th, cycle_match=True,
        )

    for k, i in enumerate(range(begin_index, min(end_index, len(pairs)))):
        id_a, id_b = pairs[i]
        i_s = Image.open(os.path.join(image_dir, img_list[id_a])).convert("RGB")
        i_t = Image.open(os.path.join(image_dir, img_list[id_b])).convert("RGB")
        if batcher is not None:
            # the proxy key fixes the slot BEFORE the rotation pre-test;
            # 0/180 vs 90/270 winners then land in different shape buckets
            # on the same slot
            proxy = (i_s.size, i_t.size)
            aligner, ap = pool[batcher.slot(proxy)]
        else:
            aligner, ap = pool[k % n_devices]
        tgt_path = os.path.join(image_dir, img_list[id_b])
        keys = jax.random.split(jax.random.fold_in(base_key, i), 5)

        aligner.set_source(i_s)
        rotated = [
            i_t if a == 0 else i_t.rotate(a, expand=True) for a in ANGLES
        ]
        scores = []
        for j, img in enumerate(rotated):
            aligner.set_target(img)
            mask = None
            if bg_mask_fn is not None:
                bg = bg_mask_fn(tgt_path, aligner.tgt_array.shape[:2],
                                ANGLES[j])
                mask = 1.0 - bg
            scores.append(aligner.dispatch_inlier_count(mask, keys[j]))
        counts = np.asarray(jnp.stack(scores))
        best = int(np.argmax(counts))
        angle = ANGLES[best]

        aligner.set_target(rotated[best])
        bg = None
        if bg_mask_fn is not None:
            ht, wt = aligner.tgt_array.shape[:2]
            bg = bg_mask_fn(tgt_path, (ht, wt), angle)
        if batcher is not None:
            batcher.add(proxy, i, bg, keys[4], angle)
            continue
        final, bgf = multi_homography_dispatch(
            aligner, ap, max_coarse=max_coarse,
            mask_region_th=mask_region_th, cycle_match=True, bg_mask=bg,
            key=keys[4],
        )
        drain.add(i, final, bgf, angle)
    if batcher is not None:
        batcher.flush()
    else:
        drain.flush()


def matches_from_flow(flow, match_binary, size_a, size_b, angle):
    """Dense flow -> pixel correspondence lists (getResults.py:53-71).

    The target grid is rotated back by `angle` so pts2 are in the original
    (unrotated) target frame.
    """
    w_a, h_a = size_a
    w_b, h_b = size_b
    gx, gy = np.meshgrid(np.arange(w_b), np.arange(h_b))
    grid_b = np.stack([gx, gy], axis=2)
    grid_b = np.rot90(grid_b, angle // 90)
    pts2 = grid_b[match_binary]
    pts1 = flow[match_binary].copy()
    pts1[:, 0] = (pts1[:, 0] + 1) * (w_a - 1) / 2
    pts1[:, 1] = (pts1[:, 1] + 1) * (h_a - 1) / 2
    return pts1, pts2


def norm_kp(org_size, new_size, K, kp):
    """Pixel coords -> normalized image-plane coords (getResults.py:29-50)."""
    w, h = org_size
    w_n, h_n = new_size
    cx = (w - 1.0) * 0.5 + K[0, 2]
    cy = (h - 1.0) * 0.5 + K[1, 2]
    fx, fy = K[0, 0], K[1, 1]
    cx *= w_n / w
    cy *= h_n / h
    fx *= w_n / w
    fy *= h_n / h
    return (kp - np.array([[cx, cy]])) / np.array([[fx, fy]])


def pose_error(R_gt, t_gt, R_pred, t_pred):
    """Angular errors of rotation and translation (getResults.py:114-129)."""
    t_gt = t_gt.flatten() / np.linalg.norm(t_gt)
    t_pred = t_pred.flatten() / np.linalg.norm(t_pred)
    R = R_gt @ R_pred.T
    err_q = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)) * 180 / np.pi
    err_t = np.arccos(np.clip(t_gt @ t_pred, -1, 1)) * 180 / np.pi
    return err_q, err_t


def estimate_pose(pts1, pts2, use_ransac=True, threshold=0.0005):
    """Essential-matrix estimation + pose recovery via OpenCV
    (getResults.py:75-111). Returns (R, t) or None."""
    import cv2

    if pts1.shape[0] < 5:
        return None
    if use_ransac:
        E, mask = cv2.findEssentialMat(pts1, pts2, method=cv2.RANSAC,
                                       threshold=threshold)
    else:
        E, mask = cv2.findFundamentalMat(pts1, pts2, method=cv2.FM_8POINT)
    # cv2 can emit degenerate output on near-collinear / duplicated
    # correspondences: None, an empty array, or a (3k, 3) stack with a
    # malformed row count. Fail soft like the None case — the caller maps
    # it to a 180-degree pose error (same as the reference's None path).
    if E is None or E.ndim != 2 or E.shape[0] < 3 or E.shape[0] % 3 != 0 \
            or E.shape[1] != 3:
        return None
    best = None
    best_inl = 0
    for e in np.split(E, len(E) // 3):
        n_inl, R, t, _ = cv2.recoverPose(e, pts1, pts2, mask=mask)
        if n_inl > best_inl:
            best_inl = n_inl
            best = (R, t)
    return best


def _resized_size(min_size, size, stride=16):
    from ransacflow_tpu.utils.image import min_size_shape_wh

    return min_size_shape_wh(size, min_size, stride)


def load_scene_calibration(scene_path, min_size=480):
    """Read per-image R/t/K/size from the YFCC calibration h5 files."""
    import h5py

    with open(os.path.join(scene_path, "images.txt")) as f:
        images = [l.strip() for l in f if l.strip()]
    with open(os.path.join(scene_path, "calibration.txt")) as f:
        calibs = [l.strip() for l in f if l.strip()]
    out = []
    for im, calib in zip(images, calibs):
        h5 = h5py.File(os.path.join(scene_path, calib), "r")
        out.append(
            {
                "R": np.array(h5["R"]),
                "t": np.array(h5["T"]).T,
                "K": np.array(h5["K"]),
                "org_size": np.array(h5["imsize"][0]).tolist(),
                "resized": _resized_size(
                    min_size, Image.open(os.path.join(scene_path, im)).size
                ),
            }
        )
    return out


def evaluate_yfcc(
    pred_dir,
    pairs_pkl,
    scene_path,
    multi_h=True,
    th=0.95,
    use_ransac=True,
    threshold=0.0005,
    min_size=480,
):
    """Per-pair max(R, t) angular errors + Acc@{5,10,15,20}.

    Returns (errors list, {acc5, acc10, acc15, acc20, mAP}).
    """
    with open(pairs_pkl, "rb") as f:
        pairs = pickle.load(f)
    calib = load_scene_calibration(scene_path, min_size)

    errors = []
    for i, (id_a, id_b) in enumerate(pairs):
        art = load_pair(pred_dir, i)
        if art is None:
            errors.append(180.0)
            continue
        h8, w8 = art["fine_flow_down8"].shape[1:3]
        flows, matches = reconstruct_flows(
            art["coarse_h"], art["fine_flow_down8"], art["fine_match_down8"],
            h8 * 8, w8 * 8, cycle_match=True,
        )
        merged = merge_multi_h(flows, matches, th, multi_h)
        match_binary = merged["match_binary"] & art["bg_mask"].astype(bool)

        pts1, pts2 = matches_from_flow(
            merged["flow"], match_binary,
            calib[id_a]["resized"], calib[id_b]["resized"],
            int(art.get("rotation", 0)),
        )
        if len(pts1) == 0:
            errors.append(180.0)
            continue
        n1 = norm_kp(calib[id_a]["org_size"], calib[id_a]["resized"],
                     calib[id_a]["K"], pts1)
        n2 = norm_kp(calib[id_b]["org_size"], calib[id_b]["resized"],
                     calib[id_b]["K"], pts2.astype(np.float64))
        pose = estimate_pose(n1, n2, use_ransac, threshold)
        if pose is None:
            errors.append(180.0)
            continue
        R_gt = calib[id_b]["R"] @ calib[id_a]["R"].T
        t_gt = calib[id_b]["t"] - R_gt @ calib[id_a]["t"]
        errors.append(max(pose_error(R_gt, t_gt, pose[0], pose[1])))

    err = np.array(errors)
    accs = {f"acc{t}": float((err < t).mean()) for t in (5, 10, 15, 20)}
    accs["mAP"] = float(np.mean([accs[f"acc{t}"] for t in (5, 10, 15, 20)]))
    return errors, accs

"""Eval subsystem tests: compose/merge semantics on synthetic data, plus
each harness end-to-end on tiny synthetic datasets (translation pairs with
border exclusion — see test_pipeline.py for why untrained features need
both)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ransacflow_tpu.models import init_resnet50_layer3
from ransacflow_tpu.pipeline import init_alignment_params
from ransacflow_tpu.eval import (
    merge_multi_h,
    remove_small_cc,
    fill_flow_nearest,
    save_pair,
    load_pair,
    check_complete,
    matches_from_flow,
    norm_kp,
    pose_error,
    estimate_pose,
)

H_IMG = W_IMG = 160
DX_PX, DY_PX = 16, 16  # one full feature cell each (stride 16)
BORDER = 32


@pytest.fixture(scope="module")
def resnet_params():
    return init_resnet50_layer3(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def align_params():
    return init_alignment_params(jax.random.PRNGKey(1))


def _blocky(rng, h, w):
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    return np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]


def _translation_pair(rng):
    """(src PIL, tgt PIL): tgt(x, y) = src(x + DX, y + DY)."""
    from ransacflow_tpu.ops import warp_grid, grid_sample

    src_arr = _blocky(rng, H_IMG, W_IMG)
    tx, ty = 2 * DX_PX / W_IMG, 2 * DY_PX / H_IMG
    H21 = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H21)[None], H_IMG, W_IMG)
    tgt_arr = np.asarray(grid_sample(jnp.asarray(src_arr)[None], g))[0]
    to_img = lambda a: Image.fromarray(
        (np.clip(a, 0, 1) * 255).astype(np.uint8))
    return to_img(src_arr), to_img(tgt_arr)


def _fg_border_mask(h, w, border=BORDER):
    m = np.zeros((h, w), np.float32)
    m[border:-border, border:-border] = 1.0
    return m


# ---------------------------------------------------------------------------
# compose / merge / artifact primitives
# ---------------------------------------------------------------------------


def test_merge_multi_h_first_accept():
    flows = np.stack([np.full((4, 4, 2), 0.1), np.full((4, 4, 2), 0.9)])
    matches = np.zeros((2, 4, 4))
    matches[0, :2] = 1.0   # first H matched on top half
    matches[1] = 1.0       # second H matched everywhere
    out = merge_multi_h(flows, matches, th=1.0)
    # top half keeps H0's flow, bottom half gets H1's
    assert np.all(out["flow"][:2] == 0.1)
    assert np.all(out["flow"][2:] == 0.9)
    assert out["match_binary"].all()
    # multi_h off: only the first H counts
    out1 = merge_multi_h(flows, matches, th=1.0, multi_h=False)
    assert np.all(out1["flow"] == 0.1)
    assert not out1["match_binary"][2:].any()


def test_merge_aggregate_match():
    flows = np.zeros((2, 3, 3, 2))
    matches = np.stack([np.full((3, 3), 0.2), np.full((3, 3), 0.97)])
    out = merge_multi_h(flows, matches, th=0.95, aggregate_match=True)
    np.testing.assert_allclose(out["match"], 0.97)


def test_remove_small_cc():
    m = np.zeros((20, 20), np.float32)
    m[:10, :10] = 1.0      # big component (25%)
    m[15, 15] = 1.0        # single pixel (0.25%)
    out = remove_small_cc(m.copy(), cc_th=0.01)
    assert out[5, 5] == 1.0
    assert out[15, 15] == 0.0
    # cc_th=0 disables cleanup
    np.testing.assert_array_equal(remove_small_cc(m.copy(), 0.0), m)


def test_fill_flow_nearest():
    flow = np.zeros((4, 4, 2))
    flow[0, 0] = [1.0, 2.0]
    match = np.zeros((4, 4), bool)
    match[0, 0] = True
    out = fill_flow_nearest(flow, match)
    np.testing.assert_allclose(out[3, 3], [1.0, 2.0])


def test_artifact_roundtrip(tmp_path):
    pred = {
        "coarse_h": np.eye(3)[None],
        "fine_flow_down8": np.zeros((1, 4, 5, 2)),
        "fine_match_down8": np.ones((1, 4, 5, 2)),
        "bg_mask": np.ones((32, 40), bool),
    }
    save_pair(str(tmp_path), 3, pred, rotation=np.int32(90))
    art = load_pair(str(tmp_path), 3)
    assert int(art["rotation"]) == 90
    np.testing.assert_array_equal(art["coarse_h"], pred["coarse_h"])
    assert load_pair(str(tmp_path), 99) is None
    assert check_complete(str(tmp_path), [3, 99]) == [99]


# ---------------------------------------------------------------------------
# HPatches harness end-to-end (synthetic translation scene)
# ---------------------------------------------------------------------------


def _write_hpatches_dataset(tmp_path, rng):
    import pandas as pd

    src, tgt = _translation_pair(rng)
    obj_dir = tmp_path / "imgs" / "obj1"
    os.makedirs(obj_dir)
    src.save(obj_dir / "1.ppm")
    tgt.save(obj_dir / "2.ppm")
    # pixel-space H mapping source px -> target px: x_t = x_s - DX
    H_px = np.array(
        [[1, 0, -DX_PX], [0, 1, -DY_PX], [0, 0, 1]], np.float64
    )
    row = {
        "obj": "obj1", "im1": 1, "im2": 2,
        "Him": H_IMG, "Wim": W_IMG,
    }
    for r in range(3):
        for c in range(3):
            row[f"h{r}{c}"] = H_px[r, c]
    csv_dir = tmp_path / "csv"
    os.makedirs(csv_dir)
    pd.DataFrame([row]).to_csv(csv_dir / "hpatches_1_2.csv", index=False)
    return str(csv_dir), str(tmp_path / "imgs")


def test_hpatches_harness_end_to_end(tmp_path, rng, resnet_params,
                                     align_params):
    from ransacflow_tpu.eval import predict_hpatches, evaluate_hpatches

    csv_dir, image_dir = _write_hpatches_dataset(tmp_path, rng)
    pred_dir = str(tmp_path / "pred")
    predict_hpatches(
        csv_dir, image_dir, pred_dir, resnet_params, align_params,
        scenes=(2,), min_size=H_IMG, nb_scale=1, n_iter=3000,
        max_coarse=1,
        bg_mask_fn=lambda path, hw: _fg_border_mask(*hw),
    )
    assert load_pair(os.path.join(pred_dir, "2"), 0) is not None
    res, per_pair = evaluate_hpatches(
        pred_dir, csv_dir, image_dir, scenes=(2,), out_size=160,
        only_coarse=True,
    )
    # coarse-only AEPE on an exactly-recoverable translation: ~0 px
    assert res[2] < 1.0, res
    # with the (untrained) fine stage the flow stays in a sane range
    res_fine, _ = evaluate_hpatches(
        pred_dir, csv_dir, image_dir, scenes=(2,), out_size=160, th=0.0,
    )
    assert res_fine[2] < 25.0, res_fine


def test_hpatches_fused_flag_equivalent(tmp_path, rng, resnet_params,
                                        align_params):
    """`--fused` (CLI sugar for n_devices=1, cli/common.resolve_n_devices)
    routes prediction through the device-resident fused loop. Its artifacts
    are NOT bit-identical to the host loop by design (documented PRNG fold
    + fp64-polish divergences, pipeline/multihomo.py:283-305), so assert
    geometric equivalence: same artifact schema/shapes and the same
    exactly-recoverable translation (coarse AEPE ~0 px on both paths)."""
    from types import SimpleNamespace
    from ransacflow_tpu.cli.common import resolve_n_devices
    from ransacflow_tpu.eval import predict_hpatches, evaluate_hpatches

    # the flag maps to a 1-device pool exactly when no pool size is given
    assert resolve_n_devices(
        SimpleNamespace(nDevices=None, fused=True)) == 1
    assert resolve_n_devices(
        SimpleNamespace(nDevices=None, fused=False)) is None
    assert resolve_n_devices(
        SimpleNamespace(nDevices=4, fused=True)) == 4

    csv_dir, image_dir = _write_hpatches_dataset(tmp_path, rng)
    outs = {}
    for tag, n_dev in (("host", None), ("fused", 1)):
        pred_dir = str(tmp_path / f"pred_{tag}")
        predict_hpatches(
            csv_dir, image_dir, pred_dir, resnet_params, align_params,
            scenes=(2,), min_size=H_IMG, nb_scale=1, n_iter=3000,
            max_coarse=1, n_devices=n_dev,
            bg_mask_fn=lambda path, hw: _fg_border_mask(*hw),
        )
        arts = load_pair(os.path.join(pred_dir, "2"), 0)
        assert arts is not None
        res, _ = evaluate_hpatches(
            pred_dir, csv_dir, image_dir, scenes=(2,), out_size=160,
            only_coarse=True,
        )
        outs[tag] = (arts, res[2])

    host_arts, host_aepe = outs["host"]
    fused_arts, fused_aepe = outs["fused"]
    assert set(host_arts.keys()) == set(fused_arts.keys())
    for k in host_arts:
        assert np.shape(host_arts[k]) == np.shape(fused_arts[k]), k
    # both paths recover the planted translation to sub-pixel coarse AEPE
    assert host_aepe < 1.0 and fused_aepe < 1.0, (host_aepe, fused_aepe)


# ---------------------------------------------------------------------------
# Corr harness end-to-end
# ---------------------------------------------------------------------------


def test_corr_harness_end_to_end(tmp_path, rng, resnet_params, align_params):
    import pandas as pd
    from ransacflow_tpu.eval import predict_corr, evaluate_corr

    src, tgt = _translation_pair(rng)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    src.save(img_dir / "a.jpg")
    tgt.save(img_dir / "b.jpg")
    # annotated correspondences on the central region
    n = 12
    xt = rng.randint(BORDER, W_IMG - BORDER, n)
    yt = rng.randint(BORDER, H_IMG - BORDER, n)
    xs, ys = xt + DX_PX, yt + DY_PX
    df = pd.DataFrame([
        {
            "scene": "/", "source_image": "a.jpg", "target_image": "b.jpg",
            "XA": ";".join(map(str, xs)), "YA": ";".join(map(str, ys)),
            "XB": ";".join(map(str, xt)), "YB": ";".join(map(str, yt)),
        }
    ])
    csv_path = str(tmp_path / "pairs.csv")
    df.to_csv(csv_path, index=False)
    pred_dir = str(tmp_path / "pred")
    predict_corr(
        csv_path, str(img_dir), pred_dir, resnet_params, align_params,
        min_size=H_IMG, nb_scale=1, n_iter=3000, max_coarse=0,
        bg_mask_fn=lambda row, hw: _fg_border_mask(*hw),
    )
    res = evaluate_corr(pred_dir, csv_path, str(img_dir), min_size=H_IMG)
    prec, total = res[0.0]
    assert total == n
    assert prec[-1] > 0.8  # precision @36px with near-exact coarse


# ---------------------------------------------------------------------------
# YFCC geometry utilities
# ---------------------------------------------------------------------------


def test_matches_from_flow_rotation():
    flow = np.zeros((4, 4, 2), np.float32)
    flow[1, 2] = [0.0, 0.0]  # source center
    mb = np.zeros((4, 4), bool)
    mb[1, 2] = True
    pts1, pts2 = matches_from_flow(flow, mb, (4, 4), (4, 4), 0)
    np.testing.assert_allclose(pts1[0], [1.5, 1.5])
    np.testing.assert_allclose(pts2[0], [2, 1])
    # 90-deg rotation: target grid rotated back
    pts1r, pts2r = matches_from_flow(flow, mb, (4, 4), (4, 4), 90)
    assert pts2r[0].tolist() != pts2[0].tolist()


def test_norm_kp_identity_K():
    K = np.eye(3)
    kp = np.array([[3.0, 1.0]])
    out = norm_kp((8, 8), (8, 8), K, kp)
    np.testing.assert_allclose(out, (kp - 3.5) / 1.0)


def test_pose_error_zero_for_identical():
    R = np.eye(3)
    t = np.array([1.0, 0, 0])
    eq, et = pose_error(R, t, R, t)
    assert eq < 1e-3 and et < 1e-3


def test_estimate_pose_recovers_synthetic_motion(rng):
    """Classic two-view: random 3D points seen by two cameras."""
    n = 200
    pts3d = np.stack([
        rng.rand(n) * 2 - 1, rng.rand(n) * 2 - 1, rng.rand(n) * 2 + 4
    ], axis=1)
    angle = 0.1
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.5, 0.1, 0.0])
    p1 = pts3d[:, :2] / pts3d[:, 2:]
    cam2 = (R @ pts3d.T).T + t
    p2 = cam2[:, :2] / cam2[:, 2:]
    pose = estimate_pose(p1, p2, use_ransac=True, threshold=0.001)
    assert pose is not None
    eq, et = pose_error(R, t, pose[0], pose[1])
    assert eq < 1.0 and et < 2.0


def test_pick_rotation_finds_prerotated_target(rng, resnet_params):
    from ransacflow_tpu.pipeline import CoarseAligner
    from ransacflow_tpu.eval import pick_rotation

    src, tgt = _translation_pair(rng)
    tgt_rot = tgt.rotate(90, expand=True)  # needs 270 more to align
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=1500,
                           min_size=H_IMG)
    coarse.set_source(src)
    angle, rotated, _ = pick_rotation(
        coarse, tgt_rot, bg_mask_fn=lambda a, hw: _fg_border_mask(*hw)
    )
    assert angle == 270


# ---------------------------------------------------------------------------
# KITTI harness end-to-end
# ---------------------------------------------------------------------------


def test_kitti_harness_end_to_end(tmp_path, rng, resnet_params, align_params):
    import cv2
    from ransacflow_tpu.eval import predict_kitti, evaluate_kitti

    src, tgt = _translation_pair(rng)
    img_dir = tmp_path / "image_2"
    gt_dir = tmp_path / "flow_noc"
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    src.save(img_dir / "000000_11.png")
    tgt.save(img_dir / "000000_10.png")
    # GT: constant flow (DX, DY), valid everywhere; BGR = (valid, v, u)
    u = np.full((H_IMG, W_IMG), DX_PX * 64.0 + 32768, np.uint16)
    v = np.full((H_IMG, W_IMG), DY_PX * 64.0 + 32768, np.uint16)
    ok = np.ones((H_IMG, W_IMG), np.uint16)
    cv2.imwrite(str(gt_dir / "000000_10.png"), np.stack([ok, v, u], axis=-1))

    pred_dir = str(tmp_path / "pred")
    predict_kitti(
        str(img_dir), pred_dir, resnet_params, align_params,
        coarse_size=H_IMG, fine_size=128, nb_scale=1, n_iter=3000,
        end_index=1, max_coarse=0,
        bg_mask_fn=lambda path, hw: _fg_border_mask(*hw),
    )
    art = load_pair(pred_dir, 0)
    assert art is not None and "fine_flow_d2_down8" in art
    mean_epe, per = evaluate_kitti(pred_dir, str(gt_dir), n_pairs=1,
                                   only_coarse=True)
    assert mean_epe < 1.5, mean_epe
    mean_fine, _ = evaluate_kitti(pred_dir, str(gt_dir), n_pairs=1,
                                  th=0.0, cc_th=0.0)
    assert np.isfinite(mean_fine)


def test_kitti_pooled_matches_sequential(tmp_path, rng, resnet_params,
                                         align_params):
    """pooled_kitti_predict (thread-per-device pool) produces bit-identical
    artifacts to predict_kitti: per-pair fold_in keys make the RANSAC
    stream independent of worker striping and thread timing."""
    from ransacflow_tpu.eval import predict_kitti, pooled_kitti_predict
    from ransacflow_tpu.eval.artifacts import load_pair

    img_dir = tmp_path / "image_2"
    os.makedirs(img_dir)
    for i in range(2):
        src, tgt = _translation_pair(rng)
        src.save(img_dir / f"{i:06}_11.png")
        tgt.save(img_dir / f"{i:06}_10.png")

    kwargs = dict(
        coarse_size=H_IMG, fine_size=128, nb_scale=1, n_iter=2000,
        end_index=2, max_coarse=0,
        bg_mask_fn=lambda path, hw: _fg_border_mask(*hw),
    )
    seq_dir = str(tmp_path / "seq")
    pool_dir = str(tmp_path / "pool")
    predict_kitti(str(img_dir), seq_dir, resnet_params, align_params,
                  **kwargs)
    pooled_kitti_predict(str(img_dir), pool_dir, resnet_params, align_params,
                         2, **kwargs)
    for i in range(2):
        a = load_pair(seq_dir, i)
        b = load_pair(pool_dir, i)
        assert a is not None and b is not None
        for k in ("coarse_h", "fine_flow_down8", "fine_match_down8",
                  "fine_flow_d2_down8", "bg_mask"):
            np.testing.assert_array_equal(a[k], b[k])


def test_aachen_export(tmp_path, rng, resnet_params, align_params):
    from ransacflow_tpu.pipeline import CoarseAligner
    from ransacflow_tpu.eval import export_correspondences, write_match_file

    src, tgt = _translation_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=2000,
                           min_size=H_IMG)
    src.save(tmp_path / "q.jpg")
    tgt.save(tmp_path / "d.jpg")
    corr = export_correspondences(
        coarse, align_params, str(tmp_path / "q.jpg"), str(tmp_path / "d.jpg"),
        match_th=0.0, max_coarse=0,
    )
    assert corr is not None
    n = len(corr["query_xy"])
    assert n > 0 and corr["db_xy"].shape == (n, 2)
    write_match_file(str(tmp_path / "matches.txt"), "q_d", corr)
    lines = open(tmp_path / "matches.txt").read().splitlines()
    assert lines[0].startswith("# q_d") and len(lines) == n + 1


def test_yfcc_harness_end_to_end(tmp_path, rng, resnet_params, align_params):
    """Full YFCC glue: predict (rotation pre-test + artifacts) ->
    evaluate (calibration h5, matches, essential matrix) on a synthetic
    3D scene rendered into two views."""
    import pickle
    import h5py
    import jax
    from ransacflow_tpu.pipeline import CoarseAligner
    from ransacflow_tpu.eval import predict_yfcc, evaluate_yfcc
    from ransacflow_tpu.eval.artifacts import load_pair as _load

    scene = tmp_path / "scene" / "test"
    os.makedirs(scene)
    # two views of a textured plane: pure in-plane translation => the pair
    # is exactly homography-related AND has consistent (R=I, t) geometry
    src, tgt = _translation_pair(rng)
    src.save(scene / "im0.jpg")
    tgt.save(scene / "im1.jpg")
    with open(scene / "images.txt", "w") as f:
        f.write("im0.jpg\nim1.jpg\n")
    with open(scene / "calibration.txt", "w") as f:
        f.write("calib0.h5\ncalib1.h5\n")
    # camera: f=200, principal point at center (K offsets are relative, see
    # norm_kp); plane at z=5, camera 2 shifted opposite the image motion
    f_len = 200.0
    K = np.array([[f_len, 0, 0], [0, f_len, 0], [0, 0, 1.0]])
    t1 = np.zeros((3, 1))
    # target sees source content shifted by (-DX, -DY) px at depth 5
    t2 = np.array([[DX_PX * 5 / f_len], [DY_PX * 5 / f_len], [0.0]])
    for name, t in (("calib0.h5", t1), ("calib1.h5", t2)):
        with h5py.File(scene / name, "w") as h5:
            h5["R"] = np.eye(3)
            h5["T"] = t.T
            h5["K"] = K
            h5["imsize"] = np.array([[W_IMG, H_IMG]])

    pairs_pkl = tmp_path / "pairs.pkl"
    with open(pairs_pkl, "wb") as f:
        pickle.dump([[0, 1]], f)

    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=3000,
                           min_size=H_IMG, seed=5)
    out_dir = str(tmp_path / "pred")
    predict_yfcc(
        str(pairs_pkl), str(scene), out_dir, coarse, align_params,
        max_coarse=0, end_index=1,
        bg_mask_fn=lambda path, hw, angle: _fg_border_mask(*hw),
    )
    art = _load(out_dir, 0)
    assert art is not None
    assert int(art["rotation"]) == 0  # unrotated target must win

    errors, accs = evaluate_yfcc(
        out_dir, str(pairs_pkl), str(scene), th=0.0, min_size=H_IMG,
        use_ransac=True, threshold=0.001,
    )
    assert len(errors) == 1 and np.isfinite(errors[0])
    assert set(accs) == {"acc5", "acc10", "acc15", "acc20", "mAP"}


# ---------------------------------------------------------------------------
# strict-ref-bug accounting + estimate_pose hardening (round-3 items)
# ---------------------------------------------------------------------------


def _write_corr_accounting_setup(tmp_path, rng):
    """2-row CSV over a 32px pair; artifact only for row 0, whose left half
    has low matchability (so th=0.0 and th=0.5 accumulators differ and the
    reference's loop-variable leak is observable)."""
    import pandas as pd

    size = 32
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir, exist_ok=True)
    arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(img_dir / "a.jpg")
    Image.fromarray(arr).save(img_dir / "b.jpg")
    # 2 points in the low-match left half, 2 in the high-match right half
    xt = np.array([4, 8, 24, 28])
    yt = np.array([16, 16, 16, 16])
    row = {
        "scene": "/", "source_image": "a.jpg", "target_image": "b.jpg",
        "XA": ";".join(map(str, xt)), "YA": ";".join(map(str, yt)),
        "XB": ";".join(map(str, xt)), "YB": ";".join(map(str, yt)),
    }
    csv_path = str(tmp_path / "pairs.csv")
    pd.DataFrame([row, dict(row)]).to_csv(csv_path, index=False)

    pred_dir = str(tmp_path / "pred")
    match = np.ones((1, 4, 4, 2), np.float32)
    match[:, :, :2, :] = 0.1  # left half unmatchable
    art = {
        "coarse_h": np.eye(3, dtype=np.float32)[None],
        "fine_flow_down8": np.zeros((1, 4, 4, 2), np.float32),
        "fine_match_down8": match,
        "bg_mask": np.ones((size, size), np.float32),
    }
    save_pair(pred_dir, 0, art)  # row 1 (index 1) stays missing
    return csv_path, str(img_dir), pred_dir, size


def test_corr_strict_ref_bug_accounting(tmp_path, rng):
    from ransacflow_tpu.eval import evaluate_corr

    csv_path, img_dir, pred_dir, size = _write_corr_accounting_setup(
        tmp_path, rng)
    kwargs = dict(min_size=size, matchability_th=(0.0, 0.5))

    fixed = evaluate_corr(pred_dir, csv_path, img_dir, **kwargs)
    # documented-fix mode: the missing pair grows EVERY denominator
    np.testing.assert_allclose(fixed[0.0][0], 4 / 8)
    assert fixed[0.0][1] == 8
    np.testing.assert_allclose(fixed[0.5][0], 2 / 6)
    assert fixed[0.5][1] == 6

    strict = evaluate_corr(pred_dir, csv_path, img_dir,
                           strict_ref_bug=True, **kwargs)
    # getResults.py:277: th=0's numerator is OVERWRITTEN with the last
    # threshold's accumulator (2 hits, not 4); only th=0's denominator grows
    np.testing.assert_allclose(strict[0.0][0], 2 / 8)
    assert strict[0.0][1] == 8
    # th>0 denominators do NOT grow on missing pairs in the reference
    np.testing.assert_allclose(strict[0.5][0], 2 / 2)
    assert strict[0.5][1] == 2


def test_corr_strict_ref_bug_edge_cases(tmp_path, rng):
    from ransacflow_tpu.eval import evaluate_corr

    csv_path, img_dir, pred_dir, size = _write_corr_accounting_setup(
        tmp_path, rng)
    # reference indexes the literal key 0 -> KeyError without it
    with pytest.raises(KeyError):
        evaluate_corr(pred_dir, csv_path, img_dir, min_size=size,
                      matchability_th=(0.5,), strict_ref_bug=True)
    # missing pair BEFORE any complete pair: the reference's `th` is an
    # undefined name at getResults.py:277
    empty_pred = str(tmp_path / "empty_pred")
    with pytest.raises(NameError):
        evaluate_corr(empty_pred, csv_path, img_dir, min_size=size,
                      matchability_th=(0.0, 0.5), strict_ref_bug=True)


def test_estimate_pose_degenerate_inputs(rng, monkeypatch):
    """cv2 edge cases fail soft to None instead of raising
    (round-2 verdict weak #7)."""
    # all-identical correspondences: must not raise
    p = np.tile(np.array([[0.1, 0.2]]), (10, 1))
    result = estimate_pose(p, p.copy(), use_ransac=True)
    assert result is None or len(result) == 2
    # exactly collinear points
    t = np.linspace(0, 1, 10)
    col1 = np.stack([t, t], axis=1)
    col2 = np.stack([t + 0.1, t], axis=1)
    result = estimate_pose(col1, col2, use_ransac=True)
    assert result is None or len(result) == 2

    # malformed essential-matrix stacks from cv2 -> None, not a crash
    import cv2

    for bad_E in (np.ones((4, 3)), np.ones((1, 9)), np.ones((0, 3)),
                  np.ones(9)):
        monkeypatch.setattr(
            cv2, "findEssentialMat",
            lambda *a, _e=bad_E, **k: (_e, np.ones((10, 1), np.uint8)),
        )
        assert estimate_pose(col1, col2, use_ransac=True) is None

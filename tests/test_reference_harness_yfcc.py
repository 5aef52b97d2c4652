"""Full-harness YFCC parity proxy against the reference's executing code.

The HPatches twin (tests/test_reference_harness.py) covers the cached-match
coarse variant and the AEPE metric; this module covers everything the YFCC
harness does differently, executed from the reference's OWN modules:

- the setSource/setTarget split with per-call masked-feature RE-matching
  inside getCoarse (evaluation/evalYFCC/coarseAlignFeatMatch.py:103-196:
  ``featt * MtTensor`` then mutualMatching — not the cached-index filter),
  plus the InlierMask image built from the winner's inlier target cells;
- the 4-rotation pre-test that picks the target orientation with the most
  RANSAC inliers (evaluation/evalYFCC/evaluation.py:190-209);
- the cycle-product PredFlowMask variant (``match12 * grid_sample(match21)``,
  evaluation/evalYFCC/evaluation.py:32-62);
- the pose metric chain on identical artifacts: _getFlow -> matches_from_flow
  -> norm_kp -> cv2 essential matrix -> evaluate_R_t
  (evaluation/evalYFCC/getResults.py:29-190,298-331).

Determinism follows the HPatches proxy: RANSAC minimal sets are chosen once
from the mutual matches COMMON to both frameworks and injected into both
(`injected_samples` on ours, a patched `torch.randint` with nbIter=1 on the
reference's); matchability is kept inside (0.2, 0.8) so the matched-region
accumulator never trips and the per-iteration re-matching sees the same
foreground mask every call.
"""

import os
import pickle

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ref_modules import (
    load_reference_modules,
    reference_available,
    extract_reference_functions,
    F12,
)
from test_eval import _translation_pair, _fg_border_mask, H_IMG, W_IMG
from test_models import TorchResNet50Trunk, _randomize_bn_stats
from test_reference_harness import (
    _to_tensor,
    _warp_grid_torch,
    _choose_sets,
    _TorchCoarseMirror,
)

from ransacflow_tpu.models import state_dict_to_tree, load_resnet50_trunk
from ransacflow_tpu.ops.homography import dlt_homography_np
from ransacflow_tpu.pipeline.coarse import (
    CoarseAligner,
    _match_masked,
    _mask_to_cells,
)
from ransacflow_tpu.pipeline.multihomo import multi_homography_predict
from ransacflow_tpu.eval.artifacts import save_pair
from ransacflow_tpu.eval.yfcc import (
    pick_rotation,
    evaluate_yfcc,
    ANGLES,
)
from ransacflow_tpu.utils.image import resize_min_size, scale_list

pytestmark = [
    pytest.mark.slow,  # reference-executed full-harness proxies
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

MIN_SIZE = H_IMG  # 160; square so every rotation keeps the shape
NB_SCALE = 3
SCALE_R = 1.2
MAX_COARSE = 2  # 3 homographies per pair


class _TorchYFCCMirror(_TorchCoarseMirror):
    """evalYFCC/coarseAlignFeatMatch.py:103-196 executed with the
    reference's outil and a golden torch trunk: setSource/setTarget split,
    matching re-done on masked target features inside every getCoarse, and
    the (H, InlierMask) return pair."""

    def set_source(self, i_s):
        outil = self.outil
        feats, Ws, Hs = [], [], []
        imgs = [
            resize_min_size(i_s, int(self.min_size * s)) for s in self.scales
        ]
        self.Is = imgs[len(self.scales) // 2]
        self.IsTensor = _to_tensor(self.Is)
        for im in imgs:
            f = self._feat(im)
            W, H = outil.getWHTensor(f)
            feats.append(f.contiguous().view(1024, -1))
            Ws.append(W)
            Hs.append(H)
        self.bank = torch.cat(feats, dim=1)
        self.W1, self.H1 = torch.cat(Ws), torch.cat(Hs)

    def set_target(self, i_t):
        outil = self.outil
        self.It = resize_min_size(i_t, self.min_size)
        self.ItTensor = _to_tensor(self.It)
        self.featt4d = self._feat(self.It)  # kept 4-D for per-call masking
        self.Wt, self.Ht = outil.getWHTensor(self.featt4d)
        self.fh, self.fw = self.featt4d.size(2), self.featt4d.size(3)

    def _matches(self, fg_mask):
        """getCoarse's matching block (coarseAlignFeatMatch.py:160-169):
        mask -> feature grid, zero the masked target features, re-match."""
        MtExtend = torch.from_numpy(
            (1 - fg_mask).astype(np.float32)
        )[None, None]
        MtTensor = F.interpolate(
            MtExtend, size=(self.fh, self.fw), mode="bilinear",
            align_corners=False,
        )
        MtTensor = (MtTensor > 0.5).float()
        featt = (self.featt4d * MtTensor).contiguous().view(1024, -1)
        return self.outil.mutualMatching(self.bank, featt)

    def pair_set(self, fg_mask):
        i1, i2 = self._matches(fg_mask)
        return set(zip(i1.numpy().tolist(), i2.numpy().tolist()))

    def get_coarse(self, fg_mask, injected_tgt_cells):
        """coarseAlignFeatMatch.py:153-196 with the minimal set injected
        (target-cell ids -> positions in this call's fresh match list)."""
        outil = self.outil
        index1, index2 = self._matches(fg_mask)
        W1m, H1m = self.W1[index1], self.H1[index1]
        W2m, H2m = self.Wt[index2], self.Ht[index2]
        ones = torch.ones(W1m.size(0))
        match1 = torch.stack([H1m, W1m, ones], dim=1)
        match2 = torch.stack([H2m, W2m, ones], dim=1)

        cells = index2.numpy()
        row = []
        for cell in injected_tgt_cells:
            pos = np.nonzero(cells == cell)[0]
            assert len(pos) == 1, "injected match not valid on torch side"
            row.append(int(pos[0]))
        sample = np.asarray([row], np.int64)

        orig_randint = torch.randint
        torch.randint = lambda high, size, device=None: torch.from_numpy(
            sample
        )
        try:
            best, _, is_inlier, _ = outil.RANSAC(
                1, match1, match2, 0.05, 4, outil.Homography
            )
        finally:
            torch.randint = orig_randint
        if best is None:
            return None, None
        index2_inlier = index2.numpy()[is_inlier]
        inlier_mask = np.zeros((self.fh, self.fw), np.float32)
        rows = ((self.Wt[index2_inlier] / 2 + 0.5) * self.fh).numpy()
        cols = ((self.Ht[index2_inlier] / 2 + 0.5) * self.fw).numpy()
        inlier_mask[rows.astype(np.int64), cols.astype(np.int64)] = 1
        return best.astype(np.float32), inlier_mask


class _RecordingInjector(CoarseAligner):
    """CoarseAligner (rematch mode) that consumes preset minimal sets in
    get_coarse call order and records every (H, inlier_count) result — the
    rotation pre-test runs through the REAL `pick_rotation`."""

    def set_injected(self, sets):
        self._inj_sets = [np.asarray([s], np.int32) for s in sets]
        self._inj_i = 0
        self.history = []

    def get_coarse(self, exclusion_mask=None, injected_samples=None):
        s = self._inj_sets[self._inj_i]
        self._inj_i += 1
        H, inlier = super().get_coarse(exclusion_mask, injected_samples=s)
        self.history.append(
            (H, 0.0 if inlier is None else float(inlier.sum()))
        )
        return H, inlier


def _pred_flow_mask_torch_cycle(nets, IsTensor, featt, flowCoarse, grid):
    """evaluation/evalYFCC/evaluation.py:32-62 executed with the reference's
    own modules — the cycle-product variant (match12 * sampled match21)."""
    IsSample = F.grid_sample(IsTensor, flowCoarse, align_corners=True)
    featsSample = F.normalize(nets["netFeatCoarse"](IsSample))

    corr12 = nets["netCorr"](featt, featsSample)
    flowDown8 = nets["netFlowCoarse"](corr12, False)
    match12Down8 = nets["netMatch"](corr12, False)

    corr21 = nets["netCorr"](featsSample, featt)
    match21Down8 = nets["netMatch"](corr21, False)

    hh, ww = grid.size(1), grid.size(2)
    match12 = F.interpolate(match12Down8, size=(hh, ww), mode="bilinear",
                            align_corners=False)
    match21 = F.interpolate(match21Down8, size=(hh, ww), mode="bilinear",
                            align_corners=False)
    flowUp = F.interpolate(flowDown8, size=(hh, ww), mode="bilinear",
                           align_corners=False)
    flowUp = flowUp.permute(0, 2, 3, 1)
    flowUp = torch.clamp(flowUp + grid, min=-1, max=1)

    flow12 = F.grid_sample(
        flowCoarse.permute(0, 3, 1, 2), flowUp, align_corners=True
    ).permute(0, 2, 3, 1).contiguous()

    match = match12 * F.grid_sample(match21, flowUp, align_corners=True)
    in_b = (
        ((flow12.narrow(3, 0, 1) >= -1) & (flow12.narrow(3, 0, 1) <= 1)).float()
        * ((flow12.narrow(3, 1, 1) >= -1) & (flow12.narrow(3, 1, 1) <= 1)).float()
    ).permute(0, 3, 1, 2)
    match = match * in_b
    match = match[0, 0].numpy()
    return (
        flow12,
        match,
        flowDown8.numpy(),
        torch.cat((match12Down8, match21Down8), dim=1).numpy(),
    )


def _run_torch_yfcc_loop(mirror, nets, fg_bg, sets):
    """evaluation/evalYFCC/evaluation.py:219-283 (the per-pair loop after
    the rotation choice; It_bg = `fg_bg`, 1 = usable foreground)."""
    ith, itw = mirror.ItTensor.shape[2:]
    with torch.no_grad():
        featt = F.normalize(nets["netFeatCoarse"](mirror.ItTensor))
    gridY = torch.linspace(-1, 1, steps=ith).view(1, -1, 1, 1).expand(
        1, ith, itw, 1
    )
    gridX = torch.linspace(-1, 1, steps=itw).view(1, 1, -1, 1).expand(
        1, ith, itw, 1
    )
    grid = torch.cat((gridX, gridY), dim=3)

    mask = np.zeros((ith, itw), np.float32)
    hs, flows, matches = [], [], []
    nb_coarse = 0
    with torch.no_grad():
        while nb_coarse <= MAX_COARSE:
            fg = ((mask + (1 - fg_bg)) > 0.5).astype(np.float32)
            H, _ = mirror.get_coarse(fg, sets[nb_coarse])
            assert H is not None
            best = torch.from_numpy(H)[None]
            flow_coarse = _warp_grid_torch(best, ith, itw)
            flow_f, match_f, flow_d8, match_d8 = _pred_flow_mask_torch_cycle(
                nets, mirror.IsTensor, featt, flow_coarse, grid
            )
            if (match_f * (1 - fg)).mean() > 0.01 or nb_coarse == 0:
                hs.append(H)
                flows.append(flow_d8)
                matches.append(match_d8)
                nb_coarse += 1
                match_f = match_f * (1 - fg)
                mask = ((mask + match_f) >= 1.0).astype(np.float32)
            else:
                break
    return (
        np.stack(hs),
        np.concatenate(flows, axis=0),
        np.concatenate(matches, axis=0),
    )


def _common_pairs(aligner, mirror, fg):
    """Mutual matches under `fg` exclusion that BOTH frameworks agree on,
    in rematch mode (each side re-matches masked features)."""
    mask_cell = _mask_to_cells(
        jnp.asarray(fg.astype(np.float32)), aligner.feat_h, aligner.feat_w
    )
    src_idx, valid = _match_masked(
        aligner._bank, aligner._featt, mask_cell,
        aligner._cached_src, aligner._cached_valid, True,
    )
    src_idx, valid = np.asarray(src_idx), np.asarray(valid)
    mine = {(int(src_idx[j]), j) for j in range(len(src_idx)) if valid[j]}
    return mine & mirror.pair_set(fg), valid


def _any_valid_set(pairs_common, coords_a, coords_b):
    """One det-gated minimal set for a junk rotation: the reference RANSAC's
    remainder branch has no zero-inlier guard (utils/outil.py:153-162), so
    the injected H must pass the det gate (its own 4 points are then always
    inliers). No corner-sanity bound — a wild H is fine, few inliers is the
    point."""
    elig = sorted(pairs_common)
    L = len(elig)
    assert L >= 4, "not enough common mutual matches on this rotation"
    for start in range(L):
        pick = [elig[(start + k * L // 4) % L] for k in range(4)]
        tgts = [t for (_, t) in pick]
        if len(set(tgts)) < 4:
            continue
        X = coords_a[[s for (s, _) in pick]]
        Y = coords_b[tgts]
        H = dlt_homography_np(X, Y).astype(np.float32)
        # the reference gate is SIGNED det > 1e-6 on the raw SVD null
        # vector (utils/outil.py:108-113) — require a comfortable margin so
        # the fp32 torch-side det agrees with this fp64 probe
        if np.linalg.det(H) < 1e-3:
            continue
        return tgts
    raise AssertionError("no det-gated minimal set found")


@pytest.fixture(scope="module")
def yfcc_run(tmp_path_factory):
    torch.manual_seed(0)
    ref = load_reference_modules()
    rng = np.random.RandomState(0)
    tmp_path = tmp_path_factory.mktemp("yparity")

    nets = {
        "netFeatCoarse": ref["model"].FeatureExtractor().eval(),
        "netCorr": ref["model"].CorrNeigh(7).eval(),
        "netFlowCoarse": ref["model"].NetFlowCoarse(7).eval(),
        "netMatch": ref["model"].NetMatchability(7).eval(),
    }
    with torch.no_grad():
        for key in ("netFeatCoarse", "netFlowCoarse", "netMatch"):
            _randomize_bn_stats(nets[key], rng)
        # matchability in (0.2, 0.8): exercises the accept rule and the
        # multi-H merge without ever saturating the >= 1.0 mask update
        torch.nn.init.normal_(nets["netMatch"].conv4.weight, 0.0, 0.03)
    trunk = TorchResNet50Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, rng)

    align_params = {
        k: state_dict_to_tree(nets[k].state_dict())
        for k in ("netFeatCoarse", "netFlowCoarse", "netMatch")
    }
    resnet_params = load_resnet50_trunk(trunk.state_dict())

    i_s, i_t = _translation_pair(rng)
    fg_bg = _fg_border_mask(H_IMG, W_IMG)  # It_bg: 1 = usable foreground
    fg = ((1 - fg_bg) > 0.5).astype(np.float32)  # constant exclusion mask

    scales = scale_list(NB_SCALE, SCALE_R)
    mirror = _TorchYFCCMirror(trunk, ref["outil"], MIN_SIZE, scales)
    mirror.set_source(i_s)

    aligner = _RecordingInjector(
        resnet_params, nb_scale=NB_SCALE, min_size=MIN_SIZE,
        scale_r=SCALE_R, n_iter=64, tolerance=0.05, resize_mode="min",
        rematch_per_call=True,
    )
    aligner.set_source(i_s)

    # --- choose injected sets per rotation (common matches of each) -------
    rotated = [
        i_t if a == 0 else i_t.rotate(a, expand=True) for a in ANGLES
    ]
    sets_pre = []
    sets_loop = None
    for j, img in enumerate(rotated):
        aligner.set_target(img)
        mirror.set_target(img)
        pairs_common, valid = _common_pairs(aligner, mirror, fg)
        coords_a = np.asarray(aligner._coordsA)
        coords_b = np.asarray(aligner._coordsB)
        if j == 0:
            # rotation 0: geometry-consistent sets (corner-bounded) — the
            # planted translation collects many inliers; first one doubles
            # as the pre-test hypothesis
            chosen = _choose_sets(
                pairs_common, coords_a, coords_b, valid, MAX_COARSE + 2
            )
            sets_pre.append(chosen[0])
            sets_loop = chosen[1:]
        else:
            sets_pre.append(
                _any_valid_set(pairs_common, coords_a, coords_b)
            )

    # --- rotation pre-test: torch mirror ----------------------------------
    counts_torch = []
    for j, img in enumerate(rotated):
        mirror.set_target(img)
        H, inl = mirror.get_coarse(fg, sets_pre[j])
        counts_torch.append(0.0 if H is None else float(inl.sum()))

    # --- rotation pre-test: the REAL pick_rotation ------------------------
    aligner.set_injected(sets_pre + sets_loop)
    angle, chosen_img, best_idx = pick_rotation(
        aligner, i_t, lambda a, hw: fg_bg
    )
    counts_mine = [c for (_, c) in aligner.history[:4]]

    # --- main loop: both frameworks on the chosen rotation ----------------
    aligner.set_target(chosen_img)
    pred = multi_homography_predict(
        aligner, align_params, max_coarse=MAX_COARSE, mask_region_th=0.01,
        cycle_match=True, bg_mask=fg_bg,
    )
    assert pred is not None
    pred_dir = str(tmp_path / "pred")
    save_pair(pred_dir, 0, pred, rotation=np.int32(angle))

    mirror.set_target(rotated[int(np.argmax(counts_torch))])
    hs_t, flows_t, matches_t = _run_torch_yfcc_loop(
        mirror, nets, fg_bg, sets_loop
    )

    return {
        "ref": ref,
        "angle": angle,
        "counts_mine": counts_mine,
        "counts_torch": counts_torch,
        "pred": pred,
        "pred_dir": pred_dir,
        "tmp_path": tmp_path,
        "torch": (hs_t, flows_t, matches_t),
        "fg_bg": fg_bg,
    }


def test_rotation_pretest_parity(yfcc_run):
    """Same injected hypotheses -> same per-rotation inlier counts (the
    InlierMask sum, evaluation/evalYFCC/coarseAlignFeatMatch.py:194-196)
    and the same chosen rotation, decisively."""
    cm = np.asarray(yfcc_run["counts_mine"])
    ct = np.asarray(yfcc_run["counts_torch"])
    assert int(np.argmax(ct)) == 0 and yfcc_run["angle"] == 0
    # the two fp32 solvers may flip the odd borderline inlier; the winner
    # margin below proves the argmax can't be a coincidence of that noise
    np.testing.assert_allclose(cm, ct, atol=2)
    assert cm[0] - max(cm[1:]) >= 5 and ct[0] - max(ct[1:]) >= 5


def test_yfcc_prediction_parity(yfcc_run):
    """Same injected minimal sets -> same homography stack and same
    cycle-product fine artifacts (fp tolerance)."""
    pred = yfcc_run["pred"]
    hs_t, flows_t, matches_t = yfcc_run["torch"]

    assert pred["coarse_h"].shape[0] == hs_t.shape[0] == MAX_COARSE + 1
    np.testing.assert_allclose(pred["coarse_h"], hs_t, atol=1e-6)
    np.testing.assert_allclose(
        pred["fine_flow_down8"], flows_t.transpose(0, 2, 3, 1), atol=3e-3
    )
    np.testing.assert_allclose(
        pred["fine_match_down8"], matches_t.transpose(0, 2, 3, 1), atol=3e-3
    )


def _match_stack(pred):
    """Our composed per-homography matchability maps (n, h, w) BEFORE
    binarization — used only to pick a knife-edge-free threshold."""
    from ransacflow_tpu.eval.compose import reconstruct_flows

    h8, w8 = pred["fine_flow_down8"].shape[1:3]
    _, matches = reconstruct_flows(
        pred["coarse_h"], pred["fine_flow_down8"], pred["fine_match_down8"],
        h8 * 8, w8 * 8, cycle_match=True,
    )
    return np.asarray(matches)


def _safe_threshold(stack, fg_bg, lo=0.5, hi=0.9, min_pts=20):
    """A matchability threshold at the midpoint of the largest value gap in
    a mid-quantile band of the FOREGROUND values — both frameworks' composed
    match maps agree to ~1e-6, so a gap-midpoint threshold ≫ that makes the
    >= th binarization provably identical on both sides at every pixel the
    pose chain can see (background flips are masked out by matchBG before
    `matches_from_flow` on both sides)."""
    fg = fg_bg.astype(bool)
    v = np.unique(stack[:, fg].ravel())
    band = v[(v >= np.quantile(v, lo)) & (v <= np.quantile(v, hi))]
    gaps = np.diff(band)
    k = int(np.argmax(gaps))
    th = float((band[k] + band[k + 1]) / 2)
    n_pts = int(((stack >= th).any(axis=0) * fg).sum())
    assert gaps[k] > 2e-5 and n_pts >= min_pts, (gaps[k], n_pts)
    return th


def test_yfcc_metric_chain_on_identical_artifacts(yfcc_run):
    """Feed MY artifacts through BOTH metric chains end-to-end: the
    reference's _getFlow + matches_from_flow + norm_kp + opencv_decompose +
    evaluate_R_t (getResults.py:29-190,298-331, AST-extracted and executed)
    vs `evaluate_yfcc` on the saved artifact directory. With cv2's RNG
    seeded identically, the final pose error must agree."""
    import cv2
    import h5py
    from test_reference_metrics import _TgmStub

    ref_fns = extract_reference_functions(
        "evaluation/evalYFCC/getResults.py",
        ["_getFlow", "matches_from_flow", "norm_kp", "opencv_decompose",
         "evaluate_R_t", "getResizedSize"],
        extra_globals={"F": F12, "tgm": _TgmStub, "cv2": cv2},
    )
    pred = yfcc_run["pred"]
    tmp_path = yfcc_run["tmp_path"]
    fg_bg = yfcc_run["fg_bg"]

    # --- synthetic scene: calibration h5 + pair list (geometry matching
    # the planted translation at depth 5, f=200 — as test_eval's YFCC glue)
    from test_eval import DX_PX, DY_PX

    scene = tmp_path / "scene" / "test"
    os.makedirs(scene, exist_ok=True)
    rng = np.random.RandomState(1)
    from PIL import Image

    for name in ("im0.jpg", "im1.jpg"):
        Image.fromarray(
            (rng.rand(H_IMG, W_IMG, 3) * 255).astype(np.uint8)
        ).save(scene / name)
    with open(scene / "images.txt", "w") as f:
        f.write("im0.jpg\nim1.jpg\n")
    with open(scene / "calibration.txt", "w") as f:
        f.write("calib0.h5\ncalib1.h5\n")
    f_len = 200.0
    K = np.array([[f_len, 0, 0], [0, f_len, 0], [0, 0, 1.0]])
    t2 = np.array([[DX_PX * 5 / f_len], [DY_PX * 5 / f_len], [0.0]])
    for name, t in (("calib0.h5", np.zeros((3, 1))), ("calib1.h5", t2)):
        with h5py.File(scene / name, "w") as h5:
            h5["R"] = np.eye(3)
            h5["T"] = t.T
            h5["K"] = K
            h5["imsize"] = np.array([[W_IMG, H_IMG]])
    pairs_pkl = tmp_path / "pairs.pkl"
    with open(pairs_pkl, "wb") as f:
        pickle.dump([[0, 1]], f)

    # --- reference chain on the same artifacts ----------------------------
    flow_t = torch.from_numpy(
        pred["fine_flow_down8"].transpose(0, 3, 1, 2).astype(np.float32)
    )
    match_t = torch.from_numpy(
        pred["fine_match_down8"].transpose(0, 3, 1, 2).astype(np.float32)
    )
    param_t = torch.from_numpy(pred["coarse_h"].astype(np.float32))
    th = _safe_threshold(_match_stack(pred), fg_bg)
    ref_flow, ref_match = ref_fns["_getFlow"](
        flow_t, param_t, match_t, fg_bg.astype(bool), True, th
    )
    size = ref_fns["getResizedSize"](MIN_SIZE, (W_IMG, H_IMG), 16)
    pts1, pts2 = ref_fns["matches_from_flow"](
        ref_flow, ref_match, size, size, 0
    )
    assert len(pts1) >= 20
    n1 = ref_fns["norm_kp"]((W_IMG, H_IMG), size, K, pts1)
    n2 = ref_fns["norm_kp"]((W_IMG, H_IMG), size, K,
                            pts2.astype(np.float64))
    cv2.setRNGSeed(7)
    decomposed, _ = ref_fns["opencv_decompose"](n1, n2, True, 0.001)
    r_gt, t_gt = np.eye(3), t2  # R2 @ R1.T = I; t2 - R @ t1 = t2
    if decomposed is None:
        ref_err = 180.0
    else:
        ref_err = max(
            ref_fns["evaluate_R_t"](r_gt, t_gt, decomposed[0], decomposed[1])
        )

    # --- our chain on the artifact directory ------------------------------
    cv2.setRNGSeed(7)
    errors, accs = evaluate_yfcc(
        yfcc_run["pred_dir"], str(pairs_pkl), str(scene),
        th=th, min_size=MIN_SIZE, use_ransac=True, threshold=0.001,
    )
    assert len(errors) == 1
    assert abs(errors[0] - ref_err) < 1e-3, (errors[0], ref_err)

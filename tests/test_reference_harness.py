"""Full-harness HPatches parity proxy against the reference's executing code.

Round-2 verdict item #2: no test compared the composed end-to-end pipeline
(predict -> artifacts -> metric) against the reference protocol executed in
torch. Here BOTH frameworks run the complete HPatches loop on the same tiny
synthetic dataset with identical converted weights and identical injected
RANSAC minimal sets:

- the torch side composes the reference's OWN modules (model.FeatureExtractor
  / CorrNeigh / NetFlowCoarse / NetMatchability, outil.mutualMatching /
  RANSAC — loaded via tests/ref_modules.py) inside a transcription of the
  harness loop (evaluation/evalHpatch/evaluation.py:23-55,193-243) and metric
  pass (getResults.py:16-63,83-156), plus a ~15-line kornia-0.1.4
  ``warp_grid``. torch-1.2 semantics are pinned explicitly
  (grid_sample/upsample_bilinear align_corners=True, F.interpolate bilinear
  align_corners=False — the defaults the reference ran under);
- the JAX side runs the real `multi_homography_predict` +
  `evaluate_hpatches` harness.

Determinism: RANSAC minimal sets are chosen once (from the mutual matches
common to both sides, det-gate probed with `dlt_homography_np`) and injected
into both frameworks — `injected_samples` on ours, a patched `torch.randint`
with nbIter=1 on the reference's. With the same sets, the winning H is the
same fp64 SVD solve bit-for-bit on both sides.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ref_modules import load_reference_modules, reference_available
from test_eval import (
    _write_hpatches_dataset,
    _fg_border_mask,
    H_IMG,
    W_IMG,
)
from test_models import TorchResNet50Trunk, _randomize_bn_stats

from ransacflow_tpu.models import state_dict_to_tree, load_resnet50_trunk
from ransacflow_tpu.ops.homography import dlt_homography_np
from ransacflow_tpu.pipeline.coarse import CoarseAligner, _mask_to_cells
from ransacflow_tpu.pipeline.multihomo import multi_homography_predict
from ransacflow_tpu.eval.artifacts import save_pair
from ransacflow_tpu.eval.hpatches import evaluate_hpatches, hpatches_gt_grid
from ransacflow_tpu.utils.image import resize_min_size, to_array, scale_list

pytestmark = [
    pytest.mark.slow,  # reference-executed full-harness proxies
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

MIN_SIZE = H_IMG  # 160; dataset images are already (160, 160)
NB_SCALE = 3
SCALE_R = 1.2
MAX_COARSE = 2  # 3 homographies per pair

IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def _to_tensor(img):
    """torchvision ToTensor (torchvision itself is not installed here)."""
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return torch.from_numpy(arr.transpose(2, 0, 1))[None]


def _warp_grid_torch(H, h, w):
    """kornia 0.1.4 HomographyWarper(h, w).warp_grid(H) equivalent:
    corner-anchored normalized grid mapped through H, plain division."""
    ys = torch.linspace(-1, 1, h)
    xs = torch.linspace(-1, 1, w)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    pts = torch.stack(
        [gx.reshape(-1), gy.reshape(-1), torch.ones(h * w)], dim=1
    )
    out = pts @ H[0].T.float()
    xy = out[:, :2] / out[:, 2:3]
    return xy.view(1, h, w, 2)


def _pred_flow_mask_torch(nets, IsTensor, featt, flowCoarse, grid):
    """evaluation/evalHpatch/evaluation.py:23-55, executed with the
    reference's own modules; HPatches variant (match12 only)."""
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
    flowUp = F.interpolate(flowDown8, size=(hh, ww), mode="bilinear",
                           align_corners=False)
    flowUp = flowUp.permute(0, 2, 3, 1)
    flowUp = torch.clamp(flowUp + grid, min=-1, max=1)

    flow12 = F.grid_sample(
        flowCoarse.permute(0, 3, 1, 2), flowUp, align_corners=True
    ).permute(0, 2, 3, 1).contiguous()

    match = match12
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


class _TorchCoarseMirror:
    """coarseAlignFeatMatch.py:102-179 executed with the reference's outil
    and a golden torch trunk; RANSAC minimal sets are injected per call."""

    def __init__(self, trunk, outil, min_size, scales):
        self.trunk = trunk
        self.outil = outil
        self.min_size = min_size
        self.scales = scales

    def _feat(self, img):
        x = _to_tensor(img)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        with torch.no_grad():
            return F.normalize(self.trunk(x))

    def set_pair(self, i_s, i_t):
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

        self.It = resize_min_size(i_t, self.min_size)
        self.ItTensor = _to_tensor(self.It)
        featt = self._feat(self.It)
        Wt, Ht = outil.getWHTensor(featt)
        WtInt, HtInt = outil.getWHTensor_Int(featt)
        self.fh, self.fw = featt.size(2), featt.size(3)
        featt = featt.contiguous().view(1024, -1)
        idx1, idx2 = outil.mutualMatching(self.bank, featt)
        self.idx1, self.idx2 = idx1, idx2
        self.W1m, self.H1m = self.W1[idx1], self.H1[idx1]
        self.W2m, self.H2m = Wt[idx2], Ht[idx2]
        self.W2mInt, self.H2mInt = WtInt[idx2], HtInt[idx2]

    def pair_set(self):
        return set(
            zip(self.idx1.numpy().tolist(), self.idx2.numpy().tolist())
        )

    def get_coarse(self, fg_mask, injected_tgt_cells):
        """getCoarse with the RANSAC sample row injected (as target-cell
        ids, translated here to positions in the filtered match list)."""
        outil = self.outil
        MtExtend = torch.from_numpy(
            (1 - fg_mask).astype(np.float32)
        )[None, None]
        MtTensor = F.interpolate(
            MtExtend, size=(self.fh, self.fw), mode="bilinear",
            align_corners=False,
        )
        MtTensor = (MtTensor > 0.5).squeeze()
        valid = MtTensor[self.W2mInt, self.H2mInt]

        ones = torch.ones(int(valid.sum()))
        match1 = torch.stack(
            [self.H1m[valid], self.W1m[valid], ones], dim=1
        )
        match2 = torch.stack(
            [self.H2m[valid], self.W2m[valid], ones], dim=1
        )

        tgt_cells = self.idx2[valid].numpy()
        row = []
        for cell in injected_tgt_cells:
            pos = np.nonzero(tgt_cells == cell)[0]
            assert len(pos) == 1, "injected match not valid on torch side"
            row.append(int(pos[0]))
        sample = np.asarray([row], np.int64)

        orig_randint = torch.randint
        torch.randint = lambda high, size, device=None: torch.from_numpy(
            sample
        )
        try:
            best, _, _, _ = outil.RANSAC(
                1, match1, match2, 0.05, 4, outil.Homography
            )
        finally:
            torch.randint = orig_randint
        assert best is not None
        return best.astype(np.float32)


def _run_torch_harness(mirror, nets, i_s, i_t, bg, sets):
    """evaluation/evalHpatch/evaluation.py:184-243 (the per-pair loop)."""
    mirror.set_pair(i_s, i_t)
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
            fg = ((mask + (1 - bg)) > 0.5).astype(np.float32)
            H = mirror.get_coarse(fg, sets[nb_coarse])
            best = torch.from_numpy(H)[None]
            flow_coarse = _warp_grid_torch(best, ith, itw)
            flow_f, match_f, flow_d8, match_d8 = _pred_flow_mask_torch(
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


def _get_flow_all_torch(coarse_h, flow_d8, match_d8, grid, th, out_hw):
    """getResults.py:16-63 on in-memory stacks (NCHW like the npy files)."""
    out_h, out_w = out_hw
    param = torch.from_numpy(coarse_h.astype(np.float32))
    coarse = torch.cat(
        [_warp_grid_torch(param[i : i + 1], out_h, out_w)
         for i in range(len(param))]
    )
    flow = torch.from_numpy(flow_d8.astype(np.float32))
    flow = F.interpolate(flow, size=(out_h, out_w), mode="bilinear",
                         align_corners=False)
    flow = flow.permute(0, 2, 3, 1)
    flow_up = torch.clamp(flow + grid, min=-1, max=1)
    flow = F.grid_sample(
        coarse.permute(0, 3, 1, 2), flow_up, align_corners=True
    ).permute(0, 2, 3, 1).contiguous()

    match = torch.from_numpy(match_d8.astype(np.float32))
    match = F.interpolate(match, size=(out_h, out_w), mode="bilinear",
                          align_corners=False)
    match = match.narrow(1, 0, 1) * (
        ((flow.narrow(3, 0, 1) >= -1) & (flow.narrow(3, 0, 1) <= 1)).float()
        * ((flow.narrow(3, 1, 1) >= -1) & (flow.narrow(3, 1, 1) <= 1)).float()
    ).permute(0, 3, 1, 2)
    match = match.permute(0, 2, 3, 1)
    flow = torch.clamp(flow, min=-1, max=1)
    flow_global = flow[:1].clone()
    match_binary = match[:1] >= th
    for i in range(1, len(match)):
        tmp = (match.narrow(0, i, 1) >= th) & (~match_binary)
        match_binary = match_binary + tmp
        tmp = tmp.expand_as(flow_global)
        flow_global[tmp] = flow.narrow(0, i, 1)[tmp]
    return flow_global


def _get_gt_torch(df, idx, min_size, image_dir):
    """getResults.py:83-144 (the DGC-Net GT grid)."""
    import cv2

    data = df.iloc[idx]
    obj = str(data.obj)
    h_ref, w_ref = int(data.Him), int(data.Wim)
    h_trg, w_trg, _ = cv2.imread(
        os.path.join(image_dir, obj, str(data.im2) + ".ppm"), -1
    ).shape
    H = data[5:].astype("double").values.reshape((3, 3))
    S1 = np.array([[min_size / w_ref, 0, 0], [0, min_size / h_ref, 0],
                   [0, 0, 1]])
    S2 = np.array([[min_size / w_trg, 0, 0], [0, min_size / h_trg, 0],
                   [0, 0, 1]])
    Hinv = np.linalg.inv(S2 @ H @ np.linalg.inv(S1))
    X, Y = np.meshgrid(np.linspace(0, min_size - 1, min_size),
                       np.linspace(0, min_size - 1, min_size))
    XYhom = np.stack([X.flatten(), Y.flatten(), np.ones_like(X.flatten())],
                     axis=1).T
    XYwarp = Hinv @ XYhom
    Xw = torch.from_numpy(XYwarp[0]).float()
    Yw = torch.from_numpy(XYwarp[1]).float()
    Zw = torch.from_numpy(XYwarp[2]).float()
    Xwarp = 2 * Xw / (Zw + 1e-8) / (min_size - 1) - 1
    Ywarp = 2 * Yw / (Zw + 1e-8) / (min_size - 1) - 1
    return torch.stack(
        [Xwarp.view(min_size, min_size), Ywarp.view(min_size, min_size)],
        dim=-1,
    )[None]


def _aepe_torch(flow_est, flow_target, min_size):
    """getResults.py:224-248 (masked AEPE in pixels)."""
    mask = (
        flow_target[..., 0].ge(-1) & flow_target[..., 0].le(1)
        & flow_target[..., 1].ge(-1) & flow_target[..., 1].le(1)
    )
    ft = (flow_target + 1) * (min_size - 1) / 2
    fe = (flow_est + 1) * (min_size - 1) / 2
    t = torch.stack([ft[..., 0][mask], ft[..., 1][mask]], dim=1)
    e = torch.stack([fe[..., 0][mask], fe[..., 1][mask]], dim=1)
    return torch.norm(t - e, p=2, dim=1).mean().item()


class _InjectingAligner(CoarseAligner):
    """CoarseAligner that consumes a preset list of injected minimal sets
    (target-cell ids), one per get_coarse call."""

    def set_injected(self, sets):
        self._inj_sets = [np.asarray([s], np.int32) for s in sets]
        self._inj_i = 0

    def get_coarse(self, exclusion_mask=None):
        s = self._inj_sets[self._inj_i]
        self._inj_i += 1
        return super().get_coarse(exclusion_mask, injected_samples=s)


def _choose_sets(pairs_common, coords_a, coords_b, eligible, n_sets):
    """n_sets distinct minimal sets from the common mutual matches: spread
    over the eligible list, det-gate probed (dlt_homography_np == the
    reference's Homography bitwise) and sanity-bounded (corners of the unit
    square must stay near [-1, 1] so fine flows remain mostly in-bounds)."""
    elig = sorted((s, t) for (s, t) in pairs_common if eligible[t])
    corners = np.array(
        [[-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1]], np.float64
    )
    sets, start = [], 0
    L = len(elig)
    assert L >= 8, "not enough common mutual matches"
    while len(sets) < n_sets:
        assert start < L, "no more candidate minimal sets"
        pick = [elig[(start + k * L // 4) % L] for k in range(4)]
        start += 1
        tgts = [t for (_, t) in pick]
        if len(set(tgts)) < 4:
            continue
        X = coords_a[[s for (s, _) in pick]]
        Y = coords_b[tgts]
        H = dlt_homography_np(X, Y).astype(np.float32)
        if np.linalg.det(H) <= 1e-6:
            continue
        warped = corners @ H.astype(np.float64).T
        xy = warped[:, :2] / warped[:, 2:]
        if np.abs(xy).max() > 1.3:
            continue
        if tgts in [s2 for s2 in sets]:
            continue
        sets.append(tgts)
    return sets


@pytest.fixture(scope="module")
def harness_run(tmp_path_factory):
    ref = load_reference_modules()
    rng = np.random.RandomState(0)
    tmp_path = tmp_path_factory.mktemp("hparity")

    # reference nets, random-init + randomized BN stats; netMatch conv4
    # re-initialized with std 0.03 so matchability varies spatially in
    # (0.2, 0.8) — exercises the multi-H merge without saturating sigmoid
    # (exact 1.0 would make the mask update order-dependent)
    nets = {
        "netFeatCoarse": ref["model"].FeatureExtractor().eval(),
        "netCorr": ref["model"].CorrNeigh(7).eval(),
        "netFlowCoarse": ref["model"].NetFlowCoarse(7).eval(),
        "netMatch": ref["model"].NetMatchability(7).eval(),
    }
    with torch.no_grad():
        for key in ("netFeatCoarse", "netFlowCoarse", "netMatch"):
            _randomize_bn_stats(nets[key], rng)
        torch.nn.init.normal_(nets["netMatch"].conv4.weight, 0.0, 0.03)
    trunk = TorchResNet50Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, rng)

    align_params = {
        k: state_dict_to_tree(nets[k].state_dict())
        for k in ("netFeatCoarse", "netFlowCoarse", "netMatch")
    }
    resnet_params = load_resnet50_trunk(trunk.state_dict())

    csv_dir, image_dir = _write_hpatches_dataset(tmp_path, rng)
    from PIL import Image

    i_s = Image.open(os.path.join(image_dir, "obj1", "1.ppm")).convert("RGB")
    i_t = Image.open(os.path.join(image_dir, "obj1", "2.ppm")).convert("RGB")
    bg = _fg_border_mask(H_IMG, W_IMG)

    scales = scale_list(NB_SCALE, SCALE_R)
    mirror = _TorchCoarseMirror(trunk, ref["outil"], MIN_SIZE, scales)
    mirror.set_pair(i_s, i_t)

    aligner = _InjectingAligner(
        resnet_params, nb_scale=NB_SCALE, min_size=MIN_SIZE,
        scale_r=SCALE_R, n_iter=64, tolerance=0.05, resize_mode="min",
    )
    aligner.set_pair(i_s, i_t)

    # mutual matches common to both frameworks (features agree to ~2e-4;
    # knife-edge argmax flips would otherwise poison the injected sets)
    src_idx = np.asarray(aligner._cached_src)
    valid = np.asarray(aligner._cached_valid)
    pairs_mine = {
        (int(src_idx[j]), j) for j in range(len(src_idx)) if valid[j]
    }
    pairs_common = pairs_mine & mirror.pair_set()
    assert len(pairs_common) >= 8

    eligible = np.asarray(
        _mask_to_cells(
            jnp.asarray(((1 - bg) > 0.5).astype(np.float32)),
            aligner.feat_h, aligner.feat_w,
        )
    )
    coords_a = np.asarray(aligner._coordsA)
    coords_b = np.asarray(aligner._coordsB)
    sets = _choose_sets(
        pairs_common, coords_a, coords_b, eligible, MAX_COARSE + 1
    )

    # --- JAX side: the real harness path
    aligner.set_injected(sets)
    pred = multi_homography_predict(
        aligner, align_params, max_coarse=MAX_COARSE, mask_region_th=0.01,
        cycle_match=False, bg_mask=bg,
    )
    assert pred is not None
    pred_dir = str(tmp_path / "pred")
    save_pair(os.path.join(pred_dir, "2"), 0, pred)

    # --- torch side: the reference loop
    hs_t, flows_t, matches_t = _run_torch_harness(
        mirror, nets, i_s, i_t, bg, sets
    )

    return {
        "ref": ref,
        "pred": pred,
        "pred_dir": pred_dir,
        "csv_dir": csv_dir,
        "image_dir": image_dir,
        "torch": (hs_t, flows_t, matches_t),
        "sets": sets,
    }


def test_harness_prediction_parity(harness_run):
    """Same injected minimal sets -> same homography stack (bitwise-level
    fp64 solve) and same fine-flow/matchability artifacts (fp tolerance)."""
    pred = harness_run["pred"]
    hs_t, flows_t, matches_t = harness_run["torch"]

    assert pred["coarse_h"].shape[0] == hs_t.shape[0] == MAX_COARSE + 1
    np.testing.assert_allclose(pred["coarse_h"], hs_t, atol=1e-6)
    np.testing.assert_allclose(
        pred["fine_flow_down8"], flows_t.transpose(0, 2, 3, 1), atol=3e-3
    )
    np.testing.assert_allclose(
        pred["fine_match_down8"], matches_t.transpose(0, 2, 3, 1), atol=3e-3
    )


def test_metric_pass_twin_on_identical_artifacts(harness_run):
    """Feed MY artifacts through BOTH metric implementations: the torch
    transcription of getResults.py vs evaluate_hpatches. Same inputs, so
    only op-level fp differences remain."""
    import pandas as pd

    pred = harness_run["pred"]
    df = pd.read_csv(
        os.path.join(harness_run["csv_dir"], "hpatches_1_2.csv")
    )
    out = H_IMG
    gridY = torch.linspace(-1, 1, out).view(1, -1, 1, 1).expand(1, out, out, 1)
    gridX = torch.linspace(-1, 1, out).view(1, 1, -1, 1).expand(1, out, out, 1)
    grid = torch.cat((gridX, gridY), dim=3)

    gt_t = _get_gt_torch(df, 0, out, harness_run["image_dir"])
    gt_mine = hpatches_gt_grid(df.iloc[0], out, harness_run["image_dir"])
    np.testing.assert_allclose(gt_mine, gt_t[0].numpy(), atol=1e-5)

    for th in (1.0, 0.5):
        flow_t = _get_flow_all_torch(
            pred["coarse_h"],
            pred["fine_flow_down8"].transpose(0, 3, 1, 2),
            pred["fine_match_down8"].transpose(0, 3, 1, 2),
            grid, th, (out, out),
        )
        aepe_t = _aepe_torch(flow_t, gt_t, out)
        res, per_pair = evaluate_hpatches(
            harness_run["pred_dir"], harness_run["csv_dir"],
            harness_run["image_dir"], scenes=(2,), out_size=out, th=th,
        )
        assert abs(per_pair[2][0] - aepe_t) < 5e-3, (th, per_pair, aepe_t)


def test_full_cross_framework_aepe(harness_run):
    """End-to-end: reference-executed predict+metric vs our predict+metric.
    The coarse H's are bitwise-shared; remaining differences are conv fp
    noise, so per-pair AEPE must agree far inside the 1% parity budget."""
    import pandas as pd

    hs_t, flows_t, matches_t = harness_run["torch"]
    df = pd.read_csv(
        os.path.join(harness_run["csv_dir"], "hpatches_1_2.csv")
    )
    out = H_IMG
    gridY = torch.linspace(-1, 1, out).view(1, -1, 1, 1).expand(1, out, out, 1)
    gridX = torch.linspace(-1, 1, out).view(1, 1, -1, 1).expand(1, out, out, 1)
    grid = torch.cat((gridX, gridY), dim=3)
    gt_t = _get_gt_torch(df, 0, out, harness_run["image_dir"])

    for th, tol in ((1.0, 0.05), (0.5, 0.3)):
        flow_t = _get_flow_all_torch(hs_t, flows_t, matches_t, grid, th,
                                     (out, out))
        aepe_t = _aepe_torch(flow_t, gt_t, out)
        res, per_pair = evaluate_hpatches(
            harness_run["pred_dir"], harness_run["csv_dir"],
            harness_run["image_dir"], scenes=(2,), out_size=out, th=th,
        )
        mine = per_pair[2][0]
        assert abs(mine - aepe_t) < tol, (th, mine, aepe_t)
        assert abs(mine - aepe_t) < 0.01 * max(mine, 1.0), (th, mine, aepe_t)

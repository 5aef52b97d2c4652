"""KITTI predict-side parity proxy against the reference's executing code.

The HPatches and YFCC proxies cover the cached-match and rematch coarse
variants plus their metric chains; what the KITTI harness does differently
is the prediction pass (evaluation/evalKITTI/evaluation.py:220-345):

- the KITTI `PredFlowMask` variant takes an ALREADY-warped source and
  recomputes target features inside every call (evaluation.py:49-84);
- the two-resolution refinement: fine flow at fineSize//2 composed into a
  new coarse grid at fineSize, a second fine pass composed at the ORIGINAL
  resolution (evaluation.py:283-311);
- connected-component cleanup and the >0.9999 accept/mask accounting
  (evaluation.py:321-333).

Here the reference's own `PredFlowMask` and `remove_small_cc` are
AST-extracted from evaluation.py and executed (same posture as
tests/test_reference_metrics.py), inside a transcription of the
two-resolution loop, against our `_predict_one_kitti_pair` on the same
synthetic pair with identical converted weights and identical injected
RANSAC minimal sets. The metric chain needs no twin here — getFlow_all /
remove_small_cc / interpolate_flow_match / EPE are already direct-execution
golden-tested (tests/test_reference_metrics.py).

Matchability is kept inside (0.2, 0.8), so the KITTI >0.9999 accept rule
deterministically rejects the second homography on BOTH sides: the loop
exercises one accepted two-resolution refinement plus the rejection path
(multi-H accounting parity is already proven by the other two proxies).
"""

import os

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
    skimage_measure_shim,
)
from test_eval import _translation_pair, _fg_border_mask, H_IMG, W_IMG
from test_models import TorchResNet50Trunk, _randomize_bn_stats
from test_reference_harness import (
    _to_tensor,
    _warp_grid_torch,
    _choose_sets,
    _TorchCoarseMirror,
    _InjectingAligner,
)

from ransacflow_tpu.models import state_dict_to_tree, load_resnet50_trunk
from ransacflow_tpu.pipeline.coarse import _mask_to_cells
from ransacflow_tpu.eval.kitti import _predict_one_kitti_pair
from ransacflow_tpu.eval.artifacts import load_pair
from ransacflow_tpu.utils.image import scale_list

pytestmark = [
    pytest.mark.slow,  # reference-executed full-harness proxies
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

MIN_SIZE = H_IMG  # coarse matching at the original 160px
NB_SCALE = 3
SCALE_R = 1.2
FINE_SIZE = 96  # two-res refine: 96px full / 48px half (stride 8)
CC_TH = 0.01
MASK_REGION_TH = 0.005
N_CALLS = 2  # call 1 accepted (nbCoarse == 0), call 2 rejected -> break


def _grid(h, w):
    gy = torch.linspace(-1, 1, steps=h).view(1, -1, 1, 1).expand(1, h, w, 1)
    gx = torch.linspace(-1, 1, steps=w).view(1, 1, -1, 1).expand(1, h, w, 1)
    return torch.cat((gx, gy), dim=3)


def _run_torch_kitti_loop(mirror, nets, ref_ev, i_s, i_t, bg, sets):
    """evaluation/evalKITTI/evaluation.py:227-337 executed with the
    reference's own outil / PredFlowMask / remove_small_cc (It_bg = `bg`,
    1 = usable foreground)."""
    outil = mirror.outil
    it_resize = outil.resizeImg(i_t, 8, FINE_SIZE)
    it_d2 = outil.resizeImg(i_t, 8, FINE_SIZE // 2)

    tensor_s = _to_tensor(i_s)
    tensor_resize = _to_tensor(it_resize)
    tensor_d2 = _to_tensor(it_d2)
    w_org, h_org = i_t.size
    w_rs, h_rs = it_resize.size
    w_d2, h_d2 = it_d2.size
    grid_org = _grid(h_org, w_org)
    grid_resize = _grid(h_rs, w_rs)
    grid_d2 = _grid(h_d2, w_d2)

    mask = np.zeros((h_org, w_org), np.float32)
    hs, f_d2, f_full, m_full = [], [], [], []
    nb_coarse = 0
    calls = 0
    with torch.no_grad():
        while True:
            fg = ((mask + (1 - bg)) > 0.5).astype(np.float32)
            H = mirror.get_coarse(fg, sets[calls])
            calls += 1
            best = torch.from_numpy(H)[None]
            hom_d2 = _warp_grid_torch(best, h_d2, w_d2)
            hom_resize = _warp_grid_torch(best, h_rs, w_rs)
            is_sample_d2 = F.grid_sample(tensor_s, hom_d2,
                                         align_corners=True)

            # pass 1 at half resolution (reference PredFlowMask, executed)
            _, _, flow_d2, _ = ref_ev["PredFlowMask"](
                is_sample_d2, tensor_d2, hom_d2, grid_d2, nets
            )

            # compose into a new coarse grid at fineSize
            flow_coarse = F.interpolate(
                flow_d2, size=(h_rs, w_rs), mode="bilinear",
                align_corners=False,
            )
            flow_coarse = flow_coarse.permute(0, 2, 3, 1)
            flow_coarse = torch.clamp(flow_coarse + grid_resize, -1, 1)
            flow_coarse = F.grid_sample(
                hom_resize.permute(0, 3, 1, 2), flow_coarse,
                align_corners=True,
            ).permute(0, 2, 3, 1).contiguous()
            is_sample = F.grid_sample(tensor_s, flow_coarse,
                                      align_corners=True)

            # pass 2 at fineSize, composed at the original resolution
            _, match_org, flow_d8, match_d8 = ref_ev["PredFlowMask"](
                is_sample, tensor_resize, flow_coarse, grid_org, nets
            )

            match_ft = ref_ev["remove_small_cc"](match_org, 0.99, CC_TH)
            if ((match_ft > 0.9999) * (1 - fg)).mean() > MASK_REGION_TH \
                    or nb_coarse == 0:
                hs.append(H)
                f_d2.append(flow_d2.numpy())
                f_full.append(flow_d8.numpy())
                m_full.append(match_d8.numpy())
                nb_coarse += 1
                match_ft = match_ft * (1 - fg)
                mask = ((mask + match_ft) > 0.9999).astype(np.float32)
            else:
                break
    return (
        calls,
        np.stack(hs),
        np.concatenate(f_d2, axis=0),
        np.concatenate(f_full, axis=0),
        np.concatenate(m_full, axis=0),
    )


@pytest.fixture(scope="module")
def kitti_run(tmp_path_factory):
    torch.manual_seed(0)
    ref = load_reference_modules()
    ref_ev = extract_reference_functions(
        "evaluation/evalKITTI/evaluation.py",
        ["PredFlowMask", "remove_small_cc"],
        extra_globals={"F": F12, "measure": skimage_measure_shim},
    )
    rng = np.random.RandomState(0)
    tmp_path = tmp_path_factory.mktemp("kparity")

    nets = {
        "netFeatCoarse": ref["model"].FeatureExtractor().eval(),
        "netCorr": ref["model"].CorrNeigh(7).eval(),
        "netFlowCoarse": ref["model"].NetFlowCoarse(7).eval(),
        "netMatch": ref["model"].NetMatchability(7).eval(),
    }
    with torch.no_grad():
        for key in ("netFeatCoarse", "netFlowCoarse", "netMatch"):
            _randomize_bn_stats(nets[key], rng)
        # matchability in (0.2, 0.8): the KITTI >0.9999 accept rule then
        # deterministically rejects homography #2 on both sides
        torch.nn.init.normal_(nets["netMatch"].conv4.weight, 0.0, 0.03)
    trunk = TorchResNet50Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, rng)

    align_params = {
        k: state_dict_to_tree(nets[k].state_dict())
        for k in ("netFeatCoarse", "netFlowCoarse", "netMatch")
    }
    resnet_params = load_resnet50_trunk(trunk.state_dict())

    # synthetic KITTI layout: {i:06}_10.png target, {i:06}_11.png source
    i_s, i_t = _translation_pair(rng)
    image_dir = tmp_path / "imgs"
    os.makedirs(image_dir)
    i_t.save(image_dir / "000000_10.png")
    i_s.save(image_dir / "000000_11.png")
    bg = _fg_border_mask(H_IMG, W_IMG)

    scales = scale_list(NB_SCALE, SCALE_R)
    mirror = _TorchCoarseMirror(trunk, ref["outil"], MIN_SIZE, scales)
    mirror.set_pair(i_s, i_t)

    aligner = _InjectingAligner(
        resnet_params, nb_scale=NB_SCALE, min_size=MIN_SIZE,
        scale_r=SCALE_R, n_iter=64, tolerance=0.05, resize_mode="min",
    )
    aligner.set_pair(i_s, i_t)

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
    sets = _choose_sets(
        pairs_common, np.asarray(aligner._coordsA),
        np.asarray(aligner._coordsB), eligible, N_CALLS,
    )

    # --- our side: the real two-resolution prediction ----------------------
    aligner.set_injected(sets)
    out_dir = str(tmp_path / "pred")
    _predict_one_kitti_pair(
        aligner, align_params, str(image_dir), out_dir, 0,
        fine_size=FINE_SIZE, mask_region_th=MASK_REGION_TH, cc_th=CC_TH,
        seed=7, bg_mask_fn=lambda path, hw: _fg_border_mask(*hw),
        max_coarse=None,
    )
    art = load_pair(out_dir, 0)
    assert art is not None
    calls_mine = aligner._inj_i

    # --- torch side: the reference loop ------------------------------------
    calls_t, hs_t, f_d2_t, f_full_t, m_full_t = _run_torch_kitti_loop(
        mirror, nets, ref_ev, i_s, i_t, bg, sets
    )

    return {
        "art": art,
        "calls_mine": calls_mine,
        "torch": (calls_t, hs_t, f_d2_t, f_full_t, m_full_t),
    }


def test_kitti_two_res_prediction_parity(kitti_run):
    """Same injected minimal sets -> same homography, same half-resolution
    fine flow, and same full-pass stride-8 flow/matchability artifacts
    through the two-resolution composition (fp tolerance)."""
    art = kitti_run["art"]
    calls_t, hs_t, f_d2_t, f_full_t, m_full_t = kitti_run["torch"]

    # both sides accepted H #1 and rejected H #2 (the >0.9999 accept rule)
    assert kitti_run["calls_mine"] == calls_t == N_CALLS
    assert art["coarse_h"].shape[0] == hs_t.shape[0] == 1

    np.testing.assert_allclose(art["coarse_h"], hs_t, atol=1e-6)
    np.testing.assert_allclose(
        art["fine_flow_d2_down8"], f_d2_t.transpose(0, 2, 3, 1), atol=3e-3
    )
    # pass-2 artifacts ride on pass 1's composed grid — tolerance stays in
    # the same fp band because the composed coarse grid is clamped to [-1,1]
    np.testing.assert_allclose(
        art["fine_flow_down8"], f_full_t.transpose(0, 2, 3, 1), atol=5e-3
    )
    np.testing.assert_allclose(
        art["fine_match_down8"], m_full_t.transpose(0, 2, 3, 1), atol=5e-3
    )

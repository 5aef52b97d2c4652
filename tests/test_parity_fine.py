"""End-to-end fine-stage parity: pred_flow_mask vs a torch golden
composition (warp -> features -> bidirectional correlation -> heads ->
flow/match composition) with converted weights.

This validates the exact composition semantics of the PredFlowMask contract
(evaluation/evalYFCC/evaluation.py:32-62) — interpolation modes,
align_corners, clamp placement, cycle product, in-bounds indicator — not
just individual ops.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from test_models import (
    TorchFeatureExtractor,
    TorchHead,
    _randomize_bn_stats,
    _nchw,
)

from ransacflow_tpu.models import state_dict_to_tree
from ransacflow_tpu.pipeline.fine import pred_flow_mask
from ransacflow_tpu.models.layers import l2_normalize
from ransacflow_tpu.models.feature_extractor import feature_extractor


def _torch_corr(x, y, k=7):
    from itertools import product

    p = k // 2
    n, c, h, w = x.shape
    yp = F.pad(y, (p, p, p, p))
    return torch.cat(
        [
            torch.sum(x * yp[:, :, i : i + h, j : j + w], dim=1, keepdim=True)
            for i, j in product(range(k), range(k))
        ],
        dim=1,
    )


def _torch_flow_head(head, corr):
    logits = head(corr)
    p = torch.softmax(logits, dim=1)
    gy = torch.arange(-3, 4).view(1, 1, -1, 1).expand(1, 1, 7, 7) \
        .contiguous().view(1, -1, 1, 1).float()
    gx = torch.arange(-3, 4).view(1, 1, 1, -1).expand(1, 1, 7, 7) \
        .contiguous().view(1, -1, 1, 1).float()
    n, c, h, w = p.shape
    fx = torch.sum(p * gx, dim=1, keepdim=True) / w * 2
    fy = torch.sum(p * gy, dim=1, keepdim=True) / h * 2
    return torch.cat([fx, fy], dim=1)


def test_pred_flow_mask_matches_torch_composition(rng):
    torch.manual_seed(3)
    feat_net = TorchFeatureExtractor().eval()
    flow_head = TorchHead(49, 49).eval()
    match_head = TorchHead(49, 1).eval()
    with torch.no_grad():
        _randomize_bn_stats(feat_net, rng)
        _randomize_bn_stats(flow_head, rng)
        _randomize_bn_stats(match_head, rng)
        torch.nn.init.normal_(match_head.conv4.weight, 0.0, 1e-2)

    params = {
        "netFeatCoarse": state_dict_to_tree(feat_net.state_dict()),
        "netFlowCoarse": state_dict_to_tree(flow_head.state_dict()),
        "netMatch": state_dict_to_tree(match_head.state_dict()),
    }

    H = W = 64
    src = rng.rand(1, H, W, 3).astype(np.float32)
    tgt = rng.rand(1, H, W, 3).astype(np.float32)
    # a mildly perturbed identity warp grid
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    flow_coarse = np.stack([gx, gy], -1)[None].astype(np.float32)
    flow_coarse += rng.randn(1, H, W, 2).astype(np.float32) * 0.02

    # ---- torch golden ----
    with torch.no_grad():
        src_t = _nchw(src)
        tgt_t = _nchw(tgt)
        fc_t = torch.from_numpy(flow_coarse)
        is_sample = F.grid_sample(src_t, fc_t, align_corners=True)
        feats = F.normalize(feat_net(is_sample))
        featt = F.normalize(feat_net(tgt_t))
        corr12 = _torch_corr(featt, feats)
        flow_d8 = _torch_flow_head(flow_head, corr12)
        m12_d8 = torch.sigmoid(match_head(corr12))
        corr21 = _torch_corr(feats, featt)
        m21_d8 = torch.sigmoid(match_head(corr21))

        m12 = F.interpolate(m12_d8, size=(H, W), mode="bilinear")
        m21 = F.interpolate(m21_d8, size=(H, W), mode="bilinear")
        up = F.interpolate(flow_d8, size=(H, W), mode="bilinear")
        up = up.permute(0, 2, 3, 1)
        gyx = torch.stack(
            [torch.from_numpy(gx).float(), torch.from_numpy(gy).float()],
            dim=-1)[None]
        up = torch.clamp(up + gyx, -1, 1)
        flow12 = F.grid_sample(fc_t.permute(0, 3, 1, 2), up,
                               align_corners=True).permute(0, 2, 3, 1)
        match = m12 * F.grid_sample(m21, up, align_corners=True)
        inb = (
            (flow12[..., 0:1] >= -1) & (flow12[..., 0:1] <= 1)
            & (flow12[..., 1:2] >= -1) & (flow12[..., 1:2] <= 1)
        ).float().permute(0, 3, 1, 2)
        match = (match * inb)[0, 0].numpy()
        flow12 = flow12.numpy()

    # ---- ours ----
    featt_j = l2_normalize(
        feature_extractor(params["netFeatCoarse"], jnp.asarray(tgt))[0]
    )
    out = pred_flow_mask(
        params, jnp.asarray(src), featt_j, jnp.asarray(flow_coarse),
        cycle_match=True,
    )
    np.testing.assert_allclose(np.asarray(out["flow"]), flow12, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["match"]), match, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["flow_down8"][0, :, :, 0]),
        flow_d8[0, 0].numpy(), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["match_down8"][0, :, :, 1]),
        m21_d8[0, 0].numpy(), atol=2e-4,
    )

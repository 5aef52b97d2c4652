"""Model forward parity: converted torch weights -> identical outputs.

Golden models are built with stock torch modules in this file (torchvision
resnet50 for the coarse net; compact torch compositions mirroring the
reference architecture descriptions in SURVEY.md §2.2 for the fine net and
heads), randomly initialized, converted with `state_dict_to_tree`, and
compared against the JAX forward pass.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from ransacflow_tpu.models import (
    feature_extractor,
    net_flow_coarse,
    net_matchability,
    resnet50_layer3,
    state_dict_to_tree,
    load_resnet50_trunk,
    l2_normalize,
)

ATOL = 2e-4


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _to_nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


class TorchBlurPool(nn.Module):
    """Anti-aliased downsample: reflect pad + binomial depthwise conv."""

    def __init__(self, channels, filt_size=3, stride=2):
        super().__init__()
        from math import comb

        a = torch.tensor([float(comb(filt_size - 1, i)) for i in range(filt_size)])
        filt = a[:, None] * a[None, :]
        filt = filt / filt.sum()
        self.register_buffer("filt", filt[None, None].repeat(channels, 1, 1, 1))
        self.stride = stride
        lo = (filt_size - 1) // 2
        hi = -(-(filt_size - 1) // 2)
        self.pad = nn.ReflectionPad2d([lo, hi, lo, hi])

    def forward(self, x):
        return F.conv2d(self.pad(x), self.filt, stride=self.stride,
                        groups=x.shape[1])


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1, antialias_shortcut=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            mods = [TorchBlurPool(cin, 3, stride)] if stride != 1 else []
            mods += [nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            self.downsample = nn.Sequential(*mods)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + res)


class TorchFeatureExtractor(nn.Module):
    """Golden fine-stage feature net per SURVEY.md §2.2 / model/model.py:59-125."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.Sequential(
            nn.MaxPool2d(kernel_size=2, stride=1), TorchBlurPool(64, 3, 2)
        )
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(
            TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128)
        )
        self.layer3 = nn.Sequential(
            TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256)
        )

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


class TorchHead(nn.Module):
    """Golden head trunk 49 -> 512 -> 256 -> 128 -> out (model/model.py:167-322)."""

    def __init__(self, k2_in, out_ch):
        super().__init__()
        self.conv1 = nn.Conv2d(k2_in, 512, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(512)
        self.conv2 = nn.Conv2d(512, 256, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(256)
        self.conv3 = nn.Conv2d(256, 128, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(128)
        self.conv4 = nn.Conv2d(128, out_ch, 3, 1, 1, bias=False)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        return self.conv4(x)


def _randomize_bn_stats(model, rng):
    """Running stats distinct from init so eval-mode parity is meaningful."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d,)):
            m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features)
                                                  .astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features).astype(np.float32) * 0.5 + 0.75)))


def test_feature_extractor_parity(rng):
    tm = TorchFeatureExtractor().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    params = state_dict_to_tree(tm.state_dict())
    x = rng.rand(2, 48, 64, 3).astype(np.float32)
    with torch.no_grad():
        gold = _to_nhwc(tm(_nchw(x)))
    ours, _ = feature_extractor(params, jnp.asarray(x))
    assert ours.shape == (2, 6, 8, 256)
    np.testing.assert_allclose(np.asarray(ours), gold, atol=ATOL)


def test_flow_head_parity(rng):
    tm = TorchHead(49, 49).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    params = state_dict_to_tree(tm.state_dict())
    corr = rng.rand(1, 6, 7, 49).astype(np.float32)

    with torch.no_grad():
        logits = tm(_nchw(corr))
        p = torch.softmax(logits, dim=1)
        gy = torch.arange(-3, 4).view(1, 1, -1, 1).expand(1, 1, 7, 7) \
            .contiguous().view(1, -1, 1, 1).float()
        gx = torch.arange(-3, 4).view(1, 1, 1, -1).expand(1, 1, 7, 7) \
            .contiguous().view(1, -1, 1, 1).float()
        n, c, w, h = p.shape  # reference naming: w=rows, h=cols
        fx = torch.sum(p * gx, dim=1, keepdim=True) / h * 2
        fy = torch.sum(p * gy, dim=1, keepdim=True) / w * 2
        flow_gold = _to_nhwc(torch.cat([fx, fy], dim=1))

    ours, _ = net_flow_coarse(params, jnp.asarray(corr), up8=False)
    np.testing.assert_allclose(np.asarray(ours), flow_gold, atol=ATOL)

    # up8 path: upsample golden with align_corners=True
    with torch.no_grad():
        up_gold = _to_nhwc(F.interpolate(
            torch.from_numpy(flow_gold).permute(0, 3, 1, 2), scale_factor=8,
            mode="bilinear", align_corners=True))
    ours_up, _ = net_flow_coarse(params, jnp.asarray(corr), up8=True)
    np.testing.assert_allclose(np.asarray(ours_up), up_gold, atol=ATOL)


def test_matchability_head_parity(rng):
    tm = TorchHead(49, 1).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
        nn.init.normal_(tm.conv4.weight, 0.0, 1e-4)
    params = state_dict_to_tree(tm.state_dict())
    corr = rng.rand(1, 5, 6, 49).astype(np.float32)
    with torch.no_grad():
        gold = _to_nhwc(torch.sigmoid(tm(_nchw(corr))))
    ours, _ = net_matchability(params, jnp.asarray(corr), up8=False)
    np.testing.assert_allclose(np.asarray(ours), gold, atol=ATOL)
    assert np.all(np.abs(np.asarray(ours) - 0.5) < 0.01)  # ~0.5 at init


class TorchBottleneck(nn.Module):
    """Standard ResNet-v1.5 bottleneck (stride on conv2), expansion 4."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + res)


class TorchResNet50Trunk(nn.Module):
    """Golden ResNet-50 through layer3 (torchvision-identical naming)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def make(cin, planes, blocks, stride):
            mods = [TorchBottleneck(cin, planes, stride)]
            mods += [TorchBottleneck(planes * 4, planes) for _ in range(blocks - 1)]
            return nn.Sequential(*mods)

        self.layer1 = make(64, 64, 3, 1)
        self.layer2 = make(256, 128, 4, 2)
        self.layer3 = make(512, 256, 6, 2)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


def test_resnet50_layer3_parity(rng):
    tm = TorchResNet50Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    params = load_resnet50_trunk(tm.state_dict())
    x = rng.rand(1, 64, 80, 3).astype(np.float32)
    with torch.no_grad():
        gold = _to_nhwc(tm(_nchw(x)))
    ours, _ = resnet50_layer3(params, jnp.asarray(x))
    assert ours.shape == (1, 4, 5, 1024)
    np.testing.assert_allclose(np.asarray(ours), gold, atol=5e-4)


def test_l2_normalize_matches_torch(rng):
    x = rng.randn(2, 4, 5, 16).astype(np.float32)
    ours = np.asarray(l2_normalize(jnp.asarray(x), axis=-1))
    gold = F.normalize(torch.from_numpy(x), p=2, dim=-1).numpy()
    np.testing.assert_allclose(ours, gold, atol=1e-6)


def test_feature_extractor_train_mode_updates_stats(rng):
    from ransacflow_tpu.models import init_feature_extractor, merge_bn_stats
    import jax

    params = init_feature_extractor(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    _, stats = feature_extractor(params, x, train=True)
    assert "bn1" in stats and "layer3" in stats
    new_params = merge_bn_stats(params, stats)
    assert not np.allclose(
        np.asarray(new_params["bn1"]["running_mean"]),
        np.asarray(params["bn1"]["running_mean"]),
    )


def test_train_mode_bn_matches_torch(rng):
    """Train-mode BN (batch stats + running-stat update) parity."""
    tm = TorchHead(49, 1).train()
    params = state_dict_to_tree(tm.state_dict())
    corr = rng.rand(4, 5, 6, 49).astype(np.float32)
    gold = _to_nhwc(torch.sigmoid(tm(_nchw(corr))))
    ours, stats = net_matchability(params, jnp.asarray(corr), up8=False, train=True)
    np.testing.assert_allclose(np.asarray(ours), gold, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(stats["bn1"]["running_mean"]),
        tm.bn1.running_mean.detach().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats["bn1"]["running_var"]),
        tm.bn1.running_var.detach().numpy(),
        atol=1e-5,
    )


def test_stem_s2d_exact_rewrite(rng):
    """The space-to-depth stem (models/resnet50.py `_stem_s2d`) is an exact
    rewrite of conv1: same trunk output to fp tolerance, and the raw stem
    output matches torch's conv2d(stride=2, padding=3) directly."""
    import jax
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.models.resnet50 import (
        resnet50_layer3, _stem_s2d, imagenet_preprocess,
    )

    params = init_resnet50_layer3(jax.random.PRNGKey(0))
    w = params["conv1"]["weight"]

    for h, wd in ((64, 96), (48, 48)):
        x = jnp.asarray(rng.rand(1, h, wd, 3).astype(np.float32))
        gold = F.conv2d(
            torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2),
            torch.from_numpy(np.asarray(w)).permute(3, 2, 0, 1),
            stride=2, padding=3,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(_stem_s2d(x, w))
        np.testing.assert_allclose(got, gold, atol=1e-5)

    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    ref, _ = resnet50_layer3(params, imagenet_preprocess(x))
    s2d, _ = resnet50_layer3(params, imagenet_preprocess(x), stem_s2d=True)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)

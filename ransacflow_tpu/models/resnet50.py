"""ResNet-50 trunk through layer3 (1024-ch, stride 16) — the coarse feature
extractor.

Covers both coarse-feature variants of the reference with one
implementation: torchvision ``resnet50`` truncated after layer3
(quick_start/coarseAlignFeatMatch.py:34-49) and the MoCo checkpoint's
ResNet-50 (model/resnet50.py:107-193) — their trunks are architecturally
identical (bottleneck [3, 4, 6], stride on conv2) with matching state_dict
keys, so the same param tree / forward serves both; only the loaded weights
differ.
"""

import math

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.layers import (
    conv2d,
    batch_norm,
    max_pool,
    bn_init,
)

_LAYERS = [  # (name, num_blocks, planes, stride); expansion 4
    ("layer1", 3, 64, 1),
    ("layer2", 4, 128, 2),
    ("layer3", 6, 256, 2),
]

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def _conv_init(key, kh, kw, cin, cout, dtype):
    # normal(0, sqrt(2/n)), n = kh*kw*cout (reference: model/resnet50.py:128-131)
    std = math.sqrt(2.0 / (kh * kw * cout))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def init_resnet50_layer3(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    p = {
        "conv1": {"weight": _conv_init(next(keys), 7, 7, 3, 64, dtype)},
        "bn1": bn_init(64, dtype),
    }
    inplanes = 64
    for name, blocks, planes, stride in _LAYERS:
        layer = {}
        for b in range(blocks):
            s = stride if b == 0 else 1
            cin = inplanes if b == 0 else planes * 4
            blk = {
                "conv1": {"weight": _conv_init(next(keys), 1, 1, cin, planes, dtype)},
                "bn1": bn_init(planes, dtype),
                "conv2": {"weight": _conv_init(next(keys), 3, 3, planes, planes, dtype)},
                "bn2": bn_init(planes, dtype),
                "conv3": {"weight": _conv_init(next(keys), 1, 1, planes, planes * 4, dtype)},
                "bn3": bn_init(planes * 4, dtype),
            }
            if b == 0:
                blk["downsample"] = {
                    "0": {"weight": _conv_init(next(keys), 1, 1, cin, planes * 4, dtype)},
                    "1": bn_init(planes * 4, dtype),
                }
            layer[str(b)] = blk
        p[name] = layer
        inplanes = planes * 4
    return p


def _bottleneck(p, x, stride, train, axis_name):
    stats = {}
    out = conv2d(x, p["conv1"]["weight"], padding=0)
    out, s = batch_norm(out, p["bn1"], train, axis_name)
    if s:
        stats["bn1"] = s
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"]["weight"], stride=stride, padding=1)
    out, s = batch_norm(out, p["bn2"], train, axis_name)
    if s:
        stats["bn2"] = s
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv3"]["weight"], padding=0)
    out, s = batch_norm(out, p["bn3"], train, axis_name)
    if s:
        stats["bn3"] = s

    if "downsample" in p:
        res = conv2d(x, p["downsample"]["0"]["weight"], stride=stride, padding=0)
        res, s = batch_norm(res, p["downsample"]["1"], train, axis_name)
        if s:
            stats["downsample"] = {"1": s}
    else:
        res = x
    return jax.nn.relu(out + res), stats


def resnet50_layer3(params, x, train=False, axis_name=None):
    """Forward to layer3 features.

    Args:
      x: (B, H, W, 3), ImageNet-normalized (use `imagenet_preprocess`).
    Returns (feat, stats): feat is (B, H/16, W/16, 1024).
    """
    stats = {}
    out = conv2d(x, params["conv1"]["weight"], stride=2, padding=3)
    out, s = batch_norm(out, params["bn1"], train, axis_name)
    if s:
        stats["bn1"] = s
    out = jax.nn.relu(out)
    out = max_pool(out, window=3, stride=2, padding=1)

    for name, blocks, _planes, stride in _LAYERS:
        layer_stats = {}
        for b in range(blocks):
            out, s = _bottleneck(
                params[name][str(b)], out, stride if b == 0 else 1, train, axis_name
            )
            if s:
                layer_stats[str(b)] = s
        if layer_stats:
            stats[name] = layer_stats
    return out, stats


def imagenet_preprocess(x):
    """(B, H, W, 3) images in [0, 1] -> ImageNet-normalized."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD

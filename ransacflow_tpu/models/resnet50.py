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


def _stem_s2d(x, w):
    """conv1 (7x7, stride 2, pad 3) as a 4x4 stride-1 conv on the 2x2
    space-to-depth input — the TPU stem layout trick (MLPerf ResNet).

    A 3-channel 960x1280 input leaves the MXU's contraction dimension
    nearly empty; packing each 2x2 pixel block into 12 channels turns the
    strided conv into a stride-1 conv with a 4x MXU-denser input. The
    rewrite is EXACT (same multiply-add set): output(i, j) reads input
    rows 2i-3..2i+3, i.e. 4 space-to-depth rows with kernel taps
    ky = 2a + r - 1 (zero where ky falls outside 0..6) and spatial
    padding (2, 1). Measured: 7-scale pyramid trunk 9.5 -> 7.25 ms fp32
    on one v5e chip (scripts/bench_trunk.py); max |diff| vs the direct
    conv 3.6e-7.

    NEGATIVE RESULT end-to-end: inside the fused serving scan program the
    input relayout (2x2x3 -> 12-channel transpose of every pyramid level)
    breaks the pyramid->preprocess->conv1 fusion and the headline bench
    REGRESSES 39.7 -> 31.8 pairs/s (A/B via RANSACFLOW_BENCH_S2D). Kept as
    an opt-in for trunk-only workloads where it wins; off by default.
    """
    from jax import lax

    b, h, wd, _ = x.shape
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, 3)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 12)

    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # row p holds ky = p-1
    ws = wp.reshape(4, 2, 4, 2, 3, w.shape[-1]).transpose(0, 2, 1, 3, 4, 5)
    ws = ws.reshape(4, 4, 12, w.shape[-1])

    return lax.conv_general_dilated(
        xs.astype(ws.dtype), ws, window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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


def resnet50_layer3(params, x, train=False, axis_name=None, stem_s2d=False):
    """Forward to layer3 features.

    Args:
      x: (B, H, W, 3), ImageNet-normalized (use `imagenet_preprocess`).
      stem_s2d: run conv1 as the exact space-to-depth rewrite (`_stem_s2d`)
        — opt-in, wins trunk-only workloads but loses inside the fused
        serving program (see `_stem_s2d`); default off, which is also
        bit-level parity with the torch goldens (the rewrite reassociates
        fp sums). Requires even H and W (all stride-16-floored pipeline
        shapes are).
    Returns (feat, stats): feat is (B, H/16, W/16, 1024).
    """
    stats = {}
    if stem_s2d:
        out = _stem_s2d(x, params["conv1"]["weight"])
    else:
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

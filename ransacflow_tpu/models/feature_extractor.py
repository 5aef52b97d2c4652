"""Fine-stage trainable feature extractor (256-ch, stride 8).

Architecture mirror of the reference's FeatureExtractor
(model/model.py:59-125): conv3x3(3->64, s1) -> BN -> ReLU ->
[MaxPool(k2, s1) -> blur-pool(filt 3, s2)] -> layer1 (2x BasicBlock, 64) ->
layer2 (128, s2, blur-pooled shortcut) -> layer3 (256, s2).

Parameter tree keys mirror the torch state_dict (e.g.
``params['layer2']['0']['downsample']['1']['weight']``), conv kernels HWIO.
"""

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.layers import (
    conv2d,
    batch_norm,
    max_pool,
    kaiming_normal_conv,
    bn_init,
)
from ransacflow_tpu.ops.blurpool import blur_pool

_LAYER_PLAN = [  # (name, in_ch, out_ch, stride)
    ("layer1", 64, 64, 1),
    ("layer2", 64, 128, 2),
    ("layer3", 128, 256, 2),
]


def init_feature_extractor(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32))
    p = {
        "conv1": {"weight": kaiming_normal_conv(next(keys), 3, 3, 3, 64, dtype)},
        "bn1": bn_init(64, dtype),
    }
    for name, cin, cout, stride in _LAYER_PLAN:
        blocks = {}
        for b in range(2):
            bin_ch = cin if b == 0 else cout
            blk = {
                "conv1": {
                    "weight": kaiming_normal_conv(next(keys), 3, 3, bin_ch, cout, dtype)
                },
                "bn1": bn_init(cout, dtype),
                "conv2": {
                    "weight": kaiming_normal_conv(next(keys), 3, 3, cout, cout, dtype)
                },
                "bn2": bn_init(cout, dtype),
            }
            if b == 0 and (stride != 1 or cin != cout):
                # Sequential(blur-pool, conv1x1, BN) -> torch indices 0,1,2
                blk["downsample"] = {
                    "1": {
                        "weight": kaiming_normal_conv(next(keys), 1, 1, cin, cout, dtype)
                    },
                    "2": bn_init(cout, dtype),
                }
            blocks[str(b)] = blk
        p[name] = blocks
    return p


def _basic_block(p, x, stride, train, axis_name):
    stats = {}
    out = conv2d(x, p["conv1"]["weight"], stride=stride, padding=1)
    out, s = batch_norm(out, p["bn1"], train, axis_name)
    if s:
        stats["bn1"] = s
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"]["weight"], padding=1)
    out, s = batch_norm(out, p["bn2"], train, axis_name)
    if s:
        stats["bn2"] = s

    if "downsample" in p:
        res = x
        if stride != 1:
            res = blur_pool(res, filt_size=3, stride=stride)
        res = conv2d(res, p["downsample"]["1"]["weight"], padding=0)
        res, s = batch_norm(res, p["downsample"]["2"], train, axis_name)
        if s:
            stats["downsample"] = {"2": s}
    else:
        res = x
    out = jax.nn.relu(out + res)
    return out, stats


def feature_extractor(params, x, train=False, axis_name=None):
    """Forward pass.

    Args:
      params: tree from `init_feature_extractor` / the weight converter.
      x: (B, H, W, 3) images in [0, 1] (the reference feeds un-normalized
        ToTensor output to this net — no ImageNet normalization).
      train: BatchNorm mode.
      axis_name: mesh axis for cross-device BN moment sync.

    Returns (feat, stats): feat is (B, H/8, W/8, 256); stats is a tree of
    updated BN running stats (empty dict in eval mode).
    """
    stats = {}
    out = conv2d(x, params["conv1"]["weight"], stride=1, padding=1)
    out, s = batch_norm(out, params["bn1"], train, axis_name)
    if s:
        stats["bn1"] = s
    out = jax.nn.relu(out)
    out = max_pool(out, window=2, stride=1)
    out = blur_pool(out, filt_size=3, stride=2)

    for name, _cin, _cout, stride in _LAYER_PLAN:
        blocks = params[name]
        layer_stats = {}
        for b in ("0", "1"):
            out, s = _basic_block(
                blocks[b], out, stride if b == "0" else 1, train, axis_name
            )
            if s:
                layer_stats[b] = s
        if layer_stats:
            stats[name] = layer_stats
    return out, stats

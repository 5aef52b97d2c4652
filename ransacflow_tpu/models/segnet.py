"""ADE20k scene-parsing network for sky removal (the reference's segNet).

Architecture mirror of segNet/segModel.py: a ResNet-50 with a 3-conv stem
(MIT CSAIL variant), layers 3/4 converted to dilation 2/4 (output stride 8),
and a PPMDeepsup decoder (pyramid pooling over scales 1/2/3/6 + conv head ->
150-class softmax upsampled to the target size). The reference's
synchronized BatchNorm (segNet/lib/nn) is here an ordinary BN in eval mode
— inference uses running stats, and train-mode cross-device sync is the
standard `axis_name` pmean in layers.batch_norm.

The sky-mask protocol mirrors segNet/segEval.py:23-43: 5-scale inference
(short side 300..600, long side <= 500, sizes rounded UP to a multiple of
8), softmax scores averaged (/5), argmax over classes, binary mask
`pred == seg_id` (optionally inverted).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ransacflow_tpu.models.layers import (
    conv2d,
    batch_norm,
    max_pool,
    bn_init,
    kaiming_normal_conv,
)
from ransacflow_tpu.models.resnet50 import imagenet_preprocess
from ransacflow_tpu.ops.sampler import interpolate_bilinear

_LAYERS = [  # (name, blocks, planes, stride, dilation)
    ("layer1", 3, 64, 1, 1),
    ("layer2", 4, 128, 2, 1),
    ("layer3", 6, 256, 1, 2),   # dilate_scale 8: stride -> 1, dilation 2
    ("layer4", 3, 512, 1, 4),
]
NUM_CLASSES = 150
POOL_SCALES = (1, 2, 3, 6)
FC_DIM = 2048


def _bn_relu(x, p, train=False):
    y, _ = batch_norm(x, p, train)
    return jax.nn.relu(y)


def init_segnet_encoder(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 80))

    def conv_init(kh, kw, cin, cout):
        return {"weight": kaiming_normal_conv(next(keys), kh, kw, cin, cout, dtype)}

    p = {
        "conv1": conv_init(3, 3, 3, 64), "bn1": bn_init(64, dtype),
        "conv2": conv_init(3, 3, 64, 64), "bn2": bn_init(64, dtype),
        "conv3": conv_init(3, 3, 64, 128), "bn3": bn_init(128, dtype),
    }
    inplanes = 128
    for name, blocks, planes, _s, _d in _LAYERS:
        layer = {}
        for b in range(blocks):
            cin = inplanes if b == 0 else planes * 4
            blk = {
                "conv1": conv_init(1, 1, cin, planes), "bn1": bn_init(planes, dtype),
                "conv2": conv_init(3, 3, planes, planes), "bn2": bn_init(planes, dtype),
                "conv3": conv_init(1, 1, planes, planes * 4),
                "bn3": bn_init(planes * 4, dtype),
            }
            if b == 0:
                blk["downsample"] = {
                    "0": conv_init(1, 1, cin, planes * 4),
                    "1": bn_init(planes * 4, dtype),
                }
            layer[str(b)] = blk
        p[name] = layer
        inplanes = planes * 4
    return p


def init_segnet_decoder(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))

    def conv_init(kh, kw, cin, cout, bias=False):
        d = {"weight": kaiming_normal_conv(next(keys), kh, kw, cin, cout, dtype)}
        if bias:
            d["bias"] = jnp.zeros((cout,), dtype)
        return d

    p = {"ppm": {}}
    for i in range(len(POOL_SCALES)):
        p["ppm"][str(i)] = {
            "1": conv_init(1, 1, FC_DIM, 512),
            "2": bn_init(512, dtype),
        }
    p["conv_last"] = {
        "0": conv_init(3, 3, FC_DIM + len(POOL_SCALES) * 512, 512),
        "1": bn_init(512, dtype),
        "4": conv_init(1, 1, 512, NUM_CLASSES, bias=True),
    }
    return p


def _bottleneck(p, x, stride, dilation, train=False):
    """Dilated bottleneck. For a dilated stage the first block's 3x3 conv
    runs stride 1 with dilation d/2 (segModel.py:186-199)."""
    d_conv2 = dilation // 2 if (dilation > 1 and stride == -1) else dilation
    out = conv2d(x, p["conv1"]["weight"], padding=0)
    out = _bn_relu(out, p["bn1"], train)
    s = 1 if stride == -1 else stride
    out = conv2d(out, p["conv2"]["weight"], stride=s, padding=d_conv2,
                 dilation=d_conv2)
    out = _bn_relu(out, p["bn2"], train)
    out = conv2d(out, p["conv3"]["weight"], padding=0)
    out, _ = batch_norm(out, p["bn3"], train)
    if "downsample" in p:
        res = conv2d(x, p["downsample"]["0"]["weight"], stride=s, padding=0)
        res, _ = batch_norm(res, p["downsample"]["1"], train)
    else:
        res = x
    return jax.nn.relu(out + res)


@jax.jit
def segnet_encoder(params, x):
    """x: (B, H, W, 3) ImageNet-normalized -> conv5 (B, H/8, W/8, 2048)."""
    out = conv2d(x, params["conv1"]["weight"], stride=2, padding=1)
    out = _bn_relu(out, params["bn1"])
    out = conv2d(out, params["conv2"]["weight"], padding=1)
    out = _bn_relu(out, params["bn2"])
    out = conv2d(out, params["conv3"]["weight"], padding=1)
    out = _bn_relu(out, params["bn3"])
    out = max_pool(out, window=3, stride=2, padding=1)

    for name, blocks, _planes, stride, dilation in _LAYERS:
        for b in range(blocks):
            if b == 0:
                # a dilated stage replaces its stride-2 entry conv with
                # stride 1 / dilation d/2 (encoded as stride == -1)
                s = -1 if dilation > 1 else stride
                out = _bottleneck(params[name][str(b)], out, s, dilation)
            else:
                out = _bottleneck(params[name][str(b)], out, 1, dilation)
    return out


def _adaptive_avg_pool(x, out_size):
    """torch AdaptiveAvgPool2d semantics: bin i spans
    [floor(i*H/s), ceil((i+1)*H/s))."""
    B, H, W, C = x.shape
    rows = []
    for i in range(out_size):
        r0, r1 = (i * H) // out_size, -(-((i + 1) * H) // out_size)
        cols = []
        for j in range(out_size):
            c0, c1 = (j * W) // out_size, -(-((j + 1) * W) // out_size)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, s, s, C)


@partial(jax.jit, static_argnames=("seg_size",))
def segnet_decoder(params, conv5, seg_size):
    """PPM decoder -> per-class softmax at seg_size (H, W)."""
    B, H, W, C = conv5.shape
    ppm_out = [conv5]
    for i, scale in enumerate(POOL_SCALES):
        p = params["ppm"][str(i)]
        pooled = _adaptive_avg_pool(conv5, scale)
        y = conv2d(pooled, p["1"]["weight"], padding=0)
        y = _bn_relu(y, p["2"])
        ppm_out.append(interpolate_bilinear(y, H, W, align_corners=False))
    x = jnp.concatenate(ppm_out, axis=-1)

    cl = params["conv_last"]
    x = conv2d(x, cl["0"]["weight"], padding=1)
    x = _bn_relu(x, cl["1"])
    x = conv2d(x, cl["4"]["weight"], cl["4"].get("bias"), padding=0)
    x = interpolate_bilinear(x, seg_size[0], seg_size[1], align_corners=False)
    return jax.nn.softmax(x, axis=-1)


def _round_up(x, p):
    return ((x - 1) // p + 1) * p


class SkySegmenter:
    """Multi-scale sky-mask inference (segNet/segEval.py API mirror).

    Args:
      encoder_params / decoder_params: from `init_segnet_*` or the
        released ade20k checkpoints via
        ``state_dict_to_tree(load_torch_checkpoint(pth))``.
      seg_id: ADE20k class index (2 = sky in the eval harness usage,
        evaluation/evalHpatch/coarseAlignFeatMatch.py:63-64).
      seg_fg: invert the mask (return 1 - (pred == seg_id)).
    """

    IMG_SIZES = (300, 375, 450, 525, 600)
    IMG_MAX_SIZE = 500
    PADDING = 8

    def __init__(self, encoder_params, decoder_params, seg_id=2, seg_fg=False):
        self.enc = encoder_params
        self.dec = decoder_params
        self.seg_id = seg_id
        self.seg_fg = seg_fg

    def class_scores(self, img):
        """PIL image -> (H, W, 150) multi-scale averaged softmax scores."""
        from PIL import Image

        w, h = img.size
        scores = np.zeros((h, w, NUM_CLASSES), np.float32)
        for short in self.IMG_SIZES:
            scale = min(short / float(min(h, w)),
                        self.IMG_MAX_SIZE / float(max(h, w)))
            tw = _round_up(int(w * scale), self.PADDING)
            th = _round_up(int(h * scale), self.PADDING)
            resized = img.resize((tw, th), resample=Image.BILINEAR)
            arr = np.asarray(resized, np.float32) / 255.0
            x = imagenet_preprocess(jnp.asarray(arr)[None])
            conv5 = segnet_encoder(self.enc, x)
            pred = segnet_decoder(self.dec, conv5, (h, w))
            scores += np.asarray(pred[0]) / len(self.IMG_SIZES)
        return scores

    def get_sky(self, img):
        """PIL image (or path) -> float32 (H, W) mask of `seg_id` pixels."""
        if isinstance(img, str):
            from PIL import Image

            img = Image.open(img).convert("RGB")
        pred = np.argmax(self.class_scores(img), axis=-1)
        mask = (pred == self.seg_id).astype(np.float32)
        return 1.0 - mask if self.seg_fg else mask

"""Host-side image I/O and resizing (PIL LANCZOS), exactly as the reference.

Everything here runs on the host; tensors cross to the device once per
image. Sizes are floored to multiples of the coarse net stride (16) so the
feature grids are exact.
"""

import numpy as np
from PIL import Image

STRIDE_NET = 16


def min_size_shape_wh(size_wh, min_size, stride=STRIDE_NET):
    """(new_w, new_h) of a min-side resize, floored to stride.

    THE single implementation of the shape rule (reference:
    evaluation/evalHpatch/coarseAlignFeatMatch.py:90-100) — every
    resize/mask/calibration consumer derives from it so the round/floor
    semantics can never diverge between them.
    """
    w, h = size_wh
    ratio = min(w / float(min_size), h / float(min_size))
    new_w, new_h = int(round(w / ratio)), int(round(h / ratio))
    return new_w // stride * stride, new_h // stride * stride


def resize_min_size(img, min_size, stride=STRIDE_NET):
    """Resize so the *smaller* dimension ~= min_size, floor to stride."""
    return img.resize(min_size_shape_wh(img.size, min_size, stride),
                      resample=Image.LANCZOS)


def resized_shape_min_size(img, min_size, stride=STRIDE_NET):
    """(Ht, Wt) that `resize_min_size` would produce, without resizing."""
    new_w, new_h = min_size_shape_wh(img.size, min_size, stride)
    return new_h, new_w


def resize_max_size(img, min_size, stride=STRIDE_NET):
    """Resize so the *larger* dimension ~= min_size, floor to stride.

    (reference: quick_start/coarseAlignFeatMatch.py:80-90)
    """
    w, h = img.size
    ratio = max(w / float(min_size), h / float(min_size))
    new_w, new_h = int(round(w / ratio)), int(round(h / ratio))
    new_w, new_h = new_w // stride * stride, new_h // stride * stride
    return img.resize((new_w, new_h), resample=Image.LANCZOS)


def resize_round_stride(img, min_size, stride=STRIDE_NET):
    """Resize so min dim = min_size, *round* (not floor) to stride.

    (reference: utils/outil.py:6-19 ``resizeImg``)
    """
    w, h = img.size
    ratio = min(w / min_size, h / min_size)
    w, h = w / ratio, h / ratio
    return img.resize(
        (round(w / stride) * stride, round(h / stride) * stride),
        resample=Image.LANCZOS,
    )


def to_array(img):
    """PIL -> float32 (H, W, 3) in [0, 1] (torchvision ToTensor semantics,
    channels-last)."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def scale_list(nb_scale, scale_r):
    """The coarse pyramid's scale factors
    (reference: quick_start/coarseAlignFeatMatch.py:70-75).

    nb_scale == 1 -> [1]; else linspace(scaleR, 1, n//2+1) ++
    linspace(1, 1/scaleR, n//2+1)[1:].
    """
    if nb_scale == 1:
        return [1.0]
    up = np.linspace(scale_r, 1, nb_scale // 2 + 1).tolist()
    down = np.linspace(1, 1 / scale_r, nb_scale // 2 + 1).tolist()[1:]
    return up + down

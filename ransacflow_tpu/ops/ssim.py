"""Masked SSIM reconstruction loss (reference: model/ssimLoss.py:6-48).

11x11 Gaussian window (sigma 1.5), C1 = 0.01^2, C2 = 0.03^2. The mask is a
box-filtered matchability map thresholded at 0.5; the final loss is
``sum((1 - ssim_map) * mask) / sum(mask) / 3``.
"""

import math

import numpy as np
import jax.numpy as jnp
from jax import lax


def gaussian_window(window_size=11, sigma=1.5):
    """Normalized 1-D Gaussian, evaluated at integer taps (torch-identical)."""
    g = np.array(
        [
            math.exp(-((i - window_size // 2) ** 2) / (2.0 * sigma**2))
            for i in range(window_size)
        ],
        dtype=np.float32,
    )
    return g / g.sum()


def _depthwise_sep_conv(x, taps_y, taps_x, pad):
    """Separable depthwise 2-D conv (zero padding), channels-last.

    Both SSIM windows are rank-1 (Gaussian outer product, uniform box), so
    two 1-D passes compute the exact same result as the 2-D conv at ~k/2x
    fewer FLOPs — the SSIM convs are a top cost of the training step.

    x: (B, H, W, C); taps_y/taps_x: (k,) 1-D filters.
    """
    C = x.shape[-1]

    def pass_1d(inp, taps, axis):
        kh, kw = (len(taps), 1) if axis == 1 else (1, len(taps))
        k = jnp.asarray(
            np.tile(np.asarray(taps).reshape(kh, kw, 1, 1), (1, 1, 1, C)),
            inp.dtype,
        )
        pads = [(pad, pad), (0, 0)] if axis == 1 else [(0, 0), (pad, pad)]
        return lax.conv_general_dilated(
            inp,
            k,
            window_strides=(1, 1),
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    return pass_1d(pass_1d(x, taps_y, axis=1), taps_x, axis=2)


def masked_ssim_loss(img1, img2, match, window_size=11, sigma=1.5,
                     axis_name=None):
    """SSIM dissimilarity between img1 and img2, weighted by matchability.

    Args:
      img1, img2: (B, H, W, 3)
      match: (B, H, W, 1) matchability in [0, 1]

    Returns scalar loss (to minimize): mean over masked pixels of
    (1 - SSIM) summed over 3 channels / 3.
    """
    pad = window_size // 2
    g1 = gaussian_window(window_size, sigma)
    box1 = np.full((window_size,), 1.0 / window_size, np.float32)

    def gconv(x):
        return _depthwise_sep_conv(x, g1, g1, pad)

    mask = _depthwise_sep_conv(match, box1, box1, pad) + 1e-7
    mask = (mask > 0.5).astype(img1.dtype) + 1e-7  # (B, H, W, 1)

    mu1 = gconv(img1)
    mu2 = gconv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = gconv(img1 * img1) - mu1_sq
    sigma2_sq = gconv(img2 * img2) - mu2_sq
    sigma12 = gconv(img1 * img2) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    num = jnp.sum((1.0 - ssim_map) * mask)
    den = jnp.sum(mask)
    if axis_name is not None:
        # global ratio across the data mesh: DP == single-device large batch
        num = lax.psum(num, axis_name)
        den = lax.psum(den, axis_name)
    return num / den / 3.0

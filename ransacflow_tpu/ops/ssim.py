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


def _depthwise_conv(x, kernel2d, pad):
    """Depthwise 2-D conv with zero padding, channels-last.

    x: (B, H, W, C); kernel2d: (kh, kw) shared across channels.
    """
    C = x.shape[-1]
    k = jnp.asarray(
        np.tile(np.asarray(kernel2d)[:, :, None, None], (1, 1, 1, C)), x.dtype
    )
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


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
    gwin = np.outer(g1, g1)
    box = np.full((window_size, window_size), 1.0 / window_size**2, np.float32)

    mask = _depthwise_conv(match, box, pad) + 1e-7
    mask = (mask > 0.5).astype(img1.dtype) + 1e-7  # (B, H, W, 1)

    mu1 = _depthwise_conv(img1, gwin, pad)
    mu2 = _depthwise_conv(img2, gwin, pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _depthwise_conv(img1 * img1, gwin, pad) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, gwin, pad) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, gwin, pad) - mu1_mu2

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

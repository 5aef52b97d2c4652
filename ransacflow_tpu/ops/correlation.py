"""Local correlation volume (the reference's CorrNeigh).

The reference loops 49 times in Python over offset pairs, each iteration a
separate CUDA launch (model/model.py:145-147). Here the offsets are a single
unrolled XLA fusion over a zero-padded target tensor; each offset is an
elementwise multiply + channel reduction that XLA fuses into one pass. A
Pallas kernel (tiled x / haloed y resident in VMEM) can replace this for
peak HBM efficiency; the XLA form is already launch-overhead free.

Channel ordering matches the reference exactly: channel c = di*k + dj
corresponds to target offset (di - k//2) rows, (dj - k//2) cols.
"""

import jax.numpy as jnp


def correlation_volume(x, y, kernel_size=7, use_pallas=False):
    """Channel-wise local correlation between feature maps.

    Args:
      x: (B, H, W, C) — features at the reference position.
      y: (B, H, W, C) — features sampled at shifted positions (zero padding
        outside), i.e. ``corr[b, i, j, di*k+dj] =
        sum_c x[b,i,j,c] * y[b, i+di-p, j+dj-p, c]`` with p = k//2.
      use_pallas: route through the VMEM-resident Pallas kernel
        (ops/pallas_corr.py) when the target fits on-chip.

    Returns (B, H, W, k*k).
    """
    assert kernel_size % 2 == 1
    if use_pallas:
        from ransacflow_tpu.ops.pallas_corr import (
            correlation_volume_pallas,
            fits_vmem,
        )

        if fits_vmem(*x.shape[1:], kernel_size):
            return correlation_volume_pallas(x, y, kernel_size)
    p = kernel_size // 2
    B, H, W, C = x.shape
    y_pad = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
    slabs = []
    for di in range(kernel_size):
        for dj in range(kernel_size):
            y_shift = y_pad[:, di : di + H, dj : dj + W, :]
            slabs.append(jnp.sum(x * y_shift, axis=-1))
    return jnp.stack(slabs, axis=-1)


def corr_offset_grids(kernel_size=7, dtype=jnp.float32):
    """(gx, gy) integer offsets per correlation channel, each (k*k,).

    gx[c] = (c % k) - k//2 (column offset), gy[c] = (c // k) - k//2 (row
    offset) — the expectation grids of NetFlowCoarse
    (reference: model/model.py:190-191).
    """
    p = kernel_size // 2
    idx = jnp.arange(kernel_size * kernel_size)
    gx = (idx % kernel_size - p).astype(dtype)
    gy = (idx // kernel_size - p).astype(dtype)
    return gx, gy

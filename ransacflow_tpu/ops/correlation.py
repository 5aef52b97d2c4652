"""Local correlation volume (the reference's CorrNeigh).

The reference loops 49 times in Python over offset pairs, each iteration a
separate CUDA launch (model/model.py:145-147). Here the offsets are a single
unrolled XLA fusion over a zero-padded target tensor; each offset is an
elementwise multiply + channel reduction that XLA fuses into one pass.

A hand-written Pallas kernel (tiled x / haloed y resident in VMEM) was
tried and measured SLOWER than this XLA form on a v5e chip at the
fine-stage shape (1, 60, 80, 256), k=7: 0.127 ms vs 0.114 ms (0.9x).
XLA's fusion already saturates HBM here, so the kernel was removed
(round-2 decision; history: ops/pallas_corr.py before c6cf255).

Channel ordering matches the reference exactly: channel c = di*k + dj
corresponds to target offset (di - k//2) rows, (dj - k//2) cols.
"""

import jax.numpy as jnp


def correlation_volume(x, y, kernel_size=7):
    """Channel-wise local correlation between feature maps.

    Args:
      x: (B, H, W, C) — features at the reference position.
      y: (B, H, W, C) — features sampled at shifted positions (zero padding
        outside), i.e. ``corr[b, i, j, di*k+dj] =
        sum_c x[b,i,j,c] * y[b, i+di-p, j+dj-p, c]`` with p = k//2.

    Returns (B, H, W, k*k).
    """
    assert kernel_size % 2 == 1
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

"""Normalized coordinate grids.

Two distinct conventions coexist in the reference and are preserved here:

1. **Corner-anchored** grids (``torch.linspace(-1, 1, n)``): used for
   sampling grids / warp grids (align_corners=True semantics). Endpoints map
   exactly to the first/last pixel centers.
2. **Cell-centered** grids (``((i + 0.5)/n - 0.5) * 2``): used for coarse
   feature-cell coordinates fed to matching + RANSAC
   (reference: utils/outil.py:21-29).
"""

import jax.numpy as jnp


def normalized_grid(h, w, dtype=jnp.float32):
    """Corner-anchored (x, y) grid of shape (h, w, 2), values in [-1, 1].

    Equivalent to the reference's
    ``cat(linspace(-1,1,w) as x, linspace(-1,1,h) as y)`` grids
    (e.g. evaluation/evalHpatch/evaluation.py:187-189).
    """
    x = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    gx, gy = jnp.meshgrid(x, y)  # each (h, w)
    return jnp.stack([gx, gy], axis=-1)


def feature_cell_coords(h, w, dtype=jnp.float32):
    """Cell-centered normalized coords of an h x w feature grid.

    Returns (y_norm, x_norm), each flattened to (h*w,) in row-major order,
    with ``y_norm = ((row + 0.5)/h - 0.5) * 2`` and likewise for columns.

    Mirrors the reference's ``getWHTensor`` (utils/outil.py:21-24); note the
    reference's "W" tensor indexes rows and its "H" tensor indexes columns —
    here they are named what they are.
    """
    rows = (jnp.arange(h, dtype=dtype) + 0.5) / h
    cols = (jnp.arange(w, dtype=dtype) + 0.5) / w
    y = jnp.repeat((rows - 0.5) * 2.0, w)
    x = jnp.tile((cols - 0.5) * 2.0, h)
    return y, x


def feature_cell_indices(h, w):
    """Integer (row, col) indices of an h x w grid flattened row-major.

    Mirrors ``getWHTensor_Int`` (utils/outil.py:26-29).
    """
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    return rows, cols

"""Sampler parity vs torch (grid_sample / interpolate / affine_grid)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ransacflow_tpu.ops import (
    grid_sample,
    interpolate_bilinear,
    upsample_bilinear_x8,
    affine_grid,
    normalized_grid,
)


def _rand_img(rng, b, h, w, c):
    return rng.randn(b, h, w, c).astype(np.float32)


def test_grid_sample_align_true_matches_torch(rng):
    img = _rand_img(rng, 2, 13, 17, 3)
    grid = (rng.rand(2, 9, 11, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        align_corners=True,
        padding_mode="zeros",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_align_false_matches_torch(rng):
    img = _rand_img(rng, 1, 8, 8, 2)
    grid = (rng.rand(1, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=False)
    )
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_interpolate_bilinear_matches_torch(rng):
    for (h, w, oh, ow) in [(6, 9, 17, 13), (16, 16, 7, 5), (5, 5, 40, 40)]:
        img = _rand_img(rng, 2, h, w, 4)
        ours = np.asarray(interpolate_bilinear(jnp.asarray(img), oh, ow))
        ref = F.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            size=(oh, ow),
            mode="bilinear",
            align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_x8_matches_torch_align_true(rng):
    img = _rand_img(rng, 1, 6, 7, 2)
    ours = np.asarray(upsample_bilinear_x8(jnp.asarray(img)))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        scale_factor=8,
        mode="bilinear",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_affine_grid_matches_torch(rng):
    theta = rng.randn(2, 2, 3).astype(np.float32) * 0.3 + np.tile(
        np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1)
    )
    h, w = 10, 14
    ours = np.asarray(affine_grid(jnp.asarray(theta), h, w))
    ref = F.affine_grid(
        torch.from_numpy(theta), (2, 3, h, w), align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalized_grid_matches_torch_linspace():
    g = np.asarray(normalized_grid(5, 7))
    gx = torch.linspace(-1, 1, steps=7).view(1, -1).expand(5, 7).numpy()
    gy = torch.linspace(-1, 1, steps=5).view(-1, 1).expand(5, 7).numpy()
    np.testing.assert_allclose(g[..., 0], gx, atol=1e-6)
    np.testing.assert_allclose(g[..., 1], gy, atol=1e-6)

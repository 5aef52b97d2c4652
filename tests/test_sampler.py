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


def test_grid_sample_far_out_of_range_matches_torch(rng):
    """Deep OOB samples (|coord| up to 3): the footprint gather's clipped
    anchors fetch garbage rows that the validity mask must fully zero —
    torch returns exact zeros there. Also mixes in border-straddling and
    in-range samples so every anchor-clip branch is hit in one call."""
    img = _rand_img(rng, 2, 13, 17, 3)
    grid = (rng.rand(2, 9, 11, 2).astype(np.float32) * 6.0 - 3.0)
    grid[:, :3] = grid[:, :3] / 3.0  # in-range rows
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


def _torch_grid_sample_grads(img, grid, g_out, align):
    """Reference cotangents from torch F.grid_sample backward."""
    ti = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(ti, tg, align_corners=align, padding_mode="zeros")
    out.backward(torch.from_numpy(g_out).permute(0, 3, 1, 2))
    return (
        ti.grad.permute(0, 2, 3, 1).numpy(),
        tg.grad.numpy(),
    )


def _jax_grid_sample_grads(img, grid, g_out, align):
    import jax

    def f(i, gr):
        return grid_sample(i, gr, align_corners=align)

    _, vjp = jax.vjp(f, jnp.asarray(img), jnp.asarray(grid))
    di, dg = vjp(jnp.asarray(g_out))
    return np.asarray(di), np.asarray(dg)


def test_grid_sample_backward_matches_torch(rng):
    """Both cotangents (dense-splat d_image + analytic d_grid) vs torch."""
    for align in (True, False):
        img = _rand_img(rng, 2, 13, 17, 3)
        grid = rng.rand(2, 9, 11, 2).astype(np.float32) * 2.6 - 1.3  # incl OOB
        g_out = _rand_img(rng, 2, 9, 11, 3)
        ref_di, ref_dg = _torch_grid_sample_grads(img, grid, g_out, align)
        di, dg = _jax_grid_sample_grads(img, grid, g_out, align)
        np.testing.assert_allclose(di, ref_di, atol=2e-5)
        np.testing.assert_allclose(dg, ref_dg, atol=2e-4, rtol=1e-4)


def test_grid_sample_backward_exact_integer_coords(rng):
    """fx = fy = 0 exactly: the splat must hit single pixels, and the grid
    gradient still uses both corners (torch semantics)."""
    h = w = 8
    img = _rand_img(rng, 1, h, w, 2)
    # grid landing exactly on pixel centers (align_corners=True)
    ys, xs = np.meshgrid(np.arange(0, h, 2), np.arange(0, w, 2), indexing="ij")
    gx = xs / (w - 1) * 2 - 1
    gy = ys / (h - 1) * 2 - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    g_out = _rand_img(rng, 1, grid.shape[1], grid.shape[2], 2)
    ref_di, ref_dg = _torch_grid_sample_grads(img, grid, g_out, True)
    di, dg = _jax_grid_sample_grads(img, grid, g_out, True)
    np.testing.assert_allclose(di, ref_di, atol=1e-5)
    np.testing.assert_allclose(dg, ref_dg, atol=1e-4)


def test_grid_sample_backward_chunked_splat(rng):
    """Sample count > _SPLAT_CHUNK exercises the scan-chunked dense splat
    (and its zero-padded tail)."""
    from ransacflow_tpu.ops import sampler as S

    img = _rand_img(rng, 1, 10, 12, 1)
    ho, wo = 70, 61  # P = 4270 > one 4096 chunk, with a padded tail
    assert ho * wo > S._SPLAT_CHUNK
    grid = rng.rand(1, ho, wo, 2).astype(np.float32) * 2.2 - 1.1
    g_out = _rand_img(rng, 1, ho, wo, 1)
    ref_di, ref_dg = _torch_grid_sample_grads(img, grid, g_out, True)
    di, dg = _jax_grid_sample_grads(img, grid, g_out, True)
    np.testing.assert_allclose(di, ref_di, atol=2e-4)
    np.testing.assert_allclose(dg, ref_dg, atol=2e-4, rtol=1e-4)


def test_grid_sample_backward_scatter_fallback(rng):
    """Force the scatter path (as used above the dense-splat threshold) and
    check it agrees with torch too."""
    from ransacflow_tpu.ops.sampler import _splat_scatter

    img = _rand_img(rng, 2, 9, 7, 3)
    grid = rng.rand(2, 6, 5, 2).astype(np.float32) * 2.4 - 1.2
    g_out = _rand_img(rng, 2, 6, 5, 3)
    ref_di, _ = _torch_grid_sample_grads(img, grid, g_out, True)
    di = np.asarray(
        _splat_scatter(jnp.asarray(g_out), jnp.asarray(grid), img.shape,
                       jnp.float32, True)
    )
    np.testing.assert_allclose(di, ref_di, atol=2e-5)


def test_grid_sample_backward_under_vmap(rng):
    """The custom VJP must stay correct under vmap (fused batch path)."""
    import jax

    imgs = _rand_img(rng, 3, 8, 8, 2)[:, None]  # (3, 1, 8, 8, 2)
    grids = (rng.rand(3, 1, 6, 6, 2).astype(np.float32) * 2 - 1)

    def per_pair(i, gr):
        return jnp.sum(grid_sample(i, gr) ** 2)

    grads = jax.vmap(jax.grad(per_pair, argnums=(0, 1)))(
        jnp.asarray(imgs), jnp.asarray(grids)
    )
    for k in range(3):
        ref = jax.grad(per_pair, argnums=(0, 1))(
            jnp.asarray(imgs[k]), jnp.asarray(grids[k])
        )
        np.testing.assert_allclose(np.asarray(grads[0][k]), np.asarray(ref[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(grads[1][k]), np.asarray(ref[1]),
                                   atol=1e-5)

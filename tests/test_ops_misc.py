"""Blur-pool / correlation volume / SSIM parity vs torch goldens."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ransacflow_tpu.ops import (
    blur_pool,
    correlation_volume,
    corr_offset_grids,
    masked_ssim_loss,
    gaussian_window,
)


def _torch_blurpool(x_nchw, filt_size=3, stride=2):
    """Golden blur-pool: binomial filter + reflect pad + depthwise conv
    (standard anti-aliased downsampling, cf. model/downsample.py:12-46)."""
    from math import comb, ceil

    a = torch.tensor([float(comb(filt_size - 1, i)) for i in range(filt_size)])
    filt = a[:, None] * a[None, :]
    filt = filt / filt.sum()
    C = x_nchw.shape[1]
    filt = filt[None, None].repeat(C, 1, 1, 1)
    lo, hi = (filt_size - 1) // 2, ceil((filt_size - 1) / 2)
    x = F.pad(x_nchw, (lo, hi, lo, hi), mode="reflect")
    return F.conv2d(x, filt, stride=stride, groups=C)


def test_blur_pool_matches_torch(rng):
    for filt_size, stride in [(3, 2), (5, 2), (2, 2), (3, 1)]:
        x = rng.randn(2, 12, 14, 6).astype(np.float32)
        ours = np.asarray(blur_pool(jnp.asarray(x), filt_size, stride))
        gold = _torch_blurpool(
            torch.from_numpy(x).permute(0, 3, 1, 2), filt_size, stride
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-5)


def _torch_corr(x_nchw, y_nchw, k):
    """Golden local correlation: zero-pad + shifted channel dot products
    (the CorrNeigh contract, model/model.py:138-149)."""
    from itertools import product

    p = k // 2
    n, c, w, h = x_nchw.shape
    y = F.pad(y_nchw, (p, p, p, p))
    coef = [
        torch.sum(x_nchw * y[:, :, i : i + w, j : j + h], dim=1, keepdim=True)
        for i, j in product(range(k), range(k))
    ]
    return torch.cat(coef, dim=1)


def test_correlation_volume_matches_torch(rng):
    x = rng.randn(2, 9, 11, 16).astype(np.float32)
    y = rng.randn(2, 9, 11, 16).astype(np.float32)
    ours = np.asarray(correlation_volume(jnp.asarray(x), jnp.asarray(y), 7))
    gold = _torch_corr(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
        7,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_corr_offset_grids_match_reference_layout():
    gx, gy = corr_offset_grids(7)
    # reference gridY varies over rows (c // 7), gridX over cols (c % 7)
    gold_y = np.repeat(np.arange(-3, 4), 7).astype(np.float32)
    gold_x = np.tile(np.arange(-3, 4), 7).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(gy), gold_y)
    np.testing.assert_array_equal(np.asarray(gx), gold_x)


def _torch_ssim_loss(img1, img2, match, window_size=11):
    """Golden masked SSIM (model/ssimLoss.py:16-48)."""
    g = torch.from_numpy(gaussian_window(window_size, 1.5)).float().unsqueeze(1)
    win2d = g @ g.t()
    window = win2d[None, None].expand(3, 1, window_size, window_size).contiguous()
    winMask = torch.ones(1, 1, window_size, window_size) / window_size**2
    pad = window_size // 2

    mask = F.conv2d(match, winMask, padding=pad) + 1e-7
    mask = (mask > 0.5).float() + 1e-7

    mu1 = F.conv2d(img1, window, padding=pad, groups=3)
    mu2 = F.conv2d(img2, window, padding=pad, groups=3)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=3) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=3) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=3) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return (torch.sum((1 - smap) * mask) / torch.sum(mask) / 3).item()


def test_masked_ssim_matches_torch(rng):
    img1 = rng.rand(2, 24, 24, 3).astype(np.float32)
    img2 = rng.rand(2, 24, 24, 3).astype(np.float32)
    match = (rng.rand(2, 24, 24, 1) > 0.3).astype(np.float32)
    ours = float(
        masked_ssim_loss(jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(match))
    )
    gold = _torch_ssim_loss(
        torch.from_numpy(img1).permute(0, 3, 1, 2),
        torch.from_numpy(img2).permute(0, 3, 1, 2),
        torch.from_numpy(match).permute(0, 3, 1, 2),
    )
    np.testing.assert_allclose(ours, gold, rtol=1e-4)


def test_blur_pool_1d_matches_torch(rng):
    from ransacflow_tpu.ops import blur_pool_1d
    from math import comb, ceil

    x = rng.randn(2, 21, 5).astype(np.float32)
    for filt_size in (3, 5):
        a = torch.tensor([float(comb(filt_size - 1, i)) for i in range(filt_size)])
        filt = (a / a.sum())[None, None, :].repeat(5, 1, 1)
        lo, hi = (filt_size - 1) // 2, ceil((filt_size - 1) / 2)
        xt = torch.from_numpy(x).permute(0, 2, 1)
        gold = F.conv1d(F.pad(xt, (lo, hi), mode="reflect"), filt, stride=2,
                        groups=5).permute(0, 2, 1).numpy()
        ours = np.asarray(blur_pool_1d(jnp.asarray(x), filt_size, stride=2))
        np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_monitor_image_dumps(tmp_path, rng):
    """Visual monitoring hooks (reference utils/monitor.py tensor2image +
    Visdom image push -> headless PNG dumps)."""
    from PIL import Image
    from ransacflow_tpu.utils.monitor import (
        MetricsLogger, tensor2image, flow2image,
    )

    # 1-channel map -> jet colormap RGB
    m = rng.rand(1, 16, 16, 1).astype(np.float32)
    img = tensor2image(m)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # RGB passthrough scaling
    img3 = tensor2image(rng.rand(1, 8, 8, 3).astype(np.float32))
    assert img3.shape == (8, 8, 3)
    # flow wheel
    fl = flow2image(rng.randn(12, 10, 2).astype(np.float32) * 0.1)
    assert fl.shape == (12, 10, 3)

    logger = MetricsLogger(str(tmp_path), echo=False)
    p1 = logger.log_image(3, "match", m)
    p2 = logger.log_image(3, "flow", rng.randn(12, 10, 2).astype(np.float32),
                          kind="flow")
    for p in (p1, p2):
        assert Image.open(p).size[0] > 0


def test_conv2d_int8_weights_integer_accumulation():
    """int8 weights select the MXU int8 path with int32 accumulation
    (models/layers.py conv2d): the float result equals an exact integer
    conv of the rounded inputs — no float rounding inside the dot."""
    import jax.numpy as jnp
    from ransacflow_tpu.models.layers import conv2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-50, 50, (1, 8, 8, 3)).astype(np.float32))
    w8 = rng.randint(-127, 128, (3, 3, 3, 4)).astype(np.int8)
    out = conv2d(x, jnp.asarray(w8), padding=1)
    assert out.dtype == jnp.float32
    # golden: exact int64 conv via explicit loops on the host
    xi = np.asarray(x)[0].astype(np.int64)
    xp = np.pad(xi, ((1, 1), (1, 1), (0, 0)))
    gold = np.zeros((8, 8, 4), np.int64)
    for i in range(8):
        for j in range(8):
            patch = xp[i:i + 3, j:j + 3, :]
            gold[i, j] = np.tensordot(
                patch, w8.astype(np.int64), axes=([0, 1, 2], [0, 1, 2]))
    np.testing.assert_array_equal(np.asarray(out)[0].astype(np.int64), gold)


def test_conv2d_int8_saturates_out_of_range_activations():
    """Float activations beyond int8 range clamp to +/-127 instead of
    wrapping (astype alone would turn 300.0 into 44 with a sign flip)."""
    import jax.numpy as jnp
    from ransacflow_tpu.models.layers import conv2d

    x = jnp.full((1, 3, 3, 1), 300.0, jnp.float32)
    w = np.zeros((1, 1, 1, 1), np.int8)
    w[0, 0, 0, 0] = 2
    out = conv2d(x, jnp.asarray(w), padding=0)
    np.testing.assert_array_equal(np.asarray(out), np.full((1, 3, 3, 1), 254.0))


def test_conv2d_int8_saturates_integer_activations_too():
    """Integer-dtype activations get the same saturate-don't-wrap treatment
    as floats (ADVICE r4): int32 input 300 clamps to 127, -300 to -127."""
    import jax.numpy as jnp
    from ransacflow_tpu.models.layers import conv2d

    x = jnp.asarray([[300], [-300], [60]], jnp.int32).reshape(1, 1, 3, 1)
    w = np.zeros((1, 1, 1, 1), np.int8)
    w[0, 0, 0, 0] = 2
    out = conv2d(x, jnp.asarray(w), padding=0)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), [254.0, -254.0, 120.0])

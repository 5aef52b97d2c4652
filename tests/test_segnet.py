"""Segmentation subsystem tests (sky removal)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ransacflow_tpu.models import (
    init_segnet_encoder,
    init_segnet_decoder,
    segnet_encoder,
    segnet_decoder,
    SkySegmenter,
)
from ransacflow_tpu.models.segnet import _adaptive_avg_pool
from ransacflow_tpu.models.layers import conv2d


def test_adaptive_avg_pool_matches_torch(rng):
    for out in (1, 2, 3, 6):
        x = rng.randn(2, 13, 17, 4).astype(np.float32)
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), out))
        gold = F.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), out
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-6)


def test_dilated_conv_matches_torch(rng):
    x = rng.randn(1, 16, 16, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 6).astype(np.float32)
    for d in (2, 4):
        ours = np.asarray(
            conv2d(jnp.asarray(x), jnp.asarray(w), padding=d, dilation=d)
        )
        gold = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            padding=d, dilation=d,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-4)


@pytest.fixture(scope="module")
def seg_params():
    return (
        init_segnet_encoder(jax.random.PRNGKey(0)),
        init_segnet_decoder(jax.random.PRNGKey(1)),
    )


def test_encoder_output_stride8_2048ch(rng, seg_params):
    enc, _ = seg_params
    x = jnp.asarray(rng.rand(1, 64, 80, 3).astype(np.float32))
    out = segnet_encoder(enc, x)
    assert out.shape == (1, 8, 10, 2048)


def test_decoder_softmax_at_seg_size(rng, seg_params):
    enc, dec = seg_params
    conv5 = jnp.asarray(rng.rand(1, 8, 10, 2048).astype(np.float32))
    out = segnet_decoder(dec, conv5, (33, 47))
    assert out.shape == (1, 33, 47, 150)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)


def test_sky_segmenter_end_to_end(rng, seg_params):
    enc, dec = seg_params
    img = Image.fromarray(
        (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    )
    seg = SkySegmenter(enc, dec, seg_id=2, seg_fg=False)
    mask = seg.get_sky(img)
    assert mask.shape == (48, 56)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # seg_fg inverts
    seg_inv = SkySegmenter(enc, dec, seg_id=2, seg_fg=True)
    np.testing.assert_allclose(seg_inv.get_sky(img), 1.0 - mask)

"""Edge cases and property tests across utilities."""

import os

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ransacflow_tpu.ops import grid_sample, interpolate_bilinear
from ransacflow_tpu.utils import (
    scale_list,
    resize_min_size,
    resize_max_size,
    resize_round_stride,
    MetricsLogger,
    StageTimer,
)


def test_grid_sample_property_sweep(rng):
    """Random shapes x align_corners x grid ranges vs torch."""
    for trial in range(6):
        b = int(rng.randint(1, 3))
        h, w = int(rng.randint(4, 20)), int(rng.randint(4, 20))
        ho, wo = int(rng.randint(2, 16)), int(rng.randint(2, 16))
        c = int(rng.randint(1, 5))
        ac = bool(trial % 2)
        img = rng.randn(b, h, w, c).astype(np.float32)
        grid = (rng.rand(b, ho, wo, 2).astype(np.float32) * 4 - 2)  # far OOB
        ours = np.asarray(
            grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=ac)
        )
        gold = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid), align_corners=ac,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_interpolate_align_true_generic_sizes(rng):
    for (h, w, oh, ow) in [(5, 7, 13, 11), (12, 9, 5, 17), (1, 6, 3, 6)]:
        img = rng.randn(1, h, w, 2).astype(np.float32)
        ours = np.asarray(
            interpolate_bilinear(jnp.asarray(img), oh, ow, align_corners=True)
        )
        gold = F.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2), size=(oh, ow),
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_scale_list_matches_reference_formula():
    # reference: linspace(scaleR,1,n//2+1) ++ linspace(1,1/scaleR,n//2+1)[1:]
    for n, r in [(7, 2.0), (5, 2.0), (3, 1.2)]:
        got = scale_list(n, r)
        gold = (np.linspace(r, 1, n // 2 + 1).tolist()
                + np.linspace(1, 1 / r, n // 2 + 1).tolist()[1:])
        np.testing.assert_allclose(got, gold)
        assert len(got) == 2 * (n // 2) + 1
    assert scale_list(1, 2.0) == [1.0]


def test_resize_helpers_dimension_rules(rng):
    img = Image.fromarray((rng.rand(100, 150, 3) * 255).astype(np.uint8))
    a = resize_min_size(img, 64)       # min dim ~64, floor to 16
    assert min(a.size) == 64 and a.size[0] % 16 == 0 and a.size[1] % 16 == 0
    b = resize_max_size(img, 64)       # max dim ~64, floor to 16
    assert max(b.size) <= 96 and b.size[0] % 16 == 0
    c = resize_round_stride(img, 64, stride=8)
    assert c.size[0] % 8 == 0 and c.size[1] % 8 == 0


def test_coarse_aligner_affine_mode(rng):
    """Affine transform fitting through the full coarse pipeline."""
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import CoarseAligner
    from ransacflow_tpu.ops import warp_grid, grid_sample

    s = 160
    base = (rng.rand(s // 4, s // 4, 3) > 0.5).astype(np.float32)
    src_arr = np.kron(base, np.ones((4, 4, 1), np.float32))[:s, :s]
    t = 2 * 16.0 / s
    H_true = np.array([[1, 0, t], [0, 1, t], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H_true)[None], s, s)
    tgt_arr = np.asarray(grid_sample(jnp.asarray(src_arr)[None], g))[0]
    to_img = lambda a: Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8))

    coarse = CoarseAligner(
        init_resnet50_layer3(jax.random.PRNGKey(0)),
        nb_scale=1, n_iter=2000, min_size=s, transform="affine",
    )
    coarse.set_pair(to_img(src_arr), to_img(tgt_arr))
    mask = np.ones((s, s), np.float32)
    mask[32:-32, 32:-32] = 0
    H, _ = coarse.get_coarse(mask)
    assert H is not None
    np.testing.assert_allclose(H, H_true, atol=0.03)
    assert H[2, 0] == 0 and H[2, 1] == 0  # affine: no perspective row


def test_margin_mask_zero_margin():
    from ransacflow_tpu.train import margin_mask

    m = np.asarray(margin_mask(2, 16, 0))
    assert m.sum() == 2 * 16 * 16


def test_metrics_logger_and_timer(tmp_path):
    import json
    import time

    logger = MetricsLogger(str(tmp_path), echo=False)
    logger.log(0, loss=1.5)
    logger.log(1, loss=1.25, extra=3)
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 1 and rec["loss"] == 1.25 and rec["extra"] == 3.0

    timer = StageTimer()
    with timer.time("a"):
        time.sleep(0.01)
    with timer.time("a"):
        pass
    report = timer.report()
    assert "a: total" in report and "2 calls" in report
